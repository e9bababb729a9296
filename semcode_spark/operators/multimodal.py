"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct, processed by Arrow-batched ``mapInPandas`` kernels — the same
batch discipline as the reference's columnar upsert pivot
(storage/milvus_store.py:110-130). The *decode* step is STUBBED (no
image/audio libraries in this container): ``decode_image_meta`` parses
only deterministic header fields of the synthetic payloads, and
``extract_features`` computes a deterministic byte-histogram "feature"
vector — the Spark-side plumbing (schema, batch shape, partitioning,
UDF signatures) is real and tested; swap the kernel body for PIL/ffmpeg
in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int"
FEATURE_DIM = 16


BODY_BYTES = 64  # deterministic payload body length (plus 8 header bytes)


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table: payload = md5-derived pseudo-random
    bytes behind a tiny header (width, height big-endian) — scales via
    spark.range, nothing materialized on the driver.

    All derivations use the portable md5 family (functions/hashing.py)
    so a DuckDB oracle can regenerate every field bit-exactly from
    media_id alone: h = md5_long(media_id); kind = h%3; width = h%640+16;
    height = h%480+16; body byte i = first md5 byte of 'media_id:i'."""
    from semcode_spark.functions.hashing import md5_long_col

    df = spark.range(n).withColumnRenamed("id", "media_id")
    h = md5_long_col(F.col("media_id").cast("string"))
    df = (
        df.withColumn("kind", F.when(F.pmod(h, F.lit(3)) == 0, "image")
                      .when(F.pmod(h, F.lit(3)) == 1, "audio").otherwise("video"))
        .withColumn("width", (F.pmod(h, F.lit(640)) + 16).cast("int"))
        .withColumn("height", (F.pmod(h, F.lit(480)) + 16).cast("int"))
    )
    # payload: 4-byte big-endian width, height, then BODY_BYTES md5 bytes
    body = F.concat(*[
        F.unhex(F.substring(F.md5(F.concat(
            F.col("media_id").cast("string"), F.lit(f":{i}"))), 1, 2))
        for i in range(BODY_BYTES)
    ])
    payload = F.concat(
        F.unhex(F.lpad(F.hex(F.col("width")), 8, "0")),
        F.unhex(F.lpad(F.hex(F.col("height")), 8, "0")),
        body,
    )
    return df.select("media_id", "kind", payload.alias("payload"), "width", "height")


def decode_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas kernel: parse the payload header → (media_id, kind,
    dec_width, dec_height, n_bytes). In production this is the
    PIL/ffprobe call; here it reads the deterministic header."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pay = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "dec_width": pay.map(lambda b: int.from_bytes(b[0:4], "big")),
                "dec_height": pay.map(lambda b: int.from_bytes(b[4:8], "big")),
                "n_bytes": pay.map(len),
            })

    return media.mapInPandas(
        kernel,
        schema="media_id long, kind string, dec_width int, dec_height int, n_bytes int",
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas kernel: payload → deterministic feature vector
    (normalized byte histogram over `dim` buckets). Stub for a real
    encoder; the schema (array<float>) and the Arrow batch path are what
    downstream similarity search consumes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b[8:], dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(kernel, schema="media_id long, features array<float>")


def decode_image(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real pixel decode — requires an image library not present in this
    container. Kept as an explicit stub so the API surface is complete."""
    raise NotImplementedError(
        "pixel decode requires PIL/opencv (not available in this container); "
        "use decode_media_meta/extract_features for the tested plumbing"
    )
