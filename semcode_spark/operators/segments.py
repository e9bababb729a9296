"""Incremental index maintenance — LSM/segment style.

The reference's async jobs add repositories to a live index one at a
time (api/main.py:142-161 → services/indexer.py:65-133, Milvus absorbs
the merge). Our persisted index absorbs new documents the way Lucene
does: each increment becomes a new *segment* (one more postings group +
append-only stats rows); queries read the union; a compaction pass
decode-merges segments back into a tight layout.

Correctness across segments:
- term_stats / corpus are append-only and aggregated on read
  (index_build.read_index), so idf / avgdl always reflect the full
  corpus — scores are exactly what a from-scratch rebuild would give.
- stored block bounds (max_w) were computed with the segment-time avgdl;
  wand_topk inflates them by max(1, avgdl_now/avgdl_enc), a proven upper
  bound (w is monotone in avgdl with ratio ≤ avgdl_new/avgdl_old), so
  block-max pruning stays lossless.
- doc_ids must be globally unique (use xxhash64(url)); duplicate adds
  are the caller's contract, same as the reference's force-reindex flag
  (ingestion/manager.py:108-115).

On object stores the swap in compact_segments would be an Iceberg
snapshot commit; locally it is a directory swap.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semcode_spark.config import DEFAULT, EngineConfig
from semcode_spark.operators import blocks as B
from semcode_spark.operators.index_build import (
    POSTINGS_SCHEMA, _manifest_append, corpus_stats, doc_stats,
    encoded_postings, read_index, term_doc_tf, term_stats,
)


def _next_group(spark: SparkSession, index_dir: str) -> int:
    try:
        man = spark.read.parquet(os.path.join(index_dir, "manifest"))
    except Exception:
        return 0  # brand-new index: a stream can build one segment-by-segment
    row = man.agg(F.max("group").alias("g")).collect()[0]
    return int(row["g"]) + 1 if row["g"] is not None else 0


def add_segment(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Index new_docs into a fresh segment of an existing index."""
    t0 = time.time()
    new_docs = new_docs.persist()
    try:
        tf = term_doc_tf(new_docs, id_col, text_col).persist()
        try:
            ds = doc_stats(new_docs, id_col, text_col)
            ds.write.mode("append").parquet(os.path.join(index_dir, "docs"))
            cs = corpus_stats(ds).collect()[0]
            n_new, avgdl_seg = int(cs["n_docs"]), float(cs["avgdl"])
            spark.createDataFrame(
                [(n_new, avgdl_seg)], "n_docs long, avgdl double"
            ).write.mode("append").parquet(os.path.join(index_dir, "corpus"))

            ts = term_stats(tf, cfg)
            thr = max(2.0, cfg.index.hot_term_df_ratio * n_new)
            ts.withColumn("is_hot", F.col("df") > thr).write.mode("append").parquet(
                os.path.join(index_dir, "term_stats"))
            hot = [r["term"] for r in ts.filter(F.col("df") > thr)
                   .select("term").collect()]

            g = _next_group(spark, index_dir)
            enc = encoded_postings(tf, avgdl_seg, hot, cfg)
            enc.write.mode("overwrite").parquet(
                os.path.join(index_dir, "postings", f"group={g}"))
            _manifest_append(spark, os.path.join(index_dir, "manifest"),
                             "segment", g, "completed", n_new, time.time() - t0)
        finally:
            tf.unpersist()
    finally:
        new_docs.unpersist()
    return {"group": g, "n_docs": n_new, "wall_s": time.time() - t0}


def compact_segments(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
) -> dict:
    """Decode-merge all segments into a fresh single layout: postings are
    decoded (never re-tokenized), re-bucketed and re-encoded with the
    full-corpus avgdl; stats tables are consolidated. Queries before and
    after return identical results (tests/test_segments.py)."""
    import pandas as pd  # noqa: F401 — decode kernel below

    t0 = time.time()
    idx = read_index(spark, index_dir)
    corpus = idx["corpus"].collect()[0]
    n_docs, avgdl = int(corpus["n_docs"]), float(corpus["avgdl"])

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            terms, ids, tfs = [], [], []
            for row in pdf.itertuples(index=False):
                d = B.decode_doc_ids(row.doc_ids).astype(np.int64)
                t = B.varint_decode(row.tfs).astype(np.int64)
                ids.append(d)
                tfs.append(t)
                terms.append(np.full(len(d), row.term, dtype=object))
            yield pd.DataFrame({
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(ids),
                "tf": np.concatenate(tfs),
            })

    flat = idx["postings"].select("term", "doc_ids", "tfs").mapInPandas(
        decode, schema="term string, doc_id long, tf long")
    tf = flat.join(idx["docs"], "doc_id").select("term", "doc_id", "doc_len", "tf")

    thr = max(2.0, cfg.index.hot_term_df_ratio * n_docs)
    ts = idx["term_stats"].persist()
    hot = [r["term"] for r in ts.filter(F.col("df") > thr).select("term").collect()]

    tmp = index_dir.rstrip("/") + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    enc = encoded_postings(tf, avgdl, hot, cfg)
    enc.write.mode("overwrite").parquet(os.path.join(tmp, "postings", "group=0"))
    ts.withColumn("is_hot", F.col("df") > thr).write.mode("overwrite").parquet(
        os.path.join(tmp, "term_stats"))
    spark.createDataFrame([(n_docs, avgdl)], "n_docs long, avgdl double") \
        .write.mode("overwrite").parquet(os.path.join(tmp, "corpus"))
    ts.unpersist()

    # swap (locally atomic enough; Iceberg snapshot commit on a cluster)
    for name in ("postings", "term_stats", "corpus"):
        old = os.path.join(index_dir, name)
        shutil.rmtree(old)
        shutil.move(os.path.join(tmp, name), old)
    shutil.rmtree(tmp, ignore_errors=True)
    _manifest_append(spark, os.path.join(index_dir, "manifest"),
                     "compaction", 0, "completed", n_docs, time.time() - t0)
    return {"n_docs": n_docs, "wall_s": time.time() - t0}
