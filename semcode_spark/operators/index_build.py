"""Distributed inverted-index build.

Pipeline (the Spark re-expression of the reference's
ingest → chunk → embed → upsert flow, reference: services/indexer.py:65-133):

    scan(documents/web_pages)
      → tokenize (JVM codegen, functions/analyzers.py)          [no shuffle]
      → explode → groupBy(term, doc_id) count                   [shuffle 1: partial agg]
      → term/corpus stats aggs                                  [shuffle 2: tiny]
      → hot-term salting + repartition(bucket(term, salt))      [shuffle 3]
      → sortWithinPartitions(term, salt, doc_id)                [in-partition external sort]
      → mapInArrow block encoder (delta+varint + block max)     [Arrow, no per-row Python]
      → parquet write, partitioned by bucket group              [checkpoint grain]

Scale notes (100 TB / 10^12 docs):
- shuffle 1 benefits from map-side partial aggregation: rows shuffled ≈
  distinct (term, doc) pairs per map task, not token occurrences.
- shuffle 3 is THE big exchange. Hot terms (df > ratio·N) are split into
  ``salt_factor`` sub-keys keyed by hash(doc_id) so no single reducer
  owns a full stopword posting list (north_rule: explicit skew split).
  AQE skew handling remains on as the safety net.
- the block encoder runs on *sorted* partition streams via mapInArrow,
  so Spark's spillable external sort does the heavy lifting and Python
  only packs bytes; a carry buffer keeps (term, salt) groups intact
  across Arrow batch boundaries so the block layout is deterministic
  (byte-identical on rebuild — the resume contract).
- per-bucket-group writes + a manifest row after each group give
  partition-grain idempotent resume, the Spark equivalent of the
  reference's staged JobInfo progress (api/jobs.py:17-30,73-91).

Persistent layout (layout 2 — versioned, snapshot-committed):

    index_dir/
      CURRENT                 tiny text file: the live version number.
                              Rewritten atomically (os.replace) — the
                              local stand-in for an Iceberg snapshot
                              commit; compaction builds v{N+1} fully,
                              then flips this pointer, so a crash at any
                              point leaves v{N} untouched and readable.
      manifest/               append-only lineage (stage, group, status,
                              rows, wall_ms, version). Readers only see
                              segments/groups with a completed manifest
                              row for the CURRENT version — a crashed
                              half-written segment is invisible.
      metrics/                per-stage telemetry (append-only).
      v{N}/
        meta.json             {"analyzer": ..., "layout": 2} — the build
                              and the query side MUST share one analyzer
                              (reference provider-selection contract,
                              embeddings/providers.py:34-104).
        docs/seg=S/           doc_id, doc_len
        corpus/seg=S/         n_docs, sum_dl  (integer sums, so replace
                              deltas cancel EXACTLY on read; avgdl is
                              derived as sum(sum_dl)/sum(n_docs))
        term_stats/seg=S/     term, df, cf, is_hot  (delta rows too)
        term_bounds/group=G/  per-term block-max metadata: max_w,
                              n_blocks, best_salt, best_block, avgdl_enc
                              — lets WAND bootstrap θ without scanning
                              blocks metadata (operators/query.py)
        postings/group=G/     compressed block rows
        forward/seg=S/        doc_id, term, tf — the forward (pre-explode
                              tf) relation, range-clustered on doc_id.
                              Doc replacement computes its exact negative
                              term-stats deltas from the collided docs'
                              forward rows alone (parquet row-group
                              pruning on doc_id), never by decoding the
                              whole postings store — the reference's
                              keyed-upsert cost model (cost ∝ upserted
                              rows, storage/milvus_store.py:87-133)
        tombstones/seg=S/     doc_id, before_group — doc replace marks
                              older postings/doc rows dead; compaction
                              physically drops them
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semcode_spark.config import DEFAULT, EngineConfig
from semcode_spark.functions.analyzers import analyzer

POSTINGS_SCHEMA = (
    "term string, salt int, block_id int, n int, "
    "doc_ids binary, tfs binary, max_w double, sum_tf long, "
    "first_doc long, last_doc long"
)
# blocks also carry avgdl_enc (the corpus avgdl at encode time, added as
# a literal column after the kernel): when later segments shift the
# corpus avgdl upward, per-posting weights grow by at most
# avgdl_now/avgdl_enc, so the WAND block bound stays valid as
# max_w · max(1, avgdl_now/avgdl_enc) — see operators/segments.py.

LAYOUT = 2


# ------------------------------------------------------- version pointer ----
# Storage primitives live behind the TableIO seam (sources/tableio.py):
# local parquet + CURRENT pointer here, Iceberg writeTo/MERGE/snapshot on
# a cluster — see that module's mapping table.

from semcode_spark.sources.tableio import (  # noqa: E402
    commit_current_version, read_current_version, version_dir,
)
from semcode_spark.sources import tableio as _tio  # noqa: E402


def _write_meta(vdir: str, cfg: EngineConfig) -> None:
    _tio.write_meta(vdir, {"analyzer": cfg.index.analyzer, "layout": LAYOUT,
                           "positions": cfg.index.store_positions,
                           "forward": cfg.index.store_forward,
                           "impact": cfg.index.impact_ordered})


def read_meta(vdir: str) -> dict:
    meta = _tio.read_meta(vdir)
    return meta or {"analyzer": "standard", "layout": LAYOUT}


# ---------------------------------------------------------------- stats ----

def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              cfg: EngineConfig = DEFAULT) -> DataFrame:
    """doc_id, doc_len (token count under the configured analyzer) — the
    analog of the reference's per-chunk bookkeeping
    (chunking/tree_sitter_chunker.py:48-57)."""
    from semcode_spark.sources.tables import spread

    toks = analyzer(cfg.index.analyzer)
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks(text_col)).alias("doc_len"),
    )


def term_doc_tf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                cfg: EngineConfig = DEFAULT,
                with_positions: bool = False) -> DataFrame:
    """(term, doc_id, doc_len, tf[, positions]) — the exploded postings
    relation.

    explode + groupBy compiles to a hash aggregate with map-side partial
    combine; doc_len rides along (functionally dependent on doc_id) so
    the build never needs a doc-stats join. ``with_positions`` switches
    to posexplode and adds the per-(term, doc) sorted token-position
    array (collect_list buffers grow the aggregate — only paid when the
    index stores positions for phrase search)."""
    from semcode_spark.sources.tables import spread

    toks_fn = analyzer(cfg.index.analyzer)
    # spread (r6): a single-split input runs tokenize+explode+partial
    # agg — the expensive pre-shuffle stage — on one core (guide §2.5);
    # no-op when the scan already has ≥ defaultParallelism splits
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        toks_fn(text_col).alias("toks"),
    )
    if not with_positions:
        toks = base.select("doc_id", F.size("toks").alias("doc_len"),
                           F.explode("toks").alias("term"))
        return toks.groupBy("term", "doc_id", "doc_len").agg(
            F.count(F.lit(1)).alias("tf")
        )
    toks = base.select("doc_id", F.size("toks").alias("doc_len"),
                       F.posexplode("toks").alias("pos", "term"))
    return toks.groupBy("term", "doc_id", "doc_len").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def corpus_stats(dstats: DataFrame) -> DataFrame:
    return dstats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )


def term_stats(tf: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """term, df, cf."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


# ------------------------------------------------------------- encoding ----

def _encode_groups(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Encode one or more complete (term, salt) runs (already sorted by
    term, salt, doc_id) into block rows. Per-group numpy; the Python loop
    is per *term*, never per posting."""
    from semcode_spark.operators import blocks as B

    out: list[tuple] = []
    for (term, salt), g in pdf.groupby(["term", "salt"], sort=False):
        doc_ids = g["doc_id"].to_numpy(dtype=np.int64)
        tfs = g["tf"].to_numpy(dtype=np.int64)
        ws = g["w"].to_numpy(dtype=np.float64)
        for b0 in range(0, len(doc_ids), block_size):
            sl = slice(b0, b0 + block_size)
            ids = doc_ids[sl]
            out.append((
                term, int(salt), b0 // block_size, len(ids),
                B.encode_doc_ids(ids.astype(np.uint64)),
                B.varint_encode(tfs[sl].astype(np.uint64)),
                float(ws[sl].max()),
                int(tfs[sl].sum()),
                int(ids[0]), int(ids[-1]),
            ))
    return pd.DataFrame(
        out,
        columns=["term", "salt", "block_id", "n", "doc_ids", "tfs",
                 "max_w", "sum_tf", "first_doc", "last_doc"],
    )


def _make_encoder(block_size: int) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # hold back the trailing (term, salt) run — it may continue
            # in the next Arrow batch
            last_term = pdf["term"].iat[-1]
            last_salt = pdf["salt"].iat[-1]
            tail_mask = (pdf["term"] == last_term) & (pdf["salt"] == last_salt)
            # tail is a contiguous suffix because input is sorted
            n_tail = int(tail_mask.to_numpy()[::-1].argmin() or len(pdf))
            carry = pdf.iloc[len(pdf) - n_tail:]
            head = pdf.iloc[: len(pdf) - n_tail]
            if len(head):
                yield _encode_groups(head, block_size)
        if carry is not None and len(carry):
            yield _encode_groups(carry, block_size)

    return encode_partition


def _make_arrow_encoder(block_size: int, with_positions: bool = False,
                        impact: bool = False):
    """mapInArrow twin of _make_encoder: operates on pyarrow
    RecordBatches directly — the term column never materializes as
    Python/pandas string objects (that conversion is pure allocation +
    memory-bandwidth burn at 10^8+ postings). Strings are touched once
    per (term, salt) *group*, numerics stay numpy views end to end.
    ``with_positions`` additionally packs each block's per-doc token
    positions (counts + in-doc gaps, one varint stream) into a `pos`
    binary column for index-backed phrase search.

    ``impact``: the input stream is sorted (term, salt, w DESC, doc_id)
    — block MEMBERSHIP follows impact rank, but each block's rows are
    re-sorted ascending by doc_id before packing, so the delta+varint
    codec, every decode path, and the block row schema are unchanged;
    only which postings share a block differs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from semcode_spark.operators import blocks as B

    def encode_partition(batches):
        carry: pa.Table | None = None

        def encode_table(tbl: pa.Table):
            term = tbl["term"].combine_chunks()
            salt = tbl["salt"].to_numpy(zero_copy_only=False)
            doc_id = tbl["doc_id"].to_numpy(zero_copy_only=False)
            tf = tbl["tf"].to_numpy(zero_copy_only=False)
            w = tbl["w"].to_numpy(zero_copy_only=False)
            if with_positions:
                pos_col = tbl["positions"].combine_chunks()
                pos_len = pc.list_value_length(pos_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pos_flat = pos_col.flatten().to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pos_off = np.zeros(len(pos_len) + 1, dtype=np.int64)
                np.cumsum(pos_len, out=pos_off[1:])
            n = len(term)
            # group boundaries: adjacent inequality on (term, salt) —
            # vectorized in Arrow/numpy, input is sorted
            if n > 1:
                neq_term = pc.invert(
                    pc.equal(term.slice(1), term.slice(0, n - 1))
                ).to_numpy(zero_copy_only=False)
                neq = neq_term | (salt[1:] != salt[:-1])
                starts = np.r_[0, np.nonzero(neq)[0] + 1]
            else:
                starts = np.array([0], dtype=np.int64)
            ends = np.r_[starts[1:], n]
            cols: dict[str, list] = {k: [] for k in (
                "term", "salt", "block_id", "n", "doc_ids", "tfs",
                "max_w", "sum_tf", "first_doc", "last_doc", "pos")}
            for s, e in zip(starts.tolist(), ends.tolist()):
                t_str = term[s].as_py()  # one Python string per group
                t_salt = int(salt[s])
                for b0 in range(s, e, block_size):
                    b1 = min(b0 + block_size, e)
                    if impact:
                        # impact membership, doc_id order inside the
                        # block — the codec sees ascending ids as ever
                        order = np.argsort(doc_id[b0:b1],
                                           kind="stable") + b0
                        ids = doc_id[order]
                        tfv = tf[order]
                        wv = w[order]
                    else:
                        order = None
                        ids = doc_id[b0:b1]
                        tfv = tf[b0:b1]
                        wv = w[b0:b1]
                    cols["term"].append(t_str)
                    cols["salt"].append(t_salt)
                    cols["block_id"].append((b0 - s) // block_size)
                    cols["n"].append(b1 - b0)
                    cols["doc_ids"].append(B.encode_doc_ids(ids.astype(np.uint64)))
                    cols["tfs"].append(B.varint_encode(tfv.astype(np.uint64)))
                    cols["max_w"].append(float(wv.max()))
                    cols["sum_tf"].append(int(tfv.sum()))
                    cols["first_doc"].append(int(ids[0]))
                    cols["last_doc"].append(int(ids[-1]))
                    if with_positions:
                        if order is None:
                            lens = pos_len[b0:b1]
                            flat = pos_flat[pos_off[b0]:pos_off[b1]]
                        else:
                            lens = pos_len[order]
                            flat = (np.concatenate(
                                [pos_flat[pos_off[i]:pos_off[i + 1]]
                                 for i in order.tolist()])
                                if int(lens.sum()) else
                                np.empty(0, dtype=np.int64))
                        cols["pos"].append(B.encode_positions(lens, flat))
            out = {
                "term": pa.array(cols["term"], pa.string()),
                "salt": pa.array(cols["salt"], pa.int32()),
                "block_id": pa.array(cols["block_id"], pa.int32()),
                "n": pa.array(cols["n"], pa.int32()),
                "doc_ids": pa.array(cols["doc_ids"], pa.binary()),
                "tfs": pa.array(cols["tfs"], pa.binary()),
                "max_w": pa.array(cols["max_w"], pa.float64()),
                "sum_tf": pa.array(cols["sum_tf"], pa.int64()),
                "first_doc": pa.array(cols["first_doc"], pa.int64()),
                "last_doc": pa.array(cols["last_doc"], pa.int64()),
            }
            if with_positions:
                out["pos"] = pa.array(cols["pos"], pa.binary())
            return pa.RecordBatch.from_pydict(out)

        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            if tbl.num_rows == 0:
                carry = None
                continue
            # hold back the trailing (term, salt) run for the next batch
            term = tbl["term"].combine_chunks()
            salt = tbl["salt"].to_numpy(zero_copy_only=False)
            n = tbl.num_rows
            last_term = term[n - 1]
            last_salt = salt[n - 1]
            same_tail = pc.equal(term, last_term).to_numpy(zero_copy_only=False) & (
                salt == last_salt
            )
            n_tail = int(same_tail[::-1].argmin() or n)
            carry = tbl.slice(n - n_tail)
            head = tbl.slice(0, n - n_tail)
            if head.num_rows:
                yield encode_table(head)
        if carry is not None and carry.num_rows:
            yield encode_table(carry)

    return encode_partition


# ------------------------------------------------------------- decoding ----

def _binary_concat(col) -> tuple[np.ndarray, np.ndarray]:
    """An Arrow binary column's values as ONE contiguous uint8 array
    plus the per-row byte counts — zero copies of the payload (the
    column's data buffer IS the concatenation of the per-row buffers).
    Varints are self-delimiting, so one varint_decode over the
    concatenated stream decodes every row's stream back to back."""
    import pyarrow as pa

    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # combine_chunks may stay chunked
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=width)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]: offs[-1]]
    return data, np.diff(offs)


def _block_cumsum_ids(deltas: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Concatenated per-block delta streams → absolute doc_ids: one
    global cumsum, re-based at each block start (the first delta of a
    block is its absolute first doc_id) — no per-block Python."""
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = np.zeros(len(n), dtype=np.int64)
    np.cumsum(n[:-1], out=starts[1:])
    base = np.zeros(len(n), dtype=np.uint64)
    base[starts > 0] = c[starts[starts > 0] - 1]
    return (c - np.repeat(base, n)).astype(np.int64)


def decode_postings(blocks_df: DataFrame) -> DataFrame:
    """Block rows → flat (term, group, doc_id, tf) posting rows.

    The single decode kernel shared by query scoring, segment
    compaction, and replace-time stats deltas. r6: mapInArrow with
    whole-BATCH vectorization — ONE varint_decode over every block's
    concatenated byte stream (self-delimiting varints), one global
    cumsum re-based per block for the doc_id deltas, and Arrow-native
    ``take`` to replicate term/group per posting. The r5 kernel looped
    per block building object-dtype term arrays through pandas; this
    touches no per-block Python at all (measured: the 454k-block
    crossover flat batch 39 s → see OPTIMIZATION_r06.md). ``group``
    rides along so tombstone filtering stays a relational anti-join
    downstream."""
    from semcode_spark.operators import blocks as B

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            id_bytes, _ = _binary_concat(tbl["doc_ids"])
            tf_bytes, _ = _binary_concat(tbl["tfs"])
            doc_id = _block_cumsum_ids(B.varint_decode(id_bytes), n)
            tf = B.varint_decode(tf_bytes).astype(np.int64)
            idx = pa.array(np.repeat(np.arange(len(n), dtype=np.int64), n))
            yield from pa.table({
                "term": pc.take(tbl["term"], idx),
                "group": pc.take(tbl["group"], idx),
                "doc_id": pa.array(doc_id),
                "tf": pa.array(tf),
            }).to_batches()

    return blocks_df.select("term", "group", "n", "doc_ids", "tfs").mapInArrow(
        kernel, schema="term string, group int, doc_id long, tf long"
    )


def decode_doc_ids_only(blocks_df: DataFrame) -> DataFrame:
    """Block rows → (term, group, doc_id) — the candidate-generation
    decode: skips the tf varint stream entirely (reads/decodes only the
    doc_ids bytes). Used by MaxScore-style retrieval where candidate
    ids come from the essential terms' blocks and exact scores come
    from the forward table, and by AND-prefilters. Same whole-batch
    vectorization as decode_postings (r6)."""
    from semcode_spark.operators import blocks as B

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            id_bytes, _ = _binary_concat(tbl["doc_ids"])
            doc_id = _block_cumsum_ids(B.varint_decode(id_bytes), n)
            idx = pa.array(np.repeat(np.arange(len(n), dtype=np.int64), n))
            yield from pa.table({
                "term": pc.take(tbl["term"], idx),
                "group": pc.take(tbl["group"], idx),
                "doc_id": pa.array(doc_id),
            }).to_batches()

    return blocks_df.select("term", "group", "n", "doc_ids").mapInArrow(
        kernel, schema="term string, group int, doc_id long"
    )


def decode_positions_flat(blocks_df: DataFrame) -> DataFrame:
    """Positional block rows → (term, group, doc_id, pos), one row per
    token occurrence of the term. The phrase-search twin of
    decode_postings. r6: mapInArrow — doc_ids decode batch-vectorized
    (one varint_decode for the whole batch), the position stream still
    splits per block (its counts/gaps boundary is data-dependent) but
    term/group replication is Arrow-native ``take`` instead of
    object-dtype numpy through pandas. ``group`` rides along for the
    same tombstone anti-join."""
    from semcode_spark.operators import blocks as B

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            id_bytes, _ = _binary_concat(tbl["doc_ids"])
            doc_id = _block_cumsum_ids(B.varint_decode(id_bytes), n)
            starts = np.zeros(len(n), dtype=np.int64)
            np.cumsum(n[:-1], out=starts[1:])
            pos_col = tbl["pos"]
            ids_out, pos_out = [], []
            totals = np.zeros(len(n), dtype=np.int64)
            for i in range(len(n)):
                counts, flat = B.decode_positions(
                    pos_col[i].as_py(), int(n[i]))
                d = doc_id[starts[i]: starts[i] + n[i]]
                ids_out.append(np.repeat(d, counts))
                pos_out.append(flat)
                totals[i] = flat.size
            idx = pa.array(np.repeat(np.arange(len(n), dtype=np.int64), totals))
            yield from pa.table({
                "term": pc.take(tbl["term"], idx),
                "group": pc.take(tbl["group"], idx),
                "doc_id": pa.array(np.concatenate(ids_out)
                                   if ids_out else np.zeros(0, np.int64)),
                "pos": pa.array(np.concatenate(pos_out).astype(np.int64)
                                if pos_out else np.zeros(0, np.int64)),
            }).to_batches()

    return blocks_df.select("term", "group", "n", "doc_ids", "pos").mapInArrow(
        kernel, schema="term string, group int, doc_id long, pos long"
    )


def filter_dead_postings(flat: DataFrame, tombstones: DataFrame | None,
                         n_tombstones: int) -> DataFrame:
    """Drop decoded postings killed by a doc replacement: a posting of
    doc d from group g is dead iff a tombstone (d, before) with
    g < before exists. No-op (no join in the plan) when the index has
    no tombstones."""
    if not n_tombstones or tombstones is None:
        return flat
    t = tombstones.select(F.col("doc_id").alias("t_id"),
                          F.col("before_group").alias("t_before"))
    return flat.join(
        t, (flat["doc_id"] == t["t_id"]) & (flat["group"] < t["t_before"]),
        "left_anti",
    )


def live_postings_flat(idx: dict) -> DataFrame:
    """Decode the whole visible index to live (term, group, doc_id, tf)."""
    return filter_dead_postings(
        decode_postings(idx["postings"]), idx.get("tombstones"),
        idx.get("_n_tombstones", 0))


def write_forward(tf: DataFrame, vdir: str, seg: int) -> None:
    """Persist one segment's forward relation (doc_id, term, tf
    [, positions]), range-partitioned + sorted on doc_id so a
    replace-time doc_id predicate prunes at parquet file/row-group
    granularity. One extra (narrow) shuffle per segment build — the
    price of O(changed-docs) replacement instead of a full-index
    decode. Positions (when the index stores them) ride along so
    compaction can re-encode positional blocks without decoding."""
    cols = ["doc_id", "term", "tf"]
    if "positions" in tf.columns:
        cols.append("positions")
    (tf.select(*cols)
     .repartitionByRange(F.col("doc_id"))
     .sortWithinPartitions("doc_id")
     .write.mode("overwrite").parquet(os.path.join(vdir, "forward", f"seg={seg}")))


def live_forward(idx: dict, with_positions: bool = False) -> DataFrame:
    """Live (doc_id, term, tf[, positions]) rows of the visible index.

    Served from the stored forward table (no posting-block decode, no
    Python) when the index has one; legacy indexes without forward/ fall
    back to decoding the postings store. Tombstone semantics match the
    postings rule: a forward row of doc d from segment s is dead iff a
    tombstone (d, before) with s < before exists. ``with_positions``
    keeps the positions column (compaction of positional indexes);
    default drops it so replace-delta scans never read those bytes."""
    cols = ["doc_id", "term", "tf"]
    fwd = idx.get("forward")
    if with_positions:
        if fwd is not None and "positions" not in fwd.columns:
            raise ValueError("index stores no positions")
        cols.append("positions")
    if fwd is None:
        if with_positions:
            # store_forward=False positional index: rebuild the forward
            # relation from the positional postings decode (tf = the
            # per-(term, doc) position count, positions re-collected in
            # order) — slower than a forward scan, still index-only
            if not idx.get("positions_stored"):
                raise ValueError("index stores no positions")
            rows = filter_dead_postings(
                decode_positions_flat(idx["postings"]),
                idx.get("tombstones"), idx.get("_n_tombstones", 0))
            return rows.groupBy("doc_id", "term").agg(
                # dtypes mirror term_doc_tf (tf long, positions
                # array<int>) so downstream re-encode sees one schema
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list(F.col("pos").cast("int")))
                .alias("positions"))
        return live_postings_flat(idx).select("doc_id", "term", "tf")
    t = idx.get("tombstones")
    if idx.get("_n_tombstones", 0) and t is not None:
        tt = t.select(F.col("doc_id").alias("t_id"),
                      F.col("before_group").alias("t_before"))
        fwd = fwd.join(
            tt, (fwd["doc_id"] == tt["t_id"]) & (fwd["seg"] < tt["t_before"]),
            "left_anti")
    return fwd.select(*cols)


# ---------------------------------------------------------------- build ----

def hot_terms(tstats: DataFrame, n_docs: int, cfg: EngineConfig = DEFAULT) -> list[str]:
    """Terms with df above the skew threshold (driver-collected: the hot
    set is tiny by definition — stopword-scale cardinality)."""
    thr = max(2.0, cfg.index.hot_term_df_ratio * n_docs)
    return [
        r["term"]
        for r in tstats.filter(F.col("df") > thr).select("term").collect()
    ]


def encoded_postings(
    tf: DataFrame,
    avgdl: float,
    hot: list[str],
    cfg: EngineConfig = DEFAULT,
    with_positions: bool = False,
    bucket_filter: tuple[int, int] | None = None,
    term_buckets: int | None = None,
    impact: bool | None = None,
) -> DataFrame:
    """tf (term, doc_id, doc_len, tf[, positions]) → block-compressed
    postings (+ a `pos` varint column when the index stores positions).
    ``impact=None`` follows cfg.index.impact_ordered: block membership
    by descending weight (impact-ordered layout; see IndexConfig), at
    the cost of one extra sort key in the same in-partition sort.

    The single wide shuffle of the build: repartition by
    hash(term, salt) % term_buckets with hot-term salting.

    ``bucket_filter=(groups, g)`` restricts the output to buckets with
    pmod(bucket, groups) == g — applied BEFORE the repartition, so a
    grouped (checkpointed) build shuffles/sorts/encodes each posting
    exactly once across all group jobs instead of re-encoding the whole
    relation per group and discarding (groups-1)/groups of it.

    ``term_buckets`` overrides the config fan-out — bucket ids are
    group-local (queries never assume a global bucket count), so a
    small incremental segment can use a small fan-out instead of
    cfg-many near-empty shuffle partitions.
    """
    k1, b = cfg.bm25.k1, cfg.bm25.b
    sf = cfg.index.salt_factor
    n_buckets = term_buckets if term_buckets is not None else cfg.index.term_buckets
    w = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    )
    salted = tf.withColumn(
        "salt",
        F.when(
            F.col("term").isin(hot) if hot else F.lit(False),
            F.pmod(F.xxhash64("doc_id"), F.lit(sf)).cast("int"),
        ).otherwise(F.lit(0)),
    ).withColumn("w", w.cast("double"))
    bucketed = salted.withColumn(
        "bucket", F.pmod(F.xxhash64("term", "salt"), F.lit(n_buckets)).cast("int")
    )
    if bucket_filter is not None:
        n_groups, g = bucket_filter
        bucketed = bucketed.filter(
            F.pmod(F.col("bucket"), F.lit(n_groups)) == g)
    if impact is None:
        impact = cfg.index.impact_ordered
    sort_keys = (["term", "salt", F.col("w").desc(), "doc_id"] if impact
                 else ["term", "salt", "doc_id"])
    sorted_parts = bucketed.repartition(n_buckets, "bucket").sortWithinPartitions(
        *sort_keys
    )
    enc_cols = ["term", "salt", "doc_id", "tf", "w"]
    schema = POSTINGS_SCHEMA
    if with_positions:
        enc_cols.append("positions")
        schema += ", pos binary"
    enc = sorted_parts.select(*enc_cols).mapInArrow(
        _make_arrow_encoder(cfg.index.block_size, with_positions, impact),
        schema=schema
    )
    # re-attach bucket for partition pruning at query time; stamp the
    # avgdl the weights were computed with (segment-merge bound support)
    return enc.withColumn(
        "bucket", F.pmod(F.xxhash64("term", "salt"), F.lit(n_buckets)).cast("int")
    ).withColumn("avgdl_enc", F.lit(float(avgdl)))


def write_term_bounds(spark: SparkSession, vdir: str, group: int) -> int:
    """Derive per-term block-max metadata for one written postings group
    (blocks metadata only — never decodes posting bytes; cost scales
    with #blocks in the group). WAND's θ bootstrap reads this tiny table
    instead of scanning blocks (operators/query.py). Returns the group's
    block-row count from the same cached pass — the parquet is read
    once, never re-scanned for the count.

    ``w_hist`` (r5): per term, the block max_w values at power-of-two
    ranks of the descending-max_w block order — the impact-prefix
    ladder impact retrieval plans against (decode the top r blocks ⇒
    every undecoded block has max_w < w_hist[r]). ~log2(n_blocks)
    entries per term, so the term dictionary stays driver-collectable;
    one extra window shuffle over block METADATA rows (never bytes).
    (A denser ladder — pow2 plus 1.5× midpoints — was measured on the
    45k-block crossover corpus: decode fraction 0.591 vs 0.586, i.e.
    no benefit; the fraction is bound by the plan's θ constraint, not
    ladder granularity, so the smaller metadata wins.)"""
    from pyspark.sql.window import Window as _W

    blocks = spark.read.parquet(os.path.join(vdir, "postings", f"group={group}"))
    win = _W.partitionBy("term").orderBy(
        F.col("max_w").desc(), "salt", "block_id")
    hist = (
        blocks.select("term", "salt", "block_id", "max_w")
        .withColumn("r", F.row_number().over(win))
        .filter(F.col("r").bitwiseAND(F.col("r") - 1) == 0)  # r = 2^j
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("r").alias("rank"), F.col("max_w").alias("w")
        ))).alias("w_hist"))
    )
    tb = blocks.groupBy("term").agg(
        F.max("max_w").alias("max_w"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.max_by(F.struct("salt", "block_id"), F.col("max_w")).alias("best"),
        F.max("avgdl_enc").alias("avgdl_enc"),
    ).select(
        "term", "max_w", "n_blocks",
        F.col("best.salt").alias("best_salt"),
        F.col("best.block_id").alias("best_block"),
        "avgdl_enc",
    ).join(hist, "term", "left").persist()
    try:
        tb.write.mode("overwrite").parquet(
            os.path.join(vdir, "term_bounds", f"group={group}"))
        row = tb.agg(F.sum("n_blocks").alias("n")).collect()[0]
    finally:
        tb.unpersist()
    return int(row["n"] or 0)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig = DEFAULT,
    groups: int = 4,
    resume: bool = False,
    fail_after_group: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_rows: bool = True,
) -> dict:
    """Build (or resume) the full index under out_dir (layout 2 above).

    ``groups`` is the checkpoint grain: each group is one idempotent
    Spark job + one manifest append; a rerun with resume=True skips
    completed groups exactly (reference resume contract:
    api/main.py:246-325). ``fail_after_group`` injects a crash for the
    resume test. Returns summary dict. Single-writer (lease-guarded)
    like every index mutation.
    """
    check_layout(spark, out_dir)
    lease = _tio.acquire_lease(out_dir, "build_index")
    try:
        return _build_index_locked(
            spark, docs, out_dir, cfg, groups, resume, fail_after_group,
            id_col, text_col)
    finally:
        _tio.release_lease(lease)


def _build_index_locked(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig,
    groups: int,
    resume: bool,
    fail_after_group: int | None,
    id_col: str,
    text_col: str,
) -> dict:
    t_all = time.time()
    man_dir = os.path.join(out_dir, "manifest")
    version = read_current_version(out_dir)
    rebuild_commit = False
    if version is None:
        version = 0
        _write_meta(version_dir(out_dir, version), cfg)
        commit_current_version(out_dir, version)
    elif not resume and _completed(spark, man_dir, version):
        # full rebuild over a non-empty index: NEVER into the live
        # version dir — its committed segment rows (prior add_segment
        # calls) would stay visible and merge stale postings /
        # double-counted stats into the rebuilt seg=0. Like compaction,
        # build v{N+1} and flip CURRENT only on success; the old
        # snapshot stays live (and readable) until then, and a crashed
        # rebuild leaves an orphan dir for gc_versions, not a corrupt
        # index. The target is the next FREE version — not CURRENT+1
        # unconditionally: a prior crashed rebuild left completed
        # manifest rows (and possibly dirs) for v{N+1}, and building
        # into the same version would union its stale groups into the
        # served index (r4 ADVICE #1).
        version = _next_free_version(spark, out_dir, version)
        _write_meta(version_dir(out_dir, version), cfg)
        rebuild_commit = True
    vdir = version_dir(out_dir, version)
    existing_meta = _tio.read_meta(vdir)
    if existing_meta and (
        existing_meta.get("analyzer", "standard") != cfg.index.analyzer
        or existing_meta.get("positions", False) != cfg.index.store_positions
        or existing_meta.get("forward", True) != cfg.index.store_forward
        or existing_meta.get("impact", False) != cfg.index.impact_ordered
    ):
        # the same mismatch guard add_segment has: resuming (or silently
        # extending) an index under a different analyzer / positions
        # setting produces postings the query side then misreads
        if resume:
            raise ValueError(
                f"index property mismatch: built with analyzer="
                f"{existing_meta.get('analyzer', 'standard')!r} positions="
                f"{existing_meta.get('positions', False)} forward="
                f"{existing_meta.get('forward', True)} impact="
                f"{existing_meta.get('impact', False)}, build cfg says "
                f"analyzer={cfg.index.analyzer!r} positions="
                f"{cfg.index.store_positions} forward="
                f"{cfg.index.store_forward} impact="
                f"{cfg.index.impact_ordered} — resume must match the "
                f"index (or rebuild with resume=False)")
        _write_meta(vdir, cfg)  # rebuild of an empty version: re-label
    done = _verify_done(vdir, _completed(spark, man_dir, version)) if resume else set()
    metrics: list[tuple] = []

    # docs is scanned twice (doc_stats + tf); if it is a derived plan
    # (e.g. html extraction), persist it for the duration of the build
    docs = docs.persist()
    tf = term_doc_tf(docs, id_col, text_col, cfg,
                     with_positions=cfg.index.store_positions).persist()
    try:
        if "stats" in done:
            cs = spark.read.parquet(os.path.join(vdir, "corpus")).collect()[0]
            n_docs, avgdl = cs["n_docs"], cs["sum_dl"] / cs["n_docs"]
            hot = [
                r["term"] for r in spark.read.parquet(os.path.join(vdir, "term_stats"))
                .filter(F.col("is_hot")).select("term").collect()
            ]
        else:
            t0 = time.time()
            # doc lengths are derived FROM the tf relation — doc_len is
            # functionally dependent on doc_id there — so the whole
            # build tokenizes the corpus exactly once (a second
            # doc_stats pass over 100 TB of text is pure waste). Docs
            # with zero tokens fall out of tf; the left join against
            # the id spine restores them with doc_len 0.
            dl = tf.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
            ds = (docs.select(F.col(id_col).alias("doc_id"))
                  .join(dl, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce("doc_len", F.lit(0)).alias("doc_len")))
            ds.write.mode("overwrite").parquet(os.path.join(vdir, "docs", "seg=0"))
            # aggregate over the *written* table — avoids re-tokenizing
            # the whole corpus for one tiny agg. Stored as (n_docs,
            # sum_dl), NOT an average: integer sums merge/cancel exactly
            # across segments and replace deltas; an n·avg reconstruction
            # is off by ulps (doc replacement demands exact stats)
            cs = spark.read.parquet(os.path.join(vdir, "docs", "seg=0")).agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_len").cast("double").alias("sum_dl"),
            ).collect()[0]
            n_docs = cs["n_docs"]
            if not n_docs:
                raise ValueError("cannot build an index over an empty corpus")
            avgdl = cs["sum_dl"] / n_docs
            spark.createDataFrame(
                [(int(n_docs), float(cs["sum_dl"]))], "n_docs long, sum_dl double"
            ).write.mode("overwrite").parquet(os.path.join(vdir, "corpus", "seg=0"))
            ts = term_stats(tf, cfg)
            thr = max(2.0, cfg.index.hot_term_df_ratio * n_docs)
            ts_flagged = ts.withColumn("is_hot", F.col("df") > thr).persist()
            ts_flagged.write.mode("overwrite").parquet(
                os.path.join(vdir, "term_stats", "seg=0"))
            hot = [r["term"] for r in ts_flagged.filter(F.col("is_hot"))
                   .select("term").collect()]
            ts_flagged.unpersist()
            if cfg.index.store_forward:
                write_forward(tf, vdir, 0)
            _manifest_append(spark, man_dir, "stats", -1, "completed",
                             n_docs, time.time() - t0, version)
            metrics.append(("stats", int(n_docs), int((time.time() - t0) * 1000)))

        for g in range(groups):
            key = f"group={g}"
            if key in done:
                continue
            t0 = time.time()
            # the bucket restriction is applied BEFORE the shuffle
            # (encoded_postings), so each posting is shuffled/sorted/
            # encoded once across the whole grouped build
            part = encoded_postings(
                tf, float(avgdl), hot, cfg,
                with_positions=cfg.index.store_positions,
                bucket_filter=(groups, g) if groups > 1 else None)
            part.write.mode("overwrite").parquet(
                os.path.join(vdir, "postings", f"group={g}"))
            # bounds derivation runs before the manifest row and yields
            # the block-row count for free (count_rows kept for API compat)
            rows = write_term_bounds(spark, vdir, g)
            _manifest_append(spark, man_dir, "postings", g, "completed",
                             rows, time.time() - t0, version)
            metrics.append((f"postings/g{g}", rows, int((time.time() - t0) * 1000)))
            if fail_after_group is not None and g >= fail_after_group:
                raise RuntimeError(f"injected failure after group {g}")
    finally:
        tf.unpersist()
        docs.unpersist()
        if metrics:
            spark.createDataFrame(
                metrics, "stage string, rows long, wall_ms long"
            ).write.mode("append").parquet(os.path.join(out_dir, "metrics"))

    if rebuild_commit:
        commit_current_version(out_dir, version)  # snapshot flip
    wall = time.time() - t_all
    return {"n_docs": int(n_docs), "avgdl": float(avgdl), "hot_terms": len(hot),
            "groups": groups, "wall_s": wall, "docs_per_sec": int(n_docs) / wall,
            "version": version}


def consolidate_small_files(spark: SparkSession, table_dir: str,
                            keep_threshold: int = 4) -> int:
    """Rewrite an append-only metadata table (manifest/, metrics/ — one
    tiny parquet file per committed stage) into a single file. At 10^5
    groups the per-commit files are real small-file pressure; the data
    itself is tiny. Rows are preserved verbatim (all versions — the
    manifest doubles as an audit log). Caller must hold the writer
    lease; in-flight readers that listed the directory before the swap
    may see a transient miss locally — the Iceberg TableIO mapping gets
    this for free from snapshot isolation (rewrite_manifests).
    Returns the resulting file count."""
    if not os.path.isdir(table_dir):
        return 0
    old = [f for f in os.listdir(table_dir)
           if not f.startswith((".", "_")) and f != "consolidated"]
    if len(old) <= keep_threshold:
        return len(old)
    df = spark.read.parquet(table_dir)
    tmp = table_dir.rstrip("/") + "__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import shutil as _sh
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    n_new = 0
    for f in os.listdir(tmp):
        if f.startswith("part-"):
            os.replace(os.path.join(tmp, f),
                       os.path.join(table_dir, f"consolidated-{tag}-{f}"))
            n_new += 1
    for f in old:
        try:
            os.unlink(os.path.join(table_dir, f))
        except (FileNotFoundError, IsADirectoryError):
            pass
    _sh.rmtree(tmp, ignore_errors=True)
    return n_new


def _manifest_append(
    spark: SparkSession, man_dir: str, stage: str, group: int,
    status: str, rows: int, wall_s: float, version: int,
) -> None:
    spark.createDataFrame(
        [(stage, group, status, int(rows), int(wall_s * 1000), int(version))],
        "stage string, group int, status string, rows long, wall_ms long, version int",
    ).write.mode("append").parquet(man_dir)


def _next_free_version(spark: SparkSession, out_dir: str, current: int) -> int:
    """Smallest version number no prior run (committed, crashed, or
    gc'd) has touched: 1 + max(CURRENT, every v* dir on disk, every
    version in the manifest). The manifest is append-only, so a crashed
    rebuild's 'completed' rows persist even after gc_versions removes
    its dir — reusing that version would make _visible union the stale
    rows into the fresh build (duplicate postings / double-counted
    stats). Both rebuild (here) and resume=False compaction
    (operators/segments.py) allocate through this."""
    import re

    vmax = current
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            m = re.fullmatch(r"v(\d+)", name)
            if m:
                vmax = max(vmax, int(m.group(1)))
    man_dir = os.path.join(out_dir, "manifest")
    if os.path.isdir(man_dir) and any(
            not f.startswith((".", "_")) for f in os.listdir(man_dir)):
        row = spark.read.parquet(man_dir).agg(
            F.max("version").alias("m")).collect()[0]
        if row["m"] is not None:
            vmax = max(vmax, int(row["m"]))
    return vmax + 1


def _verify_done(vdir: str, done: set[str]) -> set[str]:
    """Cross-check 'completed' manifest markers against the data on
    disk. The manifest is append-only, so gc_versions removing an
    aborted partial version leaves its completed rows behind; a later
    resume that trusted those rows would skip rewriting stages whose
    data no longer exists and commit an empty version (the
    resume-after-gc data-loss path). Markers whose directories are
    missing are dropped, so resume simply re-runs those stages —
    idempotent overwrites make that safe."""
    ok: set[str] = set()
    for key in done:
        if key == "stats":
            if all(os.path.isdir(os.path.join(vdir, d, "seg=0"))
                   for d in ("docs", "corpus", "term_stats")):
                ok.add(key)
        elif key == "forward":  # compaction's consolidated-forward stage
            if os.path.isdir(os.path.join(vdir, "forward", "seg=0")):
                ok.add(key)
        elif key.startswith("group="):
            g = key.split("=", 1)[1]
            if (os.path.isdir(os.path.join(vdir, "postings", f"group={g}"))
                    and os.path.isdir(os.path.join(vdir, "term_bounds", f"group={g}"))):
                ok.add(key)
        else:
            ok.add(key)
    return ok


def check_layout(spark: SparkSession, index_dir: str) -> None:
    """Reject pre-layout-2 index directories BEFORE any mutation.

    A legacy dir (data but no CURRENT pointer, or a manifest without the
    'version' column) must not be half-converted: committing CURRENT=0
    into it and then failing on the legacy manifest schema would leave
    it in a state neither layout can read. Raise a clear error instead;
    old indexes must be rebuilt."""
    if read_current_version(index_dir) is not None:
        return
    if not os.path.isdir(index_dir):
        return
    legacy_data = [d for d in ("postings", "docs", "term_stats", "corpus")
                   if os.path.isdir(os.path.join(index_dir, d))]
    man_dir = os.path.join(index_dir, "manifest")
    man_cols: list[str] | None = None
    if os.path.isdir(man_dir):
        try:
            man_cols = spark.read.parquet(man_dir).columns
        except Exception:
            man_cols = None
    if legacy_data or (man_cols is not None and "version" not in man_cols):
        raise ValueError(
            f"{index_dir} holds a pre-versioned (layout < {LAYOUT}) index "
            f"(data dirs {legacy_data or ['manifest']} with no CURRENT "
            f"pointer{' / no version column' if man_cols is not None and 'version' not in man_cols else ''}) "
            f"— no in-place migration path; rebuild the index")


def _manifest_rows(spark: SparkSession, man_dir: str, version: int) -> list:
    """Completed manifest rows for a version, read with a short retry.

    Distinguishes 'no manifest yet' (legit empty — []) from a TRANSIENT
    miss during consolidation's swap (r3 advice #4): the swap lands the
    consolidated file BEFORE unlinking the old per-commit files, so
    rows are never absent — but a reader that listed the directory just
    before the unlinks can fail mid-scan with FileNotFound. The read +
    collect runs inside the retry (a lazy handle could still fail at
    collect time); a retry re-lists and sees the consolidated file.
    Duplicated rows during the window are harmless — every consumer
    reduces via set/max semantics. Only a still-failing read of an
    existing non-empty directory escalates."""
    import time as _t

    for attempt in range(3):
        try:
            return _read_manifest(spark, man_dir, version)
        except Exception:
            if not os.path.isdir(man_dir) or not any(
                    not f.startswith((".", "_")) for f in os.listdir(man_dir)):
                return []  # genuinely absent/empty
            if attempt == 2:
                raise
            _t.sleep(0.1 * (attempt + 1))
    return []


def _read_manifest(spark: SparkSession, man_dir: str, version: int) -> list:
    """One manifest read. r6: the manifest is tiny catalog metadata —
    read it DRIVER-SIDE with pyarrow (the Iceberg manifest pattern)
    instead of paying a Spark job per index open (a cold index query
    was burning one of its ~3 driver jobs here). pyarrow's dataset
    reader skips `_`/`.` files like Spark's committer artifacts; any
    failure (e.g. a remote filesystem pyarrow can't reach) falls back
    to the Spark read, preserving cluster behavior. Consumers access
    rows by key only, so plain dicts substitute for Rows."""
    try:
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(man_dir)
        return [r for r in tbl.to_pylist()
                if r.get("status") == "completed"
                and r.get("version") == version]
    except Exception:
        if not os.path.isdir(man_dir):
            raise
        return spark.read.parquet(man_dir).filter(
            (F.col("status") == "completed")
            & (F.col("version") == version)).collect()


def _completed(spark: SparkSession, man_dir: str, version: int) -> set[str]:
    out: set[str] = set()
    rows = _manifest_rows(spark, man_dir, version)
    for r in rows:
        if r["stage"] in ("stats", "forward"):
            out.add(r["stage"])
        elif r["stage"] in ("postings", "segment"):
            # only data-bearing stages map to groups — a 'compaction'
            # observability row must never mark group=<version> done
            out.add(f"group={r['group']}")
    return out


def _visible(spark: SparkSession, out_dir: str, version: int) -> tuple[set[int], set[int]]:
    """(visible segment ids, visible postings groups) for a version —
    only stages with a completed manifest row count, so a crashed
    half-written add_segment is invisible to every reader."""
    rows = _manifest_rows(spark, os.path.join(out_dir, "manifest"), version)
    segs: set[int] = set()
    groups: set[int] = set()
    for r in rows:
        if r["stage"] == "stats":
            segs.add(0)
        elif r["stage"] == "postings":
            groups.add(int(r["group"]))
        elif r["stage"] == "segment":
            segs.add(int(r["group"]))
            groups.add(int(r["group"]))
    return segs, groups


def _empty_tombstones(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "doc_id long, before_group int")


def collect_term_dict(index: dict, max_rows: int = 2_000_000,
                      hist_max_rows: int = 500_000) -> None:
    """Serving-mode accelerator: pull the full term dictionary
    (term_stats ⋈ term_bounds — df + per-group block bounds) to the
    driver when it fits (``max_rows`` guards web-scale vocabularies:
    beyond it, queries fall back to per-query metadata lookups with
    memoization, operators/query._term_meta). The frontend-resident
    term-dictionary design of classic search engines: postings stay on
    executors, the tiny per-term metadata doesn't deserve a Spark job
    per query. Sets index['_term_dict']: term → [bound rows].

    ``hist_max_rows`` (r6, measured): the per-term ``w_hist``
    impact-prefix ladders dominate dictionary memory — ~4.8 GB of
    driver heap at the 2M-row cap vs ~1.0 GB without them (tracemalloc
    of 200k shaped rows ×10). Past this budget the dictionary is
    collected WITHOUT w_hist: impact planning degrades gracefully to
    MaxScore term-level skip/full endpoints (_impact_plan's ladder
    keeps its two endpoint rungs; prefix cuts need the histogram), and
    correctness is untouched — every bound is still predicate-based."""
    n_terms = index["term_stats"].count()
    if n_terms > max_rows:
        return
    tb = index["term_bounds"]
    if n_terms > hist_max_rows and "w_hist" in tb.columns:
        tb = tb.drop("w_hist")
    rows = tb.join(
        index["term_stats"].select("term", "df"), "term").collect()
    d: dict[str, list] = {}
    for r in rows:
        d.setdefault(r["term"], []).append(r)
    index["_term_dict"] = d


def _open_table(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with the schema derived DRIVER-SIDE (r6):
    every schema-less parquet read pays a footer-inference Spark job,
    and read_index opens six tables — six jobs before the first query
    touches data. The data schema comes from ONE footer via pyarrow;
    hive-style partition columns (seg=/group=, always small ints in
    this layout) are appended from the directory names. Falls back to
    plain inference on any surprise (remote FS, exotic types)."""
    try:
        import pyarrow.parquet as _pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import IntegerType, StructField, StructType

        first, parts = None, []
        for dp, dns, fns in os.walk(path):
            dns.sort()
            for fn in sorted(fns):
                if not fn.startswith((".", "_")) and fn.endswith(".parquet"):
                    first = os.path.join(dp, fn)
                    rel = os.path.relpath(dp, path)
                    parts = [seg.split("=", 1)[0] for seg in rel.split(os.sep)
                             if "=" in seg]
                    break
            if first:
                break
        if first is None:
            raise FileNotFoundError(path)
        fields = list(from_arrow_schema(_pq.read_schema(first)).fields)
        fields += [StructField(p, IntegerType(), True) for p in parts]
        return spark.read.schema(StructType(fields)).parquet(path)
    except Exception:
        return spark.read.parquet(path)


def read_index(spark: SparkSession, out_dir: str, cache: bool = False,
               term_dict_max: int = 2_000_000) -> dict[str, DataFrame]:
    """Open the CURRENT snapshot of an index.

    Stats tables are append-only across incremental segments
    (operators/segments.py) and may carry negative delta rows from doc
    replacement, so they aggregate on read: df/cf sum per term; corpus
    stats merge weighted by n_docs — both cancel deltas exactly. Docs
    rows killed by a tombstone (seg < before_group) are filtered here;
    postings-level tombstone filtering happens in the decode path
    (operators/query.py) because it needs the block's group.

    cache=True is serving mode (the analog of the reference's long-lived
    service process with Milvus's collection loaded to memory,
    storage/milvus_store.py:83-85): postings/docs/term_stats/term_bounds
    are persisted and materialized so repeated queries skip the parquet
    scan. On a cluster this is executor block-manager memory."""
    version = read_current_version(out_dir)
    if version is None:
        raise FileNotFoundError(f"no CURRENT pointer under {out_dir}")
    vdir = version_dir(out_dir, version)
    segs, groups = _visible(spark, out_dir, version)
    seg_list, group_list = sorted(segs), sorted(groups)

    corpus_raw = _open_table(spark, os.path.join(vdir, "corpus")).filter(
        F.col("seg").isin(seg_list))
    corpus = corpus_raw.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )
    term_stats_raw = _open_table(spark, os.path.join(vdir, "term_stats")).filter(
        F.col("seg").isin(seg_list))
    term_stats_agg = term_stats_raw.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf"),
        F.max("is_hot").alias("is_hot"),  # salted in ≥1 segment
    ).filter(F.col("df") > 0)  # fully-replaced terms cancel to zero

    tomb_dir = os.path.join(vdir, "tombstones")
    if os.path.isdir(tomb_dir):
        tombstones = _open_table(spark, tomb_dir).filter(
            F.col("seg").isin(seg_list)).select("doc_id", "before_group")
        n_tomb = tombstones.count()
    else:
        tombstones, n_tomb = _empty_tombstones(spark), 0

    docs_raw = _open_table(spark, os.path.join(vdir, "docs")).filter(
        F.col("seg").isin(seg_list))
    if n_tomb:
        t = tombstones.select(F.col("doc_id").alias("t_id"),
                              F.col("before_group").alias("t_before"))
        docs_live = docs_raw.join(
            t, (docs_raw["doc_id"] == t["t_id"]) & (docs_raw["seg"] < t["t_before"]),
            "left_anti",
        )
    else:
        docs_live = docs_raw

    fwd_dir = os.path.join(vdir, "forward")
    forward = (_open_table(spark, fwd_dir).filter(F.col("seg").isin(seg_list))
               if os.path.isdir(fwd_dir) else None)

    idx: dict = {
        "docs": docs_live.select("doc_id", "doc_len"),
        "forward": forward,
        "corpus": corpus,
        "term_stats": term_stats_agg,
        "term_bounds": _open_table(spark, os.path.join(vdir, "term_bounds")).filter(
            F.col("group").isin(group_list)),
        "postings": _open_table(spark, os.path.join(vdir, "postings")).filter(
            F.col("group").isin(group_list)),
        "tombstones": tombstones,
        "analyzer": read_meta(vdir).get("analyzer", "standard"),
        "positions_stored": bool(read_meta(vdir).get("positions", False)),
        "impact_layout": bool(read_meta(vdir).get("impact", False)),
        "_n_tombstones": n_tomb,
        "_dir": out_dir,
        "_version": version,
    }
    if cache:
        for name in ("docs", "term_stats", "term_bounds", "postings"):
            idx[name] = idx[name].persist()
            idx[name].count()  # materialize now, not on first query
        idx["_corpus_row"] = idx["corpus"].collect()[0]
        collect_term_dict(idx, term_dict_max)
    return idx
