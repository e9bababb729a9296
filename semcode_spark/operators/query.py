"""BM25 top-k ranked retrieval.

Two paths, both DataFrame-planned:

1. ``bm25_topk`` — exhaustive scoring straight off the corpus (or a flat
   tf relation). This is the oracle-comparable path: broadcast the query
   terms, join postings, one hash agg, TakeOrderedAndProject. Mirrors
   the reference's retrieval orchestration (rag/pipeline.py:93-131) with
   the ANN probe (storage/milvus_store.py:135-148) replaced by a
   broadcast join.

2. ``wand_topk`` — the persisted block index path with block-max
   pruning: an initial θ from each term's single best block, then only
   blocks whose upper bound (idf·max_w_block + Σ other terms' global
   bounds) exceeds θ are decoded. The analog of IVF nprobe=16/128
   cluster pruning (milvus_store.py:144), but lossless: tests assert
   pruned == exhaustive.

Physical shape of (1): BroadcastExchange(query terms) → hash agg on
doc_id → TakeOrderedAndProject(k) — zero wide shuffles for small k
(partial top-k per partition, merged on the driver, SURVEY §3.2).

Rank identity: total order (score desc, doc_id asc) — SURVEY §7.3(b).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semcode_spark.config import DEFAULT, EngineConfig
from semcode_spark.functions.tokenize import tokenize_query
from semcode_spark.operators import blocks as B
from semcode_spark.operators.index_build import term_doc_tf


def idf_col(df_col, n_docs: float):
    """Lucene-style non-negative idf: ln((N - df + 0.5)/(df + 0.5) + 1)."""
    return F.log((F.lit(n_docs) - df_col + 0.5) / (df_col + 0.5) + 1.0)


def score_col(tf_col, dl_col, idf, avgdl: float, cfg: EngineConfig = DEFAULT):
    k1, b = cfg.bm25.k1, cfg.bm25.b
    return idf * (tf_col * (k1 + 1.0)) / (
        tf_col + k1 * (1.0 - b + b * dl_col / avgdl)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive BM25 scores for every matching doc: (doc_id, score).

    Self-contained (computes tf/df/stats from the corpus): used for
    oracle comparison and as the reference result for WAND tests.
    """
    spark = docs.sparkSession
    tf = term_doc_tf(docs, id_col, text_col)
    stats = docs.select(F.size(
        F.filter(F.split(F.lower(F.col(text_col)), DEFAULT.index.token_pattern),
                 lambda t: t != "")
    ).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    qt = spark.createDataFrame([(t,) for t in set(query_terms)], "term string")
    tstats = tf.join(F.broadcast(qt), "term").groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    matched = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(tstats), "term")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
    )
    return matched.groupBy("doc_id").agg(
        F.sum(
            score_col(F.col("tf"), F.col("doc_len"), F.col("idf"), avgdl, cfg)
        ).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int | None = None,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (doc_id, score) for a free-text query — exhaustive path."""
    k = k or cfg.bm25.default_k
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("empty query")  # reference validates the same (api/main.py:203-206)
    scores = bm25_scores(docs, terms, cfg, id_col, text_col)
    return (
        scores.orderBy(F.round("score", cfg.bm25.rank_decimals).desc(),
                       F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


# ----------------------------------------------------------- index path ----

def _decode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """block rows → (term, doc_id, w) posting rows (numpy decode)."""
    for pdf in batches:
        if not len(pdf):
            continue
        terms, ids, ws = [], [], []
        for row in pdf.itertuples(index=False):
            d = B.decode_doc_ids(row.doc_ids).astype(np.int64)
            tf = B.varint_decode(row.tfs).astype(np.float64)
            # recompute exact w from tf: w stored per-block only as max;
            # exact per-posting w = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
            # requires dl — so blocks store tf and we join doc_len after
            ids.append(d)
            ws.append(tf)
            terms.append(np.full(len(d), row.term, dtype=object))
        yield pd.DataFrame({
            "term": np.concatenate(terms),
            "doc_id": np.concatenate(ids),
            "tf": np.concatenate(ws),
        })


def wand_topk(
    spark: SparkSession,
    index: dict[str, DataFrame],
    query: str,
    k: int | None = None,
    cfg: EngineConfig = DEFAULT,
    prune: bool | str = "auto",
) -> DataFrame:
    """Top-k over the persisted block index with block-max pruning.

    Stage A (θ bootstrap): decode only each term's best block (highest
    max_w), score those docs exactly, θ = k-th best score so far.
    Stage B: keep a block of term t iff
        idf_t · max_w(block) + Σ_{t'≠t} idf_t' · max_w_global(t') ≥ θ_eff
    where θ_eff = (floor(θ·10^d + 0.5) − 0.5) / 10^d is the *lower edge
    of θ's rounding bucket* (d = cfg.bm25.rank_decimals). Final ranking
    is by round(score, d) then doc_id asc, so a doc whose raw score is
    ≤ θ but rounds into θ's bucket can still out-rank the k-th result
    via the doc_id tiebreak — pruning against raw θ would drop it
    (reachable: docs with identical (tf, doc_len) tie bit-exactly).
    Every posting block of any doc with round(score) ≥ round(θ) survives
    this filter, so surviving docs are scored *completely*; decode
    survivors, score exactly, global top-k.

    All candidate selection is DataFrame joins/filters; only the byte
    decode runs in Python (Arrow batches). Lossless by construction
    (verified vs bm25_topk in tests/test_wand.py, incl. the θ-tie
    adversarial corpus).
    """
    k = k or cfg.bm25.default_k
    terms = list(dict.fromkeys(tokenize_query(query)))
    if not terms:
        raise ValueError("empty query")
    if "_corpus_row" not in index:  # cache: one collect per index, not per query
        index["_corpus_row"] = index["corpus"].collect()[0]
    corpus = index["_corpus_row"]
    n_docs, avgdl = float(corpus["n_docs"]), float(corpus["avgdl"])

    qt = spark.createDataFrame([(t,) for t in terms], "term string")
    tstats = (
        index["term_stats"].join(F.broadcast(qt), "term")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .select("term", "idf")
    )
    cand = index["postings"].join(F.broadcast(qt), "term")
    # block bound: idf · max_w, inflated by avgdl_now/avgdl_enc when the
    # corpus avgdl has grown since the block was encoded (per-posting
    # weights grow by at most that ratio — keeps pruning lossless across
    # incremental segments, operators/segments.py)
    adl_corr = (
        F.greatest(F.lit(1.0), F.lit(avgdl) / F.col("avgdl_enc"))
        if "avgdl_enc" in index["postings"].columns else F.lit(1.0)
    )
    cand = cand.join(F.broadcast(tstats), "term").withColumn(
        "ub", F.col("idf") * F.col("max_w") * adl_corr
    )

    if prune:
        cand = cand.persist()
        try:
            # job 1: per-term global upper bounds (blocks metadata only —
            # never collects posting bytes, scales with #terms not #blocks)
            per_term_rows = cand.groupBy("term").agg(
                F.max("ub").alias("term_ub"),
                F.count(F.lit(1)).alias("n_blocks")).collect()
            term_ubs = {r["term"]: r["term_ub"] for r in per_term_rows}
            total_ub = sum(term_ubs.values()) or 0.0
            n_blocks = sum(r["n_blocks"] for r in per_term_rows)
            if prune == "auto" and n_blocks <= cfg.bm25.prune_min_blocks:
                # candidate set is small: θ-bootstrap + pruning would cost
                # two extra jobs for nothing — decode everything directly
                # (the flat-scan side of the nprobe-vs-flat decision,
                # reference milvus_store.py:144)
                rows = (
                    _score_blocks(cand, tstats, avgdl, index["docs"], cfg)
                    .orderBy(F.round("score", cfg.bm25.rank_decimals).desc(),
                             F.col("doc_id").asc())
                    .limit(k)
                    .collect()
                )
                return spark.createDataFrame(
                    rows, "doc_id long, score double") if rows else \
                    spark.createDataFrame([], "doc_id long, score double")
            # job 2: θ bootstrap — decode each term's single best block,
            # score those docs exactly, θ = current k-th best
            best = cand.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("term").orderBy(
                        F.col("ub").desc(), F.col("salt"), F.col("block_id")
                    )
                ),
            ).filter(F.col("rn") == 1).drop("rn")
            theta_rows = (
                _score_blocks(best, tstats, avgdl, index["docs"], cfg)
                .orderBy(F.round("score", cfg.bm25.rank_decimals).desc(),
                         F.col("doc_id").asc())
                .limit(k)
                .collect()
            )
            if len(theta_rows) >= k:
                # prune against the lower edge of θ's rounding bucket,
                # never raw θ: rank order is (round(score, d), doc_id),
                # so equal-bucket docs with smaller doc_id must survive
                f = 10 ** cfg.bm25.rank_decimals
                theta_eff = (math.floor(theta_rows[-1]["score"] * f + 0.5) - 0.5) / f
            else:
                theta_eff = -1.0
            # job 3: a block survives iff its own bound plus the other
            # terms' global bounds could still reach θ's bucket; decode
            # survivors, exact-score, global top-k (TakeOrderedAndProject)
            per_term = spark.createDataFrame(
                [(t, u) for t, u in term_ubs.items()], "term string, term_ub double")
            survivors = cand.join(F.broadcast(per_term), "term").filter(
                F.col("ub") + F.lit(total_ub) - F.col("term_ub") >= F.lit(theta_eff)
            )
            rows = (
                _score_blocks(survivors, tstats, avgdl, index["docs"], cfg)
                .orderBy(F.round("score", cfg.bm25.rank_decimals).desc(),
                         F.col("doc_id").asc())
                .limit(k)
                .collect()
            )
        finally:
            cand.unpersist()
        return spark.createDataFrame(rows, "doc_id long, score double") if rows else \
            spark.createDataFrame([], "doc_id long, score double")

    return (
        _score_blocks(cand, tstats, avgdl, index["docs"], cfg)
        .orderBy(F.round("score", cfg.bm25.rank_decimals).desc(),
                 F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_batch(
    spark: SparkSession,
    index: dict[str, DataFrame],
    queries: list[tuple[int, str, int]],
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Batched top-k over the block index: (query_id, rank, doc_id, score)
    for every (query_id, text, k) — the throughput-oriented retrieval
    path (amortizes Spark's per-job floor across the whole query set).

    Plan: one decode pass over the blocks of the UNION of query terms →
    broadcast (query, term) map join → per-(query, doc) score agg →
    per-query window top-k. Single logical job; scales with the size of
    the touched postings, never the corpus.
    """
    if "_corpus_row" not in index:
        index["_corpus_row"] = index["corpus"].collect()[0]
    corpus = index["_corpus_row"]
    n_docs, avgdl = float(corpus["n_docs"]), float(corpus["avgdl"])
    k1, b = cfg.bm25.k1, cfg.bm25.b

    qt_rows, k_rows = [], []
    for qid, text, k in queries:
        k_rows.append((qid, k))
        for t in dict.fromkeys(tokenize_query(text)):
            qt_rows.append((qid, t))
    if not qt_rows:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
    qterms = spark.createDataFrame(qt_rows, "query_id long, term string")
    ks = spark.createDataFrame(k_rows, "query_id long, k int")
    terms = qterms.select("term").distinct()

    tstats = (
        index["term_stats"].join(F.broadcast(terms), "term")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .select("term", "idf")
    )
    blocks_df = index["postings"].join(F.broadcast(terms), "term")
    postings = blocks_df.select("term", "doc_ids", "tfs").mapInPandas(
        _decode_blocks, schema="term string, doc_id long, tf double"
    )
    w = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    )
    scored = (
        postings.join(F.broadcast(tstats), "term")
        .join(index["docs"], "doc_id")
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("idf") * w).alias("score"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.round("score", cfg.bm25.rank_decimals).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .join(F.broadcast(ks), "query_id")
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def _score_blocks(
    blocks_df: DataFrame,
    tstats: DataFrame,
    avgdl: float,
    docs: DataFrame,
    cfg: EngineConfig,
) -> DataFrame:
    k1, b = cfg.bm25.k1, cfg.bm25.b
    postings = blocks_df.select("term", "doc_ids", "tfs").mapInPandas(
        _decode_blocks, schema="term string, doc_id long, tf double"
    )
    joined = postings.join(F.broadcast(tstats), "term").join(docs, "doc_id")
    w = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    )
    return joined.groupBy("doc_id").agg(
        F.sum(F.col("idf") * w).alias("score")
    )
