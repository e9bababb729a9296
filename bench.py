"""Headline benchmark — one JSON line on stdout.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32):

- index build throughput over the documents table AND over a larger
  synthetic webtext corpus (the north-rule metric: docs/sec indexed)
- query latencies for the headline operator set (BM25 exhaustive,
  WAND over the block index, TPC-H-ish joins/aggs, MinHash LSH dedup,
  cosine ANN)

Output: {"metric": ..., "value": <sum of headline query secs>,
"unit": "sec", "queries": {...}, "sf": ..., plus throughput extras}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from semcode_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_webtext = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "50000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("semcode-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))

    import __spark_entry__ as entry
    from semcode_spark.operators.index_build import build_index, read_index
    from semcode_spark.operators.query import wand_topk
    from semcode_spark.sources.webpages import synth_web_pages
    from semcode_spark.functions.extract import extract_text
    import pyspark.sql.functions as F

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # ---- index build throughput: documents table ----
    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    t0 = time.time()
    build_index(spark, docs, idx_dir, groups=1)
    build_s = time.time() - t0
    extras["index_build_docs_per_sec"] = round(n_docs / build_s, 1)
    extras["index_build_sec"] = round(build_s, 3)

    # ---- index build throughput: synthetic webtext (html → text → index) ----
    web_dir = tempfile.mkdtemp(prefix="bench_web_")
    pages = synth_web_pages(spark, n_webtext)
    pages.write.mode("overwrite").parquet(os.path.join(web_dir, "pages"))
    raw = spark.read.parquet(os.path.join(web_dir, "pages"))
    t0 = time.time()
    extracted = raw.select(
        F.xxhash64("url").alias("doc_id"),
        extract_text(F.col("html")).alias("text"),
    )
    build_index(spark, extracted, os.path.join(web_dir, "idx"), groups=1)
    web_s = time.time() - t0
    extras["webtext_docs"] = n_webtext
    extras["webtext_index_docs_per_sec"] = round(n_webtext / web_s, 1)
    extras["webtext_index_sec"] = round(web_s, 3)

    # ---- headline queries ----
    qs = entry.queries()
    headline = [
        "bm25_topk", "bm25_topk_rare", "term_stats", "conjunctive_and",
        "q1_pricing_summary", "q3_topk_revenue", "window_topn_acctbal",
        "windowed_event_stats", "dedup_exact", "dedup_minhash_lsh",
        "simhash_values", "ann_cosine_topk", "quality_score", "token_count",
    ]
    for name in headline:
        timed(name, lambda n=name: qs[n](spark, sf_dir).collect())

    # WAND over the prebuilt block index (query-side latency, SURVEY §3.2)
    idx = read_index(spark, idx_dir)
    timed("wand_topk", lambda: wand_topk(spark, idx, "spark query data", k=10).collect())

    # serving mode: cached/materialized index, warm queries (the fair
    # analog of the reference's long-lived service + loaded collection)
    hot_idx = read_index(spark, idx_dir, cache=True)
    wand_topk(spark, hot_idx, "window merge", k=10).collect()  # warm-up
    t0 = time.time()
    n_warm = 5
    for i in range(n_warm):
        wand_topk(spark, hot_idx, ["spark query data", "dup merge", "the",
                                   "table scan", "sort batch"][i], k=10).collect()
    extras["wand_warm_sec_per_query"] = round((time.time() - t0) / n_warm, 4)

    # batched retrieval: the whole 24-query reference set in one job —
    # the throughput-oriented path (amortizes the per-job floor)
    from semcode_spark.fixtures.queries import REFERENCE_QUERIES
    from semcode_spark.operators.query import bm25_topk_batch

    t0 = time.time()
    n_hits = bm25_topk_batch(spark, idx, REFERENCE_QUERIES).count()
    batch_s = time.time() - t0
    extras["batch_24q_sec"] = round(batch_s, 3)
    extras["batch_sec_per_query"] = round(batch_s / len(REFERENCE_QUERIES), 4)
    extras["batch_hits"] = n_hits

    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(web_dir, ignore_errors=True)
    spark.stop()

    lat = sorted(timings.values())
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "query_p50_sec": lat[len(lat) // 2],
        "sf": sf,
        **extras,
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
