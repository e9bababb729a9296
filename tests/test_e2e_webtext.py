"""End-to-end on the input_hint shape: web_pages (url, warc_ts,
html:binary, text, lang) → extract → index → ranked query, verified
against the pure-Python oracle over the same extracted text — the
integration shape of the reference's test_indexer_service.py:32-68.
"""

import pytest
from pyspark.sql import functions as F

from semcode_spark.config import BM25Config, EngineConfig, IndexConfig
from semcode_spark.functions.extract import extract_text
from semcode_spark.fixtures.queries import WEBTEXT_QUERIES
from semcode_spark.operators.index_build import build_index, read_index
from semcode_spark.operators.query import bm25_topk_batch
from semcode_spark.oracle import BM25Oracle
from semcode_spark.sources.webpages import synth_web_pages

CFG = EngineConfig(bm25=BM25Config(), index=IndexConfig(term_buckets=8, block_size=32))
N_DOCS = 400


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    pages = synth_web_pages(spark, N_DOCS)
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        extract_text(F.col("html")).alias("text"),
    )
    out = str(tmp_path_factory.mktemp("e2e_idx"))
    summary = build_index(spark, docs, out, cfg=CFG, groups=2)
    oracle = BM25Oracle({r["doc_id"]: r["text"]
                         for r in docs.collect()})
    return read_index(spark, out), oracle, summary


def test_build_summary(pipeline):
    _, _, summary = pipeline
    assert summary["n_docs"] == N_DOCS
    assert summary["hot_terms"] >= 1  # Zipf head terms must trip the salt


def test_webtext_query_set_rank_identical(spark, pipeline):
    index, oracle, _ = pipeline
    got = bm25_topk_batch(spark, index, WEBTEXT_QUERIES, cfg=CFG).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, k in WEBTEXT_QUERIES:
        want = oracle.topk(text, k=k)
        rows = by_q.get(qid, [])
        assert [r["doc_id"] for r in rows] == [d for d, _ in want], f"q{qid}: {text!r}"
        for r, (_, s) in zip(rows, want):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_doc_stats_match_oracle(spark, pipeline):
    index, oracle, _ = pipeline
    got = {r["doc_id"]: r["doc_len"] for r in index["docs"].collect()}
    assert got == oracle.dl
