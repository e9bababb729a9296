"""WAND pruned == exhaustive (lossless block-max pruning), SURVEY §5."""

import pytest

from semcode_spark.config import BM25Config, EngineConfig, IndexConfig
from semcode_spark.operators.index_build import build_index, read_index
from semcode_spark.operators.query import bm25_topk, wand_topk

CFG = EngineConfig(
    bm25=BM25Config(),
    index=IndexConfig(term_buckets=8, block_size=16, hot_term_df_ratio=0.05, salt_factor=4),
)

QUERIES = ["the", "window merge", "spark query data", "slow batch value filter"]


@pytest.fixture(scope="module")
def index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_wand"))
    build_index(spark, documents, out, cfg=CFG, groups=2)
    return read_index(spark, out)


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_exhaustive(spark, documents, index, query):
    want = bm25_topk(documents, query, k=10).collect()
    # prune=True forces the θ-bootstrap + block-pruning path
    got = wand_topk(spark, index, query, k=10, prune=True).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)


@pytest.mark.parametrize("query", ["spark query data"])
def test_wand_auto_matches_forced(spark, index, query):
    a = wand_topk(spark, index, query, k=10, prune="auto").collect()
    b = wand_topk(spark, index, query, k=10, prune=True).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


@pytest.mark.parametrize("query", ["the", "spark query data"])
def test_unpruned_index_path_matches(spark, documents, index, query):
    want = bm25_topk(documents, query, k=10).collect()
    got = wand_topk(spark, index, query, k=10, prune=False).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
