"""Golden rank-identity: Spark BM25 vs pure-Python exhaustive oracle.

The north_rule correctness gate: top-k docIDs rank-identical and scores
equal to ~1e-9 on a representative query set (single hot term, rare
term, multi-term, out-of-vocabulary term).
"""

import pytest

from semcode_spark.operators.query import bm25_topk
from semcode_spark.oracle import BM25Oracle

QUERIES = [
    "the",                      # hot term
    "window merge",             # two mid-frequency terms
    "spark query data",         # three terms
    "customer zzznotaword",     # one in-vocab + one OOV term
    "slow batch value filter",  # four terms
]


@pytest.fixture(scope="module")
def oracle(documents):
    rows = documents.select("doc_id", "text").collect()
    return BM25Oracle({r["doc_id"]: r["text"] for r in rows})


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [5, 10])
def test_rank_identical(documents, oracle, query, k):
    got = bm25_topk(documents, query, k=k).collect()
    want = oracle.topk(query, k=k)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_empty_query_rejected(documents):
    with pytest.raises(ValueError):
        bm25_topk(documents, "  !! ")
