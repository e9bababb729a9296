"""The full reference query set (24 queries), rank-identical:
pure-Python oracle == exhaustive Spark BM25 == batched block-index path.
"""

import pytest

from semcode_spark.config import BM25Config, EngineConfig, IndexConfig
from semcode_spark.fixtures.queries import REFERENCE_QUERIES
from semcode_spark.operators.index_build import build_index, read_index
from semcode_spark.operators.query import bm25_topk_batch
from semcode_spark.oracle import BM25Oracle

CFG = EngineConfig(bm25=BM25Config(),
                   index=IndexConfig(term_buckets=16, block_size=32))


@pytest.fixture(scope="module")
def oracle(documents):
    rows = documents.select("doc_id", "text").collect()
    return BM25Oracle({r["doc_id"]: r["text"] for r in rows})


@pytest.fixture(scope="module")
def index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qset_idx"))
    build_index(spark, documents, out, cfg=CFG, groups=1, count_rows=False)
    return read_index(spark, out)


def test_reference_query_set_rank_identical(spark, index, oracle):
    got = bm25_topk_batch(spark, index, REFERENCE_QUERIES, cfg=CFG).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    n_nonempty = 0
    for qid, text, k in REFERENCE_QUERIES:
        want = oracle.topk(text, k=k)
        rows = by_q.get(qid, [])
        assert [r["doc_id"] for r in rows] == [d for d, _ in want], f"q{qid}: {text!r}"
        for r, (_, s) in zip(rows, want):
            assert r["score"] == pytest.approx(s, abs=1e-9), f"q{qid}"
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        n_nonempty += bool(rows)
    assert n_nonempty >= 20  # OOV queries are allowed to be empty
