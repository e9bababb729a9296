"""Similarity search: exact values on hand vectors, LSH recall sanity."""

import math

import pytest
from pyspark.sql import functions as F

from semcode_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, vecs):
    q = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])],
                              "query_id long, qvec array<float>")
    out = S.cosine_topk(vecs, q, k=5).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 4, 2, 3]
    assert out[0]["cosine"] == 1.0
    assert out[1]["cosine"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert out[2]["cosine"] == pytest.approx(0.5, abs=1e-6)
    assert out[4]["cosine"] == -1.0
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_lsh_recall_on_real_embeddings(spark, embeddings):
    """Multi-table LSH ANN must put the true #1 neighbor in its top-k
    for most queries: per-table hit prob ~0.14 on near-orthogonal random
    vectors, 8 tables → expected recall ~0.70."""
    qs = embeddings.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    cands = embeddings.filter("vec_id >= 10")
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in S.cosine_topk(cands, qs, k=1).collect()}
    approx = S.lsh_ann_topk(cands, qs, k=10, n_tables=8).collect()
    got = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for (qid, _), v in exact.items() if v in got.get(qid, set()))
    assert hits >= 4  # recall >= 40% of 10 queries


def test_neardup_pairs_self_excluded(spark, vecs):
    out = S.embedding_neardup_pairs(vecs, threshold=0.9)
    rows = out.collect()
    assert all(r["a"] < r["b"] for r in rows)
    # identical-direction pair (0,1) has cosine ~0.9939 and identical
    # hyperplane signs → must be found
    assert any((r["a"], r["b"]) == (0, 1) for r in rows)
