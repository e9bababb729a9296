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


def test_adaptive_planes_scales_with_corpus():
    from semcode_spark.operators.similarity import adaptive_planes
    assert adaptive_planes(1_000) == 4            # small corpus: recall floor
    assert adaptive_planes(100_000) == 9          # 100k/2^9 ≈ 195 per bucket
    assert adaptive_planes(10**9) == 22           # 1e9/2^22 ≈ 238 per bucket
    assert adaptive_planes(10**12) == 24          # capped
    # monotone non-decreasing
    last = 0
    for n in (10**3, 10**4, 10**5, 10**6, 10**7, 10**8, 10**9):
        p = adaptive_planes(n)
        assert p >= last
        last = p


def test_neardup_candidate_mass_bounded(spark, embeddings):
    """The LSH bucket join must examine ~n²/2^planes pairs, not n²:
    assert the actual candidate-pair count under the derived plane count
    is within 2× of the uniform-bucket expectation."""
    from pyspark.sql import functions as F
    from semcode_spark.operators.similarity import (
        _lsh_bucket, adaptive_planes)

    n = embeddings.count()
    planes = adaptive_planes(n, target_bucket=16)  # force growth at n=500
    assert planes > 4
    sizes = [
        r["c"] for r in embeddings
        .select(_lsh_bucket(F.col("embedding"), 64, planes).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    cand_pairs = sum(s * (s - 1) // 2 for s in sizes)
    full = n * (n - 1) // 2
    assert cand_pairs <= 2 * full / (2 ** planes)


def test_adaptive_neardup_matches_pinned(spark, embeddings):
    from semcode_spark.operators.similarity import (
        adaptive_planes, embedding_neardup_pairs)

    n = embeddings.count()
    want = embedding_neardup_pairs(
        embeddings, threshold=0.25, n_planes=adaptive_planes(n)).collect()
    got = embedding_neardup_pairs(embeddings, threshold=0.25).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ivf_topk_recall_and_candidate_mass(spark, embeddings):
    """IVF probing: candidates ≈ nprobe/nlist of the corpus, recall well
    above that fraction, lists reasonably balanced, and assignment is
    partition-invariant (deterministic centroids + rounded-sim argmax)."""
    from pyspark.sql import functions as F
    from semcode_spark.operators.similarity import (
        cosine_topk, ivf_assign, ivf_centroids, ivf_topk)

    qs = embeddings.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    cands = embeddings.filter("vec_id >= 20")
    n = cands.count()

    exact = cosine_topk(cands, qs, k=10).collect()
    approx = ivf_topk(cands, qs, k=10, nlist=16, nprobe=8).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex) / len(ex)
    assert recall >= 0.5, recall  # ≥ the scanned fraction on random vectors

    assign = ivf_assign(cands, ivf_centroids(cands, 16))
    sizes = [r["c"] for r in assign.groupBy("list_id")
             .agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) == 16
    assert max(sizes) <= 3 * n / 16  # no degenerate mega-list

    a = sorted(map(tuple, assign.collect()))
    b = sorted(map(tuple, ivf_assign(
        cands.repartition(7), ivf_centroids(cands.repartition(5), 16)).collect()))
    assert a == b, "assignment must not depend on partitioning"


def test_adaptive_tables_recall_scaling():
    """Table count grows as planes grow (recall restored) and respects
    the cap; at the small-corpus default (4 planes) it reproduces the
    measured-good 8-table setup."""
    from semcode_spark.operators.similarity import adaptive_planes, adaptive_tables

    assert 8 <= adaptive_tables(4) <= 16
    assert adaptive_tables(5) > adaptive_tables(4)
    assert adaptive_tables(24) == 32  # capped
    assert adaptive_tables(4, target_recall=0.9) > adaptive_tables(4, target_recall=0.5)
    # composed defaults: candidate mass tables/2^planes shrinks with n
    masses = []
    for n in (10_000, 1_000_000, 100_000_000):
        p = adaptive_planes(n)
        masses.append(adaptive_tables(p) / (1 << p))
    assert masses == sorted(masses, reverse=True)
    assert masses[-1] < 0.05


def test_lsh_defaults_hit_recall_target(spark, embeddings):
    """End-to-end: corpus-derived planes+tables reach ≥0.7 recall@10 vs
    brute force on the synthetic (near-random, hard-case) embeddings."""
    from semcode_spark.operators.similarity import cosine_topk, lsh_ann_topk

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    cands = embeddings.filter(F.col("vec_id") >= 5)
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(cands, qs, k=10).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in lsh_ann_topk(cands, qs, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall


def test_ivf_adaptive_nprobe_hits_target(spark, embeddings):
    from semcode_spark.operators.similarity import (
        adaptive_nprobe, cosine_topk, ivf_topk)

    assert adaptive_nprobe(16) == 8
    assert adaptive_nprobe(128) <= 64  # capped at half the lists
    assert adaptive_nprobe(16, target_recall=0.9) > adaptive_nprobe(16, 0.5)

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    cands = embeddings.filter(F.col("vec_id") >= 5)
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(cands, qs, k=10).collect()}
    tuned = {(r["query_id"], r["vec_id"])
             for r in ivf_topk(cands, qs, k=10, nlist=16).collect()}
    assert len(exact & tuned) / len(exact) >= 0.55  # clusterless hard case
