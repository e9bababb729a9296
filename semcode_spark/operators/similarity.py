"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k per query vector — broadcast
  the (small) query set against the corpus, score with JVM higher-order
  functions (zip_with + aggregate: stays in codegen, no Python), rank
  with a window. The baseline ANN answer, analog of the reference's
  Milvus IP search (storage/milvus_store.py:135-148).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic planes derived from md5 so results are reproducible);
  only vectors sharing a bucket with the query are scored. Approximate;
  recall measured against brute force in tests.
- ``embedding_neardup_pairs``: near-duplicate detection by cosine ≥
  threshold, candidates via LSH buckets (never a full cross join).

Scale: corpus side is never collected; query side is broadcast. For
10^9+ vectors, lsh_ann reduces scored candidates by ~2^n_planes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from semcode_spark.functions.hashing import md5_long_col
from semcode_spark.functions.rounding import fround
from semcode_spark.sources.tables import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    ))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pair_udf() -> Column:
    """Vectorized cosine over two array columns (guide §4.2): whole
    Arrow batches hit one numpy einsum instead of interpreted zip_with
    + aggregate lambdas per element per pair. Measured r6 at sf1.0:
    embedding_neardup's 12.5M candidate pairs went from >600 s (killed)
    to seconds; ivf_assign's n×nlist cross scoring 6.0 → <1 s.

    Same double-precision formula as ``cosine_col`` (elements cast to
    float64 BEFORE multiply, dot/(norm_a·norm_b)); only the summation
    order inside the dot differs (numpy pairwise/BLAS vs sequential) —
    an ulp-level difference absorbed by the 6-decimal rounding every
    caller applies, exactly the tolerance the engine already relies on
    vs the DuckDB oracle's own summation order (oracle hashes verified
    unchanged at sf0.001/0.01/0.1)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.stack(a.to_numpy()).astype(np.float64, copy=False)
        vb = np.stack(b.to_numpy()).astype(np.float64, copy=False)
        dot = np.einsum("ij,ij->i", va, vb)
        na = np.sqrt(np.einsum("ij,ij->i", va, va))
        nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
        return pd.Series(dot / (na * nb))

    return cos


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "qvec",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k: (query_id, rank, vec_id, cosine). Rank order uses the
    *rounded* cosine (then vec_id) so ranking is reproducible across
    engines and float summation orders."""
    # r6: scoring through the vectorized Arrow/numpy cosine kernel —
    # the interpreted zip_with/aggregate dot re-ran per (vector, query)
    # pair; one einsum per batch replaces it (see cosine_pair_udf).
    cos = cosine_pair_udf()
    vs = spread(vectors).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    qs = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("_q"))
    joined = vs.crossJoin(F.broadcast(qs))
    scored = joined.select(
        "query_id", "vec_id",
        fround(cos(F.col("_v"), F.col("_q")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def adaptive_planes(n_vectors: int, target_bucket: int = 256,
                    lo: int = 4, hi: int = 24) -> int:
    """Plane count sized to the corpus: expected bucket occupancy ≈
    n / 2^planes, so within-bucket pair work is O(n²/2^planes) — a fixed
    plane count that is fine at 10⁵ vectors is a scale-killer at 10⁹.
    Pick the smallest count that brings the expected bucket below
    ``target_bucket`` (floored at ``lo`` for recall, capped at ``hi``:
    2^24 buckets is plenty before sharding the key space further)."""
    import math

    if n_vectors <= target_bucket * (1 << lo):
        return lo
    return min(hi, math.ceil(math.log2(n_vectors / target_bucket)))


def adaptive_tables(n_planes: int, target_recall: float = 0.7,
                    p_agree: float = 0.55, max_tables: int = 32) -> int:
    """Table count sized to a recall target: a true neighbor agrees with
    the query on one random hyperplane with probability p (= 1 − θ/π;
    0.55 calibrated against the measured recall of the synthetic
    near-random corpus — the hard case, true 10-NN cosine ≈ 0.3), so one
    table catches it with p^n_planes and recall ≈ 1 − (1 − p^planes)^tables.
    Solve for tables. Paired with adaptive_planes this keeps BOTH knobs
    corpus-derived: more vectors → more planes (bounded bucket work) →
    more tables (restored recall), candidate mass ≈ tables/2^planes.
    Measured recall@10 is recorded in the bench JSON every round so
    regressions are visible, never assumed."""
    import math

    miss = 1.0 - p_agree ** n_planes
    if miss <= 0.0 or target_recall >= 1.0:
        return max_tables
    n = math.ceil(math.log(1.0 - target_recall) / math.log(miss))
    return max(1, min(max_tables, n))


def plane_values(p: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane: component d of plane p is
    (md5('p:d')[:15 nibbles] % 2001) - 1000 — computed driver-side once
    (tiny) and embedded as literals, so the executor-side plan is a pure
    constant-array dot product. The identical constants are generated
    for the DuckDB oracle, giving bit-exact bucket parity.

    (Deliberately NOT built with runtime md5 columns: stacking several
    transform()-lambdas in one projection tripped a PySpark lambda-
    variable collision that silently mixed plane values.)"""
    import hashlib

    return [
        (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) % 2001) - 1000
        for d in range(dim)
    ]


def _lsh_bucket(vec: Column, dim: int, n_planes: int) -> Column:
    """Sign-of-dot-product bucket id over deterministic hyperplanes
    (single table, planes 0..n_planes-1 — mirrored in the DuckDB oracle)."""
    return _lsh_bucket_planes(vec, dim, n_planes, 0)


def _lsh_tables(vec: Column, dim: int, n_planes: int, n_tables: int) -> Column:
    """array of per-table bucket keys: table t uses planes
    [t*n_planes, (t+1)*n_planes); key encodes (t, bucket) in one long.
    Multiple tables are the standard recall lever: a true neighbor
    missed by one table's split is caught by another."""
    return F.array(*[
        F.lit(t << 32) + _lsh_bucket_planes(vec, dim, n_planes, t * n_planes)
        for t in range(n_tables)
    ])


def _lsh_table_keys_udf(dim: int, n_planes: int, n_tables: int):
    """Arrow-vectorized pandas UDF computing ALL table bucket keys per
    vector in one pass — a bit-exact replica of the
    ``_lsh_bucket_planes`` expression fold, kept because stacking
    n_tables × n_planes higher-order-function lambdas in one projection
    falls out of whole-stage codegen and is re-evaluated per element
    (measured 24 s → sub-second on the sf0.01 gate for 8×4 tables).

    Exactness argument (parity with the DuckDB oracle depends on it):
    Spark's fold computes ``acc = (..(0.0 + x0*p0) + x1*p1 ..)`` with
    float32→float64 casts and strictly left-to-right float64 adds; here
    the products are the identical IEEE float64 elementwise multiplies
    and ``np.cumsum`` accumulates strictly left-to-right in float64, so
    every dot product — and therefore every ``dot > 0`` sign — is
    bit-identical to the expression form."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [plane_values(p, dim) for p in range(n_tables * n_planes)],
        dtype=np.float64)

    @pandas_udf("array<long>")
    def keys(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        arrs = [np.asarray(v, dtype=np.float64) for v in vecs]
        if all(a.shape == (dim,) for a in arrs):
            mat = np.stack(arrs)
        else:
            # dim-mismatched vectors: the expression form zip_with-pads
            # with null, which poisons the fold → dot null → every
            # ``dot > 0`` false → bucket 0. NaN replicates that exactly.
            mat = np.full((len(arrs), dim), np.nan)
            for i, a in enumerate(arrs):
                if a.shape == (dim,):
                    mat[i] = a
        out = np.zeros((mat.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            bucket = np.zeros(mat.shape[0], dtype=np.int64)
            for i in range(n_planes):
                dot = np.cumsum(mat * planes[t * n_planes + i], axis=1)[:, -1]
                bucket += (dot > 0).astype(np.int64) << i
            out[:, t] = (t << 32) + bucket
        return pd.Series(list(out))

    return keys


def _lsh_bucket_planes(vec: Column, dim: int, n_planes: int, first_plane: int) -> Column:
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in plane_values(first_plane + i, dim)])
        dot = _dot(vec, plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10, n_planes: int | None = None,
    dim: int = 64, n_tables: int | None = None, id_col: str = "vec_id",
    vec_col: str = "embedding", qid_col: str = "query_id", qvec_col: str = "qvec",
    n_vectors: int | None = None, target_recall: float = 0.7,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing ≥1 LSH-table bucket
    with the query. (query_id, rank, vec_id, cosine).

    Candidate mass ≈ n_tables / 2^n_planes of the corpus; recall grows
    as 1-(1-p^n_planes)^n_tables. At 10^9+ vectors this replaces the
    brute-force crossJoin with an equi-join on bucket keys.

    ``n_planes=None`` derives the plane count from the corpus size
    (adaptive_planes; pass ``n_vectors`` to skip the count job) and
    ``n_tables=None`` derives the table count from ``target_recall``
    given that plane count (adaptive_tables) — both knobs corpus-driven
    by default. Pin both explicitly for reproducible cross-engine
    results."""
    if n_planes is None:
        n_planes = adaptive_planes(n_vectors if n_vectors is not None
                                   else vectors.count())
    if n_tables is None:
        n_tables = adaptive_tables(n_planes, target_recall)
    keys = _lsh_table_keys_udf(dim, n_planes, n_tables)
    vb = spread(vectors).select(
        F.col(id_col), F.col(vec_col),
        F.explode(keys(F.col(vec_col))).alias("bucket"),
    )
    qb = queries.select(
        F.col(qid_col), F.col(qvec_col),
        F.explode(keys(F.col(qvec_col))).alias("bucket"),
    )
    joined = vb.join(F.broadcast(qb), "bucket").dropDuplicates([qid_col, id_col])
    # r6: candidate scoring through the vectorized cosine kernel
    # instead of interpreted per-pair lambdas (see cosine_pair_udf)
    scored = joined.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        fround(cosine_pair_udf()(F.col(vec_col), F.col(qvec_col)), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def ivf_centroids(
    vectors: DataFrame, nlist: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF centroids: the ``nlist`` corpus vectors with the
    smallest portable md5 hash of their id — a uniform pseudo-random
    sample that every engine reproduces bit-exactly (no k-means RNG; the
    reference's Milvus IVF_FLAT trains nlist=128 centroids the same
    spirit, storage/milvus_store.py:78-82). (centroid_id, cvec)."""
    return (
        vectors.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
            md5_long_col(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "centroid_id")
        .limit(nlist)
        .drop("_h")
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, list_id): each vector goes to its most-cosine-similar
    centroid (rounded similarity, ties → smallest centroid_id — a total
    order both engines reproduce). Broadcast centroids + ONE map-side
    partial argmax aggregate (``min_by`` over (-sim, centroid_id)): the
    shuffle carries one row per vector, never the n×nlist similarity
    relation. (r4 verdict item 2: the previous groupBy(max) + self-join
    re-shuffled — and recomputed — the full n×nlist cross product; at
    10^9 vectors × nlist 10^4 that is a 10^13-row exchange.)"""
    # r6: the n×nlist cross scoring runs through the vectorized cosine
    # kernel — the interpreted per-pair dot was 6.0 s for 20k×16 at
    # sf1.0 (see cosine_pair_udf)
    sims = spread(vectors).crossJoin(F.broadcast(centroids)).select(
        F.col(id_col).alias("vec_id"), F.col("centroid_id"),
        fround(cosine_pair_udf()(F.col(vec_col), F.col("cvec")), 6)
        .alias("sim"),
    )
    # min of the struct = (max sim, then smallest centroid_id): exactly
    # the old max+min tie order, in a single hash aggregate
    return sims.groupBy("vec_id").agg(
        F.min_by(
            "centroid_id",
            F.struct((-F.col("sim")).alias("ns"), F.col("centroid_id")),
        ).alias("list_id"))


def adaptive_nprobe(nlist: int, target_recall: float = 0.7,
                    cluster_gain: float = 1.45, max_frac: float = 0.5) -> int:
    """Probe count sized to a recall target: on a clusterless
    (near-random) corpus IVF recall ≈ probed fraction × cluster_gain
    (1.45 measured on the synthetic embeddings: nprobe/nlist 0.25 →
    recall 0.48, 0.375 → 0.54 — assignment locality buys ~1.5× over
    uniform); real
    embedding corpora cluster and exceed it. Capped at ``max_frac`` of
    the lists — probing more stops being 'inverted' search. Like
    adaptive_tables, the measured recall@10 lands in the bench JSON
    every round, so the model is checked, not assumed."""
    import math

    frac = min(max_frac, target_recall / cluster_gain)
    return max(1, math.ceil(frac * nlist))


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    nlist: int = 16, nprobe: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "qvec",
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose inverted list is
    among the query's ``nprobe`` nearest centroids — the Spark
    re-expression of Milvus IVF_FLAT nlist/nprobe probing
    (storage/milvus_store.py:144: nprobe=16 of nlist=128 ⇒ ~12.5% of the
    corpus scanned; here candidates ≈ nprobe/nlist of the corpus).
    (query_id, rank, vec_id, cosine); deterministic, DuckDB-oracle-able.
    ``nprobe=None`` derives the probe count from the recall target
    (adaptive_nprobe); pin it for reproducible cross-engine results.
    """
    if nprobe is None:
        nprobe = adaptive_nprobe(nlist)
    cents = ivf_centroids(vectors, nlist, id_col, vec_col)
    assign = ivf_assign(vectors, cents, id_col, vec_col)
    qsims = queries.crossJoin(F.broadcast(cents)).select(
        F.col(qid_col).alias("query_id"), F.col("centroid_id"),
        fround(cosine_col(F.col(qvec_col), F.col("cvec")), 6).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id"))
    probed = (
        qsims.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("list_id"))
    )
    cand_ids = assign.join(F.broadcast(probed), "list_id").select("query_id", "vec_id")
    scored = (
        cand_ids
        .join(vectors.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v")), "vec_id")
        .join(F.broadcast(queries.select(F.col(qid_col).alias("query_id"),
                                         F.col(qvec_col).alias("qv"))), "query_id")
        .select("query_id", "vec_id",
                fround(cosine_pair_udf()(F.col("v"), F.col("qv")), 6)
                .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def embedding_neardup_pairs(
    vectors: DataFrame, threshold: float = 0.95, n_planes: int | None = None,
    dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
    n_vectors: int | None = None,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold; candidates restricted
    to same LSH bucket (high-cosine pairs land together with high prob).

    ``n_planes=None`` (default) derives the plane count from the corpus
    size: within-bucket pairing is O(n²/2^planes), so the count must
    grow with n (tests/test_similarity.py asserts the candidate-mass
    bound). Pin n_planes for reproducible cross-engine results."""
    if n_planes is None:
        n_planes = adaptive_planes(n_vectors if n_vectors is not None
                                   else vectors.count())
    vb = spread(vectors).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
    ).withColumn(
        # single-table keys: (0 << 32) + bucket == _lsh_bucket, computed
        # by the vectorized kernel instead of n_planes stacked lambdas
        "bucket",
        F.element_at(_lsh_table_keys_udf(dim, n_planes, 1)(F.col("v")), 1))
    # r6: pair verification through the vectorized cosine kernel — the
    # interpreted per-pair dot over the within-bucket pair space was a
    # scale-killer (12.5M pairs at sf1.0 ran >600 s; killed), the
    # batched einsum does the same pairs in seconds (cosine_pair_udf)
    pairs = (
        vb.alias("l").join(
            vb.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"),
            fround(cosine_pair_udf()(F.col("l.v"), F.col("r.v")), 6)
            .alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)
