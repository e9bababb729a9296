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


def test_wand_theta_tie_boundary(spark, tmp_path):
    """Adversarial θ-tie corpus: many docs with bit-identical BM25 scores
    (same tf, same doc_len) straddling the k-th rank. Raw-θ strict
    pruning would drop every block (ub == θ) and return empty / wrong
    doc_ids; bucket-lower-edge pruning must return the doc_id-asc
    winners, identical to the exhaustive path."""
    rows = [(i, "apple banana") for i in range(30)]          # 30 exact ties
    rows += [(100 + i, "cherry date elderberry fig") for i in range(5)]  # non-matching
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "tie_index")
    build_index(spark, docs, out, cfg=CFG, groups=1, count_rows=False)
    idx = read_index(spark, out)
    want = bm25_topk(docs, "apple", k=10, cfg=CFG).collect()
    got = wand_topk(spark, idx, "apple", k=10, cfg=CFG, prune=True).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want] == list(range(10))
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)


def test_wand_theta_tie_multiterm(spark, tmp_path):
    """Same boundary with a multi-term query: ties across blocks where
    ub + rest lands exactly on θ."""
    rows = [(i, "apple banana apple") for i in range(25)]
    rows += [(200 + i, "banana") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "tie_index2")
    build_index(spark, docs, out, cfg=CFG, groups=1, count_rows=False)
    idx = read_index(spark, out)
    want = bm25_topk(docs, "apple banana", k=12, cfg=CFG).collect()
    got = wand_topk(spark, idx, "apple banana", k=12, cfg=CFG, prune=True).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)


def test_query_with_fallback_ladder(spark, index, monkeypatch):
    """Degraded-result path: pruned failure falls back to the flat scan
    with identical results; total failure degrades to an empty result
    instead of raising (reference rag/pipeline.py:54-79)."""
    import semcode_spark.operators.query as Q
    from semcode_spark.operators.query import query_with_fallback, wand_topk

    want = [(r["doc_id"], round(r["score"], 9)) for r in
            wand_topk(spark, index, "spark query data", k=10, cfg=CFG, prune=False).collect()]

    rows, mode, why = query_with_fallback(spark, index, "spark query data", k=10, cfg=CFG)
    assert mode == "pruned" and why == []
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == want

    real = Q._score_blocks
    calls = {"n": 0}

    def fail_first(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected decode failure")
        return real(*a, **kw)

    monkeypatch.setattr(Q, "_score_blocks", fail_first)
    rows, mode, why = query_with_fallback(spark, index, "spark query data", k=10, cfg=CFG)
    assert mode == "flat"
    # the swallowed rung failure is surfaced, mode-tagged (r3 advice #7)
    assert why == ["pruned: RuntimeError: injected decode failure"]
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == want

    monkeypatch.setattr(Q, "_score_blocks",
                        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("down")))
    rows, mode, why = query_with_fallback(spark, index, "spark query data", k=10, cfg=CFG)
    assert mode == "degraded" and rows == []
    assert [w.split(":")[0] for w in why] == ["pruned", "flat"]
    assert all("down" in w for w in why)

    monkeypatch.setattr(Q, "_score_blocks", real)
    with pytest.raises(ValueError, match="empty query"):
        query_with_fallback(spark, index, "???", k=10, cfg=CFG)


def test_serving_mode_matches_cold(spark, documents, index, tmp_path_factory):
    """cache=True serving mode (persisted tables + driver term dict)
    returns results identical to the cold path for every query mode."""
    from semcode_spark.operators.index_build import build_index, read_index

    out = str(tmp_path_factory.mktemp("serving_idx"))
    build_index(spark, documents, out, cfg=CFG, groups=2, count_rows=False)
    hot = read_index(spark, out, cache=True)
    assert "_term_dict" in hot  # tiny vocab → driver dict engaged
    try:
        for q in QUERIES:
            want = wand_topk(spark, index, q, k=10, cfg=CFG, prune=True).collect()
            for prune in (True, False, "auto"):
                got = wand_topk(spark, hot, q, k=10, cfg=CFG, prune=prune).collect()
                assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
                    [(r["doc_id"], round(r["score"], 9)) for r in want], (q, prune)
    finally:
        for name in ("docs", "term_stats", "term_bounds", "postings"):
            hot[name].unpersist()


def test_batch_pruning_lossless(spark, documents, tmp_path):
    """Batched WAND (VERDICT r2 #6): per-query θ bootstrap + min-cutoff
    block filter returns EXACTLY the unpruned batch answer, including
    θ-tie buckets and replaced docs."""
    from pyspark.sql import functions as F
    from semcode_spark.operators.query import bm25_topk_batch
    from semcode_spark.operators.segments import add_segment

    d = str(tmp_path / "batchidx")
    build_index(spark, documents, d, cfg=CFG, groups=2, count_rows=False)
    add_segment(spark, d, documents.filter("doc_id < 30").withColumn(
        "text", F.concat(F.lit("fresh spark query data "), F.col("text"))),
        cfg=CFG)
    idx = read_index(spark, d)
    queries = [(0, "spark query data", 10), (1, "dup merge", 10),
               (2, "the", 5), (3, "table scan", 7), (4, "zzz_nohit", 3),
               (5, "sort batch window", 10)]

    def rows(prune):
        out = bm25_topk_batch(spark, idx, queries, cfg=CFG, prune=prune).collect()
        return sorted((r["query_id"], r["rank"], r["doc_id"],
                       round(r["score"], 9)) for r in out)

    assert rows(True) == rows(False)


def test_conjunctive_topk_requires_all_terms(spark, documents, index):
    """bm25_topk_conj = exhaustive BM25 restricted to docs containing
    EVERY query term, rank-identical."""
    from pyspark.sql import functions as F
    from semcode_spark.operators.index_build import term_doc_tf
    from semcode_spark.operators.query import bm25_scores, bm25_topk_conj

    terms = ["spark", "query", "data"]
    tf = term_doc_tf(documents, cfg=CFG)
    must = {r["doc_id"] for r in
            tf.filter(F.col("term").isin(terms)).groupBy("doc_id")
            .agg(F.countDistinct("term").alias("nt"))
            .filter(F.col("nt") == len(terms)).collect()}
    scores = {r["doc_id"]: r["score"] for r in
              bm25_scores(documents, terms, CFG).collect()
              if r["doc_id"] in must}
    want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]

    got = bm25_topk_conj(spark, index, "spark query data", k=10, cfg=CFG).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    assert all(r["doc_id"] in must for r in got)
