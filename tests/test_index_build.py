"""Index build: stats exactness, block layout, resume, skew salting."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semcode_spark.config import BM25Config, EngineConfig, IndexConfig
from semcode_spark.operators import blocks as B
from semcode_spark.operators.index_build import (
    build_index, read_index, term_doc_tf,
)
from semcode_spark.oracle import BM25Oracle

CFG = EngineConfig(
    bm25=BM25Config(),
    index=IndexConfig(term_buckets=8, block_size=16, hot_term_df_ratio=0.05, salt_factor=4),
)


@pytest.fixture(scope="module")
def corpus(documents):
    rows = documents.select("doc_id", "text").collect()
    return {r["doc_id"]: r["text"] for r in rows}


@pytest.fixture(scope="module")
def index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    summary = build_index(spark, documents, out, cfg=CFG, groups=3)
    assert summary["n_docs"] == documents.count()
    idx = read_index(spark, out)
    idx["_dir"] = out
    return idx


def test_corpus_stats_exact(index, corpus):
    oracle = BM25Oracle(corpus)
    row = index["corpus"].collect()[0]
    assert row["n_docs"] == oracle.n
    assert row["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_term_stats_exact(index, corpus):
    oracle = BM25Oracle(corpus)
    got = {r["term"]: (r["df"], r["cf"]) for r in index["term_stats"].collect()}
    want_df = dict(oracle.df)
    assert {t: d for t, (d, _) in got.items()} == want_df
    # cf = total occurrences
    for t, (_, cf) in got.items():
        assert cf == sum(c.get(t, 0) for c in oracle.tf.values())


def test_postings_decode_match_tf(index, documents, corpus):
    """Decoded blocks reproduce the flat tf relation exactly."""
    want = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in term_doc_tf(documents).collect()
    }
    got = {}
    for r in index["postings"].collect():
        ids = B.decode_doc_ids(r["doc_ids"]).astype(np.int64)
        tfs = B.varint_decode(r["tfs"]).astype(np.int64)
        assert len(ids) == r["n"] == len(tfs)
        assert r["n"] <= CFG.index.block_size
        assert ids[0] == r["first_doc"] and ids[-1] == r["last_doc"]
        assert np.all(np.diff(ids) > 0)  # strictly sorted within block
        for d, t in zip(ids.tolist(), tfs.tolist()):
            key = (r["term"], d)
            assert key not in got, f"duplicate posting {key}"
            got[key] = t
    assert got == want


def test_hot_terms_salted(index):
    """Hot terms appear under >1 salt (skew split), cold terms under salt 0."""
    hot = [r["term"] for r in index["term_stats"].filter("is_hot").collect()]
    assert hot, "fixture corpus should have hot terms"
    salts = (
        index["postings"].groupBy("term")
        .agg(F.countDistinct("salt").alias("ns"))
        .collect()
    )
    ns = {r["term"]: r["ns"] for r in salts}
    assert all(ns[t] > 1 for t in hot)
    assert all(v == 1 for t, v in ns.items() if t not in hot)


def test_resume_skips_completed_and_is_identical(spark, documents, index, tmp_path_factory):
    """Kill after group 0 → resume → final postings identical to a clean
    build, and the manifest shows group 0 was not recomputed."""
    out = str(tmp_path_factory.mktemp("index_resume"))
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, documents, out, cfg=CFG, groups=3, fail_after_group=0)
    man1 = spark.read.parquet(out + "/manifest").count()
    build_index(spark, documents, out, cfg=CFG, groups=3, resume=True)
    man = spark.read.parquet(out + "/manifest")
    assert man.filter("stage = 'postings' and group = 0").count() == 1  # not redone
    assert man.filter("status = 'completed'").count() == man1 + 2

    a = read_index(spark, out)["postings"].orderBy("term", "salt", "block_id").collect()
    b = index["postings"].orderBy("term", "salt", "block_id").collect()
    assert a == b  # byte-identical blocks
