"""Dedup operators on hand-built corpora with known answers."""

import pytest
from pyspark.sql import functions as F

from semcode_spark.operators import dedup as D


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "spark shuffles postings into sorted blocks"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "completely different text about databases and queries"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dups(tiny):
    out = {r["doc_id"]: r for r in D.exact_dups(tiny).collect()}
    assert out[0]["is_dup"] is False and out[3]["is_dup"] is True
    assert out[0]["group_size"] == 2 == out[3]["group_size"]
    assert not out[1]["is_dup"] and not out[2]["is_dup"]
    assert out[0]["fp"] == out[3]["fp"]


def test_shingles(tiny):
    sh = D.shingles(tiny, n=3).filter("doc_id = 2").collect()
    got = {r["shingle"] for r in sh}
    assert got == {
        "spark shuffles postings", "shuffles postings into",
        "postings into sorted", "into sorted blocks",
    }


def test_ngram_jaccard_known_value(tiny):
    # docs 0/3 identical → jaccard 1.0; docs 0/1 share 6 of 7+7 shingles
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(tiny, threshold=0.1).collect()}
    assert pairs[(0, 3)] == 1.0
    # |A∩B|=6 (7 shingles each, last differs): 6/(7+7-6) = 0.75
    assert pairs[(0, 1)] == 0.75


def test_minhash_lsh_finds_planted_pair(tiny):
    pairs = {(r["a"], r["b"]) for r in D.minhash_lsh_pairs(tiny, threshold=0.5).collect()}
    assert (0, 3) in pairs  # identical docs always collide in every band
    # unrelated docs never pass the verify step
    assert all(p in {(0, 1), (0, 3), (1, 3)} for p in pairs)


def test_simhash_identical_docs_equal(tiny):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(tiny).collect()}
    assert sh[0] == sh[3]
    assert sh[0] != sh[2]
    assert all(0 <= v < 2**32 for v in sh.values())


def test_simhash_neardups(tiny):
    out = {(r["a"], r["b"]): r["hamming"]
           for r in D.simhash_neardups(tiny, max_hamming=3).collect()}
    assert out[(0, 3)] == 0


def test_simhash_64bit(spark, documents):
    """bits=64 (the standard simhash width) must not overflow LongType;
    the top bit lands in the sign position by design."""
    from semcode_spark.operators.dedup import simhash

    rows = simhash(documents.limit(50), bits=64).collect()
    assert len(rows) == 50
    assert all(isinstance(r["simhash"], int) for r in rows)
    assert any(r["simhash"] != 0 for r in rows)
