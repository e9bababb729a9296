"""Training-pipeline operators: PII scrub, deterministic stratified
sampling, sequence packing."""

import pytest
from pyspark.sql import functions as F

from semcode_spark.operators import pipeline as P


def test_pii_scrub_masks_and_counts(spark):
    rows = [
        (1, "mail me at a.b+c@ex-am.ple.org today"),
        (2, "see https://ex.org/x?q=1 and http://b.io/z now"),
        (3, "card 1234567890 pin 12345"),          # only the 10-digit run masked
        (4, "clean text with nothing to hide"),
        (5, "combo u@v.ai https://w.ch/u@v.ai 9999999"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.pii_scrub(docs).collect()}
    assert got[1]["clean"] == "mail me at <EMAIL> today"
    assert (got[1]["n_urls"], got[1]["n_emails"], got[1]["n_nums"]) == (0, 1, 0)
    assert got[2]["clean"] == "see <URL> and <URL> now"
    assert got[2]["n_urls"] == 2
    assert got[3]["clean"] == "card <NUM> pin 12345"
    assert (got[3]["n_nums"], got[3]["n_emails"]) == (1, 0)
    assert got[4]["clean"] == rows[3][1]
    # URL masked first, so the email inside it counts as URL not email
    assert got[5]["clean"] == "combo <EMAIL> <URL> <NUM>"
    assert (got[5]["n_urls"], got[5]["n_emails"], got[5]["n_nums"]) == (1, 1, 1)


def test_stratified_sample_deterministic_and_rated(spark, documents):
    rates = {"en": 0.10, "de": 0.50, "es": 1.0}
    a = sorted(r["doc_id"] for r in
               P.stratified_sample(documents, rates).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               P.stratified_sample(documents.repartition(7), rates)
               .select("doc_id").collect())
    assert a == b, "sample must not depend on partitioning"
    by_lang = {r["lang"]: r["n"] for r in
               P.stratified_sample(documents, rates)
               .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang["es"] == totals["es"]                    # rate 1.0 keeps all
    assert 0 < by_lang["en"] < totals["en"] * 0.3           # ~10%
    # strata not in rates use default_rate=0.0 → absent
    assert set(by_lang) <= {"en", "de", "es"}


def test_pack_sequences_budget_and_order(spark, documents):
    budget = 512
    packed = P.pack_sequences(documents, budget=budget).collect()
    by_shard: dict = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:
            assert r["bin"] == cum // budget, (shard, r["doc_id"])
            cum += r["n_tokens"]
        # bins are dense and start at 0
        bins = sorted({r["bin"] for r in rows})
        assert bins == list(range(len(bins)))
    stats = P.pack_stats(P.pack_sequences(documents, budget=budget)).collect()
    # every non-final bin's exclusive start respects the budget boundary:
    # sum over all bins equals the corpus token count
    total = sum(r["sum_tokens"] for r in stats)
    assert total == sum(r["n_tokens"] for r in packed)
