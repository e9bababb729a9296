"""Analyzer variants: JVM array results == driver-side query twin."""

import pytest
from pyspark.sql import functions as F

from semcode_spark.functions.analyzers import analyze_query, analyzer


CASES = [
    "The running dogs jumped over boxes",
    "a an and stopwords only the",
    "indexing merges postings blocks",
    "",
]


@pytest.mark.parametrize("name", ["standard", "stop", "stem", "stop_stem"])
def test_spark_matches_driver_twin(spark, name):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "id long, text string")
    toks = analyzer(name)
    got = {r["id"]: r["t"] for r in
           df.select("id", toks("text").alias("t")).collect()}
    for i, text in enumerate(CASES):
        assert got[i] == analyze_query(name, text), (name, text)


def test_stopwords_removed(spark):
    out = analyze_query("stop", "the quick and the dead")
    assert out == ["quick", "dead"]


def test_stemming(spark):
    assert analyze_query("stem", "running jumped boxes") == ["runn", "jump", "box"]
    # stems shorter than 3 chars are kept whole
    assert analyze_query("stem", "is as") == ["is", "as"]


def test_unknown_analyzer_rejected():
    with pytest.raises(ValueError):
        analyzer("bogus")
