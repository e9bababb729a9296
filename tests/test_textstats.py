"""Text-analysis operators on known strings."""

import pytest

from semcode_spark.operators import textstats as T


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "the quick fox and the lazy dog in a field"),
        (1, "el que no la de los un en y el"),
        (2, "der die und das ist ein nicht mit"),
        (3, "xyzzy plugh"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(tiny):
    out = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(tiny).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "de"
    assert out[3] == "und" and out[4] == "und"


def test_token_count(tiny):
    out = {r["doc_id"]: r for r in T.token_count(tiny).collect()}
    assert out[0]["n_tokens"] == 10
    assert out[4]["n_tokens"] == 0 and out[4]["n_subwords"] == 0
    # "xyzzy plugh": ceil(5/4)+ceil(5/4) = 4
    assert out[3]["n_subwords"] == 4


def test_quality_score_bounds(documents):
    rows = T.quality_score(documents).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(0.0 <= r["stop_ratio"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "hello,world!")],
        "doc_id long, text string")
    fps = {r["doc_id"]: r["fp"] for r in T.fingerprint(df).collect()}
    assert fps[0] == fps[1] == fps[2]  # case/space/punct-insensitive
