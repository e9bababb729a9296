"""Byte-identical extraction invariant (input_hint) + fixture shape."""

from pyspark.sql import functions as F

from semcode_spark.functions.extract import extract_text, extract_text_py
from semcode_spark.sources.webpages import synth_web_pages


def test_web_pages_shape(spark):
    df = synth_web_pages(spark, 200)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["html"] == "binary" and types["warc_ts"] == "timestamp"
    assert df.count() == 200
    assert df.select("url").distinct().count() == 200


def test_deterministic(spark):
    a = synth_web_pages(spark, 50).orderBy("url").collect()
    b = synth_web_pages(spark, 50).orderBy("url").collect()
    assert a == b


def test_extraction_byte_identical(spark):
    """Engine-extracted text == golden text column, per url, including
    the ~1% rows with injected invalid UTF-8 (errors='ignore' semantics,
    reference: tree_sitter_chunker.py:162-163)."""
    pages = synth_web_pages(spark, 500)
    mismatch = (
        pages.withColumn("extracted", extract_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatch == 0
    # the corpus really does contain invalid-UTF-8 rows (the interesting case)
    n_bad = pages.filter(F.hex(F.substring("html", 1, 1)) == "FF").count()
    assert n_bad > 0
    # and realistic boilerplate that extraction must strip
    assert pages.select(F.avg(F.length("html"))).collect()[0][0] > 10000


def test_extract_py_fallback_and_null():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"plain <b>no body tag</b> here") == "plain no body tag here"
    assert extract_text_py("<body>a\xff b</body>".encode("latin-1")) == "a b"


def test_extract_metadata_struct(spark):
    """T6 doc-metadata surface: title / link count / headings /
    article flag parsed from the html column (the web-page analog of the
    reference's primary-symbol heuristic)."""
    from semcode_spark.functions.extract import extract_metadata
    from semcode_spark.sources.webpages import synth_web_pages
    import pyspark.sql.functions as F

    pages = synth_web_pages(spark, 50)
    got = pages.select(
        "url", extract_metadata(F.col("html")).alias("m")
    ).select("url", "m.*").collect()
    assert len(got) == 50
    for r in got:
        seq = int(r["url"].rsplit("/", 1)[-1])
        assert r["title"] == f"page {seq}"
        assert r["n_links"] == 40          # nav repeats 40 anchors
        assert r["n_headings"] == 0
        assert r["has_article"] is True


def test_extract_metadata_edge_cases(spark):
    from semcode_spark.functions.extract import extract_metadata_py

    assert extract_metadata_py(None) == ("", 0, 0, False)
    assert extract_metadata_py(b"<html><body>plain</body></html>") == ("", 0, 0, False)
    t, links, heads, art = extract_metadata_py(
        b"<title>A\n  B</title><h1>x</h1><h2>y</h2><a href='u'>l</a><article>")
    assert (t, links, heads, art) == ("A B", 1, 2, True)
