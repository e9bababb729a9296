"""Deterministic synthetic ``web_pages`` corpus (exact input_hint shape):

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generated fully inside Spark (``spark.range`` → codegen'd column
expressions) so the same generator scales from 200 rows (unit tests) to
hundreds of millions on a cluster with no driver-side materialization —
the fixture analog of the reference's deterministic stubs
(tests/integration/test_indexer_service.py:7-13). Seeded, no wall-clock.

~1% of rows get an invalid-UTF-8 byte injected into ``html`` to exercise
errors="ignore" decoding (reference decodes file bytes the same way,
chunking/tree_sitter_chunker.py:162-163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zipf-ish vocabulary of VOCAB_SIZE synthetic terms w0..w{V-1}: low
# indexes are hot (stopword-like, exercising skew salting), the tail is
# rare — realistic web-scale term distribution without a word list.
VOCAB_SIZE = 20000


def synth_web_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """n_docs rows of (url, warc_ts, html, text, lang), deterministic in
    (n_docs, seed). Doc lengths vary 5..~200 tokens so BM25 length
    normalization matters; term choice is Zipfian via pmod of a hashed
    counter biased toward low vocabulary indexes."""
    df = spark.range(n_docs).withColumnRenamed("id", "doc_seq")
    # per-doc token count: 5 + (h % 196)
    h = F.abs(F.xxhash64(F.col("doc_seq"), F.lit(seed)))
    df = df.withColumn("n_tokens", (h % 196 + 5).cast("int"))
    # token at position p: index = h1 % (h2 % V + 1) — the nested modulus
    # biases toward small indexes (Zipf-ish: w0/w1 are stopword-hot,
    # the tail is rare), term = "w" + index.
    df = df.withColumn(
        "toks",
        F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - 1),
            lambda p: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(F.col("doc_seq"), p, F.lit(seed)),
                    F.pmod(F.xxhash64(p, F.col("doc_seq")), F.lit(VOCAB_SIZE)) + 1,
                ).cast("string"),
            ),
        ),
    )
    df = (
        df.withColumn("text", F.concat_ws(" ", "toks"))
        .withColumn("url", F.format_string("https://site%d.example/page/%d",
                                           F.pmod(F.col("doc_seq"), F.lit(97)).cast("int"),
                                           F.col("doc_seq")))
        .withColumn(
            "warc_ts",
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_seq").cast("double") * 137),
        )
        .withColumn(
            "lang",
            F.when(F.pmod(F.col("doc_seq"), F.lit(20)) == 19, F.lit("es"))
            .when(F.pmod(F.col("doc_seq"), F.lit(20)) == 18, F.lit("de"))
            .otherwise(F.lit("en")),
        )
    )
    # html wraps the text in realistic web boilerplate (style/nav/script/
    # footer — ~14 KB per page, like real Common-Crawl HTML) that the
    # extractor must strip; ~1% of rows get a leading 0xFF (invalid
    # UTF-8) so errors="ignore" decoding is exercised. The golden `text`
    # column is exactly the expected extraction output.
    style = F.repeat(
        F.format_string(".c%d{margin:0;padding:1px;color:#1a2b3c;display:flex}",
                        F.col("doc_seq")), 80)
    nav = F.repeat(
        F.format_string("<a href=\"/s%d/p\">section</a><span>|</span>",
                        F.col("doc_seq")), 40)
    script = F.repeat(
        F.format_string("var x%d=[1,2,3];function f(a){return a*%d+1;}",
                        F.col("doc_seq"), F.pmod(F.col("doc_seq"), F.lit(97))), 160)
    html_str = F.concat(
        F.format_string("<html><head><title>page %d</title><style>", F.col("doc_seq")),
        style,
        F.lit("</style></head><body><nav>"),
        nav,
        F.lit("</nav><article><p>"),
        F.col("text"),
        F.lit("</p></article><script>"),
        script,
        F.format_string("</script><footer>site %d</footer></body></html>",
                        F.col("doc_seq")),
    )
    good = F.encode(html_str, "UTF-8")
    bad = F.concat(F.unhex(F.lit("FF")), good)
    df = df.withColumn(
        "html",
        F.when(F.pmod(F.xxhash64("doc_seq", F.lit(seed + 1)), F.lit(100)) == 0, bad)
        .otherwise(good),
    )
    return df.select("url", "warc_ts", "html", "text", "lang")
