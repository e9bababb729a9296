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

# Fixed Zipf-ish vocabulary: a few hot terms (low index, high frequency)
# and a long tail — exercises hot-term skew salting (north_rule).
VOCAB = [
    "data", "spark", "query", "index", "the", "page", "web", "search",
    "term", "rank", "score", "text", "token", "crawl", "fetch", "link",
    "table", "join", "merge", "sort", "scan", "filter", "group", "batch",
    "stream", "shard", "block", "delta", "varint", "posting", "wand",
    "bm25", "idf", "corpus", "doc", "stat", "hash", "salt", "skew",
    "bucket", "lexical", "retrieval", "engine", "arrow", "pandas",
    "kernel", "vector", "cosine", "shuffle", "partition",
]


def synth_web_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """n_docs rows of (url, warc_ts, html, text, lang), deterministic in
    (n_docs, seed). Doc lengths vary 5..~200 tokens so BM25 length
    normalization matters; term choice is Zipfian via pmod of a hashed
    counter biased toward low vocabulary indexes."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)

    df = spark.range(n_docs).withColumnRenamed("id", "doc_seq")
    # per-doc token count: 5 + (h % 196)
    h = F.abs(F.xxhash64(F.col("doc_seq"), F.lit(seed)))
    df = df.withColumn("n_tokens", (h % 196 + 5).cast("int"))
    # tokens: for position p, v = (h2 % (h2 % nv + 1)) — squaring the
    # modulus biases toward small indexes → Zipf-ish hot terms.
    df = df.withColumn(
        "toks",
        F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - 1),
            lambda p: F.element_at(
                vocab,
                (
                    F.pmod(
                        F.xxhash64(F.col("doc_seq"), p, F.lit(seed)),
                        F.pmod(F.xxhash64(p, F.col("doc_seq")), F.lit(nv)) + 1,
                    )
                ).cast("int")
                + 1,
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
    # html wraps text; ~1% of rows get a lone 0xFF (invalid UTF-8) injected
    # right after <body> — extraction must ignore it byte-identically.
    html_str = F.format_string(
        "<html><head><title>page %d</title></head><body><p>%s</p></body></html>",
        F.col("doc_seq"), F.col("text"),
    )
    good = F.encode(html_str, "UTF-8")
    head = F.encode(F.format_string(
        "<html><head><title>page %d</title></head><body>", F.col("doc_seq")), "UTF-8")
    tail = F.encode(F.format_string("<p>%s</p></body></html>", F.col("text")), "UTF-8")
    bad = F.concat(head, F.unhex(F.lit("FF")), tail)
    df = df.withColumn(
        "html",
        F.when(F.pmod(F.xxhash64("doc_seq", F.lit(seed + 1)), F.lit(100)) == 0, bad)
        .otherwise(good),
    )
    return df.select("url", "warc_ts", "html", "text", "lang")
