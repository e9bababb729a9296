"""Training-data pipeline operators beyond the reference's surface:
PII scrubbing, deterministic stratified sampling, sequence packing.

All three are pure JVM column expressions (codegen; no Python, no UDF)
and each has a bit-exact DuckDB oracle (__spark_entry__):

- ``pii_scrub``: mask emails / URLs / long digit runs with regex
  families chosen to behave identically under Java regex (Spark) and
  RE2 (DuckDB) — character classes only, no lookaround.
- ``stratified_sample``: per-stratum deterministic sampling by the
  portable md5 hash (functions/hashing.py) of the doc id — the same
  rows are selected on every engine, every run, any cluster size
  (reproducible training subsets; no RNG, no seed drift).
- ``pack_sequences``: assign docs to fixed token-budget bins (context
  windows) by running-token-count within a shard. Packing is windowed
  PER SHARD (source/domain), so at 10^12 docs the cumulative-sum window
  parallelizes across shards instead of serializing on one global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semcode_spark.functions.hashing import md5_long_col
from semcode_spark.functions.tokenize import tokens_col
from semcode_spark.sources.tables import spread

# Java-regex ∩ RE2 compatible patterns (character classes only)
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
URL_RE = "https?://[^ ]+"
LONG_NUM_RE = "[0-9]{6,}"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean, n_urls, n_emails, n_nums): text with URLs, then
    emails, then ≥6-digit runs masked; per-doc match counts. Masking
    order matters (emails inside URLs must count as URL)."""
    docs = spread(docs)  # regex-heavy narrow chain: run on all cores (r6)
    t = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0)))
    after_url = F.regexp_replace(t, URL_RE, "<URL>")
    n_emails = F.size(F.regexp_extract_all(after_url, F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(after_url, EMAIL_RE, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(after_email, F.lit(LONG_NUM_RE), F.lit(0)))
    clean = F.regexp_replace(after_email, LONG_NUM_RE, "<NUM>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean"),
        n_urls.cast("long").alias("n_urls"),
        n_emails.cast("long").alias("n_emails"),
        n_nums.cast("long").alias("n_nums"),
    )


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0, stratum_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    md5_long(doc_id) % 10000 < rate·10000 for its stratum's rate.
    Hash-based, so the subset is stable across engines/runs/partitions
    — the reproducibility property a training-data pipeline needs
    (sampling with rand(seed) varies with partitioning)."""
    h = F.pmod(md5_long_col(F.col(id_col).cast("string")), F.lit(10_000))
    expr = F.lit(int(default_rate * 10_000))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == stratum,
                      F.lit(int(rate * 10_000))).otherwise(expr)
    return docs.filter(h < expr)


def pack_sequences(docs: DataFrame, budget: int = 512,
                   shard_col: str = "source", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(shard, doc_id, n_tokens, bin): assign docs to fixed token-budget
    context windows by exclusive running token count within a shard —
    bin = floor((cumsum − n_tokens) / budget), docs in doc_id order.

    The window partitions by shard (source/domain), never globally:
    packing parallelizes across shards (one global orderBy would
    serialize 10^12 rows through one partition). Deterministic: same
    bins on any cluster."""
    sized = spread(docs).select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        "shard", "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("bin"),
    )


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-(shard, bin) packing stats: docs per window, token fill."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
