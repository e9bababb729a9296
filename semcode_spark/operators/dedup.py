"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 10^12 docs:
- exact dedup = hash-groupBy on the content fingerprint — one shuffle,
  map-side combine, AQE-coalesced.
- near-dup never does the O(n²) cross join: candidates come from an
  inverted index (shared shingle / shared LSH band / simhash prefix
  bucket), i.e. a self-equi-join on a posting-style relation — the same
  shuffle shape as the BM25 index build.
- the hash family is md5 (functions/hashing.py) so every operator has a
  bit-exact DuckDB oracle; swap in xxhash64 for raw speed if oracle
  parity is not needed.

All shingling/minhashing is JVM higher-order functions (transform /
array_min / aggregate) — zero Python in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semcode_spark.functions.hashing import md5_long_col
from semcode_spark.functions.tokenize import tokens_col
from semcode_spark.functions.rounding import fround
from semcode_spark.operators.textstats import fingerprint


# ------------------------------------------------------------- exact -------

def exact_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp, group_size, is_dup): is_dup marks every doc that is
    not the smallest doc_id of its fingerprint group (the canonical
    keep-first policy)."""
    fp = fingerprint(docs, text_col, id_col)
    grp = fp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("keep_id"),
    )
    return (
        fp.join(grp, "fp")
        .select(
            "doc_id", "fp", "group_size",
            (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
        )
    )


# ----------------------------------------------------------- shingles ------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams. Built with a JVM
    transform over token positions (no Python, no window shuffle).

    The token array is materialized as a projection FIRST: referencing
    the tokenize expression inside the transform lambda re-evaluates
    the full lower+regex-split once PER ARRAY ELEMENT (higher-order
    functions are interpreted, no common-subexpression elimination
    across lambda invocations — measured 3.6× slower at sf0.1)."""
    tok_df = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # docs shorter than n tokens produce no shingles — filtered ONCE on
    # the token array (r4; the previous shape emitted a degenerate
    # shingle for them and re-split every shingle string downstream to
    # drop it: a full regex pass over the shingle relation for a
    # handful of short docs)
    return tok_df.filter(F.size(toks) >= n).select(
        "doc_id",
        F.explode(F.array_distinct(sh)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) with a < b and jaccard ≥ threshold.

    Candidates via the shingle inverted index (self-join on shingle),
    |A∩B| from the join, |A∪B| = |A|+|B|−|∩|. Exact, not approximate.
    """
    sh = shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    left = sh.alias("l")
    right = sh.alias("r")
    inter = (
        left.join(right, (F.col("l.shingle") == F.col("r.shingle"))
                  & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", fround(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ------------------------------------------------------------ minhash ------

def _minhash_cols(sh: DataFrame, n_perm: int) -> DataFrame:
    """(doc_id, m0..m{n_perm-1}) — MinHash as ONE hash aggregate with
    n_perm min buffers: shuffle rows = the shingle relation itself, not
    shingles × n_perm (an earlier explode-per-permutation shape shuffled
    16× the volume for identical results).

    Carter-Wegman permutations over ONE md5 per shingle: the digest's
    nibbles 1-15 give h1 (60 bits) and 16-29 give h2 (taken mod 2^55);
    permutation p's hash is h1 + p·h2 — for p ≤ 63 this stays under
    2^61, so the arithmetic is overflow-free in both Spark (wrapping
    longs never trip) and DuckDB (which *errors* on bigint overflow) —
    md5 work drops 16× vs hashing 'p:shingle' per permutation."""
    base = sh.select(
        "doc_id",
        md5_long_col(F.col("shingle")).alias("h1"),
        (F.conv(F.substring(F.md5(F.col("shingle")), 16, 14), 16, 10).cast("long")
         % F.lit(1 << 55)).alias("h2"),
    )
    return base.groupBy("doc_id").agg(*[
        F.min(F.col("h1") + p * F.col("h2")).alias(f"m{p}")
        for p in range(n_perm)
    ])


def minhash_signature(
    docs: DataFrame, n_perm: int = 16, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[n_perm]) — MinHash over word shingles."""
    mh = _minhash_cols(shingles(docs, n, text_col, id_col), n_perm)
    return mh.select(
        "doc_id", F.array(*[F.col(f"m{p}") for p in range(n_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, n_perm: int = 16, bands: int = 4, threshold: float = 0.5,
    n: int = 3, text_col: str = "text", id_col: str = "doc_id",
    eager: bool = False,
) -> DataFrame:
    """LSH-banded near-dup detection: band key = md5 over the band's
    signature slice → docs sharing any band are candidates → verified
    with exact shingle Jaccard ≥ threshold. Output (a, b, jaccard).

    At 10^12 docs the band join is the only shuffle that matters; band
    keys are uniform md5 values so it is skew-free by construction.

    ``eager=False`` (default) returns the lazy, fully fault-tolerant
    plan (batch-pipeline composition); the caller owns the shingle-cache
    lifetime via Spark's LRU/ContextCleaner. ``eager=True`` is a
    single-process serving convenience: it materializes the (small)
    result via localCheckpoint and deterministically unpersists the
    shared shingle cache before returning. localCheckpoint stores the
    result in executor-local (non-replicated) storage — on a multi-node
    cluster an executor loss makes it unrecoverable, so eager is
    opt-in, never the default."""
    rows_per_band = n_perm // bands
    # the shingle relation feeds minhashing AND the verify stage — cache it
    sh_cached = shingles(docs, n, text_col, id_col).persist()
    mh = _minhash_cols(sh_cached, n_perm)
    # band keys row-wise from the signature columns (no second shuffle:
    # the per-(doc, band) collect_list agg an earlier shape used is pure
    # overhead once the signature is columnar)
    band_keys = F.array(*[
        F.md5(F.concat_ws(",", *[
            F.col(f"m{b * rows_per_band + i}").cast("string")
            for i in range(rows_per_band)
        ]))
        for b in range(bands)
    ])
    banded = (
        mh.select("doc_id", F.explode(band_keys).alias("band_key"))
        .distinct()
    )
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), (F.col("l.band_key") == F.col("r.band_key"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    # verify ONLY the LSH candidates (never the full shingle-sharing
    # pair space — that degenerates to ~n² when the vocabulary is small)
    sh = sh_cached
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), F.col("shingle").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("bb"), F.col("shingle").alias("sh_b"))
    with_a = cand.join(sha, "a")
    inter = (
        with_a.join(shb, (with_a["b"] == shb["bb"]) & (with_a["sh_a"] == shb["sh_b"]))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    result = (
        inter.join(sa, "a").join(sb, "b")
        .withColumn("jaccard", fround(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if eager:
        # materialize the result (near-dup pairs: tiny vs the shingle
        # relation), cut its lineage, then release the shingle cache NOW
        result = result.localCheckpoint(eager=True)
        sh_cached.unpersist()
    return result


# ------------------------------------------------------------ simhash ------

def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash long): tf-weighted sign votes per bit of the
    term's md5-derived integer. ONE hash aggregate with ``bits``
    conditional-sum buffers straight over the token stream: since
    Σ_term tf·sign(bit) ≡ Σ_token sign(bit), the (doc_id, term) tf
    pre-aggregation is pure waste — dropping it removes a whole
    shuffle (r4; measured 1.75 s → 1.3 s at sf0.1 and bit-identical),
    and the surviving exchange carries only the map-side-combined
    per-doc vote partials, never the token rows. (r2 note still holds:
    an explode-per-bit shape shuffles 32× this volume; and r1's
    two-shuffle tf form is what this replaces.)"""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )
    h = toks.withColumn("h", md5_long_col(F.col("term")))
    votes = h.groupBy("doc_id").agg(*[
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(bits)
    ])
    # shift via SQL expr, not F.lit(1 << b): a Python literal 1<<63
    # exceeds LongType range (bits=64 is the standard simhash width)
    sim = reduce(
        lambda acc, b: acc + F.when(
            F.col(f"v{b}") > 0, F.expr(f"cast(1 as bigint) << {b}")
        ).otherwise(F.lit(0).cast("long")),
        range(1, bits),
        F.when(F.col("v0") > 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_neardups(docs: DataFrame, bits: int = 32, max_hamming: int = 3,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming. Candidates via the
    pigeonhole trick: split the hash into (max_hamming+1) chunks — a
    pair within distance d must agree exactly on ≥1 chunk → equi-join
    per chunk, then verify with bit_count(xor). Never a cross join."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    sh = simhash(docs, bits, text_col, id_col)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("c"),
                F.shiftright(F.col("simhash"), c * chunk_bits)
                .bitwiseAND((1 << chunk_bits) - 1).alias("v"),
            )
            for c in range(n_chunks)
        ])).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"),
              (F.col("l.c") == F.col("r.c")) & (F.col("l.v") == F.col("r.v"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
