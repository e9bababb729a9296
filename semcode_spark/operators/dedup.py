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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semcode_spark.functions.tokenize import tokens_col
from semcode_spark.functions.rounding import fround
from semcode_spark.operators.textstats import fingerprint


# ------------------------------------------------------------- exact -------

def exact_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp, group_size, is_dup): is_dup marks every doc that is
    not the smallest doc_id of its fingerprint group (the canonical
    keep-first policy)."""
    from pyspark.sql.window import Window

    # r6: whole-partition window aggregates — ONE shuffle by fp instead
    # of the groupBy + self-join (two exchanges of the fingerprint
    # relation) for the identical rows
    w = Window.partitionBy("fp")
    fp = fingerprint(docs, text_col, id_col)
    return fp.select(
        "doc_id", "fp",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


# ----------------------------------------------------------- shingles ------

def shingle_arrays(docs: DataFrame, n: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shl array<string>) — the distinct word n-grams of each
    doc as ONE array row (the un-exploded form of ``shingles``). Built
    with a JVM transform over token positions (no Python, no shuffle).

    The token array is materialized as a projection FIRST: referencing
    the tokenize expression inside the transform lambda re-evaluates
    the full lower+regex-split once PER ARRAY ELEMENT (higher-order
    functions are interpreted, no common-subexpression elimination
    across lambda invocations — measured 3.6× slower at sf0.1)."""
    from semcode_spark.sources.tables import spread

    # spread first (r6): the whole shingle/hash chain is narrow
    # interpreted compute — a single-split input would run it on one
    # core (guide §2.5; no-op when the scan is already parallel)
    tok_df = spread(docs).select(
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
        "doc_id", F.array_distinct(sh).alias("shl"))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, exploded (the posting
    shape the Jaccard inverted-index candidate generator needs)."""
    return shingle_arrays(docs, n, text_col, id_col).select(
        "doc_id", F.explode("shl").alias("shingle"))


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

def _shingle_minhash_kernel(
    docs: DataFrame, n: int, n_perm: int,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_sh, h1s array<long>, m0..m{n_perm-1}) in ONE Arrow
    kernel (guide §4.2): per task, shingle strings are built in Python,
    md5'd ONCE PER DISTINCT SHINGLE via a task-lifetime cache (the
    synthetic corpus has ~25k distinct shingles behind 7.2M
    occurrences at sf1.0 — the interpreted JVM chain paid the
    md5+conv per OCCURRENCE and was the 6.4 s floor of the r6 minhash
    pipeline), and the n_perm mins come from one numpy broadcast.

    Bit-identical to the expression chain it replaces: the same
    tokenizer output crosses the boundary (tokens_col stays JVM), the
    same md5 nibble split (int(hex[0:15],16), int(hex[15:29],16) mod
    2^55 — both UTF-8, both overflow-free int64), the same
    min(h1 + p·h2) family, and n_sh = |distinct shingles|. Docs
    shorter than n tokens are filtered JVM-side exactly as before."""
    import hashlib

    from semcode_spark.sources.tables import spread

    tok_df = (spread(docs)
              .select(F.col(id_col).alias("doc_id"),
                      tokens_col(text_col).alias("_toks"))
              .filter(F.size(F.col("_toks")) >= n))

    def kernel(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        cache: dict[str, tuple[int, int]] = {}
        perms = np.arange(n_perm, dtype=np.int64)

        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0)
            toks_col = rb.column(1)
            n_docs = rb.num_rows
            nsh = np.empty(n_docs, dtype=np.int32)
            mins = np.empty((n_docs, n_perm), dtype=np.int64)
            h1s: list[np.ndarray] = []
            for i in range(n_docs):
                toks = toks_col[i].as_py()
                seen: dict[str, None] = {}
                h1l: list[int] = []
                h2l: list[int] = []
                for j in range(len(toks) - n + 1):
                    sh = " ".join(toks[j:j + n])
                    if sh in seen:
                        continue
                    seen[sh] = None
                    hv = cache.get(sh)
                    if hv is None:
                        d = hashlib.md5(sh.encode()).hexdigest()
                        hv = (int(d[:15], 16), int(d[15:29], 16) % (1 << 55))
                        cache[sh] = hv
                    h1l.append(hv[0])
                    h2l.append(hv[1])
                h1 = np.asarray(h1l, dtype=np.int64)
                h2 = np.asarray(h2l, dtype=np.int64)
                nsh[i] = h1.size
                mins[i] = (h1[None, :] + perms[:, None] * h2[None, :]).min(axis=1)
                h1s.append(h1)
            cols = {
                "doc_id": ids,
                "n_sh": pa.array(nsh),
                "h1s": pa.array([a.tolist() for a in h1s],
                                type=pa.list_(pa.int64())),
            }
            for p in range(n_perm):
                cols[f"m{p}"] = pa.array(mins[:, p])
            yield from pa.table(cols).to_batches()

    schema = ("doc_id long, n_sh int, h1s array<long>, "
              + ", ".join(f"m{p} long" for p in range(n_perm)))
    return tok_df.mapInArrow(kernel, schema=schema)


def minhash_signature(
    docs: DataFrame, n_perm: int = 16, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[n_perm]) — MinHash over word shingles."""
    mh = _shingle_minhash_kernel(docs, n, n_perm, text_col, id_col)
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
    # r6 shape (guide §2.3/§2.4/§4.2): everything is derived from ONE
    # cached per-doc relation (doc_id, n_sh, h1s, m0..m15) produced by
    # the Arrow minhash kernel — shingles are built and md5'd once per
    # DISTINCT shingle per task, mins come from one numpy broadcast,
    # and candidate verification intersects the 60-bit hash arrays.
    # The r5 shape shuffled the exploded shingle-string relation three
    # times (minhash groupBy, sizes groupBy, candidates×shingles
    # explode-join) and re-built/re-hashed shingle strings per
    # consumer; an intermediate r6 shape kept the per-occurrence
    # interpreted md5+conv chain, whose cache materialization alone
    # was 6.4 s at sf1.0.
    #
    # Hash-based |A∩B|: h1 is the same 60-bit md5 prefix the minhash
    # permutations use; distinct shingle strings map to distinct h1s
    # unless md5 collides within one pair's ~2·|A| shingle union —
    # P ≈ |A∪B|²/2^61 ≈ 2e-14 per pair, orders of magnitude below the
    # float-rounding tolerance the engine already relies on vs the
    # oracle. |A| / |B| use the exact shingle-array sizes.
    arrs = _shingle_minhash_kernel(docs, n, n_perm, text_col, id_col) \
        .persist()
    mh = arrs.select("doc_id", *[F.col(f"m{p}") for p in range(n_perm)])
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
    # pair space — that degenerates to ~n² when the vocabulary is
    # small). |A∩B| via array_intersect on the cached h1 arrays (see
    # header comment), |A∪B| = |A|+|B|−|∩| — the only rows shuffled are
    # the candidate pairs themselves plus the two hash arrays they
    # touch.
    sha = arrs.select(F.col("doc_id").alias("a"),
                      F.col("h1s").alias("h_a"), F.col("n_sh").alias("na"))
    shb = arrs.select(F.col("doc_id").alias("b"),
                      F.col("h1s").alias("h_b"), F.col("n_sh").alias("nb"))
    result = (
        cand.join(sha, "a").join(shb, "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("h_a", "h_b")).alias("inter"),
            "na", "nb")
        .withColumn("jaccard", fround(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if eager:
        # materialize the result (near-dup pairs: tiny vs the shingle
        # relation), cut its lineage, then release the array cache NOW
        result = result.localCheckpoint(eager=True)
        arrs.unpersist()
    return result


# ------------------------------------------------------------ simhash ------

def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash long): tf-weighted sign votes per bit of the
    term's md5-derived integer; docs with zero tokens emit no row
    (the exploded-aggregate contract this kernel replaces).

    r6 (guide §4.2): ONE Arrow kernel — per task, md5 is computed once
    per DISTINCT token (a task-lifetime cache; Σ_term tf·sign ≡
    Σ_token sign, so per-occurrence dict lookups suffice), the per-bit
    vote counts are ``bits`` vectorized reduceats over the batch's
    flat hash stream, and the sign test ``2·ones_b > cnt`` (≡ votes_b
    > 0) assembles the hash in uint64 then reinterprets as int64 —
    the same two's-complement wrap as the JVM's ``1L << 63`` for
    bits=64. Replaces the r5 shape's per-token-occurrence md5 plus a
    ``bits``-buffer hash aggregate (measured 1.9-2.0 → ~0.6 s at
    sf1.0, bit-identical, oracle-verified)."""
    from semcode_spark.sources.tables import spread

    tok_df = (spread(docs)
              .select(F.col(id_col).alias("doc_id"),
                      tokens_col(text_col).alias("_toks"))
              .filter(F.size(F.col("_toks")) >= 1))

    def kernel(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        cache: dict[str, int] = {}
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0)
            toks_col = rb.column(1)
            n_docs = rb.num_rows
            # per-token hashes WITHOUT a per-token Python loop: Arrow
            # dictionary-encodes the flattened token stream (C++), md5
            # runs only on the batch's distinct tokens, and a numpy
            # gather expands back to per-occurrence hashes
            counts = pc.list_value_length(toks_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            de = pc.dictionary_encode(pc.list_flatten(toks_col))
            if isinstance(de, pa.ChunkedArray):
                de = de.combine_chunks()
            vals = de.dictionary.to_pylist()
            hv = np.empty(len(vals), dtype=np.uint64)
            for j, t in enumerate(vals):
                v = cache.get(t)
                if v is None:
                    v = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    cache[t] = v
                hv[j] = v
            h = hv[de.indices.to_numpy(zero_copy_only=False)]
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sim = np.zeros(n_docs, dtype=np.uint64)
            for b in range(bits):
                ones = np.add.reduceat((h >> np.uint64(b)) & np.uint64(1),
                                       starts)
                sim |= (2 * ones > counts.astype(np.uint64)).astype(
                    np.uint64) << np.uint64(b)
            yield from pa.table({
                "doc_id": ids,
                "simhash": pa.array(sim.view(np.int64)),
            }).to_batches()

    return tok_df.mapInArrow(kernel, schema="doc_id long, simhash long")


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
