"""Portable deterministic hashing.

The reference derives stable ids with md5 over a composite key
(reference: services/indexer.py:185-188). We keep md5 as the hash family
because it is bit-identical across Spark (`md5` + `conv`) and DuckDB
(`md5` + hex-literal cast) — which lets every hash-based operator
(doc ids, MinHash, SimHash, LSH bands) be verified against an ANSI-SQL
oracle. Engine-private hashes (e.g. xxhash64) would be faster but
unverifiable; md5 cost is amortized inside codegen.

Parity contract (validated in tests/test_hashing.py):
  Spark : conv(substring(md5(s), 1, 15), 16, 10)  → decimal-string → long
  DuckDB: ('0x' || substr(md5(s), 1, 15))::bigint
Both yield the same unsigned 60-bit integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long_col(c: Column, nibbles: int = 15, offset: int = 1) -> Column:
    """60-bit (default) integer from md5 hex substring; portable to DuckDB."""
    return F.conv(F.substring(F.md5(c), offset, nibbles), 16, 10).cast("long")


def md5_long_sql(expr: str, nibbles: int = 15, offset: int = 1) -> str:
    """The DuckDB-side twin of md5_long_col, as a SQL fragment."""
    return f"(('0x' || substr(md5({expr}), {offset}, {nibbles}))::bigint)"


def minhash_col(tokens: Column, perm: int) -> Column:
    """One MinHash permutation over an array<string> of shingles/tokens:
    min over elements of md5_long('{perm}:' || elem). Vectorized JVM-side
    via transform + array_min — no Python, no UDF."""
    hashed = F.transform(
        tokens, lambda t: md5_long_col(F.concat(F.lit(f"{perm}:"), t))
    )
    return F.array_min(hashed)
