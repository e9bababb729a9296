"""Cross-engine hash parity — the foundation of every oracle check."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from semcode_spark.functions.hashing import md5_long_col, md5_long_sql, minhash_col


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize("s", ["hello", "", "0:w123", "a b c", "ünïcode", "x" * 500])
def test_md5_long_parity(spark, con, s):
    got = spark.range(1).select(md5_long_col(F.lit(s))).collect()[0][0]
    want = con.sql(f"SELECT {md5_long_sql('?')}", params=[s]).fetchone()[0]
    py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert got == want == py


def test_minhash_col_matches_python(spark):
    toks = ["aa bb cc", "bb cc dd", "cc dd ee"]
    got = spark.range(1).select(
        minhash_col(F.array(*[F.lit(t) for t in toks]), perm=3)
    ).collect()[0][0]
    want = min(int(hashlib.md5(f"3:{t}".encode()).hexdigest()[:15], 16) for t in toks)
    assert got == want


def test_md5_long_range(spark):
    # 15 hex nibbles → always fits in a non-negative 60-bit long
    vals = spark.range(200).select(
        md5_long_col(F.col("id").cast("string")).alias("h")).collect()
    assert all(0 <= r["h"] < 2**60 for r in vals)
