"""Cross-engine deterministic rounding.

``round()`` half-way behavior differs across engines (HALF_UP vs
HALF_EVEN), and our oracle checks hash values bit-exactly. So every
*computed* double that leaves the engine goes through the explicit
half-up formula ``floor(x·10^d + 0.5) / 10^d`` — identical in Spark and
DuckDB given identical inputs. Raw doubles read straight from parquet
are emitted unrounded (bit-identical by construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(c: Column, digits: int = 4) -> Column:
    f = 10 ** digits
    return F.floor(c * f + F.lit(0.5)) / f


def fround_sql(expr: str, digits: int = 4) -> str:
    f = 10 ** digits
    return f"(floor(({expr}) * {f} + 0.5) / {f})"
