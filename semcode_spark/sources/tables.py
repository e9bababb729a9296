"""Parquet/Iceberg table sources.

The reference's sources are a recursive file walk with suffix filtering
and dir pruning (reference: ingestion/manager.py:179-193, cli.py:49-72);
ours are table scans — Catalyst does the pruning (PushDownPredicate +
column pruning reach the parquet reader; verified in
tests/test_plans.py). At production scale these would be Iceberg tables
(`spark.read.table`); the sandbox uses plain parquet files, same plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus being indexed: (doc_id, text, lang, source, n_chars)."""
    return load_table(spark, sf_dir, "documents")
