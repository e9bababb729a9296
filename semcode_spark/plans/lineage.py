"""Lineage / checkpoint inspection — the catalog surface.

The reference keeps a JSON registry of what was indexed
(storage/registry.py:21-62) and per-job staged progress
(api/jobs.py:17-30); our equivalents are the `manifest` and `metrics`
tables every build writes. These helpers are the read side: what is
built, what remains, what each stage cost — the inputs to an exact
resume (north_rule: interrupted 10^12-doc runs resume exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "manifest"))


def read_metrics(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "metrics"))


def resume_plan(spark: SparkSession, index_dir: str, groups: int) -> dict:
    """What a resumed build would do: completed vs pending groups —
    scoped to the CURRENT version, matching build_index's own resume
    logic (rows from aborted other-version rewrites don't count)."""
    from semcode_spark.sources.tableio import read_current_version

    try:
        man = read_manifest(spark, index_dir)
    except Exception:
        return {"completed": [], "pending": list(range(groups)),
                "stats_done": False, "version": None}
    version = read_current_version(index_dir)
    rows = man.filter(
        (F.col("status") == "completed")
        & (F.col("version") == F.lit(version if version is not None else -1))
    ).collect()
    done_groups = sorted({r["group"] for r in rows if r["stage"] == "postings"})
    return {
        "completed": done_groups,
        "pending": [g for g in range(groups) if g not in done_groups],
        "stats_done": any(r["stage"] == "stats" for r in rows),
        "version": version,
    }
