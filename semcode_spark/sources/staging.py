"""Workspace staging sink — the reference's ingest_sources copies
selected sources into a workspace applying ignore globs, with a force
flag controlling overwrite (ingestion/manager.py:81-169, force at
:108-115). Our analog stages a filtered page set as a table: the ignore
filter is a Column predicate (glob → rlike), force maps to write modes,
and on Iceberg this would be createOrReplace / overwritePartitions.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def glob_filter(col: Column | str, ignore_globs: list[str]) -> Column:
    """NOT-LIKE-any predicate from fnmatch-style globs (reference
    builds the same predicate with fnmatch, manager.py:117-122)."""
    c = F.col(col) if isinstance(col, str) else col
    keep = F.lit(True)
    for g in ignore_globs:
        keep = keep & ~c.rlike("^" + fnmatch.translate(g).replace(r"\Z", "$"))
    return keep


def stage_pages(
    pages: DataFrame,
    path: str,
    ignore_globs: list[str] | None = None,
    url_col: str = "url",
    force: bool = False,
) -> int:
    """Copy the filtered corpus into a staging location; returns rows
    staged. force=False refuses to clobber an existing staging area
    (reference: ingest_sources raises unless force, manager.py:108-115)."""
    out = pages
    if ignore_globs:
        out = out.filter(glob_filter(url_col, ignore_globs))
    out = out.dropDuplicates([url_col])
    mode = "overwrite" if force else "errorifexists"
    out.write.mode(mode).parquet(path)
    return out.sparkSession.read.parquet(path).count()
