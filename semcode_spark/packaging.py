"""Packaging for spark-submit --py-files / multi-executor dispatch.

``make_pyfiles_zip()`` zips the package for shipping to executors
(north_rule: pipeline packaged for spark-submit --py-files execution);
``ship_package(spark)`` attaches it to a live session so executor-side
Python workers can import semcode_spark (required under any
multi-executor master, e.g. local-cluster or a real cluster).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def make_pyfiles_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(tempfile.gettempdir(), "semcode_spark.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join("semcode_spark", os.path.relpath(full, _PKG_DIR))
                z.write(full, rel)
    return out_path


def ship_package(spark) -> str:
    zip_path = make_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
