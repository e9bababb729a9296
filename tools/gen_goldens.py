"""Generate golden top-k files (FIXTURES.md §3) from the pure-Python
oracle: (query_id, rank, doc_id, score) for the reference query set,
one CSV per scale factor. Committed to the repo so the ranking contract
is inspectable and drift-detectable (a change to tokenizer/BM25/ordering
fails tests/test_goldens.py even if engine and oracle move together).

Usage: python tools/gen_goldens.py [sf_dir ...]
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from semcode_spark.fixtures.queries import REFERENCE_QUERIES  # noqa: E402
from semcode_spark.oracle import BM25Oracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens")


def generate(sf_dir: str) -> str:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    oracle = BM25Oracle({d: t for d, t in rows})
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out_path = os.path.join(GOLDEN_DIR, f"golden_topk_{sf}.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query_id", "rank", "doc_id", "score"])
        for qid, text, k in REFERENCE_QUERIES:
            for rank, (doc_id, score) in enumerate(oracle.topk(text, k=k), 1):
                w.writerow([qid, rank, doc_id, f"{score:.9f}"])
    return out_path


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for d in dirs:
        print(generate(d))
