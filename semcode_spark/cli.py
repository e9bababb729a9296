"""Thin CLI mirroring the reference's ingest/query UX (cli.py:119-313)
without the service stack — every command is a Spark job.

    python -m semcode_spark.cli build  --input docs.parquet --output idx/
    python -m semcode_spark.cli query  --index idx/ --query "spark shuffle"
    python -m semcode_spark.cli status --index idx/ --groups 4
    python -m semcode_spark.cli package --out semcode_spark.zip
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="semcode_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--groups", type=int, default=4)
    b.add_argument("--resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k query against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", action="append", required=True)
    q.add_argument("--k", type=int, default=10)

    s = sub.add_parser("status", help="manifest/lineage of an index")
    s.add_argument("--index", required=True)
    s.add_argument("--groups", type=int, default=4)

    p = sub.add_parser("package", help="zip the package for --py-files")
    p.add_argument("--out", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "package":
        from semcode_spark.packaging import make_pyfiles_zip

        print(make_pyfiles_zip(args.out))
        return 0

    from semcode_spark.session import get_spark

    spark = get_spark(f"semcode-{args.cmd}")
    try:
        if args.cmd == "build":
            from semcode_spark.operators.index_build import build_index

            docs = spark.read.parquet(args.input)
            out = build_index(spark, docs, args.output,
                              groups=args.groups, resume=args.resume)
            json.dump(out, sys.stdout)
            print()
        elif args.cmd == "query":
            from semcode_spark.operators.index_build import read_index
            from semcode_spark.operators.query import wand_topk

            idx = read_index(spark, args.index)
            for text in args.query:
                rows = wand_topk(spark, idx, text, k=args.k).collect()
                json.dump({"query": text, "hits": [
                    {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
                    for r in rows]}, sys.stdout)
                print()
        elif args.cmd == "status":
            from semcode_spark.plans.lineage import resume_plan

            json.dump(resume_plan(spark, args.index, args.groups), sys.stdout)
            print()
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
