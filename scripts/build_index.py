"""spark-submit entry point: build the inverted index.

    spark-submit --py-files semcode_spark.zip scripts/build_index.py \
        --input /path/to/documents.parquet --output /path/to/index \
        [--groups 8] [--resume] [--webtext N]

With --webtext N, a deterministic synthetic web_pages corpus of N rows
is generated, html→text extracted, and indexed (the full ingest path of
SURVEY §3.1). Packaging mirrors the north_rule's spark-submit --py-files
requirement; on a cluster, drop the master override and submit as usual.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet of (doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--webtext", type=int, default=0,
                    help="generate+index N synthetic web pages instead of --input")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from semcode_spark.session import get_spark
    from semcode_spark.operators.index_build import build_index

    spark = get_spark("semcode-build", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    if args.webtext:
        from semcode_spark.functions.extract import extract_text
        from semcode_spark.sources.webpages import synth_web_pages

        pages = synth_web_pages(spark, args.webtext)
        docs = pages.select(
            F.xxhash64("url").alias("doc_id"),
            extract_text(F.col("html")).alias("text"),
        )
    else:
        if not args.input:
            ap.error("--input or --webtext required")
        docs = spark.read.parquet(args.input)

    summary = build_index(spark, docs, args.output,
                          groups=args.groups, resume=args.resume)
    json.dump(summary, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
