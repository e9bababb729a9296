"""Incremental / streaming index maintenance.

The reference's async-job subsystem (staged, resumable ingestion —
api/main.py:142-161,246-325) maps to Structured Streaming with
``trigger(availableNow=True)``: each micro-batch is a checkpointed,
exactly-once increment. Two surfaces:

- ``incremental_index``: stream new document files → per-batch tf
  deltas merged into the flat postings store via idempotent
  partitioned writes (at production scale: Iceberg MERGE INTO keyed on
  (term, doc_id); parquet append per micro-batch here).
- ``windowed_event_stats``: the event-time windowed aggregation surface
  (watermark + tumbling window), the streaming analog of the telemetry
  stats table (api/telemetry.py:24-37).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semcode_spark.functions.rounding import fround
from semcode_spark.operators.index_build import term_doc_tf


def incremental_index(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    schema: str = "doc_id long, text string, lang string, source string, n_chars long",
    max_files_per_trigger: int = 4,
    cfg=None,
) -> None:
    """Maintain a full block index from a document stream: every
    micro-batch becomes one LSM-style segment (operators/segments.py) —
    postings group + appended stats + manifest row. Exactly-once via the
    stream checkpoint; restart never re-indexes processed files; queries
    against the index are rank-identical to a from-scratch batch build
    (tests/test_streaming_multimodal.py). This is the streaming form of
    the reference's resumable async ingestion (api/main.py:246-325)."""
    from semcode_spark.operators.segments import add_segment

    # cfg=None → add_segment inherits the index's persisted properties
    # (or DEFAULT for a brand-new index), so a stream can append to a
    # positional/stemmed index without restating its knobs
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_segment(batch_df.sparkSession, index_dir, batch_df, cfg=cfg)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(index_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup_groups(
    spark: SparkSession,
    docs_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string, n_chars long",
    query_name: str = "stream_dedup",
) -> DataFrame:
    """Streaming exact-dedup summary: content fingerprint groups
    maintained over a document stream — (fp, keep_id, n) where keep_id
    is the smallest doc_id of the group (the canonical keep-first
    policy of dedup.exact_dups, kept deterministic under any arrival
    order by aggregating min instead of relying on dropDuplicates'
    arbitrary within-batch pick). availableNow micro-batches into a
    complete-mode memory sink; exactly-once via the stream checkpoint.

    At web scale this is the continuously-maintained dedup ledger a
    crawl pipeline keeps in front of the indexer: new fingerprints pass
    through, re-crawled content lands in an existing group."""
    from semcode_spark.functions.tokenize import tokens_col

    tmp_dir = None
    if os.path.isfile(docs_path):
        import tempfile

        tmp_dir = tempfile.mkdtemp(prefix="docs_dedup_stream_")
        os.symlink(docs_path, os.path.join(tmp_dir, os.path.basename(docs_path)))
        docs_path = tmp_dir
    from semcode_spark.streaming.runner import run_bounded

    def _start():
        stream = spark.readStream.schema(schema).parquet(docs_path)
        fp = stream.select(
            F.col("doc_id"),
            F.md5(F.concat_ws(" ", tokens_col("text"))).alias("fp"),
        )
        groups = fp.groupBy("fp").agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n"),
        )
        return (
            groups.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    try:
        run_bounded(spark, _start)
        return spark.table(query_name)
    finally:
        if tmp_dir is not None:  # availableNow terminated: files no longer read
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-type event stats (works on both a static and
    a streaming DataFrame — same plan, which is the point of the
    DataFrame-first design)."""
    # r6: measured and left alone — a spread() of the batch input cost
    # 1.4 s vs the 0.4-0.6 s status quo at sf1.0 (shuffling 1M event
    # rows costs far more than the cheap codegen partial agg saves;
    # the window expression is not the interpreted-HOF class spread
    # exists for)
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # fround, not F.round: JVM BigDecimal HALF_UP on the exact
            # binary value can disagree with the oracle's floor(x·10⁴+0.5)
            # when the multiply crosses the .5 boundary (functions/rounding.py)
            fround(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type", "n", "sum_value",
        )
    )


def streaming_event_stats(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    window: str = "1 hour",
) -> DataFrame:
    """Run the windowed agg as a real stream (availableNow) into an
    in-memory sink; returns the result table. Demonstrates watermarks +
    event-time windows end to end."""
    # the file stream source wants a directory; accept a single parquet
    # file by staging a symlink under a temp dir
    tmp_dir = None
    if os.path.isfile(events_path):
        import tempfile

        tmp_dir = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(events_path, os.path.join(tmp_dir, os.path.basename(events_path)))
        events_path = tmp_dir
    from semcode_spark.streaming.runner import run_bounded

    def _start():
        stream = spark.readStream.schema(schema).parquet(events_path)
        agg = windowed_event_stats(stream, window=window)
        return (
            agg.writeStream.format("memory")
            .queryName("event_stats")
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    try:
        run_bounded(spark, _start)
        return spark.table("event_stats")
    finally:
        if tmp_dir is not None:
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
