"""Custom stateful streaming operator: running per-kind stats.

The reference accumulates running telemetry per event kind — count,
failure count, total duration, last timestamp, derived average
(api/telemetry.py:24-37,74-105). The streaming form is a custom
stateful operator: ``applyInPandasWithState`` keyed by event_type,
state = the running counters, each micro-batch folds its Arrow batches
into the state and emits the updated snapshot (output mode "update").
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "event_type string, n long, n_high long, total_value double, "
    "avg_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, n_high long, total_value double, last_ts timestamp"
HIGH_VALUE = 50.0  # "failure" analog: events with value above threshold


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    n, n_high, total, last_ts = (
        state.get if state.exists else (0, 0, 0.0, None)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        n_high += int((pdf["value"] > HIGH_VALUE).sum())
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, n_high, total, last_ts))
    yield pd.DataFrame([{
        "event_type": event_type,
        "n": n,
        "n_high": n_high,
        "total_value": total,
        "avg_value": total / n if n else 0.0,
        "last_ts": last_ts,
    }])


def running_event_stats(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    max_files_per_trigger: int = 2,
    query_name: str = "running_event_stats",
) -> DataFrame:
    """Run the stateful stream (availableNow) into a memory sink and
    return the emitted snapshots; the latest snapshot per key (max n)
    equals the batch aggregate over all data — asserted in tests."""
    tmp_dir = None
    if os.path.isfile(events_path):
        import tempfile

        tmp_dir = tempfile.mkdtemp(prefix="events_state_")
        os.symlink(events_path, os.path.join(tmp_dir, os.path.basename(events_path)))
        events_path = tmp_dir
    from semcode_spark.streaming.runner import run_bounded

    def _start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_path)
        )
        out = stream.groupBy("event_type").applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    try:
        run_bounded(spark, _start)
        return spark.table(query_name)
    finally:
        if tmp_dir is not None:
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
