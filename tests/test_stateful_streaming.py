"""Custom stateful operator: running stats across micro-batches equal
the batch aggregate (reference telemetry semantics, api/telemetry.py)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semcode_spark.streaming.stateful import running_event_stats

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_running_stats_converge_to_batch_agg(spark, tmp_path):
    events_src = str(tmp_path / "events_src")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev.repartition(5).write.parquet(events_src)  # 5 files → multiple batches

    snaps = running_event_stats(spark, events_src, str(tmp_path / "ckpt"),
                                query_name="res_t1")
    # snapshots are monotone in n; several per key proves statefulness
    assert snaps.count() > snaps.select("event_type").distinct().count()
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc())
    latest = (snaps.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1").drop("rn"))

    want = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).alias("n_high"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    got = {r["event_type"]: r for r in latest.collect()}
    for r in want.collect():
        g = got[r["event_type"]]
        assert g["n"] == r["n"]
        assert g["n_high"] == r["n_high"]
        assert g["total_value"] == pytest.approx(r["total_value"], rel=1e-9)
        assert g["avg_value"] == pytest.approx(r["total_value"] / r["n"], rel=1e-9)
        assert g["last_ts"] == r["last_ts"]
