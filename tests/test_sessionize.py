"""Gap-based sessionization (applyInPandasWithState) tests."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from gluestick_spark.streaming.pipeline import sessionize, stream_from_directory


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 12, minute, 0)


def test_sessionize_closes_on_gap(spark, tmp_dir):
    src = os.path.join(tmp_dir, "events")
    ckpt = os.path.join(tmp_dir, "ckpt")
    rows = [
        # user 7: two clusters separated by > 30 min -> first emitted closed
        Row(user_id=7, ts=_ts(0)),
        Row(user_id=7, ts=_ts(5)),
        Row(user_id=7, ts=_ts(50)),
        # user 8: one cluster, stays open (kept in state, not emitted)
        Row(user_id=8, ts=_ts(10)),
    ]
    spark.createDataFrame(rows).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = stream_from_directory(spark, src, schema)
    sessions = sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM sess_out").collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 7
    assert r["session_start"] == _ts(0)
    assert r["session_end"] == _ts(5)
    assert r["n_events"] == 2


def test_sessionize_state_survives_micro_batches(spark, tmp_dir):
    import time

    src = os.path.join(tmp_dir, "events")
    ckpt = os.path.join(tmp_dir, "ckpt")
    spark.createDataFrame(
        [Row(user_id=7, ts=_ts(0)), Row(user_id=7, ts=_ts(5))]
    ).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # distinct mod times => deterministic batch order
    spark.createDataFrame(
        [Row(user_id=7, ts=_ts(10)), Row(user_id=7, ts=_ts(59))]
    ).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = stream_from_directory(spark, src, schema, max_files_per_trigger=1)
    q = (
        sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_mb")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM sess_mb").collect()
    # the minute-10 event (second batch) continues the session started in
    # the first batch; the minute-59 event closes it with 3 events
    assert len(got) == 1
    r = got[0]
    assert (r["session_start"], r["session_end"], r["n_events"]) == (_ts(0), _ts(10), 3)
