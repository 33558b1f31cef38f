"""Structured Streaming + validation + cleaning + config tests."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_spark.config import JobDirs, get_config_value, read_config
from gluestick_spark.functions.cleaning import clean_convert, remove_nulls_deep
from gluestick_spark.streaming.pipeline import (
    stream_from_directory,
    streaming_snapshot_upsert,
    windowed_event_counts,
)
from gluestick_spark.validation import split_valid_invalid, validate_records
from gluestick_spark.sources.reader import read_snapshots


def test_streaming_snapshot_upsert(spark, tmp_dir):
    src = os.path.join(tmp_dir, "incoming")
    snap = os.path.join(tmp_dir, "snapshots")
    ckpt = os.path.join(tmp_dir, "ckpt")
    os.makedirs(src)

    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = spark.read.parquet(src).schema
    stream = stream_from_directory(spark, src, schema)
    assert stream.isStreaming
    q = streaming_snapshot_upsert(stream, "s", snap, "id", ckpt)
    q.awaitTermination(120)

    got = {r["id"]: r["v"] for r in read_snapshots(spark, "s", snap).collect()}
    assert got == {1: "a", 2: "b"}

    # second batch: new file upserts (id=2 updated, id=3 added)
    spark.createDataFrame([Row(id=2, v="B2"), Row(id=3, v="c")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = streaming_snapshot_upsert(stream, "s", snap, "id", ckpt)
    q2.awaitTermination(120)
    got = {r["id"]: r["v"] for r in read_snapshots(spark, "s", snap).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_windowed_event_counts_batch_semantics(spark, tmp_dir):
    import datetime

    rows = [
        Row(ts=datetime.datetime(2024, 1, 1, 0, 10), event_type="a", value=1.0),
        Row(ts=datetime.datetime(2024, 1, 1, 0, 50), event_type="a", value=2.0),
        Row(ts=datetime.datetime(2024, 1, 1, 1, 10), event_type="a", value=4.0),
    ]
    src = os.path.join(tmp_dir, "ev")
    spark.createDataFrame(rows).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = stream_from_directory(spark, src, schema)
    agg = windowed_event_counts(stream, window="1 hour", watermark="0 seconds")

    out_path = os.path.join(tmp_dir, "agg_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", os.path.join(tmp_dir, "agg_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].hour, r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_path).collect()
    }
    # append mode emits only windows the watermark (max event time 1:10)
    # has passed: the 0:00-1:00 window closes, the 1:00-2:00 window is
    # withheld as potentially still receiving late data
    assert got == {(0, 2, 3.0)}


def test_validate_records_with_callable(spark):
    df = spark.createDataFrame([Row(id=1, v="ok"), Row(id=2, v="")])

    def validator(rec):
        if not rec["v"]:
            raise ValueError("v must be non-empty")

    out = validate_records(df, validator=validator)
    valid, invalid = split_valid_invalid(out)
    assert [r["id"] for r in valid.collect()] == [1]
    bad = invalid.first()
    assert bad["id"] == 2 and "non-empty" in bad["_error"]


try:
    from pydantic import BaseModel

    class _PydRec(BaseModel):
        id: int
        v: str

except ImportError:  # pragma: no cover
    _PydRec = None


def test_validate_records_with_pydantic(spark):
    if _PydRec is None:
        import pytest

        pytest.skip("pydantic not installed")

    # model classes must either be importable on executors or explicitly
    # pickled by value — test modules aren't on the executor path
    import sys

    from pyspark import cloudpickle  # the instance Spark serializes with

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    Rec = _PydRec
    df = spark.createDataFrame([Row(id=1, v="x")])
    valid, invalid = split_valid_invalid(validate_records(df, model=Rec))
    assert valid.count() == 1 and invalid.count() == 0


def test_remove_nulls_deep():
    rec = {"a": 1, "b": None, "c": {"d": None, "e": [1, None, {"f": None, "g": 2}]}}
    assert remove_nulls_deep(rec) == {"a": 1, "c": {"e": [1, {"g": 2}]}}


def test_clean_convert_dates():
    import datetime

    rec = {"ts": datetime.datetime(2024, 1, 2, 3, 4, 5), "d": datetime.date(2024, 1, 2), "x": None}
    out = clean_convert(rec)
    assert out == {"ts": "2024-01-02T03:04:05", "d": "2024-01-02"}


def test_job_dirs_and_config(tmp_dir, monkeypatch):
    monkeypatch.delenv("INPUT_DIR", raising=False)
    dirs = JobDirs(tmp_dir).ensure()
    assert os.path.isdir(dirs.snapshot_dir)
    assert dirs.input_dir.endswith("sync-output")

    import json

    with open(os.path.join(tmp_dir, "config.json"), "w") as f:
        json.dump({"api_key": "from_file"}, f)
    cfg = read_config(tmp_dir)
    assert get_config_value("api_key", cfg) == "from_file"
    monkeypatch.setenv("API_KEY", "from_env")
    assert get_config_value("api_key", cfg) == "from_env"
    assert get_config_value("missing", cfg, default=42) == 42


def test_streaming_dedup_within_watermark(spark, tmp_dir):
    """Duplicate keys inside one stream are collapsed; state is bounded by
    the watermark (dropDuplicatesWithinWatermark)."""
    import datetime

    from gluestick_spark.streaming.pipeline import streaming_dedup

    src = os.path.join(tmp_dir, "in")
    out = os.path.join(tmp_dir, "out")
    ckpt = os.path.join(tmp_dir, "ck")
    os.makedirs(src)
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(id=1, ts=t0, v="a"),
        Row(id=1, ts=t0 + datetime.timedelta(minutes=1), v="dup"),
        Row(id=2, ts=t0, v="b"),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = stream_from_directory(spark, src, schema)
    deduped = streaming_dedup(stream, ["id"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert sorted(r["id"] for r in got) == [1, 2]


def test_streaming_minhash_dedup_equals_batch(spark, tmp_dir):
    """Stream-then-batch equivalence: docs fed through two micro-batches
    (monotone ids) emit exactly the keep set of a single batch
    minhash_dedup over the union — including a batch-2 doc that
    near-duplicates a batch-1 doc that was ITSELF dropped (the docs state
    must hold dropped docs too)."""
    from gluestick_spark.llm.dedup import minhash_dedup
    from gluestick_spark.streaming.pipeline import (
        stream_from_directory,
        streaming_minhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " ok"),          # near-dup of 1 → dropped
        Row(doc_id=3, text="completely different content about spark engines"),
        # batch 2:
        Row(doc_id=4, text=base + " ok!"),         # near-dup of 2 (dropped) → dropped
        Row(doc_id=5, text="another unrelated document talking about ducks"),
        Row(doc_id=6, text=base),                  # exact dup of 1 → dropped
    ]
    src = os.path.join(tmp_dir, "docs_src")
    out = os.path.join(tmp_dir, "kept")
    state = os.path.join(tmp_dir, "state")
    ckpt = os.path.join(tmp_dir, "ckpt")
    os.makedirs(src)
    os.makedirs(state)

    full = spark.createDataFrame(docs)
    schema = full.schema
    for lo, hi in ((1, 3), (4, 6)):
        spark.createDataFrame([d for d in docs if lo <= d.doc_id <= hi]).coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = stream_from_directory(spark, src, schema)
        q = streaming_minhash_dedup(
            stream, "text", "doc_id", state, out, ckpt, threshold=0.7
        )
        q.awaitTermination(120)

    streamed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    batch = sorted(
        r["doc_id"] for r in minhash_dedup(full, "text", "doc_id", threshold=0.7).collect()
    )
    assert streamed == batch
    assert 4 not in streamed  # near-dups a DROPPED doc — still dropped


def test_streaming_agg_upsert_equals_batch(spark, tmp_dir):
    """Incremental aggregate maintenance: after two micro-batches the
    snapshot equals the batch groupBy over the union (count + sums merge
    additively; history never rescanned)."""
    from gluestick_spark.streaming.pipeline import (
        stream_from_directory,
        streaming_agg_upsert,
    )
    from gluestick_spark.sources.reader import read_snapshots

    rows1 = [Row(k="a", v=1.0), Row(k="a", v=2.0), Row(k="b", v=10.0)]
    rows2 = [Row(k="a", v=4.0), Row(k="c", v=7.0)]
    src = os.path.join(tmp_dir, "in")
    snap = os.path.join(tmp_dir, "snap")
    ckpt = os.path.join(tmp_dir, "ck")
    os.makedirs(src)

    schema = spark.createDataFrame(rows1).schema
    for batch in (rows1, rows2):
        spark.createDataFrame(batch).coalesce(1).write.mode("append").parquet(src)
        q = streaming_agg_upsert(
            stream_from_directory(spark, src, schema), "agg", snap, ["k"], ["v"], ckpt
        )
        q.awaitTermination(120)

    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in read_snapshots(spark, "agg", snap).collect()}
    assert got == {"a": (3, 7.0), "b": (1, 10.0), "c": (1, 7.0)}
