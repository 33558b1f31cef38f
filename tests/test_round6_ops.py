"""Round-6 operators: segment (span) dedup, heavy hitters, SCD2 merge,
salted join, streaming interval join."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_spark.llm.sketch import heavy_hitters
from gluestick_spark.llm.spans import segment_dedup, segment_occurrences
from gluestick_spark.operators.scd2 import scd2_merge
from gluestick_spark.operators.skew import salted_join


# ---------------------------------------------------------------- spans ----


def test_segment_occurrences_slices_and_tail(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")], "doc_id long, text string")
    rows = sorted(
        segment_occurrences(df, "doc_id", "text", seg_words=4).collect(),
        key=lambda r: r.pos,
    )
    assert [(r.pos, r.seg) for r in rows] == [
        (0, "a b c d"),
        (1, "e f g h"),
        (2, "i j"),  # short tail segment is kept
    ]


def test_segment_dedup_keeps_first_occurrence_only(spark):
    df = spark.createDataFrame(
        [
            (1, "x y z w a b c d"),
            (2, "x y z w q r s t"),  # first segment duplicates doc 1's
            (3, "q r s t"),  # duplicates doc 2's second segment
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in segment_dedup(df, seg_words=4).collect()}
    assert out[1].text_clean == "x y z w a b c d" and out[1].n_removed == 0
    assert out[2].text_clean == "q r s t" and out[2].n_removed == 1
    assert out[3].text_clean == "" and out[3].n_removed == 1
    assert out[3].n_segments == 1


def test_segment_dedup_empty_and_null_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in segment_dedup(df, seg_words=2).collect()}
    assert out[1].text_clean == "" and out[1].n_segments == 0
    assert out[2].text_clean == "" and out[2].n_segments == 0
    assert out[3].text_clean == "a b"


def test_segment_dedup_corpus_order_tiebreak(spark):
    # Same segment at two positions in ONE doc: position breaks the tie.
    df = spark.createDataFrame([(7, "p q p q")], "doc_id long, text string")
    out = segment_dedup(df, seg_words=2).collect()[0]
    assert out.text_clean == "p q" and out.n_removed == 1


# -------------------------------------------------------- heavy hitters ----


def test_heavy_hitters_exact_counts_and_ties(spark):
    vals = ["a"] * 5 + ["b"] * 5 + ["c"] * 3 + ["d"] * 1
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    got = [(r.term, r.n) for r in heavy_hitters(df, "term", k=3).collect()]
    # tie between a and b broken by value asc
    assert got == [("a", 5), ("b", 5), ("c", 3)]


def test_heavy_hitters_small_capacity_still_finds_heavy_item(spark):
    # One value holds 60% of the mass: guaranteed a candidate even with a
    # tiny Space-Saving capacity, and its verified count is exact.
    vals = ["hot"] * 60 + [f"cold{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "term string").repartition(4)
    got = heavy_hitters(df, "term", k=1, capacity=2).collect()
    assert [(r.term, r.n) for r in got] == [("hot", 60)]


def test_heavy_hitters_raises_when_capacity_cannot_guarantee_topk(spark):
    """Adversarial: near-uniform corpus with capacity far too small. Every
    Space-Saving summary churns, the non-candidate bound exceeds the k-th
    verified count, and the completeness guard must RAISE at
    materialization instead of silently returning an incomplete top-k
    (the pre-guard behavior)."""
    import pytest

    vals = [f"v{i:03d}" for i in range(200) for _ in range(5)]
    df = spark.createDataFrame([(v,) for v in vals], "term string").repartition(1)
    with pytest.raises(Exception, match="completeness not guaranteed"):
        heavy_hitters(df, "term", k=3, capacity=4).collect()


def test_heavy_hitters_guard_passes_when_summaries_exact(spark):
    # Same shape but capacity >= cardinality: no eviction, bound == 0,
    # result complete even though counts tie (fewer than k rows is fine).
    vals = [f"v{i}" for i in range(10) for _ in range(2)]
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    got = heavy_hitters(df, "term", k=3, capacity=64).collect()
    assert [(r.term, r.n) for r in got] == [("v0", 2), ("v1", 2), ("v2", 2)]


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], "term string"
    )
    got = [(r.term, r.n) for r in heavy_hitters(df, "term", k=5).collect()]
    assert got == [("x", 2), ("y", 1)]


# ----------------------------------------------------------------- scd2 ----


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_merge_all_cases(spark):
    hist = spark.createDataFrame(
        [
            # closed row, passes through untouched
            Row(k=1, v="old", valid_from=_ts("2024-01-01"), valid_to=_ts("2024-01-05")),
            Row(k=1, v="a", valid_from=_ts("2024-01-05"), valid_to=None),  # changes
            Row(k=2, v="b", valid_from=_ts("2024-01-02"), valid_to=None),  # unchanged
            Row(k=3, v="c", valid_from=_ts("2024-01-03"), valid_to=None),  # no batch row
        ],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame(
        [
            Row(k=1, v="a2", ts=_ts("2024-02-01")),
            Row(k=2, v="b", ts=_ts("2024-02-01")),
            Row(k=4, v="new", ts=_ts("2024-02-01")),  # brand-new key
        ],
        "k long, v string, ts timestamp",
    )
    out = scd2_merge(hist, batch, "k", "ts", ["v"])
    rows = sorted(
        [(r.k, r.v, r.valid_from, r.valid_to) for r in out.collect()]
    )
    assert rows == [
        (1, "a", _ts("2024-01-05"), _ts("2024-02-01")),  # closed by the change
        (1, "a2", _ts("2024-02-01"), None),  # new current version
        (1, "old", _ts("2024-01-01"), _ts("2024-01-05")),  # untouched closed
        (2, "b", _ts("2024-01-02"), None),  # unchanged: no churn
        (3, "c", _ts("2024-01-03"), None),  # absent from batch: still current
        (4, "new", _ts("2024-02-01"), None),  # insert
    ]


def test_scd2_merge_null_safe_change_detection(spark):
    hist = spark.createDataFrame(
        [Row(k=1, v=None, valid_from=_ts("2024-01-01"), valid_to=None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    same = spark.createDataFrame(
        [Row(k=1, v=None, ts=_ts("2024-02-01"))], "k long, v string, ts timestamp"
    )
    out = scd2_merge(hist, same, "k", "ts", ["v"]).collect()
    assert len(out) == 1 and out[0].valid_to is None  # NULL == NULL: no churn
    changed = spark.createDataFrame(
        [Row(k=1, v="x", ts=_ts("2024-02-01"))], "k long, v string, ts timestamp"
    )
    out2 = scd2_merge(hist, changed, "k", "ts", ["v"]).collect()
    assert len(out2) == 2  # NULL -> 'x' IS a change


def test_scd2_merge_idempotent_reapply(spark):
    # Re-applying the same batch to the merged history is a no-op
    # (every key is now unchanged) — the MERGE retry-safety property.
    hist = spark.createDataFrame(
        [Row(k=1, v="a", valid_from=_ts("2024-01-01"), valid_to=None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame(
        [Row(k=1, v="b", ts=_ts("2024-02-01"))], "k long, v string, ts timestamp"
    )
    once = scd2_merge(hist, batch, "k", "ts", ["v"])
    twice = scd2_merge(once, batch, "k", "ts", ["v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ---------------------------------------------------------- salted join ----


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k long, lv long"
    )
    right = spark.createDataFrame([(0, "a"), (0, "b"), (2, "c")], "k long, rv string")
    got = sorted(map(tuple, salted_join(left, right, "k", salt=5).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


def test_salted_join_left_outer_multiplicity(spark):
    left = spark.createDataFrame([(1, "x"), (9, "unmatched")], "k long, lv string")
    right = spark.createDataFrame([(1, "r")], "k long, rv string")
    got = sorted(
        map(tuple, salted_join(left, right, "k", how="left", salt=7).collect())
    )
    assert got == [(1, "x", "r"), (9, "unmatched", None)]


def test_salted_join_plan_joins_on_salt(spark):
    left = spark.createDataFrame([(1, 1)], "k long, lv long")
    right = spark.createDataFrame([(1, 2)], "k long, rv long")
    plan = salted_join(left, right, "k", salt=3)._jdf.queryExecution().analyzed().toString()
    assert "__salt__" in plan  # the join condition really carries the salt


# ----------------------------------------------- streaming interval join ----


def test_streaming_interval_join_matches_batch(spark):
    from gluestick_spark.streaming.pipeline import (
        stream_from_directory,
        streaming_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    schema = ev.schema
    stage = tempfile.mkdtemp(prefix="gs_sij_t_")
    os.symlink(
        os.path.abspath(f"{sf}/events.parquet"), os.path.join(stage, "events.parquet")
    )

    def sides(df):
        p = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        c = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        return p, c

    sp, sc = sides(stream_from_directory(spark, stage, schema))
    joined = streaming_interval_join(
        sp, sc, "p_user", "c_user", "p_ts", "c_ts", lookback="6 hours"
    )
    out_dir = tempfile.mkdtemp(prefix="gs_sij_t_out_")
    ckpt = tempfile.mkdtemp(prefix="gs_sij_t_ck_")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(out_dir).select("purchase_id", "click_id").collect()
    )

    bp, bc = sides(ev)
    batch = bp.join(
        bc,
        (bp.p_user == bc.c_user)
        & (bc.c_ts >= bp.p_ts - F.expr("INTERVAL 6 hours"))
        & (bc.c_ts <= bp.p_ts),
    )
    want = sorted((r.purchase_id, r.click_id) for r in batch.collect())
    assert got == want and len(got) > 0


def test_streaming_interval_join_left_outer_flushes_unmatched(spark):
    from gluestick_spark.streaming.pipeline import (
        stream_from_directory,
        streaming_interval_join,
    )

    import datetime as dt

    stage = tempfile.mkdtemp(prefix="gs_sij_lo_")
    # sentinel rows (keys matching nothing) push the final watermark past
    # every real row's outer-emit deadline: Spark never flushes join state
    # at end-of-stream, it only evicts as the watermark advances
    left_rows = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0), 100),
         (2, dt.datetime(2024, 1, 2, 12, 0), 200),
         (999, dt.datetime(2024, 1, 10), 999)],
        "k long, ts timestamp, lid long",
    )
    right_rows = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 11, 30), 900),
         (998, dt.datetime(2024, 1, 10), 998)],
        "k long, ts timestamp, rid long",
    )
    lp = os.path.join(stage, "l"); rp = os.path.join(stage, "r")
    left_rows.coalesce(1).write.parquet(lp)
    right_rows.coalesce(1).write.parquet(rp)
    ls = stream_from_directory(spark, lp, "k long, ts timestamp, lid long").select(
        F.col("k").alias("lk"), F.col("ts").alias("lts"), "lid"
    )
    rs = stream_from_directory(spark, rp, "k long, ts timestamp, rid long").select(
        F.col("k").alias("rk"), F.col("ts").alias("rts"), "rid"
    )
    joined = streaming_interval_join(
        ls, rs, "lk", "rk", "lts", "rts", lookback="1 hour",
        watermark="1 hour", how="leftOuter",
    )
    out_dir = tempfile.mkdtemp(prefix="gs_sij_lo_out_")
    q = (
        joined.writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gs_sij_lo_ck_"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.lid, r.rid) for r in spark.read.parquet(out_dir).select("lid", "rid").collect()
    )
    # lid=100 matched within the hour; lid=200's deadline passed by the
    # sentinel-advanced watermark -> emitted unmatched; the Jan-10
    # sentinel itself stays in state (nothing later advances past it)
    assert got == [(100, 900), (200, None)]
