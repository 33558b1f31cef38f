"""Round-6 batch 2: expectations, Z-order layout, histogram,
negative pairs, streaming SCD2."""

from __future__ import annotations

import datetime as dt
import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_spark.operators.expectations import check_expectations
from gluestick_spark.operators.profile import histogram
from gluestick_spark.sinks.layout import write_zordered, zvalue_expr
from gluestick_spark.llm.sampling import negative_pairs


# --------------------------------------------------------- expectations ----


def test_expectations_row_local_rules_one_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "ab"), (2, None, "zz"), (None, 20.0, "cd"), (4, -1.0, None)],
        "id long, x double, s string",
    )
    out = {
        r.rule: r.n_violations
        for r in check_expectations(
            df,
            [
                {"rule": "not_null", "col": "id"},
                {"rule": "in_range", "col": "x", "min": 0, "max": 10},
                {"rule": "matches", "col": "s", "pattern": "^[a-c]+$"},
                {"rule": "in_set", "col": "s", "values": ["ab", "cd"]},
            ],
        ).collect()
    }
    assert out == {
        "not_null:id": 1,
        "in_range:x": 2,  # 20.0 and -1.0; NULL is not a range violation
        "matches:s": 2,  # "zz" and "cd" ('d' outside [a-c]); NULL not counted
        "in_set:s": 1,  # "zz"
    }


def test_expectations_unique_and_ref(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 99), (3, None)], "pk long, fk int"
    )
    dim = spark.createDataFrame([(10,), (11,), (12,)], "k int")
    out = {
        r.rule: r.n_violations
        for r in check_expectations(
            df,
            [
                {"rule": "unique", "cols": ["pk"]},
                {"rule": "ref", "col": "fk", "ref": "dim", "ref_col": "k"},
            ],
            ref_tables={"dim": dim},
        ).collect()
    }
    # pk=1 thrice -> 2 excess rows; fk=99 orphan; NULL fk not a violation
    assert out == {"unique:pk": 2, "ref:fk": 1}


def test_expectations_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown rule"):
        check_expectations(df, [{"rule": "positive", "col": "id"}])


# --------------------------------------------------------------- zorder ----


def test_zvalue_interleaves_bits(spark):
    # 2-bit toy: x=0b11, y=0b01 over [0,4) -> z = y1 x1 y0 x0 = 0b0111
    df = spark.createDataFrame([(3.0, 1.0)], "x double, y double")
    z = df.select(
        zvalue_expr(["x", "y"], [(0.0, 4.0), (0.0, 4.0)], bits=2).alias("z")
    ).collect()[0].z
    assert z == 0b0111


def test_zvalue_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0, 99.0)], "x double, y double")
    z = df.select(
        zvalue_expr(["x", "y"], [(0.0, 4.0), (0.0, 4.0)], bits=2).alias("z")
    ).collect()[0].z
    # x clamps to 0, y clamps to 3 (0b11) -> z = 1010
    assert z == 0b1010


def test_zvalue_locality_beats_lexicographic(spark):
    # points on a grid: z-order keeps both dims clustered
    pts = [(float(x), float(y)) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x double, y double")
    ranges = [(0.0, 16.0), (0.0, 16.0)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "z")
        write_zordered(df, path, ["x", "y"], ranges, bits=4, n_files=8)
        files = glob.glob(os.path.join(path, "*.parquet"))
        assert len(files) > 1
        # each file must cover a NARROW band in BOTH dimensions: for a
        # y-filter to prune, per-file y-spans must not all be the full
        # domain (a plain x-sort would give every file the full y span)
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            ys = [
                (
                    md.row_group(i).column(1).statistics.min,
                    md.row_group(i).column(1).statistics.max,
                )
                for i in range(md.num_row_groups)
            ]
            spans.append(max(hi for _, hi in ys) - min(lo for lo, _ in ys))
        assert sum(1 for s in spans if s < 15.0) >= len(spans) // 2


# ------------------------------------------------------------ histogram ----


def test_histogram_dense_grid_and_clamping(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0.5, 1.5, 1.6, 99.0, -7.0, None]], "v double"
    )
    out = {r.bin: (r.bin_lo, r.bin_hi, r.n) for r in histogram(df, "v", 4, 0.0, 4.0).collect()}
    assert len(out) == 4  # dense: empty bins present
    assert out[0][2] == 2  # 0.5 and clamped -7.0
    assert out[1][2] == 2  # 1.5, 1.6
    assert out[2][2] == 0  # empty bin reported
    assert out[3][2] == 1  # clamped 99.0
    assert out[1][0] == 1.0 and out[1][1] == 2.0


# ------------------------------------------------------- negative pairs ----


def test_negative_pairs_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(10)], "idx long, text string"
    )
    out = negative_pairs(df, "idx", n=10, k=3, seed="s1")
    rows = out.collect()
    assert len(rows) == 30  # every anchor gets exactly k partners
    for r in rows:
        assert r.text_neg != f"doc{r.idx}"  # never self
    again = sorted(map(tuple, negative_pairs(df, "idx", n=10, k=3, seed="s1").collect()))
    assert sorted(map(tuple, rows)) == again  # pure function of (idx, rank, seed)
    other = sorted(map(tuple, negative_pairs(df, "idx", n=10, k=3, seed="s2").collect()))
    assert other != again  # seed changes the draw


def test_negative_pairs_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(20)], "idx long, text string"
    )
    a = sorted(map(tuple, negative_pairs(df, "idx", n=20, k=2).collect()))
    b = sorted(
        map(tuple, negative_pairs(df.repartition(7), "idx", n=20, k=2).collect())
    )
    assert a == b


# ------------------------------------------------------- streaming scd2 ----


def test_streaming_scd2_two_batches_builds_history(spark, tmp_dir):
    from gluestick_spark.operators.scd2 import scd2_merge  # noqa: F401
    from gluestick_spark.streaming.pipeline import streaming_scd2

    # two parquet files = two micro-batches (maxFilesPerTrigger=1)
    src = os.path.join(tmp_dir, "src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1)), (2, "b", dt.datetime(2024, 1, 1))],
        "k long, v string, ts timestamp",
    )
    b2 = spark.createDataFrame(
        [(1, "a2", dt.datetime(2024, 2, 1)), (3, "c", dt.datetime(2024, 2, 1))],
        "k long, v string, ts timestamp",
    )
    b1.coalesce(1).write.parquet(os.path.join(src, "f=1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "f=2"))
    # order by file name: stage them as flat files so trigger order is fixed
    flat = os.path.join(tmp_dir, "flat")
    os.makedirs(flat)
    for i, d in enumerate(sorted(glob.glob(os.path.join(src, "f=*")))):
        (pqf,) = glob.glob(os.path.join(d, "*.parquet"))
        os.rename(pqf, os.path.join(flat, f"batch_{i}.parquet"))

    stream = (
        spark.readStream.schema("k long, v string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
    )
    snap = os.path.join(tmp_dir, "snap")
    os.makedirs(snap)
    q = streaming_scd2(
        stream, "dim", snap, "k", "ts", ["v"],
        checkpoint_dir=os.path.join(tmp_dir, "ckpt"),
    )
    q.awaitTermination()

    from gluestick_spark.sources.reader import read_snapshots

    hist = read_snapshots(spark, "dim.scd2", snap)
    rows = sorted((r.k, r.v, r.valid_to is None) for r in hist.collect())
    assert rows == [
        (1, "a", False),  # closed when k=1 changed in batch 2
        (1, "a2", True),
        (2, "b", True),
        (3, "c", True),
    ]
