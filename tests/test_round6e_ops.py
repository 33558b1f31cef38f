"""Round-6 batch 6: hive-partitioned writes, small-file compaction,
streaming CDC."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from gluestick_spark.sinks.layout import compact_files, write_hive_partitioned


def test_write_hive_partitioned_dirs_and_file_count(spark, tmp_dir):
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("a", "b") for i in range(50)],
        "src string, id long, v double",
    ).repartition(8)
    path = os.path.join(tmp_dir, "part")
    write_hive_partitioned(df, path, ["src"], sort_cols=["id"])
    dirs = sorted(os.path.basename(p) for p in glob.glob(os.path.join(path, "src=*")))
    assert dirs == ["src=a", "src=b"]
    for d in dirs:
        files = glob.glob(os.path.join(path, d, "*.parquet"))
        assert len(files) == 1  # no task×partition small-file explosion
    back = spark.read.parquet(path)
    assert back.count() == 100
    # partition pruning: a src filter reads one directory only
    plan = (
        back.where(F.col("src") == "a")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "src#" in plan


def test_compact_files_preserves_rows_atomically(spark, tmp_dir):
    path = os.path.join(tmp_dir, "small")
    # simulate a streaming sink: 10 tiny files
    for i in range(10):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    before = glob.glob(os.path.join(path, "*.parquet"))
    assert len(before) >= 10
    n_files = compact_files(spark, path, target_rows_per_file=50)
    assert n_files == 2
    after = glob.glob(os.path.join(path, "*.parquet"))
    assert len(after) == 2
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == list(range(100))
    assert not os.path.exists(path + ".__old__")


def test_streaming_cdc_emits_changes_only(spark, tmp_dir):
    from gluestick_spark.streaming.pipeline import streaming_cdc

    flat = os.path.join(tmp_dir, "feed")
    os.makedirs(flat)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b2 = spark.createDataFrame([(1, "a"), (2, "b2"), (3, "c")], "k long, v string")
    for i, b in enumerate((b1, b2)):
        tmp = os.path.join(tmp_dir, f"w{i}")
        b.coalesce(1).write.parquet(tmp)
        (part,) = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        os.rename(os.path.join(tmp, part), os.path.join(flat, f"batch_{i}.parquet"))

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
    )
    snap = os.path.join(tmp_dir, "snap")
    changes = os.path.join(tmp_dir, "changes")
    os.makedirs(snap)
    q = streaming_cdc(
        stream, "feed", snap, "k", changes,
        checkpoint_dir=os.path.join(tmp_dir, "ck"),
    )
    q.awaitTermination()

    got = sorted(
        (r.batch_id, r.k, r.change, r.new_v)
        for r in spark.read.parquet(changes).collect()
    )
    # batch 0: everything is an insert (empty snapshot); batch 1: only the
    # changed/new keys — key 1 unchanged emits nothing, absence != delete
    assert got == [
        (0, 1, "insert", "a"),
        (0, 2, "insert", "b"),
        (1, 2, "update", "b2"),
        (1, 3, "insert", "c"),
    ]
    # snapshot advanced to the latest state
    from gluestick_spark.sources.reader import read_snapshots

    final = sorted(map(tuple, read_snapshots(spark, "feed", snap).collect()))
    assert final == [(1, "a"), (2, "b2"), (3, "c")]
