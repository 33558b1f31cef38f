"""SparkSession factory with engine defaults.

Design notes (100 TB posture):
- UTC session timezone everywhere (reference pins tz-aware UTC datetimes,
  see /root/reference/gluestick/utils/polars_utils.py:16-17 and
  date_utils.py:82-90).
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting;
  at real cluster scale ``spark.sql.shuffle.partitions`` becomes a *ceiling*
  AQE coalesces down from, so it is safe to set it high.
- Arrow enabled for the pandas-UDF paths (vectorized batch transfer).
- zstd parquet to match the reference's writer config
  (/root/reference/gluestick/etl_utils.py:189).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ENGINE_CONF"]

ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    # Pre-shuffle partition count: a ceiling for AQE to coalesce from.
    "spark.sql.shuffle.partitions": "32",
    # 128 MB scan splits — the cluster default; sane for local too.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast joins for dim tables (catalogs, snapshots' id maps).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Reference's reduce-into-dict keeps the last value under a repeated key
    # (pandas_utils.py:381-412); map_from_entries must match, not throw.
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # Parquet TIMESTAMP(NANOS) (e.g. the events table) is otherwise illegal
    # in Spark; read as long nanos, convert with functions.ts.ns_to_timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "gluestick-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster the master
    comes from spark-submit and this argument is left None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
