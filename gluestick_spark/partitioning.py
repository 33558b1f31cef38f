"""Partition-balance helpers.

``ensure_min_partitions`` is the engine's one rule for CPU-heavy per-row
operators (JSON parsing, hashing, shingling): make sure the work can use
every core *before* spending CPU. A small or single-row-group parquet scan
yields fewer splits than cores — locally a 10 MB file is ONE task and a
64-permutation MinHash runs on one thread of 32. At real scale (100 TB,
thousands of row groups) the scan already has more splits than the
parallelism floor and this is a pure no-op — large inputs never pay the
extra shuffle.

Partitioning on the operator's key column(s) makes the exchange reusable:
a downstream groupBy/join on the same key satisfies its ClusteredDistribution
requirement from this shuffle instead of adding another.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_min_partitions"]


def ensure_min_partitions(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition to ``defaultParallelism`` iff the plan currently has fewer
    partitions (checked on the physical plan, no job is launched)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    if key_cols:
        return df.repartition(p, *[F.col(f"`{c}`") for c in key_cols])
    return df.repartition(p)
