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

__all__ = ["ensure_min_partitions", "salted_join"]


def ensure_min_partitions(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition to ``defaultParallelism`` iff the plan currently has fewer
    partitions (checked on the physical plan, no job is launched)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    if key_cols:
        return df.repartition(p, *[F.col(f"`{c}`") for c in key_cols])
    return df.repartition(p)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side's hot keys spread over ``salt`` shards.

    The skewed side gets a uniform random shard id; the other side is
    replicated ``salt`` times (one row per shard) so every (key, shard)
    partition joins locally. Row-for-row equivalent to
    ``skewed.join(other, on, how)`` for inner/left joins.

    When to use: AQE's skew-join (``spark.sql.adaptive.skewJoin``) already
    splits oversized *partitions* at runtime and is the default answer —
    reach for explicit salting only when a single key's rows exceed executor
    memory in a sort-merge join, or in streaming joins where AQE doesn't
    apply. Cost: ``salt``× replication of ``other`` — keep it for small-to-
    medium dimension sides (a broadcast-sized ``other`` needs no salting at
    all; let the broadcast join handle skew for free).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # canonical implementation lives in operators/skew.py (round-6 home);
    # this alias keeps the original call shape (list keys, left_outer)
    from gluestick_spark.operators.skew import salted_join as _impl

    return _impl(
        skewed, other, on, how="left" if how == "left_outer" else how, salt=salt
    )
