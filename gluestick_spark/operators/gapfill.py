"""Time-series gap filling — TimescaleDB ``time_bucket_gapfill`` parity.

Dashboards and feature pipelines need a dense time grid: every (key,
bucket) between a key's first and last observation, with missing buckets
materialized and optionally forward-filled (``locf``). Spark has no
built-in for this; the composition is:

1. bucket each row's timestamp (exact integral floor — no double rounding),
2. aggregate observed buckets per key (one shuffle, map-side combined),
3. per key, compute [min, max] bucket and EXPLODE the full range — the
   dense grid is generated, never joined against a calendar table,
4. left-join observations back on (key, bucket) — the grid and the
   observations share the same partitioning key so this is one hash join,
5. ``locf`` = running ``last(value, ignorenulls)`` per key ordered by
   bucket — one window over the join's existing partitioning.

Scale shape: grid rows per key = span/step (bounded by the key's own
activity window, independent of corpus size); all shuffles are on the key.
A key with a year of hourly buckets is 8.8k rows — the explode is safe
wherever the downstream grid itself is wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["fill_gaps"]

_FILLS = ("locf", "null", "zero")


def _bucket(c: Column, step: int) -> Column:
    c = c.cast("long")
    return (c - F.pmod(c, F.lit(step))).cast("long")


def fill_gaps(
    df: DataFrame,
    ts_col: str,
    step: int,
    key_cols: list[str],
    agg: dict[str, Column],
    fill: str = "locf",
) -> DataFrame:
    """Dense per-key time grid at ``step``-second buckets.

    ``agg`` maps output column name → aggregate expression (evaluated per
    (key, bucket) over the observed rows, e.g. ``{"v": F.sum("value")}``).
    Missing buckets appear with ``is_gap = true`` and their aggregates
    ``locf``-forward-filled (default), left ``null``, or ``zero``-filled.
    Returns (*key_cols, ``bucket_ts`` timestamp, *agg keys, ``is_gap``).
    """
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}, got {fill!r}")
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    names = list(agg)
    # NULL timestamps carry no position on the grid — excluded explicitly
    # (they would otherwise form a null bucket that joins nothing and
    # silently vanishes mid-plan).
    obs = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("__b__", _bucket(F.col(ts_col), step))
        .groupBy(*key_cols, "__b__")
        .agg(*[expr.alias(n) for n, expr in agg.items()])
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("__b__").alias("__lo__"), F.max("__b__").alias("__hi__")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step))
        ).alias("__b__"),
    )
    joined = grid.join(obs, [*key_cols, "__b__"], "left").withColumn(
        "is_gap", F.col(names[0]).isNull() if names else F.lit(False)
    )
    if fill == "locf":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__b__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for n in names:
            joined = joined.withColumn(n, F.last(F.col(n), ignorenulls=True).over(w))
    elif fill == "zero":
        for n in names:
            joined = joined.withColumn(n, F.coalesce(F.col(n), F.lit(0)))
    return joined.select(
        *key_cols,
        F.timestamp_seconds(F.col("__b__")).alias("bucket_ts"),
        *names,
        "is_gap",
    )
