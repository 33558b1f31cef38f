"""Generic grouped selection/aggregation helpers.

Small, heavily-reused shapes that deserve a canonical single-shuffle
implementation instead of being re-derived (often wrongly — e.g. with a
global sort) at every call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["top_k_per_group", "grouped_percentiles"]


def top_k_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """The ``k`` first rows of every group under ``order_by`` (pandas
    ``groupby().head(k)`` / ``QUALIFY row_number() <= k``).

    ONE keyed shuffle + in-partition sort; ``row_number`` (not ``rank``)
    keeps the output size exactly ``k·groups`` even under ties — pass a
    tiebreaker column in ``order_by`` for full determinism.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def grouped_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-group percentiles (linear interpolation): one sort-based
    aggregate per group — heavier than t-digest ``percentile_approx`` but
    engine-portable (DuckDB ``quantile_cont`` reproduces it), keeping
    grouped distribution reports oracle-checkable. Swap to
    ``percentile_approx`` at 100 TB when ±0.1% error is fine."""
    v = F.col(value_col).cast("double")
    return df.groupBy(*key_cols).agg(
        F.count(v).alias("n"),
        *[
            F.percentile(v, F.lit(p)).alias(f"p{int(p * 100)}")
            for p in percentiles
        ],
    )
