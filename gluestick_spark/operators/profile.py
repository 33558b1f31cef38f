"""Column profiling: one-scan numeric data-quality statistics.

Pipelines gate ingest on data-quality reports (null rates, ranges,
distribution shape). The reference has no profiling; this is the engine's
beyond-reference surface for it.

Scale design: ALL columns' statistics are computed in ONE aggregate over
ONE scan — every per-column expression (count/nulls/min/max/mean/stddev/
exact percentiles) lands in a single ``agg`` producing a single row, which
is then exploded to long form (column, stat…) driver-light. Exact
percentiles use Spark's sort-based ``percentile`` — heavier than the
t-digest ``percentile_approx`` but engine-portable (DuckDB's
``quantile_cont`` reproduces the same linear interpolation), which keeps
profiles oracle-checkable; swap in ``percentile_approx`` at 100 TB when
±0.1% quantile error is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric"]


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """One row per column: (``column``, ``n``, ``n_null``, ``min``,
    ``max``, ``mean``, ``stddev``, ``p{…}``...). Numeric columns only;
    stats are computed over non-null values (SQL aggregate semantics),
    ``n`` counts all rows."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
            F.avg(col).alias(f"__avg_{c}"),
            F.stddev_samp(col).alias(f"__sd_{c}"),
            *[
                F.percentile(col, F.lit(p)).alias(f"__p{int(p * 100)}_{c}")
                for p in percentiles
            ],
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").alias("n"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__min_{c}").alias("min"),
            F.col(f"__max_{c}").alias("max"),
            F.col(f"__avg_{c}").alias("mean"),
            F.col(f"__sd_{c}").alias("stddev"),
            *[
                F.col(f"__p{int(p * 100)}_{c}").alias(f"p{int(p * 100)}")
                for p in percentiles
            ],
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
