"""Rolling z-score anomaly detection over keyed time series.

Pipeline monitoring 101: flag buckets whose value deviates from the key's
own trailing baseline. ``rolling_zscore`` computes, per key and ordered by
time, the mean/stddev of the PRECEDING ``window`` observations (the
current row excluded — a spike must not inflate its own baseline) and the
resulting z-score.

Scale shape: one keyed Exchange + in-partition sort; both window
aggregates share the frame, so Spark evaluates them in a single Window
operator with O(window) running state — never a self-join of the series
against its own history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rolling_zscore"]


def rolling_zscore(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    window: int = 7,
    min_periods: int = 3,
) -> DataFrame:
    """Adds ``baseline_mean``, ``baseline_std``, ``zscore`` per row.

    ``zscore`` is NULL while fewer than ``min_periods`` trailing
    observations exist (cold start) or when the baseline stddev is 0
    (constant history — any deviation would be infinite; flag those rows
    by ``baseline_std = 0`` instead).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not 1 <= min_periods <= window:
        raise ValueError(f"min_periods must be in [1, window], got {min_periods}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when(
        (n >= min_periods) & std.isNotNull() & (std > 0), (v - mean) / std
    )
    return (
        df.withColumn("baseline_mean", F.when(n >= min_periods, mean))
        .withColumn("baseline_std", F.when(n >= min_periods, std))
        .withColumn("zscore", z)
    )
