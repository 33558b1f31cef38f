"""Cohort retention — the activation/retention matrix every
product-analytics stack computes: users grouped by their first-seen
period (the cohort), then counted per subsequent period of activity.
Row (cohort_date, period_offset, n_users) answers "of the users who
arrived in week X, how many were still active N weeks later".

Scale shape: ONE aggregate finds each user's first period (hash
aggregate with map-side combine), one distinct collapses (user, period)
activity, and the join between them is keyed on the user — both sides
arrive hash-partitioned by user from their own aggregates, so AQE reuses
the exchange rather than re-shuffling. The final matrix aggregate is
cohort×offset-bounded (tiny). No windows, no self-joins over raw events;
cost is O(events) + O(distinct user-periods).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_matrix"]

_TRUNCS = {"day": "dd", "week": "week", "month": "mm"}


def retention_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    grain: str = "day",
    max_offset: int | None = None,
) -> DataFrame:
    """(``cohort_date``, ``period_offset``, ``n_users``) — users whose
    FIRST activity fell in ``cohort_date``'s period and who were active
    ``period_offset`` periods later (offset 0 row = cohort size). Offsets
    with zero retained users are absent (join the cohort grid to densify;
    :mod:`gluestick_spark.operators.gapfill` does this for time axes).
    ``max_offset`` prunes the long tail before the final aggregate.

    ``grain``: ``"day"`` | ``"week"`` | ``"month"`` — offsets count
    whole periods (date_trunc difference), the standard cohort
    convention, so a Monday signup retained on any day of the next week
    is a week-1 retention regardless of weekday.
    """
    if grain not in _TRUNCS:
        raise ValueError(f"grain must be one of {sorted(_TRUNCS)}, got {grain!r}")
    period = F.date_trunc(_TRUNCS[grain], F.col(ts_col)).cast("date")
    acts = (
        df.select(F.col(user_col).alias("__u__"), period.alias("__p__"))
        .where(F.col("__p__").isNotNull())
        .distinct()
    )
    firsts = acts.groupBy("__u__").agg(F.min("__p__").alias("__c__"))
    if grain == "day":
        off: Column = F.datediff(F.col("__p__"), F.col("__c__"))
    elif grain == "week":
        off = (F.datediff(F.col("__p__"), F.col("__c__")) / 7).cast("int")
    else:
        off = (
            (F.year("__p__") - F.year("__c__")) * 12
            + (F.month("__p__") - F.month("__c__"))
        )
    joined = acts.join(firsts, "__u__").select(
        F.col("__c__").alias("cohort_date"), off.cast("int").alias("period_offset")
    )
    if max_offset is not None:
        joined = joined.where(F.col("period_offset") <= max_offset)
    return joined.groupBy("cohort_date", "period_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
