"""Batch gap-sessionization — the batch twin of
:func:`gluestick_spark.streaming.pipeline.sessionize`.

Backfills and historical reprocessing need the same session semantics the
stream produces, without running a stream: a session closes when the gap
to the next event exceeds ``gap``. The batch formulation is pure window
algebra (no state, no Python):

    new_session = (ts − lag(ts) > gap) per key, ordered by ts
    session_nr  = running sum of new_session
    sessions    = groupBy(key, session_nr) → start/end/count

Scale shape: ONE shuffle on the key serves both windows (same partitioning
and ordering — single Exchange + sort) and the final aggregate is
map-side-combinable on (key, session_nr). Sessions of any length cost
their events, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize_batch"]


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_minutes: float = 30.0,
) -> DataFrame:
    """(*key_cols, ``session_start``, ``session_end``, ``n_events``) — one
    row per closed session, identical semantics to the streaming
    sessionizer's final state (every session is 'closed' in batch)."""
    gap_s = gap_minutes * 60.0
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") > gap_s),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = df.withColumn("__sn__", F.sum(new_sess).over(run))
    return (
        numbered.groupBy(*key_cols, "__sn__")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("__sn__")
    )
