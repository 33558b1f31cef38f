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

__all__ = ["sessionize_batch", "suppress_duplicates"]


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


def suppress_duplicates(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_seconds: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Burst suppression: keep only the FIRST row of every burst per key,
    where a burst is a run of rows each within ``window_seconds`` of its
    predecessor — the alert-dedup / retry-collapse shape, and the batch
    twin of streaming ``dropDuplicatesWithinWatermark`` over a full
    history (the streaming form bounds state by the watermark horizon;
    batch has the whole timeline, so suppression is exact).

    Chain semantics (deliberate, matching alert dedup): a burst EXTENDS
    while consecutive gaps stay under the window, however long the burst
    runs — suppressing relative to the burst's first row instead would
    re-emit mid-storm. ``tiebreak_cols`` orders equal timestamps
    deterministically.

    Plan: ONE keyed Exchange + one sort: a row is kept iff it STARTS a
    burst (its lag-gap exceeds the window, or it has no predecessor) — a
    single lag window and a filter, no burst-id numbering needed.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    starts_burst = prev.isNull() | (
        F.col(ts_col).cast("double") - prev.cast("double") > window_seconds
    )
    return df.withColumn("__k__", starts_burst).where(F.col("__k__")).drop("__k__")


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_by: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-key state sequences
    — (``from_state``, ``to_state``, ``n``, ``p``): the user-behavior /
    clickstream model behind next-event prediction and funnel priors.

    Beyond-reference operator (the pandas reference has no sequence
    analytics). ``order_by`` must be a TOTAL order within each key
    (include a unique id as the last column — ties would otherwise make
    ``lead`` nondeterministic and the result engine-dependent).

    ``p = n / n_from`` divides two exactly-representable int64 casts —
    IEEE-identical in every engine, no rounding fudge needed.

    Plan: ONE keyed window (partition by key, order by ``order_by``)
    over the raw events builds the adjacent pairs, one map-side-combined
    aggregate counts them; the row totals are a ``from_state``-keyed
    window over the AGGREGATED pair frame (state²-bounded — tiny), so
    the corpus is scanned exactly once — a totals join would re-derive
    the whole event pipeline a second time.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    w = Window.partitionBy(key_col).orderBy(*order_by)
    nxt = F.lead(F.col(state_col)).over(w)
    pairs = (
        df.select(F.col(state_col).alias("from_state"), nxt.alias("to_state"))
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("from_state"))
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n").cast("double") / tot.cast("double")).alias("p"),
    )
