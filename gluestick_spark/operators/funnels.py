"""Ordered funnel analysis — per-user earliest strict-order completion of
an event-step sequence, with an optional conversion window anchored at the
first step. The product-analytics primitive (signup → activation →
purchase) the reference's pandas surface has no room for at scale.

Semantics (the chained-min funnel, the common analytics contract):
``t_0`` = the user's earliest step-0 event; ``t_i`` = the earliest step-i
event STRICTLY after ``t_{i-1}`` (ties at the same timestamp never chain —
deterministic under any event ordering); with ``within_seconds`` set, every
``t_i (i ≥ 1)`` must also land inside ``(t_0, t_0 + within]`` — the window
is anchored at the earliest entry, not searched over all entries. Greedy
earliest-completion is optimal for this contract, so the per-user scan and
the chained ``min`` formulation (which an oracle reproduces as k chained
SQL CTEs) agree exactly.

Scale shape: ONE keyed shuffle. Events are filtered to the step set at the
scan (predicate pushdown), grouped per user into a sorted struct array,
and the funnel state machine runs as a pure Catalyst ``aggregate`` lambda
over that array — no per-step self-joins (k-step funnels as k joins re-read
the event table k times), no window functions, no Python. The final count
is a tiny second aggregate over k rows per user. Per-user event counts are
bounded by user activity, not corpus size — the standard assumption every
sessionizer in this repo shares; a user with millions of events is a bot
you filtered earlier.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "funnel_times"]


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """Per-user funnel completion times: (``user_col``, ``t_0`` …
    ``t_{k-1}``) — NULL from the first uncompleted step onward. See module
    docstring for the exact contract."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {list(steps)}")
    k = len(steps)

    step_idx = F.lit(None).cast("int")
    for i in reversed(range(k)):
        step_idx = F.when(F.col(event_col) == steps[i], F.lit(i)).otherwise(step_idx)

    evs = (
        df.where(F.col(event_col).isin(list(steps)) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u__"),
            F.struct(
                F.col(ts_col).alias("ts"), step_idx.alias("si")
            ).alias("__e__"),
        )
    )
    per_user = evs.groupBy("__u__").agg(
        F.sort_array(F.collect_list("__e__")).alias("__seq__")
    )

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def advance(acc, e):
        # one event: fill slot e.si iff empty, prior slot filled (or si=0),
        # strictly after the prior time, and inside the t0-anchored window
        prior_ok = (e["si"] == 0) | (
            F.element_at(acc, e["si"]).isNotNull()
            & (e["ts"] > F.element_at(acc, e["si"]))
        )
        if within_seconds is not None:
            prior_ok = prior_ok & (
                (e["si"] == 0)
                | (
                    e["ts"]
                    <= F.element_at(acc, F.lit(1))
                    + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
                )
            )
        return F.transform(
            acc,
            lambda cur, i: F.when(
                (i == e["si"]) & cur.isNull() & prior_ok, e["ts"]
            ).otherwise(cur),
        )

    state = F.aggregate("__seq__", init, advance)
    return per_user.select(
        F.col("__u__").alias(user_col),
        *[F.element_at(state, i + 1).alias(f"t_{i}") for i in range(k)],
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """The funnel report: (``step_index``, ``step``, ``n_users``) — users
    whose earliest strict-order completion reached each step (so counts
    are non-increasing down the funnel). One keyed shuffle + one k-row
    aggregate; see :func:`funnel_times`."""
    times = funnel_times(df, user_col, ts_col, event_col, steps, within_seconds)
    k = len(steps)
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).cast("long").alias(f"__n_{i}__")
            for i in range(k)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_index"),
                F.lit(steps[i]).alias("step"),
                F.col(f"__n_{i}__").alias("n_users"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.n_users"
    )
