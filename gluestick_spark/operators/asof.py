"""As-of (temporal) join — a custom operator Spark's built-ins lack.

For each left row, attach the latest right row whose timestamp is at or
before (``inclusive=True``) / strictly before the left row's timestamp,
within the same join-key group. The classic uses: point-in-time feature
lookup, slowly-changing-dimension resolution, last-known-price enrichment.

Scale design: the naive formulation is a range join (``l.ts >= r.ts`` →
O(N·M) per key). This implementation is the single-shuffle union-window
form instead:

1. tag both sides and union them (right carries its payload in
   namespaced columns, absent on the left),
2. one window per key ordered by (ts, side): running
   ``last(payload, ignorenulls=True)`` fills every row with the most
   recent right payload at-or-before it,
3. keep only left rows.

One Exchange on the key (both inputs shuffled once, together), sort within
partitions, no cross product — the same plan shape at 100 TB as at 1 MB.
AQE skew-join handling applies to the single shuffle; a hot key degrades to
a sort, never to a quadratic join.

Determinism: if the right side has duplicate (key, ts) rows, which payload
wins is unspecified (as in DuckDB's ASOF join) — pre-dedupe the right side
to unique (key, ts) when exact reproducibility matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right payload at-or-before
    (or strictly before) each left timestamp, per key.

    Returns all left rows (left-outer semantics: no matching right row →
    null payload) with one ``{col}{suffix}`` column per right value column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]

    l2 = (
        left.withColumn("__side__", F.lit(1))
        .withColumn("__ats__", F.col(left_ts))
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ats__"),
        *[F.col(c).alias(f"__rv_{c}__") for c in value_cols],
    ).withColumn("__side__", F.lit(0))

    u = l2.unionByName(r2, allowMissingColumns=True)
    # At equal timestamps: inclusive ⇒ right rows order BEFORE left rows
    # (side 0 < 1 asc) so a left row sees an equal-ts right row; strict ⇒
    # left first, so it doesn't.
    side_order = F.col("__side__").asc() if inclusive else F.col("__side__").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ats__").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per RIGHT ROW (non-null exactly on right rows, even when
    # every payload field is null) so the window matches the latest right
    # ROW atomically: per-column last(ignorenulls) would skip a null field
    # back to an OLDER row and could stitch an output row from different
    # right rows — not as-of semantics.
    payload = F.when(
        F.col("__side__") == 0,
        F.struct(*[F.col(f"__rv_{c}__").alias(c) for c in value_cols]),
    )
    filled = u.select(
        "*", F.last(payload, ignorenulls=True).over(w).alias("__match__")
    )
    return filled.where(F.col("__side__") == 1).select(
        *[c for c in l2.columns if c not in ("__side__", "__ats__")],
        *[F.col(f"__match__.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def _bucket_of(c, width: int):
    """Exact integral floor-division for non-negative long values across the
    FULL long range: c − c mod w is an exact multiple of w, and the division
    happens in decimal (a double `/` would round above 2^53 — e.g. raw
    nanosecond epochs ~1.7e18 — silently mis-bucketing boundary points)."""
    c = c.cast("long")
    exact = (c - F.pmod(c, F.lit(width))).cast("decimal(38,0)")
    return (exact / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    key: str | list[str] | None = None,
) -> DataFrame:
    """Interval-containment join: each point row × every interval row with
    ``start ≤ point ≤ end`` (closed bounds), optionally also matching on
    equality ``key`` columns. Inner-join semantics.

    Scale design: Spark plans a bare inequality join as a nested-loop
    (O(N·M) — the 100 TB killer). This is the classic **binning**
    rewrite instead: every interval is exploded to the time buckets it
    covers (width ``bucket_width``, in the column's native units — seconds
    for timestamps), each point carries its single bucket, and the join
    becomes an EQUI-join on (key…, bucket) followed by the exact
    between-filter. One hash shuffle, no cross product; a point's bucket is
    unique so no dedupe step is needed. Interval replication factor is
    len/bucket_width + 1 — pick the width near the typical interval length.

    Timestamps bucket via ``cast(long)`` (epoch seconds); numeric columns
    must be non-negative and within long range.
    """
    keys = [] if key is None else ([key] if isinstance(key, str) else list(key))

    p = points.withColumn("__pb__", _bucket_of(F.col(point_col), bucket_width))
    cover = F.sequence(
        _bucket_of(F.col(start_col), bucket_width),
        _bucket_of(F.col(end_col), bucket_width),
    )
    iv = intervals.withColumn("__pb__", F.explode(cover))
    cond = [p["__pb__"] == iv["__pb__"]] + [p[k] == iv[k] for k in keys]
    joined = p.join(iv, cond, "inner").where(
        (p[point_col] >= iv[start_col]) & (p[point_col] <= iv[end_col])
    )
    # project away helper + duplicated key columns (keep the points side)
    drop = [iv["__pb__"], p["__pb__"]] + [iv[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined
