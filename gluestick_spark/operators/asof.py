"""As-of (temporal) join — a custom operator Spark's built-ins lack.

For each left row, attach the nearest right row at-or-before
(``direction="backward"``), at-or-after (``"forward"``), or closest in
either direction (``"nearest"``) within the same join-key group, optionally
bounded by a ``tolerance``. The classic uses: point-in-time feature lookup,
slowly-changing-dimension resolution, last-known-price enrichment.
Semantics match DuckDB ``ASOF JOIN`` / pandas ``merge_asof``.

Scale design: the naive formulation is a range join (``l.ts >= r.ts`` →
O(N·M) per key). This implementation is the single-shuffle union-window
form instead:

1. tag both sides and union them (right carries its payload in
   namespaced columns, absent on the left),
2. one window per key ordered by (ts, side): running
   ``last(payload, ignorenulls=True)`` fills every row with the most
   recent right payload at-or-before it (backward; forward reverses the
   ordering; nearest runs both windows over the SAME exchange — the second
   window re-sorts within partitions but does not re-shuffle),
3. keep only left rows.

One Exchange on the key (both inputs shuffled once, together), sort within
partitions, no cross product — the same plan shape at 100 TB as at 1 MB.
AQE skew-join handling applies to the single shuffle; a hot key degrades to
a sort, never to a quadratic join.

Null handling (DuckDB-parity): right rows with a NULL timestamp are never
matched; left rows with a NULL timestamp get a NULL payload.

Determinism: if the right side has duplicate (key, ts) rows, which payload
wins is unspecified (as in DuckDB's ASOF join) — pre-dedupe the right side
to unique (key, ts) when exact reproducibility matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    inclusive: bool = True,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: left rows + the nearest right payload per key.

    ``direction``: ``"backward"`` (latest right at-or-before each left ts —
    the default), ``"forward"`` (earliest right at-or-after), or
    ``"nearest"`` (whichever of the two is closer; ties go backward, as in
    pandas ``merge_asof``). ``inclusive=False`` makes the bound strict —
    equal-timestamp right rows are excluded, in every direction (for
    ``"nearest"`` this is pandas ``allow_exact_matches=False``).
    ``tolerance`` (in the timestamp column's native units — seconds for
    timestamps) nulls out matches farther than the bound.

    Returns all left rows (left-outer semantics: no matching right row →
    null payload) with one ``{col}{suffix}`` column per right value column.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]

    l2 = (
        left.withColumn("__side__", F.lit(1))
        .withColumn("__ats__", F.col(left_ts))
    )
    # NULL right timestamps are unmatchable (DuckDB ASOF parity): unfiltered
    # they sort to an edge of the key group and their payload would leak
    # into left rows that should have no match.
    r2 = (
        right.where(F.col(right_ts).isNotNull())
        .select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias("__ats__"),
            *[F.col(c).alias(f"__rv_{c}__") for c in value_cols],
        )
        .withColumn("__side__", F.lit(0))
    )

    u = l2.unionByName(r2, allowMissingColumns=True)
    # One struct per RIGHT ROW (non-null exactly on right rows, even when
    # every payload field is null) so the window matches the latest right
    # ROW atomically: per-column last(ignorenulls) would skip a null field
    # back to an OLDER row and could stitch an output row from different
    # right rows — not as-of semantics. The struct carries the match ts for
    # the tolerance bound and the nearest tie-break.
    payload = F.when(
        F.col("__side__") == 0,
        F.struct(
            F.col("__ats__").alias("__mts__"),
            *[F.col(f"__rv_{c}__").alias(c) for c in value_cols],
        ),
    )

    def _window(backward: bool):
        # At equal timestamps: inclusive ⇒ right rows order BEFORE left rows
        # in scan direction so a left row sees an equal-ts right row;
        # strict ⇒ left first, so it doesn't.
        if backward:
            ts_order = F.col("__ats__").asc_nulls_first()
            side_order = F.col("__side__").asc() if inclusive else F.col("__side__").desc()
        else:
            ts_order = F.col("__ats__").desc_nulls_first()
            side_order = F.col("__side__").asc() if inclusive else F.col("__side__").desc()
        return (
            Window.partitionBy(*keys)
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction == "backward":
        matched = u.select(
            "*", F.last(payload, ignorenulls=True).over(_window(True)).alias("__match__")
        )
    elif direction == "forward":
        matched = u.select(
            "*", F.last(payload, ignorenulls=True).over(_window(False)).alias("__match__")
        )
    else:  # nearest — both scans share the one Exchange; pick the closer.
        both = u.select(
            "*",
            F.last(payload, ignorenulls=True).over(_window(True)).alias("__bwd__"),
            F.last(payload, ignorenulls=True).over(_window(False)).alias("__fwd__"),
        )
        gap_b = F.abs(F.col("__ats__").cast("double") - F.col("__bwd__.__mts__").cast("double"))
        gap_f = F.abs(F.col("__fwd__.__mts__").cast("double") - F.col("__ats__").cast("double"))
        matched = both.withColumn(
            "__match__",
            F.when(F.col("__bwd__").isNull(), F.col("__fwd__"))
            .when(F.col("__fwd__").isNull(), F.col("__bwd__"))
            .when(gap_b <= gap_f, F.col("__bwd__"))
            .otherwise(F.col("__fwd__")),
        )

    # Left NULL ts ⇒ no match (its edge position in the sort is arbitrary).
    guard = F.col("__ats__").isNotNull()
    if tolerance is not None:
        gap = F.abs(
            F.col("__ats__").cast("double") - F.col("__match__.__mts__").cast("double")
        )
        guard = guard & (gap <= F.lit(float(tolerance)))
    final_match = F.when(guard, F.col("__match__"))
    return (
        matched.where(F.col("__side__") == 1)
        .withColumn("__match__", final_match)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__match__.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )


def _bucket_of(c, width: int):
    """Exact integral floor-division for non-negative long values across the
    FULL long range: c − c mod w is an exact multiple of w, and the division
    happens in decimal (a double `/` would round above 2^53 — e.g. raw
    nanosecond epochs ~1.7e18 — silently mis-bucketing boundary points)."""
    c = c.cast("long")
    exact = (c - F.pmod(c, F.lit(width))).cast("decimal(38,0)")
    return (exact / F.lit(width)).cast("long")


# Auto bucket_width guard: the p99-longest interval replicates into at most
# this many buckets (+1), bounding the explode even when the median is tiny
# and the tail is long.
_MAX_REPLICATION = 256


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
    key: str | list[str] | None = None,
    suffix: str = "_iv",
) -> DataFrame:
    """Interval-containment join: each point row × every interval row with
    ``start ≤ point ≤ end`` (closed bounds), optionally also matching on
    equality ``key`` columns. Inner-join semantics. Interval-side non-key
    columns whose names collide with point-side columns are renamed with
    ``suffix`` so every output column stays addressable by name.

    Scale design: Spark plans a bare inequality join as a nested-loop
    (O(N·M) — the 100 TB killer). This is the classic **binning**
    rewrite instead: every interval is exploded to the time buckets it
    covers (width ``bucket_width``, in the column's native units — seconds
    for timestamps), each point carries its single bucket, and the join
    becomes an EQUI-join on (key…, bucket) followed by the exact
    between-filter. One hash shuffle, no cross product; a point's bucket is
    unique so no dedupe step is needed. Interval replication factor is
    len/bucket_width + 1 — pick the width near the typical interval length.

    ``bucket_width=None`` derives it from the data in one cheap aggregate
    job: the median interval length (median interval → ≤2 buckets), raised
    so the p99-longest interval replicates into at most ``_MAX_REPLICATION``
    buckets — a long-tailed interval distribution can't explode the build
    side. Pass an explicit width to skip the extra job (e.g. when the
    interval frame is an expensive derived plan).

    Timestamps bucket via ``cast(long)`` (epoch seconds); numeric columns
    must be non-negative and within long range.
    """
    keys = [] if key is None else ([key] if isinstance(key, str) else list(key))

    # Rename colliding interval-side columns (start/end included) up front.
    collisions = (set(intervals.columns) - set(keys)) & set(points.columns)
    for c in sorted(collisions):
        intervals = intervals.withColumnRenamed(c, f"{c}{suffix}")
    if start_col in collisions:
        start_col = f"{start_col}{suffix}"
    if end_col in collisions:
        end_col = f"{end_col}{suffix}"

    if bucket_width is None:
        span = F.col(end_col).cast("long") - F.col(start_col).cast("long")
        stats = intervals.select(
            F.percentile_approx(span, 0.5).alias("med"),
            F.percentile_approx(span, 0.99).alias("p99"),
        ).first()
        med = max(int(stats["med"] or 0), 1)
        p99 = int(stats["p99"] or med)
        bucket_width = max(med, -(-p99 // _MAX_REPLICATION))

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
