"""Hypertable-style time rollup: every grain in ONE scan.

The continuous-aggregate pattern (timescale-style hypertable rollups):
aggregate a fact table to several time granularities (hour/day/month…)
at once. The naive form is one groupBy per grain — G scans and G
shuffles of the full table. This operator projects one ``date_trunc``
column per grain and aggregates them under GROUPING SETS, so Spark
computes all grains from a single scan with shared map-side partial
aggregation; the shuffle carries one row per (grain, bucket) group —
already-reduced data, not the fact table.

At 100 TB the difference is G full passes vs one. Rollup output is
typically written partitioned by ``grain`` so dashboards partition-prune
to the granularity they read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    grains: list[str] | tuple[str, ...] = ("hour", "day"),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate ``df`` to every grain in ``grains`` in one pass.

    ``aggs`` maps output name → aggregate expression (e.g.
    ``{"n": F.count("*")}``); ``group_cols`` are extra dimensions present
    at every grain. Output: (``grain`` label, ``bucket`` truncated
    timestamp, *group_cols, *aggs) — the union of per-grain rollups,
    computed via GROUPING SETS over per-grain ``date_trunc`` columns.

    The grain label comes from ``grouping_id()`` (which grouping set
    produced the row), NOT from data nullability — so null timestamps are
    handled correctly: each grain gets its own labeled null bucket instead
    of indistinguishable unlabeled rows.
    """
    grains = list(grains)
    extra = list(group_cols or [])
    gcols = [f"__g_{g}__" for g in grains]
    base = df.select(
        "*",
        *[F.date_trunc(g, F.col(ts_col)).alias(c) for g, c in zip(grains, gcols)],
    )
    sets = [[F.col(c)] + [F.col(x) for x in extra] for c in gcols]
    all_cols = gcols + extra
    grouped = base.groupingSets(sets, *[F.col(c) for c in all_cols])
    out = grouped.agg(
        F.grouping_id().alias("__gid__"),
        *[expr.alias(name) for name, expr in aggs.items()],
    )
    # grouping_id bit i (MSB-first over all_cols) is 1 iff the column is
    # aggregated away in that set; grain i's set keeps gcols[i] + extras.
    n = len(all_cols)

    def gid_for(i: int) -> int:
        bits = [0 if j == i else 1 for j in range(len(gcols))] + [0] * len(extra)
        return sum(b << (n - 1 - pos) for pos, b in enumerate(bits))

    grain_label = F.coalesce(
        *[
            F.when(F.col("__gid__") == gid_for(i), F.lit(g))
            for i, g in enumerate(grains)
        ]
    )
    bucket = F.coalesce(
        *[
            F.when(F.col("__gid__") == gid_for(i), F.col(gcols[i]))
            for i in range(len(grains))
        ]
    )
    return out.select(
        grain_label.alias("grain"),
        bucket.alias("bucket"),
        *extra,
        *aggs.keys(),
    )
