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

    Requires a non-null ``ts_col`` (true for event time); the grain label
    is recovered from which truncated column is non-null.
    """
    grains = list(grains)
    extra = list(group_cols or [])
    gcols = [f"__g_{g}__" for g in grains]
    base = df.select(
        "*",
        *[F.date_trunc(g, F.col(ts_col)).alias(c) for g, c in zip(grains, gcols)],
    )
    sets = [[F.col(c)] + [F.col(x) for x in extra] for c in gcols]
    grouped = base.groupingSets(sets, *[F.col(c) for c in gcols + extra])
    out = grouped.agg(*[expr.alias(name) for name, expr in aggs.items()])
    grain_label = F.coalesce(
        *[F.when(F.col(c).isNotNull(), F.lit(g)) for g, c in zip(grains, gcols)]
    )
    return out.select(
        grain_label.alias("grain"),
        F.coalesce(*[F.col(c) for c in gcols]).alias("bucket"),
        *extra,
        *aggs.keys(),
    )
