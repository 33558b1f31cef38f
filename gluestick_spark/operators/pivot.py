"""Wide↔long reshaping: ``pivot_table`` (long → wide) and ``melt``
(wide → long), the pandas ``pivot_table``/``melt`` pair re-expressed
Spark-first.

Reference parity note: the pandas reference
(/root/reference/gluestick) leans on pandas' own reshape verbs inside
user pipelines rather than shipping wrappers; a drop-in user still
needs the verbs, so the engine provides them as first-class operators
with the same core semantics (explicit value list, aggregated cells,
stacked variable/value rows).

Scale posture (100 TB):

* ``pivot_table`` REQUIRES the explicit ``values`` list. Spark's
  ``pivot(col)`` without values silently runs an EAGER distinct job
  over the corpus and then builds one output column per distinct key —
  an unbounded-width plan a 100 TB table cannot survive. With explicit
  values the plan is static: ONE map-side-combined aggregate (each
  cell is a conditional partial aggregate), one shuffle on the index
  keys, bounded output width len(values)·len(aggs).
* ``melt`` is a pure narrow projection (Spark's native ``unpivot`` —
  each input row expands to len(value_vars) output rows in place, no
  shuffle, no driver participation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cube_agg", "melt", "pivot_table"]

_AGGS = {
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
}


def pivot_table(
    df: DataFrame,
    index: list[str],
    pivot_col: str,
    value_col: str,
    values: list,
    agg: str = "sum",
    fill=None,
) -> DataFrame:
    """Long → wide: one row per distinct ``index``, one column per
    entry of ``values`` holding ``agg(value_col)`` over the matching
    ``pivot_col`` rows (pandas ``pivot_table`` semantics; cells with no
    matching rows are NULL unless ``fill`` is given — pandas'
    ``fill_value``).

    ``values`` is REQUIRED (module docstring: implicit-distinct pivots
    are an unbounded-width anti-pattern at scale). Rows whose
    ``pivot_col`` is not in ``values`` are ignored, like pandas. Output
    columns are named ``str(value)``.
    """
    if not values:
        raise ValueError("values must be a non-empty explicit list")
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if not index:
        raise ValueError("index must be non-empty")
    fn = _AGGS[agg]
    out = (
        df.groupBy(*[F.col(c) for c in index])
        .pivot(pivot_col, values)
        .agg(fn(F.col(value_col)))
    )
    if fill is not None:
        out = out.select(
            *[F.col(c) for c in index],
            *[
                F.coalesce(F.col(f"`{v}`"), F.lit(fill)).alias(str(v))
                for v in values
            ],
        )
    return out


def cube_agg(
    df: DataFrame,
    dims: list[str],
    aggs: dict,
) -> DataFrame:
    """All-subtotals aggregation (SQL ``GROUP BY CUBE``): one row per
    cell of every dimension subset — the roll-up report a corpus audit
    reads (per-lang, per-source, per-lang×source, and the grand total in
    ONE pass). ``aggs`` maps output name → aggregate Column.

    Output: (*dims, per-dim ``g_<dim>`` grouping flags, *aggs). The
    flags come from ``grouping()`` (1 = dimension aggregated away), NOT
    from output nullability — so a NULL data value in a dimension stays
    distinguishable from that dimension's subtotal row (the classic
    CUBE footgun; same device as ``operators/rollup.py:time_rollup``).

    Scale posture: Spark expands CUBE before the aggregate (2^d
    replicas of each input row, partially aggregated map-side before
    ONE shuffle) — cost 2^d per row, so ``dims`` is capped at 5 (32×
    expansion) to keep the anti-pattern loud rather than silent; use
    explicit grouping-set lists (``time_rollup``'s shape) when only a
    few subsets are needed.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    if len(dims) > 5:
        raise ValueError(
            f"cube over {len(dims)} dims expands every row 2^{len(dims)}x; "
            "use explicit grouping sets instead"
        )
    if not aggs:
        raise ValueError("aggs must be non-empty")
    return df.cube(*[F.col(d) for d in dims]).agg(
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims],
        *[expr.alias(name) for name, expr in aggs.items()],
    )


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (pandas ``melt``): one output row per input row per
    entry of ``value_vars`` — (``id_vars``…, ``var_name``,
    ``value_name``). NULL cells are KEPT (one row with a NULL value),
    matching pandas; engines whose UNPIVOT drops NULLs differ — this
    contract is pinned by a test.

    ``value_vars`` must share (or coerce to) a least common type —
    Spark's native ``unpivot`` enforces this loudly; cast beforehand
    for mixed numeric widths. Pure narrow projection: no shuffle.
    """
    if not value_vars:
        raise ValueError("value_vars must be non-empty")
    return df.unpivot(
        [F.col(c) for c in id_vars],
        [F.col(c) for c in value_vars],
        var_name,
        value_name,
    )
