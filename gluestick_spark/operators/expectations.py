"""Declarative data-quality expectations — the distributed audit twin of
the reference's Pydantic record validation (`gluestick/unified_models_utils.py`;
our per-record path is `validation.py`).

Pydantic validates one record at a time in Python — fine at the reference's
single-node scale, a non-starter at 100 TB. This module evaluates a rule
set over a whole DataFrame with engine-side expressions and returns an
audit summary (one row per rule with exact violation counts), the shape
data contracts / expectation suites (Great Expectations, dbt tests, Deequ)
standardize on.

Scale design — the rule taxonomy maps to plan shapes:

- **Row-local rules** (``not_null``, ``in_range``, ``in_set``,
  ``matches``): ALL of them fold into ONE conditional aggregate over ONE
  scan — adding a rule adds a counter, never a pass. Map-side partial
  aggregation reduces each task to a single row.
- **``unique``**: one keyed shuffle (groupBy count>1); violation count is
  the number of EXCESS rows (total − distinct), so a fully-unique key
  costs one aggregate and reports 0.
- **``ref``** (referential integrity): left-anti join against the
  referenced keys — broadcast when the dimension is small (the planner
  decides), never a cartesian.

Rules are plain dicts so suites can live in config files next to the
tenant mappings the reference already ships around.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "schema_drift", "assert_no_breaking_drift"]


def _row_rule_pred(rule: dict) -> Column:
    """True where the row VIOLATES the rule (row-local rules only)."""
    kind = rule["rule"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        ok = F.lit(True)
        if "min" in rule:
            ok = ok & (c >= F.lit(rule["min"]))
        if "max" in rule:
            ok = ok & (c <= F.lit(rule["max"]))
        return c.isNotNull() & ~ok
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown row-local rule: {kind!r}")


def _rule_label(rule: dict) -> str:
    if "__label__" in rule:
        return rule["__label__"]
    kind = rule["rule"]
    col = rule.get("col") or ",".join(rule.get("cols", []))
    return f"{kind}:{col}"


def check_expectations(
    df: DataFrame,
    rules: list[dict],
    ref_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (``rule`` label, ``n_violations``). NULLs violate only ``not_null``
    (SQL semantics: a NULL is not "out of range", it's absent — match the
    dbt/GE convention and test nullability separately).

    Rule forms::

        {"rule": "not_null", "col": "x"}
        {"rule": "in_range", "col": "x", "min": 0, "max": 10}   # either bound optional
        {"rule": "in_set",   "col": "s", "values": [...]}
        {"rule": "matches",  "col": "s", "pattern": r"^\\d+$"}
        {"rule": "unique",   "cols": ["pk", ...]}
        {"rule": "ref",      "col": "fk", "ref": "name", "ref_col": "pk"}

    ``ref`` rules resolve ``name`` in ``ref_tables``. NULL foreign keys
    are not violations (SQL FK semantics).
    """
    # disambiguate repeated (kind, col) labels — e.g. two `matches` rules
    # on one column — so aggregate aliases and output rows stay unique
    seen: dict[str, int] = {}
    rules = [dict(r) for r in rules]
    for r in rules:
        label = _rule_label(r)
        seen[label] = seen.get(label, 0) + 1
        if seen[label] > 1:
            r["__label__"] = f"{label}#{seen[label]}"

    row_rules = [r for r in rules if r["rule"] in ("not_null", "in_range", "in_set", "matches")]
    unique_rules = [r for r in rules if r["rule"] == "unique"]
    ref_rules = [r for r in rules if r["rule"] == "ref"]
    known = len(row_rules) + len(unique_rules) + len(ref_rules)
    if known != len(rules):
        bad = [r["rule"] for r in rules
               if r["rule"] not in ("not_null", "in_range", "in_set", "matches", "unique", "ref")]
        raise ValueError(f"unknown rule kinds: {bad}")

    spark = df.sparkSession
    parts: list[DataFrame] = []

    if row_rules:
        # one scan, one aggregate row, every row-local rule a counter
        aggs = [
            F.sum(_row_rule_pred(r).cast("long")).alias(_rule_label(r))
            for r in row_rules
        ]
        wide = df.agg(*aggs)
        stacked = wide.select(
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(_rule_label(r)) for r in row_rules]),
                    # coalesce: sum over an empty frame is NULL, not 0
                    F.array(*[
                        F.coalesce(F.col(f"`{_rule_label(r)}`"), F.lit(0))
                        for r in row_rules
                    ]),
                )
            ).alias("rule", "n_violations")
        )
        parts.append(stacked)

    for r in unique_rules:
        cols = list(r["cols"])
        # excess rows = total − distinct keys (NULL-keyed rows count as a
        # key, matching groupBy semantics)
        excess = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n__")).agg(
            F.coalesce(F.sum(F.col("__n__") - 1), F.lit(0)).alias("n_violations")
        )
        parts.append(excess.select(F.lit(_rule_label(r)).alias("rule"), "n_violations"))

    for r in ref_rules:
        if not ref_tables or r["ref"] not in ref_tables:
            raise ValueError(f"ref rule needs ref_tables[{r['ref']!r}]")
        ref_keys = ref_tables[r["ref"]].select(
            F.col(r["ref_col"]).alias("__rk__")
        ).distinct()
        orphans = (
            df.where(F.col(r["col"]).isNotNull())
            .select(F.col(r["col"]).alias("__rk__"))
            .join(ref_keys, "__rk__", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        parts.append(orphans.select(F.lit(_rule_label(r)).alias("rule"), "n_violations"))

    if not parts:
        return spark.createDataFrame([], "rule string, n_violations long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def schema_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Column-level schema diff between two frames — the incremental-load
    guard the catalog-coercion family needs: a new batch that silently
    dropped a column, grew one, or changed a type should be CAUGHT at
    the schema boundary, not three joins later as a resolution error.

    Returns one row per column in either schema:
    (``column``, ``type_before``, ``type_after``, ``change``) with
    ``change`` ∈ added | dropped | type_changed | unchanged (types as
    Spark ``simpleString``; absent side is NULL). Columns are compared
    by NAME (the union-relaxed convention); nested struct/array types
    compare by their full simpleString, so a field added INSIDE a struct
    reads as type_changed on the struct column.

    Pure metadata — schemas come from the plan, no job runs; the result
    is a tiny driver-built frame."""
    b = {f.name: f.dataType.simpleString() for f in before.schema.fields}
    a = {f.name: f.dataType.simpleString() for f in after.schema.fields}
    rows = []
    for c in sorted(set(b) | set(a)):
        if c in b and c not in a:
            change = "dropped"
        elif c not in b and c in a:
            change = "added"
        elif b[c] != a[c]:
            change = "type_changed"
        else:
            change = "unchanged"
        rows.append((c, b.get(c), a.get(c), change))
    return before.sparkSession.createDataFrame(
        rows,
        "column string, type_before string, type_after string, change string",
    )


def assert_no_breaking_drift(
    before: DataFrame, after: DataFrame, allow_added: bool = True
) -> None:
    """Raise ``ValueError`` listing every BREAKING schema change between
    ``before`` and ``after`` (dropped columns and type changes always
    break; added columns break only with ``allow_added=False`` — strict
    contracts). The loud-guard companion to :func:`schema_drift`, meant
    as the first line of an incremental load."""
    bad_kinds = {"dropped", "type_changed"} | (
        set() if allow_added else {"added"}
    )
    bad = [
        (r["column"], r["change"], r["type_before"], r["type_after"])
        for r in schema_drift(before, after).collect()
        if r["change"] in bad_kinds
    ]
    if bad:
        detail = "; ".join(
            f"{c}: {k} ({tb} -> {ta})" for c, k, tb, ta in bad
        )
        raise ValueError(
            f"breaking schema drift between batches: {detail}. Fix the "
            "upstream extract or migrate the snapshot before loading."
        )
