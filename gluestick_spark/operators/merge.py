"""General conditional MERGE — the ``MERGE INTO`` statement as an
operator, completing the state-management family: ``snapshot.upsert`` is
the keep-last special case, ``scd2.scd2_merge`` the history-keeping one,
``cdc.table_diff`` the observer; this is the programmable form (update
some columns under a condition, delete under another, insert the rest) a
warehouse MERGE expresses.

Scale shape: ONE full-outer hash join on the key; every clause
(update/delete/insert) is a CASE branch in a single projection — no
per-clause pass, no second shuffle. Cost is O(target + source) per merge
with AQE handling key skew; at 100 TB pair it with a hive/bucket layout
(`sinks/layout.py`) so the join co-locates, and prune the TARGET to the
partitions the source can touch before calling (the classic MERGE
optimization — this operator, like SQL MERGE, rewrites what it is given).

Clause semantics follow SQL MERGE: ``when_matched_delete`` is evaluated
first, then ``when_matched_update`` (each with an optional condition);
matched rows hitting neither clause stay unchanged; unmatched source rows
insert when ``when_not_matched_insert`` (optionally conditional);
unmatched target rows always survive. Expressions reference the two sides
as ``t.<col>`` and ``s.<col>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_into"]


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str | list[str],
    when_matched_update: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: bool | Column = True,
) -> DataFrame:
    """Apply MERGE semantics (see module docstring); returns the new
    target with the target's schema. ``when_matched_update`` maps target
    column names to expressions over ``t.*``/``s.*`` (columns not in the
    map keep their target values); source rows must be unique per key
    (pre-dedupe keep-last first). Insert takes the source's values for
    target columns (source must carry every non-key target column it
    inserts; missing ones raise at analysis)."""
    keys = [on] if isinstance(on, str) else list(on)
    t = target.alias("t").withColumn("__has_t__", F.lit(True))
    s = source.alias("s").withColumn("__has_s__", F.lit(True))
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    j = t.join(s, cond, "full_outer")

    matched = F.col("__has_t__").isNotNull() & F.col("__has_s__").isNotNull()
    t_only = F.col("__has_s__").isNull()
    s_only = F.col("__has_t__").isNull()

    # SQL MERGE treats a NULL clause condition as NOT satisfied (the row
    # falls through to the next clause / stays unchanged). Without the
    # coalesce a NULL delete condition poisons `keep` below into NULL and
    # where() silently DROPS the row — i.e. a NULL would delete.
    def _cond(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    delete_pred = matched & (
        _cond(when_matched_delete) if when_matched_delete is not None else F.lit(False)
    )
    upd_cond = (
        _cond(update_condition) if update_condition is not None else F.lit(True)
    )
    update_pred = matched & ~delete_pred & (
        upd_cond if when_matched_update is not None else F.lit(False)
    )
    ins_cond = (
        _cond(when_not_matched_insert)
        if isinstance(when_not_matched_insert, Column)
        else F.lit(bool(when_not_matched_insert))
    )
    insert_pred = s_only & ins_cond

    out_cols = []
    updates = when_matched_update or {}
    for c in target.columns:
        tc = F.col(f"t.{c}")
        # keys coalesce from either side; inserts take source values
        sc = F.col(f"s.{c}") if c in source.columns or c in keys else F.lit(None)
        val = (
            F.when(update_pred, updates.get(c, tc))
            .when(insert_pred, sc)
            .otherwise(tc)
        )
        out_cols.append(val.alias(c))
    keep = t_only | (matched & ~delete_pred) | insert_pred
    return j.where(keep).select(*out_cols)
