"""Slowly-changing-dimension type-2 (SCD2) history maintenance.

The reference's snapshot machinery (`gluestick/etl_utils.py:152-269`) is
SCD **type 1**: the upsert overwrites, history is lost. Warehouse pipelines
that feed point-in-time joins (see ``operators/asof.py``) need type 2 —
every change appends a new version row and closes the previous one with a
validity interval, so "what was this row worth at time T" stays answerable
forever. This operator is the merge step; compose it with
``top_k_per_group(k=1)`` to collapse a raw change feed to one row per key
first.

Contract: ``history`` rows are (keys…, tracked…, ``valid_from``,
``valid_to``), where ``valid_to IS NULL`` marks the current version (at
most one per key). ``batch`` rows are (keys…, tracked…, ``ts_col``), ONE
row per key (pre-dedupe a multi-change batch — keep-last — before
merging), with ``ts_col`` ≥ every current ``valid_from`` (merges apply in
time order, the same precondition as any incremental MERGE).

Merge cases (standard SCD2):
- key only in history      → unchanged (still current)
- key only in batch        → new current row, ``valid_from = ts``
- both, tracked cols equal (null-safe) → unchanged (no version churn)
- both, tracked cols differ → close the old row (``valid_to = ts``) AND
  append the new current row

Scale shape: already-closed history rows pass through UNTOUCHED — no
shuffle, no rewrite (at 100 TB the closed set dwarfs the current set; a
merge that rewrote it would be O(history) per batch). The current set and
the batch meet in ONE full-outer hash join on the key; each joined row
emits its 1–2 output rows via a single array-explode projection, then a
union with the untouched closed set. Per-batch cost is O(current + batch),
independent of total history size. Null-safe equality (`eqNullSafe` /
``IS NOT DISTINCT FROM``) keeps the change test engine-portable for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    pk: str | list[str],
    ts_col: str = "ts",
    tracked_cols: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of changes to an SCD2 ``history`` (see module
    docstring for the contract). Returns the new full history with the
    same column layout: (keys…, tracked…, ``valid_from``, ``valid_to``).
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    if tracked_cols is None:
        tracked_cols = [c for c in batch.columns if c not in set(keys) | {ts_col}]
    if not tracked_cols:
        raise ValueError("scd2_merge needs at least one tracked column")

    closed = history.where(F.col(valid_to).isNotNull())
    current = history.where(F.col(valid_to).isNull()).withColumn(
        "__has_c__", F.lit(True)
    )
    b = batch.select(
        *keys,
        F.col(ts_col).alias("__bts__"),
        *[F.col(c).alias(f"__b_{c}__") for c in tracked_cols],
        F.lit(True).alias("__has_b__"),
    )
    j = current.join(b, keys, "full_outer")

    unchanged = F.lit(True)
    for c in tracked_cols:
        unchanged = unchanged & F.col(c).eqNullSafe(F.col(f"__b_{c}__"))

    cur_row = F.struct(
        *[F.col(c).alias(c) for c in tracked_cols],
        F.col(valid_from).alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )
    closed_cur_row = F.struct(
        *[F.col(c).alias(c) for c in tracked_cols],
        F.col(valid_from).alias(valid_from),
        F.col("__bts__").alias(valid_to),
    )
    new_row = F.struct(
        *[F.col(f"__b_{c}__").alias(c) for c in tracked_cols],
        F.col("__bts__").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )
    emit = (
        F.when(F.col("__has_b__").isNull(), F.array(cur_row))
        .when(F.col("__has_c__").isNull(), F.array(new_row))
        .when(unchanged, F.array(cur_row))
        .otherwise(F.array(closed_cur_row, new_row))
    )
    merged = (
        j.select(*keys, F.explode(emit).alias("__r__"))
        .select(*keys, "__r__.*")
    )
    return closed.select(*keys, *tracked_cols, valid_from, valid_to).unionByName(
        merged
    )
