"""Change-data-capture diff: compare two table versions, emit a change feed.

The reference detects changes one way only — ``drop_redundant`` discards
incoming rows whose hash matches the snapshot (`gluestick/etl_utils.py:
299-367`). This operator is the full two-sided version: given an old and a
new version of a table keyed by ``pk``, emit every INSERT / DELETE /
UPDATE with both sides' values — the feed that drives downstream syncs,
audits, and incremental rebuilds (and the input shape
``operators/scd2.py`` consumes).

Scale shape: ONE full-outer hash join on the key + a null-safe column
compare, then unchanged rows are filtered out — output is proportional to
the CHANGE volume, not the table size. No window, no sort; the join is the
only shuffle and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    pk: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change feed between ``old`` and ``new``: one row per changed key —
    (keys…, ``change`` ∈ insert|delete|update, ``old_{c}``/``new_{c}`` per
    compare column; the absent side's values are NULL for inserts/deletes).
    Keys present in both with all compare columns null-safe-equal emit
    nothing. Both inputs must be unique per key (pre-dedupe a raw feed
    with keep-last first)."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    if not compare_cols:
        raise ValueError("table_diff needs at least one compare column")

    o = old.select(
        *keys,
        F.lit(True).alias("__has_o__"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__has_n__"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    unchanged = F.lit(True)
    for c in compare_cols:
        unchanged = unchanged & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__has_o__").isNull(), F.lit("insert"))
        .when(F.col("__has_n__").isNull(), F.lit("delete"))
        .when(~unchanged, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *keys,
            "change",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
