"""Row hashing for change detection.

Parity: /root/reference/gluestick/etl_utils.py:272-296 (get_row_hash) — md5
of the concatenation of stringified NON-NULL values, columns sorted by name,
no separator. ``concat_ws("")`` drops nulls, matching the null-skip.

Stringification contract: values are rendered with Spark's string cast.
Integers and strings match Python ``str()`` exactly; floats may differ in
trailing-zero rendering (``1.0`` both sides — safe; exotic floats may not
be, documented limitation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_hash_expr", "with_row_hash"]


def row_hash_expr(columns: list[str]) -> Column:
    ordered = sorted(columns)
    return F.md5(F.concat_ws("", *[F.col(f"`{c}`").cast("string") for c in ordered]))


def with_row_hash(df: DataFrame, hash_col: str = "hash", columns: list[str] | None = None) -> DataFrame:
    cols = columns if columns is not None else df.columns
    return df.withColumn(hash_col, row_hash_expr(cols))
