"""Column casting helpers with the reference's coercion semantics.

Parity targets:
- string→boolean goes through a lowercase CASE ("true"/"false" else null):
  /root/reference/gluestick/utils/polars_utils.py:31-59 (cast_df_from_schema).
- date-time coercion is coerce-to-null (errors="coerce"):
  /root/reference/gluestick/reader.py:105-116 → Spark ``try_to_timestamp``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["cast_expr", "cast_df_to_schema"]


def cast_expr(col: Column, dt: T.DataType, *, source_dt: T.DataType | None = None) -> Column:
    """Cast ``col`` to ``dt`` with gluestick coercion semantics."""
    if isinstance(dt, T.BooleanType) and (source_dt is None or isinstance(source_dt, T.StringType)):
        low = F.lower(F.trim(col.cast("string")))
        return (
            F.when(low == "true", F.lit(True))
            .when(low == "false", F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if isinstance(dt, T.TimestampType):
        if source_dt is not None and isinstance(source_dt, (T.TimestampType, T.DateType)):
            return col.cast(dt)
        return F.try_to_timestamp(col.cast("string"))
    if isinstance(dt, T.DateType) and (source_dt is None or isinstance(source_dt, T.StringType)):
        return F.try_to_timestamp(col.cast("string")).cast("date")
    return col.cast(dt)


def cast_df_to_schema(df: DataFrame, target: T.StructType, *, strict: bool = False) -> DataFrame:
    """Cast matching columns of ``df`` to the types in ``target``.

    Columns absent from ``target`` pass through unchanged; columns in
    ``target`` absent from ``df`` are ignored (added only when ``strict``).
    Single projection → one Catalyst Project node, no shuffles.
    """
    by_name = {f.name: f for f in target.fields}
    src_types = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for c in df.columns:
        f = by_name.get(c)
        if f is None or src_types[c] == f.dataType:
            cols.append(F.col(c))
        else:
            cols.append(cast_expr(F.col(c), f.dataType, source_dt=src_types[c]).alias(c))
    if strict:
        for f in target.fields:
            if f.name not in src_types:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
