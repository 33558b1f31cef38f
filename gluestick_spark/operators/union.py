"""Schema-evolving union (the polars ``diagonal_relaxed`` concat, U2).

Parity: /root/reference/gluestick/readers/pl_reader.py:145-152 and
pl_lazyframe_reader.py:162-168 delegate to polars' relaxed diagonal concat;
Spark needs the reconciliation spelled out. Rules (widest common type):

- identical types → unchanged
- both numeric → integer ranks widen up to Long; any fractional → Double
- date + timestamp → timestamp
- anything + string (or any other mismatch) → string
- missing columns → null-filled (``unionByName(allowMissingColumns=True)``)

Pure DataFrame API — a projection per side, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["widest_common_type", "union_relaxed", "keep_last"]

_INT_RANK = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def widest_common_type(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    a_int, b_int = type(a) in _INT_RANK, type(b) in _INT_RANK
    a_frac, b_frac = isinstance(a, _FRACTIONAL), isinstance(b, _FRACTIONAL)
    if a_int and b_int:
        return a if _INT_RANK[type(a)] >= _INT_RANK[type(b)] else b
    if (a_int or a_frac) and (b_int or b_frac):
        return T.DoubleType()
    if {type(a), type(b)} == {T.DateType, T.TimestampType}:
        return T.TimestampType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(widest_common_type(a.elementType, b.elementType))
    return T.StringType()


def union_relaxed(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union with column-superset + widest-common-type reconciliation."""
    lt = {f.name: f.dataType for f in left.schema.fields}
    rt = {f.name: f.dataType for f in right.schema.fields}

    def reconcile(df: DataFrame, own: dict[str, T.DataType], other: dict[str, T.DataType]) -> DataFrame:
        cols = []
        changed = False
        for c in df.columns:
            if c in other and own[c] != other[c]:
                target = widest_common_type(own[c], other[c])
                if target != own[c]:
                    cols.append(F.col(f"`{c}`").cast(target).alias(c))
                    changed = True
                    continue
            cols.append(F.col(f"`{c}`"))
        return df.select(*cols) if changed else df

    left2 = reconcile(left, lt, rt)
    right2 = reconcile(right, rt, lt)
    return left2.unionByName(right2, allowMissingColumns=True)


def keep_last(
    df: DataFrame,
    pk: str | list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Deduplicate by PK keeping the last row.

    pandas ``drop_duplicates(pk, keep="last")`` is positional; Spark needs an
    explicit ordering (SURVEY §4.2.1). When ``order_col`` is None a
    ``monotonically_increasing_id`` is attached first — callers that union
    snapshot+incoming must attach a source-priority column *before* the
    union and pass it here.
    """
    from pyspark.sql.window import Window

    pk_list = [pk] if isinstance(pk, str) else list(pk)
    tmp_order = order_col
    if tmp_order is None:
        tmp_order = "__ord__"
        df = df.withColumn(tmp_order, F.monotonically_increasing_id())
    w = Window.partitionBy(*[F.col(f"`{c}`") for c in pk_list]).orderBy(
        F.col(f"`{tmp_order}`").desc()
    )
    out = (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    if order_col is None:
        out = out.drop(tmp_order)
    return out
