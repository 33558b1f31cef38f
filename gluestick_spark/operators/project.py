"""Projection / filter operators.

Parity targets (citations into /root/reference):
- ``rename``: gluestick/pandas_utils.py:74-113 — list → column subset;
  dict → select intersection of mapping keys and df columns, renamed.
- ``pluck_fields``: gluestick/etl_utils.py:1042-1141 — filter rows by
  ``id_field ∈ filter_ids`` (+ optional partition key), project target
  fields.
- ``pluck_fields_by_regex``: gluestick/etl_utils.py:1161-1177.
- ``process_custom_fields``: gluestick/etl_utils.py:1143-1159 — row dict →
  ``[{"name": k, "value": v}]`` dropping nulls.
- all-null column drop: gluestick/singer.py:498-499.
"""

from __future__ import annotations

import re
from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "rename",
    "pluck_fields",
    "pluck_fields_by_regex",
    "custom_fields_expr",
    "array_to_dict_expr",
    "array_to_dict_reducer",
    "drop_all_null_columns",
]


def rename(df: DataFrame, target_columns: list[str] | dict[str, str] | None) -> DataFrame:
    """Subset (list) or subset+rename (dict) columns; unknown names skipped."""
    if not target_columns:
        return df
    if isinstance(target_columns, (list, set, tuple)):
        keep = [c for c in target_columns if c in df.columns]
        return df.select(*[F.col(f"`{c}`") for c in keep])
    if isinstance(target_columns, dict):
        pairs = [(k, v) for k, v in target_columns.items() if k in df.columns]
        return df.select(*[F.col(f"`{k}`").alias(v) for k, v in pairs])
    raise TypeError("target_columns must be a list or dict")


def pluck_fields(
    df: DataFrame,
    id_field: str,
    filter_ids: Iterable[Any],
    target_fields: str | list[str] | dict[str, str],
    partition_key: str | None = None,
    partition_value: Any = None,
) -> DataFrame:
    """Filter to ``id_field ∈ filter_ids`` (+ optional partition predicate),
    project target fields. ``target_fields`` as dict renames on the way out.
    """
    cond: Column = F.col(f"`{id_field}`").isin(list(filter_ids))
    if partition_key is not None:
        cond = cond & (F.col(f"`{partition_key}`") == F.lit(partition_value))
    out = df.where(cond)
    if isinstance(target_fields, str):
        target_fields = [target_fields]
    if isinstance(target_fields, dict):
        cols = [F.col(f"`{k}`").alias(v) for k, v in target_fields.items() if k in df.columns]
    else:
        cols = [F.col(f"`{c}`") for c in target_fields if c in df.columns]
    return out.select(F.col(f"`{id_field}`"), *cols)


def pluck_fields_by_regex(df: DataFrame, pattern: str, keep: list[str] | None = None) -> DataFrame:
    """Keep columns whose name matches ``pattern`` (plus ``keep`` passthrough
    columns, e.g. the PK)."""
    rx = re.compile(pattern)
    keep = keep or []
    cols = [c for c in df.columns if c in keep or rx.search(c)]
    return df.select(*[F.col(f"`{c}`") for c in cols])


def custom_fields_expr(columns: list[str], name_key: str = "name", value_key: str = "value") -> Column:
    """Columns → ``array<struct<name,value>>`` dropping null values
    (etl_utils.py:1143-1159). Values stringified like the reference's dict
    serialization."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias(name_key),
                F.col(f"`{c}`").cast("string").alias(value_key),
            )
            for c in columns
        ]
    )
    return F.filter(entries, lambda x: x[value_key].isNotNull())


def array_to_dict_expr(
    entries: Column, key_field: str = "name", value_field: str = "value"
) -> Column:
    """``array<struct>`` of key/value entries → ``map`` column — the inverse
    of :func:`custom_fields_expr` (gluestick/pandas_utils.py:381-412
    ``array_to_dict_reducer``). Later duplicate keys win, matching the
    reference's reduce-into-dict semantics (``map_from_entries`` keeps the
    last entry under ``spark.sql.mapKeyDedupPolicy=LAST_WIN``; the session
    factory sets it)."""
    return F.map_from_entries(
        F.transform(entries, lambda x: F.struct(x[key_field], x[value_field]))
    )


def array_to_dict_reducer(key_prop: str | None = None, value_prop: str | None = None):
    """Record-level reducer: fold an array of dicts into one dict
    (gluestick/pandas_utils.py:381-412). Kept for API parity — reference ETL
    scripts pass it as ``explode_json_to_cols(..., reducer=...)`` (where the
    reference, like this repo, accepts-and-ignores it) and use it with
    ``functools.reduce`` directly. The distributed equivalent is
    :func:`array_to_dict_expr`."""

    def reducer(accumulator: dict, current_value: dict) -> dict:
        if type(current_value) is not dict:
            raise AttributeError("Value being reduced must be a dictionary")
        if key_prop is not None and value_prop is not None:
            accumulator[current_value.get(key_prop)] = current_value.get(value_prop)
        else:
            accumulator.update(current_value)
        return accumulator

    return reducer


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """Drop columns whose values are all null (singer.py:498-499).

    One aggregate pass (map-side combinable count per column).
    """
    counts = df.agg(
        *[F.count(F.col(f"`{c}`")).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    if len(keep) == len(df.columns):
        return df
    return df.select(*[F.col(f"`{c}`") for c in keep])
