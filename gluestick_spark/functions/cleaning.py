"""Deep null-cleaning helpers.

Parity targets (citations into /root/reference):
- ``remove_nulls_deep``: gluestick/singer.py:404-433 — recursive None/NaN
  removal in nested dict/list records.
- ``clean_convert``: gluestick/etl_utils.py:369-402 — deep None removal +
  ISO datetime formatting.
- ``clean_obj_null_values``: gluestick/etl_utils.py:404-427 — 'null' →
  'None' string replace inside stringified JSON.

In the Spark engine the executor-side equivalent is ``to_json(...,
ignoreNullFields=true)`` (the singer sink uses it), so these run driver-side
on plain Python records (STATE payloads, config blobs). ``nulls_trimmed_expr``
is the column form for trimming a struct/array column in-plan.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "remove_nulls_deep",
    "clean_convert",
    "clean_obj_null_values",
    "deep_convert_datetimes",
    "nulls_trimmed_expr",
]


def _is_null(v: Any) -> bool:
    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return True
    return False


def remove_nulls_deep(obj: Any) -> Any:
    """Recursively remove null values from nested dict/list structures."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if _is_null(v):
                continue
            cleaned = remove_nulls_deep(v)
            out[k] = cleaned
        return out
    if isinstance(obj, list):
        return [remove_nulls_deep(v) for v in obj if not _is_null(v)]
    return obj


def clean_convert(obj: Any) -> Any:
    """Deep None removal + ISO datetime formatting (etl_utils.py:369-402)."""
    if isinstance(obj, list):
        return [clean_convert(v) for v in obj if v is not None]
    if isinstance(obj, dict):
        return {k: clean_convert(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, datetime.datetime):
        return obj.isoformat()
    if isinstance(obj, datetime.date):
        return obj.isoformat()
    return obj


def clean_obj_null_values(col):
    """Replace JSON ``null`` literals with Python ``None`` text inside a
    stringified-JSON value. Rarely needed on Spark (``from_json`` handles
    null), kept for drop-in parity (etl_utils.py:404-427).

    Dual-mode like the reference call sites: a Column gets the expression
    form; a plain value gets the reference's record semantics (plain
    ``str.replace``, NaN → ``{}``)."""
    if isinstance(col, Column):
        return F.regexp_replace(col, r"\bnull\b", "None")
    try:
        import pandas as pd

        is_na = not isinstance(col, (list, dict)) and pd.isna(col)
    except (TypeError, ValueError):
        is_na = False
    if is_na:
        return {}
    return col.replace("null", "None") if isinstance(col, str) else col


def deep_convert_datetimes(value: Any) -> Any:
    """Recursively render datetimes to the Singer formats
    (``%Y-%m-%dT%H:%M:%S.%fZ`` / ``%Y-%m-%d``, reference singer.py:280-304).
    Record-level helper; the distributed sink does this with to_json
    timestampFormat/dateFormat options instead."""
    if isinstance(value, list):
        return [deep_convert_datetimes(v) for v in value]
    if isinstance(value, dict):
        return {k: deep_convert_datetimes(v) for k, v in value.items()}
    if isinstance(value, datetime.datetime):
        return value.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    if isinstance(value, datetime.date):
        return value.strftime("%Y-%m-%d")
    return value


def nulls_trimmed_expr(col: Column) -> Column:
    """Trim nulls from a nested struct/array column by JSON round-trip with
    ``ignoreNullFields`` — one JVM expression pair, no UDF."""
    return F.to_json(col, {"ignoreNullFields": "true"})
