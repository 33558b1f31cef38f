"""Record-level (driver-side) utilities: the reference's row-form APIs.

These operate on single ``dict`` records with small in-memory lookup tables
— the entry points reference ETL scripts call per record (parity targets:
``map_fields`` gluestick/etl_utils.py:1179-1241, ``pluck_fields``
:1042-1141, ``pluck_fields_by_regex`` :1161-1177, ``process_custom_fields``
:1143-1159, dict-mode ``localize_datetime`` gluestick/date_utils.py:38-115,
``get_model_datetime_fields`` :9-36).

Scale note: these are NOT the distributed path. For DataFrame-scale data
use :func:`gluestick_spark.operators.mapping.map_fields_df`, which compiles
the same mapping DSL to Catalyst expressions and broadcast joins. The row
forms exist for per-record driver logic (webhook handlers, small control
tables) and share the DSL semantics with the df form, which is
equivalence-tested against them.
"""

from __future__ import annotations

import copy
import datetime
import re
from typing import Any

import pandas as pd

__all__ = [
    "CustomValidationError",
    "map_fields",
    "pluck_fields",
    "pluck_fields_by_regex",
    "process_custom_fields",
    "localize_record_datetimes",
    "get_model_datetime_fields",
    "validate_model",
    "handle_validation_error",
    "get_row_hash",
    "parse_objs",
]


class CustomValidationError(Exception):
    """Raised when a record fails a validation rule (reference
    gluestick/utils/exceptions.py)."""


def _isna_scalar(v: Any) -> bool:
    """Scalar-safe null check: collections are never 'na'."""
    if isinstance(v, (list, dict, set, tuple)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def pluck_fields(
    objects: Any,
    id_field: str,
    filter_ids: Any,
    target_fields: str | list[str],
    partition_key: str | None = None,
    partition_key_value: Any = None,
) -> Any:
    """Extract ``target_fields`` from the objects whose ``id_field`` is in
    ``filter_ids``.

    ``objects`` is a list of dicts or a pandas DataFrame (a small lookup
    table). A single str/int ``filter_ids`` returns a single value (str
    target) or dict (list target); a list/set returns a list of them; no
    match returns None. A Spark DataFrame is rejected — collect a small
    lookup first, or use ``map_fields_df`` for the distributed path.
    """
    from pyspark.sql import DataFrame as SparkDataFrame

    if isinstance(objects, SparkDataFrame):
        raise TypeError(
            "pluck_fields is a record-level helper; collect the lookup table "
            "first (small side only) or use map_fields_df for DataFrames"
        )
    if isinstance(filter_ids, (int, str)):
        wanted = {filter_ids}
        is_single = True
    elif isinstance(filter_ids, (list, set)):
        wanted = set(filter_ids)
        is_single = False
    elif _isna_scalar(filter_ids):
        return None
    else:
        raise ValueError("filter_ids must be an integer, string, list, or set.")

    def extract(obj: dict[str, Any]) -> Any:
        if isinstance(target_fields, str):
            return obj[target_fields]
        if isinstance(target_fields, list):
            return {f: obj[f] for f in target_fields}
        raise ValueError("target_fields must be a string or a list of strings.")

    if objects is None:
        return None
    if isinstance(objects, pd.DataFrame):
        mask = objects[id_field].isin(wanted)
        if partition_key:
            mask &= objects[partition_key] == partition_key_value
        results = [extract(row.to_dict()) for _, row in objects[mask].iterrows()]
    else:
        results = [extract(o) for o in objects if o[id_field] in wanted]

    if is_single and len(results) == 1:
        return results[0]
    if not results:
        return None
    return results


def process_custom_fields(row: dict[str, Any] | pd.Series) -> list[dict[str, Any]] | None:
    """Dict → ``[{"name": key, "value": value}, ...]`` (nulls dropped)."""
    if isinstance(row, pd.Series):
        row = row.to_dict()
    if isinstance(row, dict):
        return [
            {"name": k, "value": v} for k, v in row.items() if not _isna_scalar(v)
        ]
    return None


def pluck_fields_by_regex(
    row: dict[str, Any], regex_field: str, return_as_cf: bool = False
) -> dict[str, Any] | list[dict[str, Any]] | None:
    """Keep the row's keys matching ``regex_field``; optionally reshape to
    custom-field entries."""
    pattern = re.compile(regex_field)
    result = {k: v for k, v in row.items() if pattern.match(k)}
    if return_as_cf:
        return process_custom_fields(result)
    return result


def map_fields(
    row: dict[str, Any],
    mapping: dict[str, Any],
    other_data: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Map one record through the mapping DSL.

    DSL semantics (shared with ``map_fields_df``): a string value is a
    source-field rename (null/missing sources are omitted, lists pass
    through); a dict is a nested object (or a ``pick`` lookup against
    ``other_data`` / ``pickregex`` projection); a list of dicts maps each
    entry, keeping non-empty results.
    """
    other_data = other_data or {}
    output: dict[str, Any] = {}
    for key, value in mapping.items():
        if isinstance(value, list):
            mapped_list = [m for m in (map_fields(row, v, other_data) for v in value) if m]
            if mapped_list:
                output[key] = mapped_list
        elif isinstance(value, dict):
            if "pick" in value:
                kwargs = copy.deepcopy(value["pick"])
                if str(kwargs.get("filter_ids", "")).startswith("rec."):
                    field = kwargs["filter_ids"][len("rec."):]
                    filter_id = row.get(field)
                    if not filter_id:
                        output[key] = None
                        continue
                    kwargs["filter_ids"] = filter_id
                if kwargs.get("partition_key"):
                    kwargs["partition_key_value"] = row.get(kwargs["partition_key"])
                else:
                    kwargs["partition_key"] = None
                    kwargs["partition_key_value"] = None
                objects = other_data.get(kwargs.pop("objects", None))
                empty = objects is None or (
                    objects.empty if isinstance(objects, pd.DataFrame) else not len(objects)
                )
                output[key] = None if empty else pluck_fields(objects=objects, **kwargs)
                continue
            if "pickregex" in value:
                output[key] = pluck_fields_by_regex(row, **value["pickregex"])
                continue
            mapped = map_fields(row, value, other_data)
            if mapped:
                output[key] = mapped
        elif value is not None:
            cell = row.get(value)
            if isinstance(cell, list) or not _isna_scalar(cell):
                output[key] = cell
    return output


def get_model_datetime_fields(model: Any) -> list[str]:
    """Names of a Pydantic model's fields annotated as ``datetime``.

    Mirrors the reference exactly (date_utils.py:9-36), including its quirk:
    only wrapped annotations (``Optional[datetime]``, unions, ``Annotated``)
    are inspected via ``__args__`` — a bare ``datetime`` annotation is not
    reported.
    """
    out: list[str] = []
    for name, field in model.model_fields.items():
        annotation = field.annotation
        for arg in getattr(annotation, "__args__", ()):
            if arg is datetime.datetime or getattr(arg, "__origin__", None) is datetime.datetime:
                out.append(name)
                break
    return out


def get_row_hash(row: dict[str, Any] | pd.Series, columns: list[str]) -> str:
    """md5 of the concatenated stringified non-null values in ``columns``
    order (reference etl_utils.py:272-296). Record form of
    :func:`gluestick_spark.functions.hashing.row_hash_expr` — note the
    caller supplies the column order; the expression form sorts column
    names for stability, matching how ``drop_redundant`` calls this."""
    import hashlib

    values = []
    for col in columns:
        v = row[col]
        if isinstance(v, list) or not _isna_scalar(v):
            values.append(str(v))
    return hashlib.md5("".join(values).encode()).hexdigest()


def parse_objs(x: Any) -> Any:
    """Parse a stringified dict/list: python-literal first, JSON fallback
    (reference singer.py:306-331). Record form of the ``python_literals``
    normalization in ``operators/restructure.py``; non-strings pass
    through."""
    import ast
    import json

    if not isinstance(x, str):
        return x
    try:
        return ast.literal_eval(x)
    except (ValueError, SyntaxError):
        return json.loads(x)


def handle_validation_error(
    error_message: str, file_path: str = "error_log.txt", raise_error: bool = False
) -> None:
    """Raise ``CustomValidationError`` or append message+traceback to a log
    (reference gluestick/unified_models_utils.py:9-32)."""
    if raise_error:
        raise CustomValidationError(error_message)
    import traceback

    with open(file_path, "a") as f:
        f.write(f"ERROR: {error_message}\n")
        f.write(f"TRACEBACK:\n{traceback.format_exc()}\n\n")


def validate_model(
    records: list[dict[str, Any]],
    model: Any,
    config: dict[str, Any],
    raise_error: bool = True,
) -> list[Any]:
    """Localize datetime fields then validate/cast each record against a
    Pydantic model class (reference gluestick/unified_models_utils.py:34-80).

    Driver-side, matching the reference's per-record flow. For
    DataFrame-scale validation use
    :func:`gluestick_spark.validation.validate_records` (Arrow-batched).
    """
    try:
        from pydantic import ValidationError
    except ImportError as exc:  # pragma: no cover
        raise ImportError("validate_model requires pydantic") from exc

    output: list[Any] = []
    datetime_fields = get_model_datetime_fields(model)
    timezone = config.get("timezone", "UTC")
    for value in records:
        try:
            value = localize_record_datetimes(value, datetime_fields, timezone)
            output.append(model(**value))
        except ValidationError as ve:
            for error in ve.errors():
                field_name = error["loc"][0] if error["loc"] else "?"
                message = (
                    f"Field '{field_name}' in model "
                    f"{getattr(model, 'schema_name', model.__name__)} failed to be "
                    f"casted as '{error['type']}', value trying to be casted: "
                    f"'{error.get('input')}'"
                )
                handle_validation_error(message, raise_error=raise_error)
        except CustomValidationError as e:
            handle_validation_error(str(e), raise_error=raise_error)
    return output


def localize_record_datetimes(
    data: dict[str, Any], column_names: list[str], timezone: str = "UTC"
) -> dict[str, Any]:
    """Dict-mode ``localize_datetime``: attach/convert timezones in-place.

    Per-type rules (date_utils.py:92-115): strings are parsed then
    localized/converted to ``timezone``; naive ``pd.Timestamp`` localized,
    aware left as-is; naive ``datetime.datetime`` localized via pytz; bare
    ``datetime.date`` promoted to midnight in ``timezone``. A ``NaT`` value
    raises :class:`CustomValidationError`.
    """
    import pytz

    for field in column_names:
        if field not in data or data[field] is None:
            continue
        value = data[field]
        if _isna_scalar(value):
            raise CustomValidationError(
                f"Field '{field}' contains a NaT (Not a Time) value which is "
                f"not allowed against the record: {data}"
            )
        if isinstance(value, str):
            ts = pd.to_datetime(value)
            data[field] = ts.tz_localize(timezone) if ts.tzinfo is None else ts.tz_convert(timezone)
        elif isinstance(value, pd.Timestamp):
            data[field] = value.tz_localize(timezone) if value.tzinfo is None else value
        elif isinstance(value, datetime.datetime):
            if value.tzinfo is None:
                data[field] = pytz.timezone(timezone).localize(value)
        elif isinstance(value, datetime.date):
            midnight = datetime.datetime(value.year, value.month, value.day)
            data[field] = pytz.timezone(timezone).localize(midnight)
    return data
