"""Singer protocol sink: SCHEMA → RECORD* → STATE newline-JSON.

Parity targets (citations into /root/reference):
- message primitives: gluestick/singer.py:20-70 (write_schema/record/state;
  key_properties string→list coercion; aware ``time_extracted`` only).
- ``to_singer``: gluestick/singer.py:436-549 — drop all-null columns (unless
  keeping nulls), schema precedence (explicit > catalog > inferred), chunked
  record emission (env ``SINGER_CHUNK_SIZE``, default 20000, flush per
  chunk), append mode when the file exists, per-record null dropping,
  ISO-µs UTC datetime rendering (``%Y-%m-%dT%H:%M:%S.%fZ``, singer.py:17).
- header generation: gluestick/singer.py:99-187 — typed columns map to
  Singer types; complex columns allowed as object/array schemas when
  ``allow_objects`` else stringified.

Spark shape: the record body is built executor-side as one
``to_json(struct(*))`` projection (JVM, whole-stage codegen) with the Singer
timestamp/date formats; the driver streams partitions via
``toLocalIterator`` and wraps each JSON body in the RECORD envelope — the
single-appendable-file contract of the Singer protocol is inherently
driver-sequential (SURVEY §4.2.3). At cluster scale prefer
``to_export(..., "jsonl")`` which writes distributed.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime
from typing import Any, IO

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.project import drop_all_null_columns
from ..schema import struct_to_json_schema

__all__ = [
    "write_schema",
    "write_record",
    "write_state",
    "to_singer",
    "gen_singer_header",
]

_DATETIME_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
_DATE_FORMAT = "yyyy-MM-dd"


def _emit(msg: dict[str, Any], fp: IO[str] | None = None) -> None:
    line = json.dumps(msg, default=str) + "\n"
    if fp is None:
        sys.stdout.write(line)
        sys.stdout.flush()
    else:
        fp.write(line)


def write_schema(
    stream: str,
    schema: dict[str, Any],
    key_properties: str | list[str],
    bookmark_properties: list[str] | None = None,
    fp: IO[str] | None = None,
) -> None:
    if isinstance(key_properties, (str, bytes)):
        key_properties = [key_properties]
    if not isinstance(key_properties, list):
        raise ValueError("key_properties must be a string or list of strings")
    msg: dict[str, Any] = {
        "type": "SCHEMA",
        "stream": stream,
        "schema": schema,
        "key_properties": key_properties,
    }
    if bookmark_properties:
        msg["bookmark_properties"] = bookmark_properties
    _emit(msg, fp)


def write_record(
    stream: str,
    record: dict[str, Any],
    version: Any = None,
    time_extracted: datetime | None = None,
    fp: IO[str] | None = None,
) -> None:
    msg: dict[str, Any] = {"type": "RECORD", "stream": stream, "record": record}
    if version is not None:
        msg["version"] = version
    if time_extracted:
        if not time_extracted.tzinfo:
            raise ValueError(
                "'time_extracted' must be either None or an aware datetime (with a time zone)"
            )
        import datetime as _dt

        msg["time_extracted"] = time_extracted.astimezone(_dt.timezone.utc).strftime(
            _DATETIME_FMT
        )
    _emit(msg, fp)


def write_state(value: dict[str, Any], fp: IO[str] | None = None) -> None:
    _emit({"type": "STATE", "value": value}, fp)


def gen_singer_header(
    df: DataFrame,
    allow_objects: bool,
    schema: dict[str, Any] | None = None,
    catalog_schema: bool = False,
    recursive_typing: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Build the Singer SCHEMA header for ``df`` and (when
    ``allow_objects=False``) stringify complex columns like the reference
    (singer.py:178-180: non-typed columns get ``_serialize_value``).

    An explicit/unified ``schema`` is returned as-is; under the catalog path
    (``catalog_schema=True``) the header is inferred from the DataFrame and
    then overridden by the catalog properties, keeping extra columns the
    catalog doesn't know (tenant, sync_date, ... — singer.py:182-186).
    """
    if schema is not None and not catalog_schema:
        return df, schema
    if not allow_objects:
        cols = []
        changed = False
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                cols.append(F.to_json(F.col(f"`{f.name}`")).alias(f.name))
                changed = True
            else:
                cols.append(F.col(f"`{f.name}`"))
        if changed:
            df = df.select(*cols)
    header = struct_to_json_schema(df.schema)
    if not recursive_typing:
        # reference singer.py:169-171: array columns keep a generic items
        # schema instead of recursing into element types
        for f in df.schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                header["properties"][f.name] = {
                    "type": ["array", "null"],
                    "items": {"type": ["object", "string", "null"]},
                }
    if catalog_schema and schema is not None:
        header["properties"].update(schema.get("properties", {}))
    return df, header


def _record_body(df: DataFrame, keep_nulls: bool, trim_nested_nulls: bool):
    """Column expression rendering one record as a JSON object string.

    Reference null semantics (singer.py:521-543): with ``keep_nulls`` every
    field is emitted (nulls as ``null``); otherwise top-level nulls are
    dropped, and nested nulls are dropped too only when
    ``trim_nested_nulls`` (``remove_nulls_deep``). Spark's ``to_json``
    ``ignoreNullFields`` is all-levels-or-nothing, so the
    drop-top-keep-nested mode assembles the object from per-field
    ``to_json`` fragments — still one JVM projection, no Python. Flat
    frames (no struct/array/map columns) can't have nested nulls and take
    the single-``to_json`` path regardless.
    """
    opts_keep = {"timestampFormat": _TS_FORMAT, "dateFormat": _DATE_FORMAT, "ignoreNullFields": "false"}
    opts_drop = {**opts_keep, "ignoreNullFields": "true"}
    whole = F.struct(*[F.col(f"`{c}`") for c in df.columns])
    if keep_nulls:
        return F.to_json(whole, opts_keep)
    has_complex = any(
        isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)) for f in df.schema.fields
    )
    if trim_nested_nulls or not has_complex:
        return F.to_json(whole, opts_drop)
    frags = []
    for c in df.columns:
        one = F.to_json(F.struct(F.col(f"`{c}`").alias(c)), opts_keep)
        # '{"c":v}' -> '"c":v'; null field -> fragment null -> filtered out
        frags.append(F.when(F.col(f"`{c}`").isNotNull(), one.substr(F.lit(2), F.length(one) - 2)))
    body = F.array_join(F.array_compact(F.array(*frags)), ",")
    return F.concat(F.lit("{"), body, F.lit("}"))


def to_singer(
    df: DataFrame,
    stream: str,
    output_dir: str,
    keys: list[str] | None = None,
    filename: str = "data.singer",
    allow_objects: bool = False,
    schema: dict[str, Any] | None = None,
    unified_model: Any | None = None,
    keep_null_fields: bool = False,
    catalog_stream: str | None = None,
    trim_nested_nulls: bool = False,
    recursive_typing: bool = True,
) -> None:
    """Export ``df`` as a Singer ndjson file (append mode when it exists).

    Schema precedence (reference singer.py:494-516): catalog
    (``USE_CATALOG_SCHEMA=true`` env or ``catalog_stream``) > Pydantic
    ``unified_model`` (its ``model_json_schema()`` unwrapped) > explicit
    ``schema`` > inferred from the DataFrame. The catalog path also parses
    string-encoded object/array columns back into structures and keeps null
    fields; ``INCLUDE_ALL_UNIFIED_FIELDS=true`` keeps nulls on the unified
    path.

    Null semantics (reference singer.py:521-543): top-level null fields are
    dropped unless ``keep_nulls``; NESTED nulls are kept unless
    ``trim_nested_nulls`` (``remove_nulls_deep`` per record). Flat frames
    take the single-``to_json`` fast path; only frames with complex columns
    in the keep-nested-nulls mode pay the per-field assembly.

    Accepts driver-side pandas/polars frames too (converted via
    :mod:`..compat`, matching the reference's singledispatch registrations).
    """
    if not isinstance(df, DataFrame):
        from ..compat import ensure_spark_df

        df = ensure_spark_df(df)
    keys = keys or []
    use_catalog = os.environ.get("USE_CATALOG_SCHEMA", "false").lower() == "true"
    include_all_unified = (
        os.environ.get("INCLUDE_ALL_UNIFIED_FIELDS", "false").lower() == "true"
        and unified_model is not None
    )

    # all-null column drop happens BEFORE the catalog branch flips
    # allow_objects (reference singer.py:498-500)
    if allow_objects and not (use_catalog or include_all_unified or keep_null_fields):
        df = drop_all_null_columns(df)

    if use_catalog or catalog_stream:
        from .singer_schema import get_catalog_schema, parse_df_cols

        allow_objects = True
        schema = get_catalog_schema(catalog_stream or stream)
        df = parse_df_cols(df, schema)
    elif unified_model is not None:
        from .singer_schema import unwrap_json_schema

        schema = unwrap_json_schema(unified_model.model_json_schema())

    # float32 → double before rendering: the reference materializes records
    # through Python floats (json.dumps of float32 upcasts to float64), so
    # 0.37426901f must serialize as 0.3742690086364746 for byte/value parity
    # with reference singer output (tests/data/output/data.singer).
    if any(isinstance(f.dataType, T.FloatType) for f in df.schema.fields):
        df = df.select(
            *[
                F.col(f"`{f.name}`").cast("double").alias(f.name)
                if isinstance(f.dataType, T.FloatType)
                else F.col(f"`{f.name}`")
                for f in df.schema.fields
            ]
        )

    df, header_map = gen_singer_header(
        df, allow_objects, schema, catalog_schema=use_catalog, recursive_typing=recursive_typing
    )

    keep_nulls = use_catalog or include_all_unified or keep_null_fields
    prefix = json.dumps({"type": "RECORD", "stream": stream})[:-1] + ', "record": '
    line = F.concat(
        F.lit(prefix), _record_body(df, keep_nulls, trim_nested_nulls), F.lit("}\n")
    )
    lines = df.select(line.alias("line"))

    # Block-concatenate executor-side: each Arrow batch of rendered lines is
    # joined into ONE string on the workers (vectorized, all cores), so the
    # driver loop handles ~rows/maxRecordsPerBatch writes instead of one per
    # row. Measured on 600k×6-col lineitem: 100k → ~150k rows/s. Row order
    # is preserved (mapInPandas is partition-local, toLocalIterator walks
    # partitions in order).
    import pandas as pd

    def _blocks(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame({"block": ["".join(pdf["line"].tolist())], "n": [len(pdf)]})

    blocks = lines.mapInPandas(_blocks, "block string, n long")

    os.makedirs(output_dir, exist_ok=True)
    output = os.path.join(output_dir, filename)
    mode = "a" if os.path.isfile(output) else "w"
    chunk_size = int(os.environ.get("SINGER_CHUNK_SIZE", "20000"))

    with open(output, mode) as f:
        write_schema(stream, header_map, keys, fp=f)
        since_flush = 0
        for row in blocks.toLocalIterator(prefetchPartitions=True):
            f.write(row["block"])
            since_flush += row["n"]
            if since_flush >= chunk_size:
                f.flush()
                since_flush = 0
        write_state({}, fp=f)
