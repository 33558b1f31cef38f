"""Schema sources for the Singer sink: Pydantic unified models + catalogs.

Parity targets (citations into /root/reference — behavior only, fresh
implementation):
- ``to_singer_schema``: gluestick/singer.py:190-220 — value-shape → Singer
  type (dict recurses, list types from its first element, bool before int).
- ``unwrap_json_schema`` / ``_resolve_refs``: gluestick/singer.py:222-277 —
  inline ``$defs`` references, collapse ``anyOf`` into a merged dict with a
  combined ``type`` list (null-only anyOf → ``{}``), drop scalar ``title``
  keys (list-valued ``required`` survives), strip ``$defs``.
- ``combine_anyof_types`` (list form): gluestick/singer.py:333-343 — sorted
  union of the variants' type names.
- ``get_catalog_schema``: gluestick/singer.py:345-380 — stream lookup in
  ``Reader().read_catalog()``, anyOf normalization (format-carrying variant
  wins), every array property gets an ``items`` dict.
- ``parse_df_cols``: gluestick/singer.py:383-401 — object/array-typed
  string columns are parsed back into structures. The Spark form needs a
  target type: structured catalog properties compile directly to a Spark
  type; open-typed ones go through distributed JSON inference. Python-literal
  cells (single quotes) are normalized by the shared pandas-UDF fallback.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "to_singer_schema",
    "unwrap_json_schema",
    "combine_anyof_types",
    "get_catalog_schema",
    "parse_df_cols",
]


def to_singer_schema(value: Any) -> dict[str, Any]:
    """Singer schema fragment for a Python value's shape.

    ``bool`` must be tested before ``int`` (it subclasses int); unknown
    shapes (None, tuples, ...) fall back to string; an empty list types its
    items as string.
    """
    if isinstance(value, dict):
        return {
            "type": ["object", "null"],
            "properties": {k: to_singer_schema(v) for k, v in value.items()},
        }
    if isinstance(value, list):
        if value:
            return {"type": ["array", "null"], "items": to_singer_schema(value[0])}
        return {"type": ["array", "null"], "items": {"type": ["string", "null"]}}
    if isinstance(value, bool):
        return {"type": ["boolean", "null"]}
    if isinstance(value, int):
        return {"type": ["integer", "null"]}
    if isinstance(value, float):
        return {"type": ["number", "null"]}
    return {"type": ["string", "null"]}


def _resolve_refs(node: Any, defs: dict[str, Any]) -> Any:
    """Inline ``$ref`` pointers against ``defs``; scalar ``required``/``title``
    entries are dropped along the way (list-valued ones are recursed, so a
    ``required: [...]`` list survives — matching the reference)."""
    if isinstance(node, dict):
        if "$ref" in node:
            name = node["$ref"].split("/")[-1]
            return _resolve_refs(defs[name], defs)
        out: dict[str, Any] = {}
        for k, v in node.items():
            if isinstance(v, (list, dict)):
                out[k] = _resolve_refs(v, defs)
            elif k not in ("required", "title"):
                out[k] = v
        return out
    if isinstance(node, list):
        return [_resolve_refs(x, defs) for x in node]
    return node


def _simplify_anyof(node: Any) -> Any:
    if isinstance(node, dict):
        if "anyOf" in node:
            types = [v["type"] for v in node["anyOf"] if "type" in v]
            if types == ["null"]:
                # only-null anyOf means "any type": open schema
                return {}
            merged: dict[str, Any] = {}
            for variant in node["anyOf"]:
                for k, v in variant.items():
                    merged[k] = _simplify_anyof(v)
            merged["type"] = types
            return merged
        out = {}
        for k, v in node.items():
            if isinstance(v, (list, dict)):
                out[k] = _simplify_anyof(v)
            elif k not in ("required", "title"):
                out[k] = v
        return out
    if isinstance(node, list):
        return [_simplify_anyof(x) for x in node]
    return node


def unwrap_json_schema(schema: dict[str, Any]) -> dict[str, Any]:
    """Flatten a Pydantic ``model_json_schema()`` into a Singer-usable
    schema: resolve ``$defs`` references, collapse ``anyOf`` unions, strip
    titles and the ``$defs`` block."""
    defs = schema.get("$defs", {})
    out = _simplify_anyof(_resolve_refs(schema, defs))
    out.pop("$defs", None)
    return out


def combine_anyof_types(variants: list[dict[str, Any]]) -> list[str]:
    """Sorted union of the ``type`` names across anyOf variants."""
    types: set[str] = set()
    for v in variants:
        if "type" not in v:
            continue
        t = v["type"]
        if isinstance(t, list):
            types.update(t)
        elif isinstance(t, str):
            types.add(t)
        else:
            raise ValueError(f"Invalid type: {t!r}")
    return sorted(types)


def get_catalog_schema(stream: str, reader: Any | None = None) -> dict[str, Any]:
    """Schema for ``stream`` from the catalog, normalized for Singer export.

    anyOf properties collapse to the format-carrying variant when one exists,
    else to the combined type list; any array-typed property is guaranteed an
    ``items`` dict (reset to ``{}`` for a bare ``"array"`` type, like the
    reference).
    """
    if reader is None:
        from ..sources.reader import Reader

        reader = Reader()
    catalog = reader.read_catalog() or {}
    schema = next(
        (s["schema"] for s in catalog.get("streams", []) if s.get("stream") == stream),
        None,
    )
    if not schema:
        raise Exception(f"No schema found in catalog for stream {stream}")
    schema = {k: v for k, v in schema.items() if k in ("type", "properties")}
    for prop in schema.get("properties", {}).values():
        if prop.get("anyOf"):
            chosen = next((v for v in prop["anyOf"] if "format" in v), None)
            if chosen is None:
                chosen = {"type": combine_anyof_types(prop["anyOf"])}
            prop.update(chosen)
            prop.pop("anyOf", None)
        t = prop.get("type") or []
        if t == "array" or ("array" in t and prop.get("items") is None):
            prop["items"] = {}
    return schema


def _is_structured(prop: dict[str, Any]) -> bool:
    """Does the catalog property carry enough structure to compile a Spark
    type directly (object with properties / array with typed items)?"""
    if prop.get("properties"):
        return True
    items = prop.get("items")
    return isinstance(items, dict) and bool(items.get("type") or items.get("properties"))


def parse_df_cols(df: DataFrame, schema: dict[str, Any]) -> DataFrame:
    """Parse string-encoded object/array columns back into structures,
    driven by the catalog schema (reference singer.py:383-401).

    Columns already structured (struct/array/map) pass through. The parse is
    one ``from_json`` projection per column; the target type comes from the
    catalog property when it is structured, else from Spark's distributed
    JSON inference over the column. Python-literal strings are normalized
    first when a driver-side sample detects them.
    """
    from ..operators.restructure import _maybe_normalize, infer_json_schema
    from ..schema import json_schema_to_spark_type

    props = schema.get("properties", {})
    for field in df.schema.fields:
        prop = props.get(field.name, {})
        t = prop.get("type", [])
        t_list = t if isinstance(t, list) else [t]
        if not any(x in ("object", "array") for x in t_list):
            continue
        if not isinstance(field.dataType, T.StringType):
            continue
        df = _maybe_normalize(df, field.name, "auto")
        if _is_structured(prop):
            target: T.DataType = json_schema_to_spark_type(prop)
        else:
            # inference returns the ELEMENT schema (top-level JSON arrays are
            # flattened by the JSON source) — re-wrap for array-typed props
            elem = infer_json_schema(df, field.name)
            if not elem.fields:
                continue
            is_array = "array" in t_list and "object" not in t_list
            target = T.ArrayType(elem) if is_array else elem
        df = df.withColumn(field.name, F.from_json(F.col(f"`{field.name}`"), target))
    return df
