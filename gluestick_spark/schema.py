"""JSON-Schema (Singer catalog) ⇄ Spark StructType conversion.

This is the load-bearing schema component of the engine: every catalog-typed
read and every Singer SCHEMA emission goes through it.

Behavioral parity targets (citations into /root/reference):
- type-name mapping: gluestick/reader.py:232-279 (get_types_from_catalog),
  gluestick/utils/polars_utils.py:3-29.
- ``anyOf`` resolution prefers the variant carrying a ``format``:
  gluestick/reader.py:264-271, gluestick/singer.py:333-343.
- multi-type lists drop "null"; a residual multi-type is treated as the
  widest/safest type (string): gluestick/reader.py:272-277.
- reverse direction (Spark → Singer JSON-Schema) mirrors
  gluestick/singer.py:99-187 (gen_singer_header) and 552-604.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

__all__ = [
    "json_schema_to_spark_type",
    "json_schema_to_struct",
    "spark_type_to_json_schema",
    "struct_to_json_schema",
    "combine_anyof_types",
]

_PRIMITIVE_TO_SPARK: dict[str, T.DataType] = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}

_FORMAT_TO_SPARK: dict[str, T.DataType] = {
    "date-time": T.TimestampType(),
    "date": T.DateType(),
    # no native time-of-day type in Spark; reference keeps it as string when
    # round-tripping through pandas (gluestick/singer.py:583).
    "time": T.StringType(),
    "singer.decimal": T.DoubleType(),
}


def combine_anyof_types(prop: dict[str, Any]) -> dict[str, Any]:
    """Collapse an ``anyOf`` property into a single schema dict.

    Rule (gluestick/singer.py:333-343 + reader.py:264-271): prefer the
    variant that declares a ``format``; otherwise union the ``type`` lists
    of all variants (sorted, deduped).
    """
    variants = prop.get("anyOf")
    if not variants:
        return prop
    for v in variants:
        if isinstance(v, dict) and v.get("format"):
            return v
    types: list[str] = []
    merged: dict[str, Any] = {}
    for v in variants:
        if not isinstance(v, dict):
            continue
        t = v.get("type", [])
        types.extend([t] if isinstance(t, str) else list(t))
        for key in ("properties", "items"):
            if key in v and key not in merged:
                merged[key] = v[key]
    merged["type"] = sorted(set(types))
    return merged


def _norm_types(prop: dict[str, Any]) -> list[str]:
    t = prop.get("type", [])
    if isinstance(t, str):
        t = [t]
    return [x for x in t if x != "null"]


def json_schema_to_spark_type(prop: dict[str, Any]) -> T.DataType:
    """One JSON-Schema property → Spark DataType."""
    if not isinstance(prop, dict):
        return T.StringType()
    prop = combine_anyof_types(prop)
    fmt = prop.get("format")
    if fmt in _FORMAT_TO_SPARK:
        return _FORMAT_TO_SPARK[fmt]
    types = _norm_types(prop)
    if len(types) == 1:
        t = types[0]
        if t == "object":
            props = prop.get("properties")
            if props:
                return json_schema_to_struct({"properties": props})
            # open-keyed object: map compromise keeps it queryable at scale
            return T.MapType(T.StringType(), T.StringType())
        if t == "array":
            items = prop.get("items", {})
            return T.ArrayType(json_schema_to_spark_type(items))
        return _PRIMITIVE_TO_SPARK.get(t, T.StringType())
    # multi-type (after null-drop) or missing type → widest safe type
    # (reference falls back to pandas "object": reader.py:272-277)
    return T.StringType()


def json_schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    """Full JSON-Schema (``{"properties": {...}}`` or bare property map)
    → StructType. All fields nullable (Singer types are ``[..., "null"]``).
    """
    props = schema.get("properties", schema)
    fields = [
        T.StructField(name, json_schema_to_spark_type(p), nullable=True)
        for name, p in props.items()
    ]
    return T.StructType(fields)


def spark_type_to_json_schema(dt: T.DataType) -> dict[str, Any]:
    """Spark DataType → Singer-flavored JSON-Schema property.

    Mirrors gluestick/singer.py:117-127 (dtype map) and 552-604
    (struct→object, list→array, unknown→string).
    """
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": ["integer", "null"]}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": ["number", "null"]}
    if isinstance(dt, T.BooleanType):
        return {"type": ["boolean", "null"]}
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return {"type": ["string", "null"], "format": "date-time"}
    if isinstance(dt, T.DateType):
        return {"type": ["string", "null"], "format": "date"}
    if isinstance(dt, T.ArrayType):
        return {"type": ["array", "null"], "items": spark_type_to_json_schema(dt.elementType)}
    if isinstance(dt, T.StructType):
        return {
            "type": ["object", "null"],
            "properties": {f.name: spark_type_to_json_schema(f.dataType) for f in dt.fields},
        }
    if isinstance(dt, T.MapType):
        return {"type": ["object", "null"], "properties": {}}
    if isinstance(dt, T.BinaryType):
        return {"type": ["string", "null"]}
    return {"type": ["string", "null"]}


def struct_to_json_schema(st: T.StructType) -> dict[str, Any]:
    """StructType → Singer SCHEMA body (top-level type is the reference's
    ``["object", "null"]``, gluestick/singer.py:104)."""
    return {
        "type": ["object", "null"],
        "properties": {f.name: spark_type_to_json_schema(f.dataType) for f in st.fields},
    }
