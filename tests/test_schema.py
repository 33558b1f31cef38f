"""JSON-Schema ⇄ StructType converter tests.

Mirrors the reference's catalog-typing cases (FIXTURES.md F8;
reference tests/function_tests/test_reader.py:316-387,
test_unwrap_json_schema.py, test_combine_anyof_types.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

from gluestick_spark.schema import (
    combine_anyof_types,
    json_schema_to_spark_type,
    json_schema_to_struct,
    spark_type_to_json_schema,
    struct_to_json_schema,
)


def test_primitive_mappings():
    assert json_schema_to_spark_type({"type": ["integer", "null"]}) == T.LongType()
    assert json_schema_to_spark_type({"type": ["number", "null"]}) == T.DoubleType()
    assert json_schema_to_spark_type({"type": ["boolean", "null"]}) == T.BooleanType()
    assert json_schema_to_spark_type({"type": ["string", "null"]}) == T.StringType()


def test_format_wins():
    assert (
        json_schema_to_spark_type({"type": ["string", "null"], "format": "date-time"})
        == T.TimestampType()
    )
    assert json_schema_to_spark_type({"type": "string", "format": "date"}) == T.DateType()
    # no native time type → string (reference keeps it stringy too)
    assert json_schema_to_spark_type({"type": "string", "format": "time"}) == T.StringType()


def test_anyof_prefers_format_variant():
    prop = {
        "anyOf": [
            {"type": ["string", "null"]},
            {"type": ["string", "null"], "format": "date-time"},
        ]
    }
    assert json_schema_to_spark_type(prop) == T.TimestampType()


def test_anyof_union_without_format():
    prop = {"anyOf": [{"type": "integer"}, {"type": ["string", "null"]}]}
    merged = combine_anyof_types(prop)
    assert merged["type"] == ["integer", "null", "string"]
    # multi-type → widest safe type (string)
    assert json_schema_to_spark_type(prop) == T.StringType()


def test_nested_object_and_array():
    prop = {
        "type": ["object", "null"],
        "properties": {
            "a": {"type": ["integer", "null"]},
            "b": {"type": ["array", "null"], "items": {"type": "number"}},
        },
    }
    dt = json_schema_to_spark_type(prop)
    assert isinstance(dt, T.StructType)
    assert dt["a"].dataType == T.LongType()
    assert dt["b"].dataType == T.ArrayType(T.DoubleType())


def test_open_object_becomes_map():
    assert json_schema_to_spark_type({"type": "object"}) == T.MapType(
        T.StringType(), T.StringType()
    )


def test_roundtrip_struct_to_json_schema():
    st = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("s", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("arr", T.ArrayType(T.LongType())),
            T.StructField("obj", T.StructType([T.StructField("x", T.StringType())])),
        ]
    )
    js = struct_to_json_schema(st)
    props = js["properties"]
    assert props["i"] == {"type": ["integer", "null"]}
    assert props["f"] == {"type": ["number", "null"]}
    assert props["b"] == {"type": ["boolean", "null"]}
    assert props["ts"] == {"type": ["string", "null"], "format": "date-time"}
    assert props["d"] == {"type": ["string", "null"], "format": "date"}
    assert props["arr"]["items"] == {"type": ["integer", "null"]}
    assert props["obj"]["properties"]["x"] == {"type": ["string", "null"]}
    # and back again
    st2 = json_schema_to_struct(js)
    assert st2["i"].dataType == T.LongType()
    assert st2["obj"].dataType == T.StructType(
        [T.StructField("x", T.StringType(), True)]
    )


def test_decimal_maps_to_number():
    assert spark_type_to_json_schema(T.DecimalType(18, 2)) == {"type": ["number", "null"]}
