"""Pydantic unified-model + catalog schema paths for the Singer sink.

Ports of the reference test suites (behavioral parity):
- tests/function_tests/test_unwrap_json_schema.py
- tests/function_tests/test_to_singer_schema.py
- tests/function_tests/test_get_catalog_schema.py
- tests/function_tests/test_parse_df_cols.py
plus end-to-end precedence checks through ``to_singer``.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from gluestick_spark.sinks.singer_schema import (
    combine_anyof_types,
    get_catalog_schema,
    parse_df_cols,
    to_singer_schema,
    unwrap_json_schema,
)


class TestUnwrapJsonSchema:
    def test_passthrough_simple_schema(self):
        schema = {"type": "object", "properties": {"name": {"type": "string"}}}
        assert unwrap_json_schema(schema) == schema

    def test_strips_scalar_title_but_keeps_list_required(self):
        schema = {
            "type": "object",
            "title": "Customer",
            "required": ["customer_name"],
            "properties": {"customer_name": {"type": "string", "title": "Name"}},
        }
        result = unwrap_json_schema(schema)
        assert "title" not in result
        assert "title" not in result["properties"]["customer_name"]
        assert result["required"] == ["customer_name"]

    def test_resolves_ref(self):
        schema = {
            "type": "object",
            "properties": {"billing_address": {"$ref": "#/$defs/Address"}},
            "$defs": {
                "Address": {"type": "object", "properties": {"city": {"type": "string"}}}
            },
        }
        result = unwrap_json_schema(schema)
        assert "$defs" not in result
        addr = result["properties"]["billing_address"]
        assert addr["type"] == "object"
        assert addr["properties"]["city"] == {"type": "string"}

    def test_anyof_null_only_returns_empty_dict(self):
        schema = {
            "type": "object",
            "properties": {"deleted_at": {"anyOf": [{"type": "null"}]}},
        }
        assert unwrap_json_schema(schema)["properties"]["deleted_at"] == {}

    def test_anyof_merges_types(self):
        schema = {
            "type": "object",
            "properties": {
                "amount": {
                    "anyOf": [{"type": "string"}, {"type": "integer"}, {"type": "null"}]
                }
            },
        }
        result = unwrap_json_schema(schema)
        assert result["properties"]["amount"]["type"] == ["string", "integer", "null"]

    def test_anyof_with_nested_properties(self):
        schema = {
            "type": "object",
            "properties": {
                "shipping_info": {
                    "anyOf": [
                        {"type": "object", "properties": {"carrier": {"type": "string"}}},
                        {"type": "null"},
                    ]
                }
            },
        }
        info = unwrap_json_schema(schema)["properties"]["shipping_info"]
        assert info["type"] == ["object", "null"]
        assert "carrier" in info["properties"]

    def test_nested_ref_inside_anyof(self):
        schema = {
            "type": "object",
            "properties": {
                "contact": {"anyOf": [{"$ref": "#/$defs/Contact"}, {"type": "null"}]}
            },
            "$defs": {
                "Contact": {"type": "object", "properties": {"email": {"type": "string"}}}
            },
        }
        result = unwrap_json_schema(schema)
        assert "$defs" not in result
        assert "null" in result["properties"]["contact"]["type"]

    def test_defs_removed_from_output(self):
        schema = {"type": "object", "$defs": {"Unused": {"type": "string"}}, "properties": {}}
        assert "$defs" not in unwrap_json_schema(schema)

    def test_list_values_recursed(self):
        schema = {
            "type": "object",
            "properties": {
                "tags": {"type": "array", "items": [{"type": "string"}, {"type": "integer"}]}
            },
        }
        items = unwrap_json_schema(schema)["properties"]["tags"]["items"]
        assert items == [{"type": "string"}, {"type": "integer"}]


class TestToSingerSchema:
    def test_scalars(self):
        assert to_singer_schema("hello") == {"type": ["string", "null"]}
        assert to_singer_schema(42) == {"type": ["integer", "null"]}
        assert to_singer_schema(19.99) == {"type": ["number", "null"]}
        assert to_singer_schema(True) == {"type": ["boolean", "null"]}

    def test_unknown_types_fallback_to_string(self):
        assert to_singer_schema(None) == {"type": ["string", "null"]}
        assert to_singer_schema((1, 2)) == {"type": ["string", "null"]}

    def test_dicts(self):
        assert to_singer_schema({}) == {"type": ["object", "null"], "properties": {}}
        result = to_singer_schema({"customer_name": "alice", "order_total": 59.99})
        assert result["properties"]["customer_name"] == {"type": ["string", "null"]}
        assert result["properties"]["order_total"] == {"type": ["number", "null"]}

    def test_lists(self):
        assert to_singer_schema([]) == {
            "items": {"type": ["string", "null"]},
            "type": ["array", "null"],
        }
        assert to_singer_schema([100, "ignored", 3.14]) == {
            "type": ["array", "null"],
            "items": {"type": ["integer", "null"]},
        }

    def test_complex_nested_structure(self):
        props = to_singer_schema(
            {
                "tenant_id": "org-123",
                "employee_count": 50,
                "is_active": True,
                "departments": ["engineering", "sales"],
                "headquarters": {"city": "Austin", "state": "TX"},
                "past_orders": [],
            }
        )["properties"]
        assert props["is_active"] == {"type": ["boolean", "null"]}
        assert props["departments"] == {
            "type": ["array", "null"],
            "items": {"type": ["string", "null"]},
        }
        assert props["headquarters"]["properties"]["city"] == {"type": ["string", "null"]}
        assert props["past_orders"] == {
            "items": {"type": ["string", "null"]},
            "type": ["array", "null"],
        }


class _FakeReader:
    def read_catalog(self):
        return {
            "streams": [
                {
                    "stream": "orders",
                    "schema": {
                        "type": "object",
                        "properties": {
                            "event_time": {
                                "anyOf": [
                                    {"type": "string"},
                                    {"type": "string", "format": "date-time"},
                                ]
                            },
                            "amount": {
                                "anyOf": [
                                    {"type": "null"},
                                    {"type": ["integer", "null"]},
                                    {"type": "number"},
                                ]
                            },
                            "tags": {"type": "array"},
                            "items_or_null": {"type": ["array", "null"]},
                            "status": {"type": "string"},
                        },
                        "additionalProperties": False,
                    },
                }
            ]
        }


class TestGetCatalogSchema:
    def test_raises_when_stream_not_found(self):
        with pytest.raises(Exception, match="No schema found in catalog for stream missing"):
            get_catalog_schema("missing", reader=_FakeReader())

    def test_normalizes_anyof_and_arrays(self):
        result = get_catalog_schema("orders", reader=_FakeReader())
        assert set(result.keys()) == {"type", "properties"}
        event_time = result["properties"]["event_time"]
        assert event_time["type"] == "string" and event_time["format"] == "date-time"
        assert "anyOf" not in event_time
        amount = result["properties"]["amount"]
        assert amount["type"] == ["integer", "null", "number"]
        assert result["properties"]["tags"]["items"] == {}
        assert result["properties"]["items_or_null"]["items"] == {}


def test_combine_anyof_types_rejects_bad_type():
    with pytest.raises(ValueError):
        combine_anyof_types([{"type": 42}])


class TestParseDfCols:
    def test_parses_object_and_array_columns(self, spark):
        df = spark.createDataFrame(
            [
                Row(metadata='{"city": "Austin"}', tags='["electronics", "sale"]', name='{"not": "parsed"}'),
                Row(metadata='{"city": "NYC"}', tags='["new"]', name="plain"),
            ]
        )
        schema = {
            "properties": {
                "metadata": {"type": ["object", "null"], "properties": {"city": {"type": "string"}}},
                "tags": {"type": ["array", "null"], "items": {"type": "string"}},
                "name": {"type": ["string", "null"]},
            }
        }
        out = parse_df_cols(df, schema)
        rows = out.orderBy("name").collect()
        assert rows[0]["metadata"]["city"] == "NYC"  # '{"not"...' sorts after
        assert rows[1]["tags"] == ["electronics", "sale"]
        # string-typed column untouched
        assert rows[0]["name"] == "plain" or rows[1]["name"] == "plain"
        assert any(r["name"] == '{"not": "parsed"}' for r in rows)

    def test_untyped_object_column_inferred(self, spark):
        df = spark.createDataFrame([Row(k=1, meta='{"a": 5}'), Row(k=2, meta='{"a": 7, "b": "x"}')])
        out = parse_df_cols(df, {"properties": {"meta": {"type": ["object", "null"]}}})
        got = {r["k"]: r["meta"] for r in out.collect()}
        assert got[2]["a"] == 7 and got[2]["b"] == "x"

    def test_skips_columns_not_in_schema(self, spark):
        df = spark.createDataFrame([Row(unknown_col='{"key": "val"}')])
        out = parse_df_cols(df, {"properties": {}})
        assert out.first()["unknown_col"] == '{"key": "val"}'

    def test_python_literal_cells_normalized(self, spark):
        df = spark.createDataFrame([Row(meta="{'a': 'single-quoted'}")])
        schema = {
            "properties": {"meta": {"type": ["object", "null"], "properties": {"a": {"type": "string"}}}}
        }
        assert parse_df_cols(df, schema).first()["meta"]["a"] == "single-quoted"


class _FakeUnifiedModel:
    """Duck-typed stand-in for a Pydantic v2 model class."""

    @staticmethod
    def model_json_schema():
        return {
            "type": "object",
            "title": "Invoice",
            "required": ["invoice_id"],
            "properties": {
                "invoice_id": {"title": "Id", "type": "integer"},
                "total": {"anyOf": [{"type": "number"}, {"type": "null"}], "title": "Total"},
                "customer": {"anyOf": [{"$ref": "#/$defs/Customer"}, {"type": "null"}]},
            },
            "$defs": {
                "Customer": {
                    "type": "object",
                    "title": "Customer",
                    "properties": {"name": {"title": "Name", "type": "string"}},
                }
            },
        }


def _read_singer(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


class TestToSingerPrecedence:
    def test_unified_model_schema_wins_over_inference(self, spark, tmp_path):
        from gluestick_spark import to_singer

        df = spark.createDataFrame([Row(invoice_id=1, total=9.5)])
        to_singer(df, "invoices", str(tmp_path), keys=["invoice_id"], unified_model=_FakeUnifiedModel)
        msgs = _read_singer(tmp_path / "data.singer")
        header = msgs[0]
        assert header["type"] == "SCHEMA"
        props = header["schema"]["properties"]
        assert props["invoice_id"] == {"type": "integer"}
        assert props["total"]["type"] == ["number", "null"]
        assert props["customer"]["type"] == ["object", "null"]
        assert "title" not in header["schema"]
        assert "$defs" not in header["schema"]
        assert msgs[1] == {
            "type": "RECORD",
            "stream": "invoices",
            "record": {"invoice_id": 1, "total": 9.5},
        }

    def test_catalog_stream_branch(self, spark, tmp_path, monkeypatch):
        import gluestick_spark.sinks.singer_schema as ss
        from gluestick_spark import to_singer

        class _CatReader:
            def read_catalog(self):
                return {
                    "streams": [
                        {
                            "stream": "orders",
                            "schema": {
                                "type": "object",
                                "properties": {
                                    "order_id": {"type": ["integer", "null"]},
                                    "meta": {
                                        "type": ["object", "null"],
                                        "properties": {"city": {"type": "string"}},
                                    },
                                },
                            },
                        }
                    ]
                }

        monkeypatch.setattr(ss, "Reader", _CatReader, raising=False)
        # route the default Reader() through the fake
        orig = ss.get_catalog_schema
        monkeypatch.setattr(
            ss, "get_catalog_schema", lambda stream, reader=None: orig(stream, _CatReader())
        )
        df = spark.createDataFrame([Row(order_id=7, meta='{"city": "Austin"}')])
        to_singer(df, "whatever", str(tmp_path), keys=["order_id"], catalog_stream="orders")
        msgs = _read_singer(tmp_path / "data.singer")
        assert msgs[0]["schema"]["properties"]["meta"]["properties"] == {
            "city": {"type": "string"}
        }
        # string cell was parsed into a real object before export
        assert msgs[1]["record"]["meta"] == {"city": "Austin"}

    def test_use_catalog_schema_env_merges_extra_columns(self, spark, tmp_path, monkeypatch):
        import gluestick_spark.sinks.singer_schema as ss
        from gluestick_spark import to_singer

        class _CatReader:
            def read_catalog(self):
                return {
                    "streams": [
                        {
                            "stream": "orders",
                            "schema": {
                                "type": "object",
                                "properties": {"order_id": {"type": ["integer", "null"]}},
                            },
                        }
                    ]
                }

        orig = ss.get_catalog_schema
        monkeypatch.setattr(
            ss, "get_catalog_schema", lambda stream, reader=None: orig(stream, _CatReader())
        )
        monkeypatch.setenv("USE_CATALOG_SCHEMA", "true")
        df = spark.createDataFrame([Row(order_id=7, tenant="acme")])
        to_singer(df, "orders", str(tmp_path))
        msgs = _read_singer(tmp_path / "data.singer")
        props = msgs[0]["schema"]["properties"]
        # catalog overrides known columns, extra df columns survive
        assert props["order_id"] == {"type": ["integer", "null"]}
        assert props["tenant"] == {"type": ["string", "null"]}

    def test_include_all_unified_fields_keeps_nulls(self, spark, tmp_path, monkeypatch):
        from gluestick_spark import to_singer

        monkeypatch.setenv("INCLUDE_ALL_UNIFIED_FIELDS", "true")
        df = spark.createDataFrame([(1, None)], "invoice_id long, total double")
        to_singer(df, "invoices", str(tmp_path), unified_model=_FakeUnifiedModel)
        msgs = _read_singer(tmp_path / "data.singer")
        assert msgs[1]["record"] == {"invoice_id": 1, "total": None}
