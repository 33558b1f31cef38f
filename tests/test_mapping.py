"""Mapping DSL tests (FIXTURES.md F9; reference
tests/function_tests/map_fields.py / map_fields_df.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_spark.operators.mapping import (
    map_fields_df,
    read_tenant_custom_mapping,
    should_map_table,
)


def _main_df(spark):
    return spark.createDataFrame(
        [
            Row(first_name="Ada", last_name="L", age=36, city=None, dept="eng", contact_id="c1"),
            Row(first_name="Bob", last_name="M", age=25, city="NYC", dept="hr", contact_id="c9"),
        ]
    )


def _contacts(spark):
    return spark.createDataFrame(
        [
            Row(id="c1", name="Ada Lovelace", email="ada@x.io", dept="eng"),
            Row(id="c1", name="Ada L. (newer)", email="ada2@x.io", dept="eng"),
            Row(id="c2", name="Eve", email="eve@x.io", dept="hr"),
        ]
    )


def test_simple_rename_and_missing_skipped(spark):
    out = map_fields_df(_main_df(spark), {"fname": "first_name", "nope": "missing_col"})
    assert "fname" in out.columns and "nope" not in out.columns
    assert out.where("fname = 'Ada'").count() == 1


def test_nested_dict_mapping(spark):
    out = map_fields_df(
        _main_df(spark),
        {"person": {"given": "first_name", "family": "last_name", "contact": {"c": "city"}}},
    )
    r = out.where("first_name = 'Bob'").first()["person"]
    assert r["given"] == "Bob" and r["contact"]["c"] == "NYC"


def test_list_of_mappings(spark):
    out = map_fields_df(
        _main_df(spark),
        {"entries": [{"v": "first_name"}, {"v": "last_name"}]},
    )
    r = out.first()["entries"]
    assert [e["v"] for e in r] == [r[0]["v"], r[1]["v"]]
    assert len(r) == 2


def test_pick_with_rec_dynamic_id_and_keep_last(spark):
    mapping = {
        "contact_name": {
            "pick": {
                "objects": "contacts",
                "id_field": "id",
                "filter_ids": "rec.contact_id",
                "target_fields": "name",
            }
        }
    }
    out = map_fields_df(_main_df(spark), mapping, {"contacts": _contacts(spark)})
    got = {r["first_name"]: r["contact_name"] for r in out.collect()}
    assert got["Ada"] == "Ada L. (newer)"  # keep-last dedup on lookup side
    assert got["Bob"] is None  # c9 unmatched


def test_pick_with_partition_key(spark):
    mapping = {
        "contact_email": {
            "pick": {
                "objects": "contacts",
                "id_field": "id",
                "filter_ids": "rec.contact_id",
                "target_fields": "email",
                "partition_key": "dept",
            }
        }
    }
    out = map_fields_df(_main_df(spark), mapping, {"contacts": _contacts(spark)})
    got = {r["first_name"]: r["contact_email"] for r in out.collect()}
    assert got["Ada"] == "ada2@x.io"  # matched id+dept
    assert got["Bob"] is None


def test_pick_multiple_target_fields(spark):
    mapping = {
        "contact": {
            "pick": {
                "objects": "contacts",
                "id_field": "id",
                "filter_ids": "rec.contact_id",
                "target_fields": ["name", "email"],
            }
        }
    }
    out = map_fields_df(_main_df(spark), mapping, {"contacts": _contacts(spark)})
    ada = out.where("first_name = 'Ada'").first()["contact"]
    assert ada["email"] == "ada2@x.io"


def test_pick_is_list(spark):
    df = spark.createDataFrame([Row(pk=1, ids=["c1", "c2"]), Row(pk=2, ids=["c9"]), Row(pk=3, ids=None)])
    mapping = {
        "names": {
            "pick": {
                "objects": "contacts",
                "id_field": "id",
                "filter_ids": "rec.ids",
                "target_fields": "name",
                "is_list": True,
            }
        }
    }
    out = map_fields_df(df, mapping, {"contacts": _contacts(spark)})
    got = {r["pk"]: sorted(r["names"]) for r in out.collect()}
    assert got[1] == ["Ada L. (newer)", "Eve"]
    assert got[2] == []
    assert got[3] == []


def test_pick_missing_objects_skipped(spark):
    mapping = {"x": {"pick": {"objects": "absent", "id_field": "id", "filter_ids": "rec.contact_id", "target_fields": "name"}}}
    out = map_fields_df(_main_df(spark), mapping, {})
    assert "x" not in out.columns


def test_pickregex_as_cf(spark):
    df = spark.createDataFrame(
        [Row(pk=1, cf_a="1", cf_b=None, other="x")],
        schema="pk int, cf_a string, cf_b string, other string",
    )
    out = map_fields_df(df, {"cf": {"pickregex": {"pattern": "^cf_", "return_as_cf": True}}})
    cf = out.first()["cf"]
    assert [(e["name"], e["value"]) for e in cf] == [("cf_a", "1")]


def test_read_tenant_custom_mapping_v1():
    cfg = {
        "hotglue_mapping": {
            "mapping": {
                "version": "1.0",
                "formatOrigin": "connectorList",
                "salesforce": [
                    {"source": "customers", "target": "Contact", "fields": {"a": "b"}}
                ],
            }
        }
    }
    fields, names = read_tenant_custom_mapping(cfg, connector_id="salesforce")
    assert fields == {"customers": {"a": "b"}}
    assert names == {"customers": "Contact"}


def test_read_tenant_custom_mapping_legacy():
    cfg = {
        "hotglue_mapping": {
            "mapping": {"flow1": {"orders/SalesOrder": {"x": "y"}}}
        }
    }
    fields, names = read_tenant_custom_mapping(cfg)
    assert fields == {"orders": {"x": "y"}}
    assert names == {"orders": "SalesOrder"}


def test_should_map_table():
    cfg = {"selected_tables": {"orders": True, "skipme": False}}
    assert should_map_table("orders", cfg) is True
    assert should_map_table("skipme", cfg) is False
    assert should_map_table("absent", cfg) is False
