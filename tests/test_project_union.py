"""Projection, union, hashing, string-helper tests."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gluestick_spark import (
    build_string_format_variables,
    custom_fields_expr,
    drop_all_null_columns,
    format_str_safely,
    get_index_safely,
    keep_last,
    pluck_fields,
    pluck_fields_by_regex,
    rename,
    union_relaxed,
    widest_common_type,
    with_row_hash,
)


def test_rename_list_subsets(spark):
    df = spark.createDataFrame([Row(a=1, b=2, c=3)])
    assert rename(df, ["a", "c", "missing"]).columns == ["a", "c"]


def test_rename_dict(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    out = rename(df, {"a": "x", "missing": "y"})
    assert out.columns == ["x"]
    assert out.first()["x"] == 1


def test_pluck_fields_partition_key(spark):
    df = spark.createDataFrame(
        [Row(id=1, p="x", v=10), Row(id=1, p="y", v=20), Row(id=2, p="x", v=30)]
    )
    out = pluck_fields(df, "id", [1], {"v": "val"}, partition_key="p", partition_value="y")
    assert [(r["id"], r["val"]) for r in out.collect()] == [(1, 20)]


def test_pluck_by_regex(spark):
    df = spark.createDataFrame([Row(pk=1, m_a=2, m_b=3, other=4)])
    assert pluck_fields_by_regex(df, r"^m_", keep=["pk"]).columns == ["pk", "m_a", "m_b"]


def test_union_relaxed_widening(spark):
    l = spark.createDataFrame([Row(i=1, f=1.5, d=None)], schema="i int, f double, d date")
    r = spark.createDataFrame(
        [Row(i=2**40, f="x", ts=None)], schema="i long, f string, ts timestamp"
    )
    out = union_relaxed(l, r)
    types = dict(out.dtypes)
    assert types["i"] == "bigint"
    assert types["f"] == "string"
    assert out.count() == 2


def test_widest_common_type_lattice():
    assert widest_common_type(T.IntegerType(), T.LongType()) == T.LongType()
    assert widest_common_type(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widest_common_type(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert widest_common_type(T.BooleanType(), T.StringType()) == T.StringType()
    assert widest_common_type(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())
    ) == T.ArrayType(T.LongType())


def test_keep_last_positional_contract(spark):
    df = spark.createDataFrame([Row(id=1, v="a"), Row(id=1, v="b"), Row(id=2, v="c")])
    got = {r["id"]: r["v"] for r in keep_last(df, "id").collect()}
    assert got == {1: "b", 2: "c"}


def test_row_hash_sorted_columns_and_null_skip(spark):
    df = spark.createDataFrame([Row(b="2", a="1", c=None)], schema="b string, a string, c string")
    h = with_row_hash(df).first()["hash"]
    import hashlib

    assert h == hashlib.md5(b"12").hexdigest()  # sorted cols a,b; null c skipped


def test_custom_fields_drops_nulls(spark):
    df = spark.createDataFrame([Row(x="v", y=None)], schema="x string, y string")
    cf = df.select(custom_fields_expr(["x", "y"]).alias("cf")).first()["cf"]
    assert [(e["name"], e["value"]) for e in cf] == [("x", "v")]


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame([Row(a=1, b=None), Row(a=2, b=None)], schema="a int, b string")
    assert drop_all_null_columns(df).columns == ["a"]


def test_format_str_safely():
    assert format_str_safely("{tenant}_{x}_{missing}", tenant="t", x="") == "t_{x}_{missing}"


def test_build_string_format_variables(monkeypatch):
    monkeypatch.setenv("FLOW", "f1")
    out = build_string_format_variables({"custom": "c", "env": "nope"})
    assert out["flow"] == "f1"
    assert out["custom"] == "c"
    assert "env" not in out


def test_get_index_safely():
    assert get_index_safely([1, 2], 1) == 2
    assert get_index_safely([1], 5) is None
    assert get_index_safely(None, 0) is None
