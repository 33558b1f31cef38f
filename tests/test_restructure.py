"""Explode/compress operator tests — ports of the reference golden cases
(FIXTURES.md F1-F4; reference tests/etl_test.py:22-127)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gluestick_spark import (
    compress_rows_to_col,
    enforce_exploded_col_types,
    explode_json_to_cols,
    explode_json_to_rows,
    json_tuple_to_cols,
)


def _rows_fixture(spark):
    # F3: array / single-element / null / bare-dict variants
    return spark.createDataFrame(
        [
            Row(**{"Customer Name": "A", "Line Detail": '[{"Id":"1","Desc":"Bolts","Amount":101.15},{"Id":"2","Desc":"Nuts","Amount":5.5}]'}),
            Row(**{"Customer Name": "B", "Line Detail": '[{"Id":"3","Desc":"Washers","Amount":1.0}]'}),
            Row(**{"Customer Name": "C", "Line Detail": None}),
            Row(**{"Customer Name": "D", "Line Detail": '{"Id":"4","Desc":"Screws","Amount":2.25}'}),
        ]
    )


def test_explode_json_to_rows_golden(spark):
    out = explode_json_to_rows(_rows_fixture(spark), "Line Detail")
    assert set(out.columns) == {
        "Customer Name",
        "Line Detail.Id",
        "Line Detail.Desc",
        "Line Detail.Amount",
    }
    rows = {(r["Customer Name"], r["Line Detail.Id"]) for r in out.collect()}
    # one row per element; null preserved; bare dict wrapped
    assert rows == {("A", "1"), ("A", "2"), ("B", "3"), ("C", None), ("D", "4")}
    amounts = {r["Line Detail.Id"]: r["Line Detail.Amount"] for r in out.collect()}
    assert amounts["1"] == 101.15
    assert out.schema["Line Detail.Amount"].dataType == T.DoubleType()


def test_explode_json_to_rows_keep_source(spark):
    out = explode_json_to_rows(_rows_fixture(spark), "Line Detail", drop=False)
    assert "Line Detail" in out.columns


def test_explode_json_to_cols_golden(spark):
    # F1/F2: key union across rows
    df = spark.createDataFrame(
        [
            Row(**{"Customer Name": "John", "Metadata": '{"FirstName":"John","LastName":"Smith"}'}),
            Row(**{"Customer Name": "Jane", "Metadata": '{"FirstName":"Jane","Type":"VIP"}'}),
        ]
    )
    out = explode_json_to_cols(df, "Metadata")
    assert set(out.columns) == {
        "Customer Name",
        "Metadata.FirstName",
        "Metadata.LastName",
        "Metadata.Type",
    }
    jane = out.where(F.col("`Customer Name`") == "Jane").first()
    assert jane["Metadata.LastName"] is None
    assert jane["Metadata.Type"] == "VIP"


def test_explode_json_to_cols_expected_keys_default(spark):
    df = spark.createDataFrame([Row(id=1, meta="{}"), Row(id=2, meta=None)])
    out = explode_json_to_cols(df, "meta")
    assert set(out.columns) == {"id", "meta.value", "meta.name"}


def test_multi_explode_order_independence(spark):
    # F4: cols-then-rows equals rows-then-cols (reference etl_test.py:101-124)
    df = spark.createDataFrame(
        [
            Row(
                CompanyId=1,
                Metadata='{"FirstName":"John","LastName":"Smith"}',
                LineDetail='[{"Id":"1","Amount":2.0},{"Id":"2","Amount":3.5}]',
                Total=5.5,
            )
        ]
    )
    a = explode_json_to_rows(explode_json_to_cols(df, "Metadata"), "LineDetail")
    b = explode_json_to_cols(explode_json_to_rows(df, "LineDetail"), "Metadata")
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    ra = sorted([tuple(r[c] for c in cols) for r in a.collect()])
    rb = sorted([tuple(r[c] for c in cols) for r in b.collect()])
    assert ra == rb


def test_python_literal_normalization(spark):
    df = spark.createDataFrame([Row(id=1, meta="{'a': 1, 'b': None}")])
    out = explode_json_to_cols(df, "meta")
    r = out.first()
    assert r["meta.a"] == 1
    assert r["meta.b"] is None


def test_compress_roundtrip(spark):
    df = _rows_fixture(spark).where(F.col("`Customer Name`") != "C")
    exploded = explode_json_to_rows(df, "Line Detail")
    packed = compress_rows_to_col(exploded, "Customer Name", "Line Detail")
    assert packed.count() == 3
    a = packed.where(F.col("`Customer Name`") == "A").first()["Line Detail"]
    assert len(a) == 2
    assert {x["Id"] for x in a} == {"1", "2"}


def test_compress_stringify(spark):
    df = spark.createDataFrame(
        [Row(pk=1, **{"c.x": "a"}), Row(pk=1, **{"c.x": "b"})]
    )
    out = compress_rows_to_col(df, "pk", "c", stringify=True)
    vals = out.first()["c"]
    assert sorted(vals) == ['{"x":"a"}', '{"x":"b"}']


def test_json_tuple_to_cols(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, kv='{"Name":"color","Value":"red"}'),
            Row(id=2, kv='[{"Name":"size","Value":"XL"},{"Name":"x","Value":"y"}]'),
            Row(id=3, kv=None),
        ]
    )
    out = json_tuple_to_cols(df, "kv")
    got = {r["id"]: (r["kv_name"], r["kv_value"]) for r in out.collect()}
    assert got[1] == ("color", "red")
    assert got[2] == ("size", "XL")  # first-of-list
    assert got[3] == (None, None)
    assert "kv" not in out.columns


def test_enforce_exploded_col_types(spark):
    df = spark.createDataFrame([Row(**{"m.flag": "true", "m.n": "7"})])
    out = enforce_exploded_col_types(
        df,
        "m",
        {"flag": {"type": ["boolean", "null"]}, "n": {"type": ["integer", "null"]}},
    )
    r = out.first()
    assert r["m.flag"] is True
    assert r["m.n"] == 7
    assert out.schema["m.n"].dataType == T.LongType()


def test_explode_order_independence(spark):
    """F4 multi_json: cols-then-rows == rows-then-cols (etl_test.py:113-124)."""
    df = spark.createDataFrame(
        [
            Row(
                CompanyId=1,
                Metadata='{"FirstName":"John","LastName":"Smith"}',
                LineDetail='[{"Id":"1","Amount":101.15},{"Id":"2","Amount":5.5}]',
                Total=106.65,
            ),
            Row(CompanyId=2, Metadata=None, LineDetail=None, Total=0.0),
        ]
    )
    a = explode_json_to_rows(explode_json_to_cols(df, "Metadata"), "LineDetail")
    b = explode_json_to_cols(explode_json_to_rows(df, "LineDetail"), "Metadata")
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    key = lambda r: tuple(str(r[c]) for c in cols)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_needs_normalization_cached_per_plan(spark):
    """auto-mode sampling runs one driver job per distinct (plan, column);
    a repeat call is answered from the cache."""
    from gluestick_spark.operators import restructure as rs

    df = spark.createDataFrame([("{'a': 1}",), ('{"a": 2}',)], ["js"])
    rs._NORMALIZATION_CACHE.clear()
    first = rs._needs_normalization(df, "js")
    assert first is True  # python literal present
    assert len(rs._NORMALIZATION_CACHE) == 1
    ((key, cached),) = rs._NORMALIZATION_CACHE.items()
    assert cached is True and key[1] == "js"
    # same logical plan -> cache hit (same single entry, same answer)
    assert rs._needs_normalization(df, "js") is True
    assert len(rs._NORMALIZATION_CACHE) == 1
