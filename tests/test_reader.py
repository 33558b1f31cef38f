"""Reader tests (FIXTURES.md F5/F8; reference tests/function_tests/test_reader.py)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from gluestick_spark import Reader, read_csv_folder, read_parquet_folder
from gluestick_spark.functions.casting import cast_df_to_schema


def _setup_dir(tmp_dir: str) -> str:
    sync = os.path.join(tmp_dir, "sync-output")
    os.makedirs(sync)
    pdf = pd.DataFrame(
        {
            "order_id": ["1", "2"],
            "amount": ["5.5", "6.25"],
            "created_at": ["2024-01-01T00:00:00Z", "bogus"],
            "is_active": ["true", "nope"],
        }
    )
    pdf.to_csv(os.path.join(sync, "orders-20250427T202522.csv"), index=False)
    table = pa.Table.from_pandas(pdf)
    table = table.replace_schema_metadata({"key_properties": json.dumps(["order_id"])})
    pq.write_table(table, os.path.join(sync, "invoices-20250427T202522.parquet"))
    # a second (older-named later) file for the same stream: first wins
    pdf.head(1).to_csv(os.path.join(sync, "orders-20250428T000000.csv"), index=False)
    catalog = {
        "streams": [
            {
                "stream": "orders",
                "tap_stream_id": "orders",
                "schema": {
                    "properties": {
                        "order_id": {"type": ["integer", "null"]},
                        "amount": {"type": ["number", "null"]},
                        "created_at": {"type": ["string", "null"], "format": "date-time"},
                        "is_active": {"type": ["boolean", "null"]},
                    }
                },
                "metadata": [
                    {"breadcrumb": [], "metadata": {"table-key-properties": ["order_id"]}}
                ],
            }
        ]
    }
    with open(os.path.join(tmp_dir, "catalog.json"), "w") as f:
        json.dump(catalog, f)
    return tmp_dir


def test_discovery_and_stream_names(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    assert set(r.keys()) == {"orders", "invoices"}
    assert "orders" in r
    # first file wins
    assert r.input_files["orders"].endswith("orders-20250427T202522.csv")


def test_ignore_list(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root, ignore=["invoices"])
    assert set(r.keys()) == {"orders"}


def test_catalog_typed_read(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    df = r.get("orders", catalog_types=True)
    schema = dict(df.dtypes)
    assert schema["order_id"] == "bigint"
    assert schema["amount"] == "double"
    assert schema["created_at"] == "timestamp"
    assert schema["is_active"] == "boolean"
    rows = {r_["order_id"]: r_ for r_ in df.collect()}
    assert rows[1]["amount"] == 5.5
    assert rows[1]["is_active"] is True
    assert rows[2]["is_active"] is None  # "nope" → null (boolean CASE)
    assert rows[2]["created_at"] is None  # "bogus" → null (coerce)


def test_get_default_for_missing_stream(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    assert r.get("nope") is None
    sentinel = spark.range(1)
    assert r.get("nope", default=sentinel) is sentinel


def test_pk_from_parquet_metadata(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    assert r.get_pk("invoices") == ["order_id"]


def test_pk_from_catalog_breadcrumb(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    assert r.get_pk("orders") == ["order_id"]


def test_folder_readers(spark, tmp_dir):
    root = _setup_dir(tmp_dir)
    sync = os.path.join(root, "sync-output")
    csvs = read_csv_folder(spark, sync)
    assert "orders" in csvs and "invoices" not in csvs
    pqs = read_parquet_folder(spark, sync)
    assert "invoices" in pqs and pqs["invoices"].count() == 2


def test_folder_readers_discover_spark_dataset_dirs(spark, tmp_dir):
    """Spark writers emit dataset *directories* named `{stream}.{ext}`;
    to_export output must round-trip through the folder readers."""
    from gluestick_spark.sinks.export import to_export

    df = spark.createDataFrame([(1, "a,b"), (2, 'c"d')], ["id", "txt"])
    to_export(df, "things", tmp_dir, export_format="csv")
    to_export(df, "stuff", tmp_dir, export_format="parquet")
    got_csv = read_csv_folder(spark, tmp_dir)["things"]
    assert {(r["id"], r["txt"]) for r in got_csv.collect()} == {(1, "a,b"), (2, 'c"d')}
    got_pq = read_parquet_folder(spark, tmp_dir)["stuff"]
    assert got_pq.count() == 2


def test_cast_df_strict_adds_missing(spark):
    df = spark.createDataFrame([("1",)], ["a"])
    target = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    out = cast_df_to_schema(df, target, strict=True)
    assert set(out.columns) == {"a", "b"}
    assert out.first()["b"] is None


def test_reader_jsonl_roundtrip(spark, tmp_dir):
    """to_export jsonl output is readable back through the Reader."""
    import os

    from pyspark.sql import Row

    from gluestick_spark import to_export

    df = spark.createDataFrame([Row(id=1, name="a"), Row(id=2, name="b")])
    out_dir = os.path.join(tmp_dir, "sync-output")
    to_export(df, "things-20260101T000000", out_dir, export_format="jsonl")
    # Spark writes a directory named {name}.jsonl; point the Reader at a
    # flattened single-file layout like a tap would produce
    import glob, shutil

    src = glob.glob(os.path.join(out_dir, "things-20260101T000000.jsonl", "part-*.json"))[0]
    flat = os.path.join(tmp_dir, "flat")
    os.makedirs(flat)
    shutil.copy(src, os.path.join(flat, "things-20260101T000000.jsonl"))

    r = Reader(spark, input_dir=flat)
    assert "things" in r
    got = {row["id"]: row["name"] for row in r.get("things").collect()}
    assert got == {1: "a", 2: "b"}


# ---------------------------------------------------------------- polars ---
# Import-parity aliases for the reference's polars surface (VERDICT r6 #8;
# reference readers/pl_reader.py:12, utils/polars_utils.py:3-59,
# singer.py:552). polars is not an engine dependency: functional paths are
# exercised when it's importable, and the no-polars error contract is pinned
# otherwise.


def _has_polars() -> bool:
    try:
        import polars  # noqa: F401

        return True
    except ImportError:
        return False


def test_polars_alias_imports_resolve():
    # a reference script's imports must resolve from the package root
    from gluestick_spark import (  # noqa: F401
        PLLazyFrameReader,
        PolarsReader,
        cast_df_from_schema,
        cast_lf_from_schema,
        gen_singer_header_from_polars_schema,
        map_pd_type_to_polars,
    )


def test_polars_reader_discovery_and_get(spark, tmp_dir):
    from gluestick_spark import PLLazyFrameReader, PolarsReader

    root = _setup_dir(tmp_dir)
    r = PolarsReader(spark, root_dir=root)
    # discovery/catalog run engine-side regardless of polars
    assert sorted(r.keys()) == ["invoices", "orders"]
    assert r.get("missing", default="sentinel") == "sentinel"
    if _has_polars():
        import polars as pl

        out = r.get("orders")
        assert isinstance(out, pl.DataFrame)
        assert out["order_id"].to_list() == [1, 2]  # catalog coercion applied
        lf = PLLazyFrameReader(spark, root_dir=root).get("orders")
        assert isinstance(lf, pl.LazyFrame)
    else:
        import pytest

        with pytest.raises(NotImplementedError, match="polars is not installed"):
            r.get("orders")


def test_cast_df_from_schema_spark_dispatch(spark):
    """The reference's polars cast entrypoints accept a Spark DataFrame and
    cast engine-side — including the boolean string matrix (true/false only,
    junk -> null), never a blind cast."""
    from gluestick_spark import cast_df_from_schema, cast_lf_from_schema

    df = spark.createDataFrame(
        [("1", "5.5", "true"), ("2", "6.25", "nope")], "id string, amt string, ok string"
    )
    out = cast_df_from_schema(df, {"id": "Int64", "amt": "Float64", "ok": "Boolean"})
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "boolean",
    ]
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 5.5, True), (2, 6.25, None)]
    # lf variant: a Spark frame is already lazy; same result
    rows2 = sorted(map(tuple, cast_lf_from_schema(df, {"id": "Int64"}).collect()))
    assert [r[0] for r in rows2] == [1, 2]


def test_map_pd_type_to_polars_contract():
    import pytest

    from gluestick_spark import map_pd_type_to_polars

    if _has_polars():
        import polars as pl

        assert map_pd_type_to_polars("Int64") == pl.Int64
        assert map_pd_type_to_polars("object") == pl.String
        with pytest.raises(ValueError, match="Unknown type"):
            map_pd_type_to_polars("Complex128")
    else:
        with pytest.raises(NotImplementedError, match="polars is not installed"):
            map_pd_type_to_polars("Int64")


def test_gen_singer_header_from_polars_schema_no_polars():
    # operates on str(dtype): plain name strings work without polars
    from gluestick_spark import gen_singer_header_from_polars_schema

    hdr = gen_singer_header_from_polars_schema(
        {
            "id": "Int64",
            "amt": "Float64",
            "ok": "Boolean",
            "ts": "Datetime(time_unit='us', time_zone=None)",
            "tags": "List(String)",
            "meta": "Struct({'a': Int64})",
            "weird": "Decimal128",
        }
    )
    p = hdr["properties"]
    assert p["id"] == {"type": ["integer", "null"]}
    assert p["amt"] == {"type": ["number", "null"]}
    assert p["ok"] == {"type": ["boolean", "null"]}
    assert p["ts"] == {"type": ["string", "null"], "format": "date-time"}
    assert p["tags"]["type"] == ["array", "null"]
    assert p["meta"] == {"type": ["object", "null"]}
    assert p["weird"] == {"type": ["string", "null"]}  # non-primitive stringified


def test_reader_alias_read_directories(spark, tmp_dir):
    """Reference-name alias (reader.py:154): public re-discovery honoring
    an ignore list, on a live Reader."""
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    assert set(r.read_directories()) == {"orders", "invoices"}
    assert set(r.read_directories(ignore=["orders"])) == {"invoices"}


def test_reader_alias_get_types_from_catalog(spark, tmp_dir):
    """Reference-name alias (reader.py:232-279): pandas-style dtype dict +
    parse_dates from the catalog, including anyOf/format handling."""
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    got = r.get_types_from_catalog(r.catalog, "orders")
    assert got["parse_dates"] == ["created_at"]
    assert got["dtype"] == {
        "order_id": "Int64",
        "amount": float,
        "is_active": "boolean",
    }
    # unknown stream -> {}
    assert r.get_types_from_catalog(r.catalog, "nope") == {}
    # anyOf: the member with a format wins; multi-typed -> object
    cat = {
        "streams": [
            {
                "stream": "s",
                "schema": {
                    "properties": {
                        "a": {
                            "anyOf": [
                                {"type": ["string", "null"]},
                                {"type": ["string", "null"], "format": "date-time"},
                            ]
                        },
                        "b": {"type": ["string", "integer", "null"]},
                    }
                },
            }
        ]
    }
    got = r.get_types_from_catalog(cat, "s", headers=["a", "b"])
    assert got == {"dtype": {"b": "object"}, "parse_dates": ["a"]}


def test_reader_alias_get_csv_get_parquet(spark, tmp_dir):
    """Reference readers' get_csv/get_parquet names (pl_reader.py:36-56):
    read one stream with catalog coercion by default."""
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    df = r.get_csv("orders")
    assert dict(df.dtypes)["amount"] == "double"       # catalog-coerced
    assert dict(df.dtypes)["created_at"] == "timestamp"
    raw = r.get_csv("orders", catalog_types=False)
    assert dict(raw.dtypes)["amount"] == "string"
    pq_df = r.get_parquet("invoices", catalog_types=False)
    assert pq_df.count() == 2
    import pytest

    with pytest.raises(FileNotFoundError):
        r.get_csv("missing_stream")


def test_reader_alias_read_parquet_with_chunks(spark, tmp_dir):
    """Reference-name generator alias (reader.py:41-47): driver-side
    pandas batches; the last name in the AST public-name diff."""
    root = _setup_dir(tmp_dir)
    r = Reader(spark, root_dir=root)
    path = r.input_files["invoices"]
    chunks = list(r.read_parquet_with_chunks(path, chunksize=1))
    assert len(chunks) == 2 and all(len(c) == 1 for c in chunks)
    assert list(chunks[0].columns)[:2] == ["order_id", "amount"]
