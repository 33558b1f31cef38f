"""Record-level (row-form) APIs: map_fields, pluck_fields, dict-mode
localize_datetime, get_model_datetime_fields.

Ports the core cases of the reference suites
tests/function_tests/map_fields.py and localize_datetime.py, plus an
equivalence test of the row-form vs the distributed df-form mapping DSL.
"""

from __future__ import annotations

import datetime
import os
import typing

import pandas as pd
import pytest

from gluestick_spark.records import (
    CustomValidationError,
    get_model_datetime_fields,
    localize_record_datetimes,
    map_fields,
    pluck_fields,
    pluck_fields_by_regex,
    process_custom_fields,
)


VENDORS = pd.DataFrame(
    [
        {"id": 1, "name": "Acme Corp", "city": "NYC"},
        {"id": 2, "name": "Globex", "city": "LA"},
    ]
)


class TestPluckFields:
    def test_single_id_single_field(self):
        objs = [{"id": 1, "name": "Alice"}, {"id": 2, "name": "Bob"}]
        assert pluck_fields(objs, "id", 1, "name") == "Alice"

    def test_single_id_multiple_fields(self):
        assert pluck_fields(VENDORS, "id", 2, ["name", "city"]) == {
            "name": "Globex",
            "city": "LA",
        }

    def test_multiple_ids(self):
        objs = [{"id": i, "name": n} for i, n in [(1, "A"), (2, "B"), (3, "C")]]
        assert pluck_fields(objs, "id", [1, 3], "name") == ["A", "C"]

    def test_no_match_returns_none(self):
        assert pluck_fields(VENDORS, "id", 999, "name") is None

    def test_none_filter_ids_returns_none(self):
        assert pluck_fields(VENDORS, "id", None, "name") is None

    def test_partition_key(self):
        df = pd.DataFrame(
            [
                {"id": 1, "name": "Alice", "dept": "HR"},
                {"id": 1, "name": "Alice-IT", "dept": "IT"},
            ]
        )
        assert pluck_fields(df, "id", 1, "name", "dept", "HR") == "Alice"

    def test_rejects_spark_dataframe(self, spark):
        sdf = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(TypeError, match="map_fields_df"):
            pluck_fields(sdf, "id", 1, "name")


class TestMapFieldsRow:
    def test_simple_flat_mapping(self):
        row = {"first_name": "John", "last_name": "Doe", "age": 30}
        assert map_fields(row, {"name": "first_name", "surname": "last_name", "years": "age"}) == {
            "name": "John",
            "surname": "Doe",
            "years": 30,
        }

    def test_list_mapping(self):
        row = {"phone1": "555-1234", "phone2": "555-5678", "email": "j@x.com"}
        mapping = {"contact_info": [{"phone_1": "phone1", "phone_2": "phone2", "email_address": "email"}]}
        assert map_fields(row, mapping) == {
            "contact_info": [
                {"phone_1": "555-1234", "phone_2": "555-5678", "email_address": "j@x.com"}
            ]
        }

    def test_nan_and_none_values_excluded(self):
        row = {"name": "John", "age": float("nan"), "city": None}
        mapping = {"person_name": "name", "person_age": "age", "location": "city"}
        assert map_fields(row, mapping) == {"person_name": "John"}

    def test_nonexistent_field_excluded(self):
        assert map_fields({"name": "John"}, {"person_name": "name", "person_age": "age"}) == {
            "person_name": "John"
        }

    def test_deeply_nested(self):
        row = {"fname": "John", "street": "123 Main", "country": "USA"}
        mapping = {
            "person": {
                "name": {"first": "fname"},
                "location": {"address": {"street_name": "street"}, "country_name": "country"},
            }
        }
        assert map_fields(row, mapping) == {
            "person": {
                "name": {"first": "John"},
                "location": {"address": {"street_name": "123 Main"}, "country_name": "USA"},
            }
        }

    def test_pick_single_id_single_field(self):
        row = {"vendor_id": 1, "amount": 500}
        mapping = {
            "vendor_name": {
                "pick": {
                    "objects": "vendors",
                    "id_field": "id",
                    "filter_ids": "rec.vendor_id",
                    "target_fields": "name",
                }
            }
        }
        assert map_fields(row, mapping, {"vendors": VENDORS}) == {"vendor_name": "Acme Corp"}

    def test_pick_multiple_fields(self):
        row = {"vendor_id": 2}
        mapping = {
            "vendor_info": {
                "pick": {
                    "objects": "vendors",
                    "id_field": "id",
                    "filter_ids": "rec.vendor_id",
                    "target_fields": ["name", "city"],
                }
            }
        }
        assert map_fields(row, mapping, {"vendors": VENDORS}) == {
            "vendor_info": {"name": "Globex", "city": "LA"}
        }

    def test_pick_missing_filter_id_yields_none(self):
        row = {"vendor_id": None}
        mapping = {
            "vendor_name": {
                "pick": {
                    "objects": "vendors",
                    "id_field": "id",
                    "filter_ids": "rec.vendor_id",
                    "target_fields": "name",
                }
            }
        }
        assert map_fields(row, mapping, {"vendors": VENDORS}) == {"vendor_name": None}

    def test_pick_no_match_yields_none(self):
        row = {"vendor_id": 999}
        mapping = {
            "vendor_name": {
                "pick": {
                    "objects": "vendors",
                    "id_field": "id",
                    "filter_ids": "rec.vendor_id",
                    "target_fields": "name",
                }
            }
        }
        assert map_fields(row, mapping, {"vendors": VENDORS}) == {"vendor_name": None}

    def test_pick_with_partition_key(self):
        row = {"vendor_id": 1, "dept": "HR"}
        vendors = pd.DataFrame(
            [
                {"id": 1, "name": "Alice", "dept": "HR"},
                {"id": 1, "name": "Alice-IT", "dept": "IT"},
                {"id": 2, "name": "Bob", "dept": "HR"},
            ]
        )
        mapping = {
            "vendor_name": {
                "pick": {
                    "objects": "vendors",
                    "id_field": "id",
                    "filter_ids": "rec.vendor_id",
                    "target_fields": "name",
                    "partition_key": "dept",
                }
            }
        }
        assert map_fields(row, mapping, {"vendors": vendors}) == {"vendor_name": "Alice"}

    def test_pickregex(self):
        row = {"cf_color": "red", "cf_size": "XL", "other": 1}
        mapping = {"custom": {"pickregex": {"regex_field": "^cf_"}}}
        assert map_fields(row, mapping) == {"custom": {"cf_color": "red", "cf_size": "XL"}}

    def test_pickregex_as_custom_fields(self):
        row = {"cf_color": "red", "other": 1}
        mapping = {"custom": {"pickregex": {"regex_field": "^cf_", "return_as_cf": True}}}
        assert map_fields(row, mapping) == {"custom": [{"name": "cf_color", "value": "red"}]}


def test_process_custom_fields_drops_nulls():
    assert process_custom_fields({"a": 1, "b": None, "c": float("nan")}) == [
        {"name": "a", "value": 1}
    ]


def test_pluck_fields_by_regex_plain():
    assert pluck_fields_by_regex({"x_a": 1, "y_b": 2}, "^x_") == {"x_a": 1}


def test_row_form_matches_df_form(spark):
    """The same mapping DSL through map_fields (row) and map_fields_df
    (distributed) must agree."""
    from gluestick_spark.operators.mapping import map_fields_df

    orders = [
        {"order_id": 1, "vendor_id": 1, "status": "open"},
        {"order_id": 2, "vendor_id": 2, "status": "closed"},
        {"order_id": 3, "vendor_id": None, "status": "open"},
    ]
    mapping = {
        "id": "order_id",
        "state": "status",
        "vendor_name": {
            "pick": {
                "objects": "vendors",
                "id_field": "id",
                "filter_ids": "rec.vendor_id",
                "target_fields": "name",
            }
        },
    }
    row_results = [map_fields(r, mapping, {"vendors": VENDORS}) for r in orders]

    odf = spark.createDataFrame(
        [(o["order_id"], o["vendor_id"], o["status"]) for o in orders],
        "order_id long, vendor_id long, status string",
    )
    vdf = spark.createDataFrame(VENDORS)
    df_results = {
        r["id"]: r
        for r in map_fields_df(odf, mapping, {"vendors": vdf})
        .select("id", "state", "vendor_name")
        .collect()
    }
    for rr in row_results:
        dr = df_results[rr["id"]]
        assert dr["state"] == rr["state"]
        assert dr["vendor_name"] == rr.get("vendor_name")


class TestLocalizeRecordDatetimes:
    def test_naive_string_localized(self):
        row = {"created_at": "2024-06-15 10:30:00", "name": "Alice"}
        out = localize_record_datetimes(row, ["created_at"], timezone="US/Eastern")
        assert isinstance(out["created_at"], pd.Timestamp)
        assert str(out["created_at"].tzinfo) == "US/Eastern"

    def test_aware_string_converted(self):
        out = localize_record_datetimes(
            {"created_at": "2024-06-15T10:30:00+00:00"}, ["created_at"], timezone="US/Eastern"
        )
        assert out["created_at"].hour == 6

    def test_string_defaults_to_utc(self):
        out = localize_record_datetimes({"ts": "2024-01-15 12:00:00"}, ["ts"])
        assert str(out["ts"].tzinfo) == "UTC"

    def test_naive_timestamp_localized(self):
        out = localize_record_datetimes(
            {"updated_at": pd.Timestamp("2024-06-15 14:00:00")}, ["updated_at"], "US/Pacific"
        )
        assert str(out["updated_at"].tzinfo) == "US/Pacific"

    def test_aware_timestamp_unchanged(self):
        ts = pd.Timestamp("2024-06-15 14:00:00", tz="US/Eastern")
        out = localize_record_datetimes({"updated_at": ts}, ["updated_at"], "US/Pacific")
        assert out["updated_at"] is ts

    def test_naive_datetime_gets_timezone(self):
        out = localize_record_datetimes(
            {"d": datetime.datetime(2024, 6, 15, 9, 0)}, ["d"], "UTC"
        )
        assert out["d"].tzinfo is not None

    def test_date_promoted_to_midnight(self):
        out = localize_record_datetimes({"d": datetime.date(2024, 6, 15)}, ["d"], "UTC")
        assert isinstance(out["d"], datetime.datetime)
        assert (out["d"].hour, out["d"].minute) == (0, 0)
        assert out["d"].tzinfo is not None

    def test_none_and_missing_fields_skipped(self):
        row = {"a": None}
        assert localize_record_datetimes(row, ["a", "missing"]) == {"a": None}

    def test_nat_raises(self):
        with pytest.raises(CustomValidationError, match="NaT"):
            localize_record_datetimes({"ts": pd.NaT}, ["ts"])

    def test_non_datetime_fields_untouched(self):
        row = {"name": "Alice", "ts": "2024-01-01"}
        out = localize_record_datetimes(row, ["ts"])
        assert out["name"] == "Alice"

    def test_dispatch_through_localize_datetime(self):
        from gluestick_spark.functions.datetimes import localize_datetime

        out = localize_datetime({"ts": "2024-01-15 12:00:00"}, ["ts"])
        assert str(out["ts"].tzinfo) == "UTC"


def test_get_model_datetime_fields():
    import typing

    class _Field:
        def __init__(self, annotation):
            self.annotation = annotation

    class _FakeModel:
        model_fields = {
            "created_at": _Field(typing.Optional[datetime.datetime]),
            "name": _Field(typing.Optional[str]),
            "updated_at": _Field(typing.Union[datetime.datetime, str]),
            # bare datetime is NOT reported (reference quirk, date_utils.py:27)
            "bare": _Field(datetime.datetime),
        }

    assert get_model_datetime_fields(_FakeModel) == ["created_at", "updated_at"]


def test_validate_model_roundtrip(tmp_path, monkeypatch):
    """validate_model localizes datetimes then casts via Pydantic
    (reference unified_models_utils.py:34-80)."""
    pydantic = pytest.importorskip("pydantic")
    from gluestick_spark import validate_model, CustomValidationError

    class Item(pydantic.BaseModel):
        schema_name: typing.ClassVar[str] = "Item"
        id: int
        created_at: typing.Optional[datetime.datetime] = None

    records = [
        {"id": "1", "created_at": "2024-01-02T03:04:05"},
        {"id": 2, "created_at": None},
    ]
    out = validate_model(records, Item, {"timezone": "UTC"})
    assert [m.id for m in out] == [1, 2]
    assert out[0].created_at.tzinfo is not None

    # invalid record raises when raise_error=True
    with pytest.raises(CustomValidationError):
        validate_model([{"id": "nope"}], Item, {})

    # ... and is logged + skipped when raise_error=False
    monkeypatch.chdir(tmp_path)
    out = validate_model([{"id": "nope"}, {"id": 3}], Item, {}, raise_error=False)
    assert [m.id for m in out] == [3]
    assert "failed to be casted" in open(tmp_path / "error_log.txt").read()


def test_establish_directories_and_load_config_json(tmp_path, monkeypatch):
    from gluestick_spark import establish_directories, load_config_json
    import json as _json

    monkeypatch.delenv("ROOT_DIR", raising=False)
    (tmp_path / "config.json").write_text(_json.dumps({"batch_size": 500, "empty": ""}))
    root, base_in, out_dir, snap, tenant, flow, today, tmp, cfg_path = establish_directories(
        {"ROOT_DIR": str(tmp_path), "USER_ID": "t1", "FLOW": "f1", "today": "20260102"}
    )
    assert root == str(tmp_path)
    for d in (base_in, out_dir, snap, tmp):
        assert os.path.isdir(d)
    assert (tenant, flow) == ("t1", "f1")
    assert today == datetime.datetime(2026, 1, 2)
    assert cfg_path == str(tmp_path / "config.json")

    merged = load_config_json(cfg_path, {"batch_size": 100, "timeout": 30, "empty": "x"})
    assert merged == {"batch_size": 500, "timeout": 30, "empty": "x"}
    assert load_config_json(None, {"a": 1}) == {"a": 1}


def test_snapshot_lock_protocol(tmp_path):
    from gluestick_spark import prepare_snapshot_write, finish_snapshot_write

    canonical = str(tmp_path / "s.snapshot.csv")
    # first write: nothing to move aside
    lock = prepare_snapshot_write(canonical)
    assert lock.endswith(".hg.partial_written.lock") and not os.path.exists(canonical)
    open(lock, "w").write("v1")
    finish_snapshot_write(lock, canonical)
    assert open(canonical).read() == "v1"
    # second write: canonical moved to lock (inode reuse), then committed
    lock = prepare_snapshot_write(canonical)
    assert not os.path.exists(canonical) and open(lock).read() == "v1"
    open(lock, "w").write("v2")
    finish_snapshot_write(lock, canonical)
    assert open(canonical).read() == "v2"


def test_get_row_hash_matches_expression_form(tmp_path):
    """Record form agrees with row_hash_expr given the same (sorted) column
    order and non-null values."""
    import hashlib

    from gluestick_spark import get_row_hash

    row = {"b": 2, "a": "x", "c": None}
    # null skipped entirely (no separator), reference etl_utils.py:289-294
    assert get_row_hash(row, ["a", "b", "c"]) == hashlib.md5(b"x2").hexdigest()
    # list values participate stringified
    assert get_row_hash({"a": [1, 2]}, ["a"]) == hashlib.md5(b"[1, 2]").hexdigest()


def test_parse_objs():
    from gluestick_spark import parse_objs

    assert parse_objs("{'a': 1}") == {"a": 1}          # python literal
    assert parse_objs('{"a": null}') == {"a": None}     # JSON fallback
    assert parse_objs([1, 2]) == [1, 2]                 # non-str passthrough
    assert parse_objs(None) is None


def test_deep_convert_datetimes_and_clean_obj_null_values():
    from gluestick_spark import clean_obj_null_values, deep_convert_datetimes

    v = {
        "ts": datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        "d": datetime.date(2024, 1, 2),
        "nested": [{"ts": datetime.datetime(2024, 1, 1)}],
        "n": 1,
    }
    out = deep_convert_datetimes(v)
    assert out["ts"] == "2024-01-02T03:04:05.123456Z"
    assert out["d"] == "2024-01-02"
    assert out["nested"][0]["ts"] == "2024-01-01T00:00:00.000000Z"
    assert out["n"] == 1

    # record mode: plain str.replace; NaN -> {}
    assert clean_obj_null_values('{"a": null}') == '{"a": None}'
    assert clean_obj_null_values(float("nan")) == {}
