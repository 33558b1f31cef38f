"""Property-based tests (hypothesis) for the JSON-Schema ⇄ StructType
converter — the component every catalog read and Singer SCHEMA emission
goes through.

Key properties:
- conversion is *total*: any JSON-ish schema dict maps to a valid Spark type
  without raising (the reference silently falls back to object/string;
  reader.py:272-277);
- one round trip normalizes: ``to_json ∘ to_spark`` is idempotent from the
  first round-trip image onward (int widths collapse to long, unknown types
  to string, open objects to map).

Driver-side only — no SparkSession needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from gluestick_spark import (
    combine_anyof_types,
    json_schema_to_spark_type,
    json_schema_to_struct,
    spark_type_to_json_schema,
    struct_to_json_schema,
)

# -- strategies -------------------------------------------------------------

_names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)

_scalar_types = st.sampled_from(
    [
        T.LongType(),
        T.DoubleType(),
        T.BooleanType(),
        T.StringType(),
        T.TimestampType(),
        T.DateType(),
    ]
)


def _datatypes(depth: int = 2):
    if depth == 0:
        return _scalar_types
    inner = _datatypes(depth - 1)
    return st.one_of(
        _scalar_types,
        st.builds(T.ArrayType, inner),
        st.builds(
            lambda fields: T.StructType(
                [T.StructField(n, dt, True) for n, dt in fields]
            ),
            st.lists(st.tuples(_names, inner), min_size=1, max_size=4, unique_by=lambda x: x[0]),
        ),
    )


_json_scalars = st.sampled_from(["integer", "number", "boolean", "string", "object", "array", "null", "weird"])

_json_props = st.recursive(
    st.fixed_dictionaries(
        {},
        optional={
            "type": st.one_of(_json_scalars, st.lists(_json_scalars, max_size=3)),
            "format": st.sampled_from(["date-time", "date", "time", "singer.decimal", "uuid"]),
        },
    ),
    lambda children: st.one_of(
        st.fixed_dictionaries(
            {"type": st.just("array"), "items": children},
        ),
        st.fixed_dictionaries(
            {
                "type": st.just("object"),
                "properties": st.dictionaries(_names, children, max_size=3),
            },
        ),
        st.fixed_dictionaries({"anyOf": st.lists(children, min_size=1, max_size=3)}),
    ),
    max_leaves=8,
)


# -- properties -------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(_json_props)
def test_conversion_is_total(prop):
    dt = json_schema_to_spark_type(prop)
    assert isinstance(dt, T.DataType)
    # and the result can itself be described as JSON-Schema
    assert isinstance(spark_type_to_json_schema(dt), dict)


@settings(max_examples=200, deadline=None)
@given(_datatypes())
def test_roundtrip_idempotent(dt):
    once = json_schema_to_spark_type(spark_type_to_json_schema(dt))
    twice = json_schema_to_spark_type(spark_type_to_json_schema(once))
    assert once == twice


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_names, _datatypes(1)), min_size=1, max_size=5, unique_by=lambda x: x[0]))
def test_struct_roundtrip_preserves_field_names(fields):
    stt = T.StructType([T.StructField(n, dt, True) for n, dt in fields])
    back = json_schema_to_struct(struct_to_json_schema(stt))
    assert back.fieldNames() == stt.fieldNames()


@settings(max_examples=200, deadline=None)
@given(st.lists(_json_props, min_size=1, max_size=4))
def test_combine_anyof_total_and_format_preferred(variants):
    merged = combine_anyof_types({"anyOf": variants})
    assert isinstance(merged, dict)
    with_fmt = [v for v in variants if isinstance(v, dict) and v.get("format")]
    if with_fmt:
        assert merged == with_fmt[0]


def test_scalar_mappings_match_reference_table():
    # SURVEY §1.3 mapping table (reader.py:257, singer.py:117-127)
    assert json_schema_to_spark_type({"type": ["integer", "null"]}) == T.LongType()
    assert json_schema_to_spark_type({"type": ["number", "null"]}) == T.DoubleType()
    assert json_schema_to_spark_type({"type": ["boolean", "null"]}) == T.BooleanType()
    assert (
        json_schema_to_spark_type({"type": ["string", "null"], "format": "date-time"})
        == T.TimestampType()
    )
    assert json_schema_to_spark_type({"type": ["string", "null"], "format": "date"}) == T.DateType()
    # multi-type after null-drop → widest safe type
    assert json_schema_to_spark_type({"type": ["integer", "string"]}) == T.StringType()


# -- widest_common_type lattice properties ----------------------------------
# union_relaxed reconciles each column pair with widest_common_type; these
# properties guarantee reconciliation is order-independent (a multi-file
# diagonal union gives one schema no matter the fold order) and stable
# (re-reconciling with an input never changes the result again).

from gluestick_spark import widest_common_type  # noqa: E402


@given(_datatypes(), _datatypes())
@settings(max_examples=300, deadline=None)
def test_widest_common_type_commutative(a, b):
    assert widest_common_type(a, b) == widest_common_type(b, a)


@given(_datatypes())
@settings(max_examples=200, deadline=None)
def test_widest_common_type_idempotent(a):
    assert widest_common_type(a, a) == a


@given(_datatypes(), _datatypes())
@settings(max_examples=300, deadline=None)
def test_widest_common_type_is_upper_bound(a, b):
    w = widest_common_type(a, b)
    assert widest_common_type(a, w) == w
    assert widest_common_type(b, w) == w


@given(_datatypes(), _datatypes(), _datatypes())
@settings(max_examples=300, deadline=None)
def test_widest_common_type_associative(a, b, c):
    left = widest_common_type(widest_common_type(a, b), c)
    right = widest_common_type(a, widest_common_type(b, c))
    assert left == right
