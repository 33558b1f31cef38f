"""Declarative field-mapping DSL compiled to Spark expressions + joins.

Parity targets (citations into /root/reference):
- ``map_fields`` (row form): gluestick/etl_utils.py:1179-1241 — scalar
  rename, nested dicts, list-of-mappings, ``pick`` lookups (``rec.``-prefixed
  dynamic filter ids, optional partition key), ``pickregex``.
- ``map_fields_df`` (vectorized form): gluestick/etl_utils.py:1243-1340 —
  simple renames vectorized; ``pick`` via left merge with keep-last-deduped
  lookup side; ``is_list`` picks gather per-row id lists.
- tenant mapping config parsing: gluestick/etl_utils.py:924-1024
  (``read_tenant_custom_mapping`` + v1/legacy parsers) and
  ``should_map_table`` (etl_utils.py:1026-1040).

Spark compilation strategy (this is the Spark-native target the reference's
docstring asks for): the mapping dict is compiled ONCE into
- a set of column expressions (simple renames, nested structs, regex picks
  — zero extra plan nodes), and
- one broadcast left join per ``pick`` (lookup sides are small dimension
  frames; keep-last dedup before the join is semantic, not just perf).
``is_list`` picks explode the id array, join, and regroup on a synthetic
row id — two shuffles bounded by the exploded width, never a per-row UDF.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .union import keep_last

__all__ = [
    "map_fields_df",
    "read_tenant_custom_mapping",
    "should_map_table",
]


def _strip_rec(filter_ids: str) -> str:
    return filter_ids.replace("rec.", "") if filter_ids.startswith("rec.") else filter_ids


def _simple_expr(df: DataFrame, value: Any) -> Column | None:
    """Scalar mapping: source column name → column (None when absent)."""
    if isinstance(value, str) and value in df.columns:
        return F.col(f"`{value}`")
    return None


def _nested_expr(df: DataFrame, mapping: Mapping[str, Any]) -> Column:
    """Nested dict mapping (no picks inside) → struct expression."""
    fields = []
    for key, value in mapping.items():
        if isinstance(value, dict):
            fields.append(_nested_expr(df, value).alias(key))
        elif isinstance(value, list):
            fields.append(_list_expr(df, value).alias(key))
        else:
            col = _simple_expr(df, value)
            if col is not None:
                fields.append(col.alias(key))
    return F.struct(*fields) if fields else F.lit(None)


def _list_expr(df: DataFrame, mappings: list[Mapping[str, Any]]) -> Column:
    """List-of-mappings → array<struct>, dropping all-null elements
    (reference drops empty mapped dicts, etl_utils.py:1201-1207)."""
    elems = [_nested_expr(df, m) for m in mappings]
    arr = F.array(*elems)
    # element survives if any field is non-null
    return F.filter(
        arr,
        lambda s: F.to_json(s).isNotNull() & (F.to_json(s) != F.lit("{}")),
    )


def _regex_pick_expr(df: DataFrame, kwargs: Mapping[str, Any]) -> Column:
    """pickregex: columns matching pattern → struct, or custom-fields array
    when ``return_as_cf`` (reference etl_utils.py:1161-1177)."""
    pattern = kwargs.get("pattern", kwargs.get("regex", ""))
    rx = re.compile(pattern)
    cols = [c for c in df.columns if rx.search(c)]
    if kwargs.get("return_as_cf"):
        from .project import custom_fields_expr

        return custom_fields_expr(cols)
    return F.struct(*[F.col(f"`{c}`").alias(c) for c in cols])


def _apply_pick(
    df: DataFrame,
    out_col: str,
    pick: Mapping[str, Any],
    other_data: Mapping[str, DataFrame],
) -> DataFrame:
    objects = other_data.get(pick.get("objects"))
    if objects is None:
        return df

    id_field = pick["id_field"]
    filter_col = _strip_rec(pick["filter_ids"])
    target_fields = pick["target_fields"]
    partition_key = pick.get("partition_key")
    is_list = pick.get("is_list", False)

    dedup_keys = [id_field] + ([partition_key] if partition_key else [])
    lookup_cols = dedup_keys + (
        [target_fields] if isinstance(target_fields, str) else list(target_fields)
    )
    lookup = keep_last(objects.select(*dict.fromkeys(lookup_cols)), dedup_keys)

    if isinstance(target_fields, str):
        value_expr = F.col(f"`{target_fields}`").alias(out_col)
    else:
        value_expr = F.struct(*[F.col(f"`{t}`") for t in target_fields]).alias(out_col)
    lookup = lookup.select(
        F.col(f"`{id_field}`").alias("__lk_id__"),
        *([F.col(f"`{partition_key}`").alias("__lk_pk__")] if partition_key else []),
        value_expr,
    )

    if not is_list:
        cond = df[filter_col] == lookup["__lk_id__"]
        if partition_key:
            cond = cond & (df[partition_key] == lookup["__lk_pk__"])
        return df.join(F.broadcast(lookup), cond, "left").drop("__lk_id__", "__lk_pk__")

    # is_list: explode the per-row id array, join, regroup preserving rows
    rid = "__map_rid__"
    with_id = df.withColumn(rid, F.monotonically_increasing_id())
    exploded = with_id.select(
        rid,
        F.explode_outer(F.col(f"`{filter_col}`")).alias("__fid__"),
        *([F.col(f"`{partition_key}`").alias("__pk__")] if partition_key else []),
    )
    cond = exploded["__fid__"] == lookup["__lk_id__"]
    if partition_key:
        cond = cond & (exploded["__pk__"] == lookup["__lk_pk__"])
    joined = exploded.join(F.broadcast(lookup), cond, "left")
    regrouped = joined.groupBy(rid).agg(
        F.collect_list(out_col).alias(out_col)
    )
    return (
        with_id.join(regrouped, rid, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.array()))
        .drop(rid)
    )


def map_fields_df(
    df: DataFrame,
    mapping: Mapping[str, Any],
    other_data: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Apply a declarative mapping to ``df`` (adds mapped columns, keeping
    the originals — matching the reference's df form)."""
    other_data = other_data or {}
    exprs: list[tuple[str, Column]] = []
    picks: list[tuple[str, Mapping[str, Any]]] = []

    for key, value in mapping.items():
        if value is None:
            continue
        if isinstance(value, str):
            col = _simple_expr(df, value)
            if col is not None:
                exprs.append((key, col))
        elif isinstance(value, list):
            exprs.append((key, _list_expr(df, value)))
        elif isinstance(value, dict):
            if "pick" in value:
                picks.append((key, value["pick"]))
            elif "pickregex" in value:
                exprs.append((key, _regex_pick_expr(df, value["pickregex"])))
            else:
                exprs.append((key, _nested_expr(df, value)))

    out = df
    if exprs:
        out = out.select("*", *[c.alias(k) for k, c in exprs])
    for key, pick in picks:
        out = _apply_pick(out, key, pick, other_data)
    return out


# ---------------------------------------------------------------------------
# Tenant mapping config parsing (driver-side; semantics per reference)
# ---------------------------------------------------------------------------

def _parse_v1(raw: Mapping[str, Any], connector_id: str | None) -> tuple[dict, dict]:
    fields_by_stream: dict[str, Any] = {}
    stream_names: dict[str, str] = {}
    if connector_id and isinstance(raw.get(connector_id), list):
        entries = raw[connector_id]
    else:
        entries = [e for v in raw.values() if isinstance(v, list) for e in v]
    for entry in entries:
        if not isinstance(entry, dict):
            raise ValueError(f"Unexpected mapping entry type: {type(entry)}")
        if "source" not in entry or "target" not in entry:
            raise ValueError(f"Mapping entry missing source/target: {entry}")
        fields_by_stream[entry["source"]] = entry.get("fields", {})
        stream_names[entry["source"]] = entry["target"]
    return fields_by_stream, stream_names


def _parse_legacy(raw: Mapping[str, Any], flow_id: str | None) -> tuple[dict, dict]:
    fields_by_stream: dict[str, Any] = {}
    stream_names: dict[str, str] = {}
    if flow_id is None and len(raw) == 1:
        flow_id = next(iter(raw))
    flow_mapping = raw.get(flow_id)
    if not flow_mapping:
        return fields_by_stream, stream_names
    if not isinstance(flow_mapping, dict):
        raise ValueError("Invalid mapping structure.")
    for combined, field_map in flow_mapping.items():
        source, target = combined.split("/", 1)
        fields_by_stream[source] = field_map
        stream_names[source] = target
    return fields_by_stream, stream_names


def read_tenant_custom_mapping(
    tenant_config: Mapping[str, Any],
    flow_id: str | None = None,
    connector_id: str | None = None,
) -> tuple[dict, dict]:
    """Parse tenant mapping config into (field-map, stream-rename map).

    Format detected from ``version``: "1.0" → connectorList
    (``[{source, target, fields}]``), else legacy ``Source/Target`` keys.
    """
    import os

    raw = tenant_config.get("hotglue_mapping", {}).get("mapping", {})
    if not raw:
        return {}, {}
    if raw.get("version") == "1.0":
        cid = connector_id or os.environ.get("CONNECTOR_ID", os.environ.get("TAP"))
        return _parse_v1(raw, cid)
    return _parse_legacy(raw, flow_id)


def should_map_table(model_name: str, config: Mapping[str, Any]) -> bool:
    """True when the table is selected for mapping (etl_utils.py:1026-1040)."""
    return bool(config.get("selected_tables", {}).get(model_name))
