"""Unified export router: singer / parquet / csv / json / jsonl.

Parity: /root/reference/gluestick/etl_utils.py:561-832 (``to_export``) —
zstd parquet, name override via env ``HG_UNIFIED_OUTPUT_{NAME}``,
``output_file_prefix`` templating via format_str_safely.

Spark shape: parquet/csv/jsonl are distributed writers (directory outputs —
at 100 TB a single file is an anti-pattern; ``coalesce_single=True`` opts
into the reference's one-file layout for protocol compatibility). ``json``
(one JSON array) and ``singer`` are driver-streamed by nature.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame

from ..functions.strings import build_string_format_variables, format_str_safely
from .singer import to_singer

__all__ = ["to_export"]


def _resolve_name(name: str, output_file_prefix: str | None, format_vars: dict[str, Any]) -> str:
    env_name = os.environ.get(f"HG_UNIFIED_OUTPUT_{name.upper()}")
    if env_name:
        name = env_name
    if output_file_prefix:
        prefix = format_str_safely(output_file_prefix, **format_vars)
        name = f"{prefix}{name}"
    return name


def to_export(
    df: DataFrame,
    name: str,
    output_dir: str,
    keys: list[str] | None = None,
    unified_model: Any = None,
    export_format: str = "singer",
    output_file_prefix: str | None = None,
    stringify_objects: bool = False,
    allow_objects: bool = False,
    schema: dict[str, Any] | None = None,
    keep_null_fields: bool = False,
    coalesce_single: bool = True,
    tenant_metadata: dict[str, Any] | None = None,
) -> None:
    """Route ``df`` to the requested sink format."""
    format_vars = build_string_format_variables(tenant_metadata)
    name = _resolve_name(name, output_file_prefix, format_vars)
    os.makedirs(output_dir, exist_ok=True)

    if export_format == "singer":
        to_singer(
            df,
            name,
            output_dir,
            keys=keys or [],
            allow_objects=allow_objects or stringify_objects,
            schema=schema,
            keep_null_fields=keep_null_fields,
        )
        return

    out = df.coalesce(1) if coalesce_single else df
    path = os.path.join(output_dir, f"{name}.{ _ext(export_format) }")
    if export_format == "parquet":
        out.write.mode("overwrite").option("compression", "zstd").parquet(path)
    elif export_format == "csv":
        out.write.mode("overwrite").option("header", "true").csv(path)
    elif export_format in ("jsonl", "json"):
        out.write.mode("overwrite").json(path)
    else:
        raise ValueError(f"unsupported export_format: {export_format}")


def _ext(export_format: str) -> str:
    return {"parquet": "parquet", "csv": "csv", "jsonl": "jsonl", "json": "json"}[export_format]
