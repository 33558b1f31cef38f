"""Driver-side string/config helpers.

Parity targets (citations into /root/reference):
- ``format_str_safely``: gluestick/etl_utils.py:528-558 — replace ``{key}``
  placeholders, skipping empty/missing values (placeholder left intact).
- ``build_string_format_variables``: gluestick/etl_utils.py:451-525 — merge
  tenant metadata + env vars into format variables; reserved keys protected.
- ``get_index_safely``: gluestick/etl_utils.py:430-448.
"""

from __future__ import annotations

import os
import re
from typing import Any, Sequence

__all__ = ["format_str_safely", "build_string_format_variables", "get_index_safely"]

_RESERVED_KEYS = ("env", "tenant", "tenant_metadata")
_ENV_KEYS = ("FLOW", "JOB_ID", "TAP", "TENANT", "FLOW_ID", "JOB_ROOT", "TARGET")


def format_str_safely(value: str, **format_vars: Any) -> str:
    """Replace ``{key}`` placeholders with non-empty values; unknown or
    empty keys leave the placeholder untouched."""
    def sub(m: re.Match[str]) -> str:
        key = m.group(1)
        v = format_vars.get(key)
        if v is None or v == "":
            return m.group(0)
        return str(v)

    return re.sub(r"\{(\w+)\}", sub, value)


def build_string_format_variables(
    tenant_metadata: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Merge tenant metadata and well-known env vars into format variables.

    Reserved keys can't be overridden by tenant metadata.
    """
    out: dict[str, Any] = {}
    tenant_metadata = tenant_metadata or {}
    for k, v in tenant_metadata.items():
        if k not in _RESERVED_KEYS:
            out[k] = v
    for k in _ENV_KEYS:
        v = os.environ.get(k)
        if v:
            out[k.lower()] = v
            out[k] = v
    return out


def get_index_safely(seq: Sequence[Any] | None, idx: int) -> Any:
    """``seq[idx]`` or None (etl_utils.py:430-448)."""
    if seq is None:
        return None
    try:
        return seq[idx]
    except (IndexError, KeyError, TypeError):
        return None
