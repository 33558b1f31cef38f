"""Crash-safe APPEND protocol for persisted ANN indexes (ADVICE r10).

Rounds ≤10 bracketed an index append by DELETING the ``_ROUTER.json``
commit marker before the cell write and atomically rewriting it after.
That refuses torn appends loudly, but any transient Spark job failure —
not just a crash — left the index permanently uncommitted with no
recovery path short of a full ``materialize_*`` over the entire corpus,
and the partially appended cell files were never cleaned up.

This module replaces the delete-the-marker bracket with an
``_APPEND_INPROGRESS`` sidecar (a batch manifest):

- :func:`begin_append` snapshots the current cell-file listing into the
  sidecar (atomic tmp+replace) BEFORE the append writes anything. If a
  prior sidecar exists, the torn batch is first rolled back.
- :func:`commit_append` removes the sidecar after the append job
  commits — the grown index is live.
- :func:`rollback_torn_append` deletes every cell file NOT named in the
  manifest (parquet appends only ever ADD uniquely-named part files, so
  "not in the manifest" exactly identifies the torn batch), prunes any
  partition directories the torn batch created, and removes the
  sidecar. Idempotent — safe to crash during rollback and re-run.
- :func:`require_committed` is the serving-side guard: an index with a
  sidecar present is mid-append or torn and must not be probed.

``_ROUTER.json`` stays in place throughout: it still commits the BUILD
(a missing router refuses as before); the sidecar owns append-torn
state. A retried append therefore self-heals — roll back, re-append —
and the worst-case loss is the one unacknowledged batch, never the
index.

Scale note: the manifest is file METADATA (relative paths only), O(part
files) not O(rows); listing and rollback touch the index directory
tree, never the data.

All state-file operations go through the injectable ``fs=`` seam
(:mod:`gluestick_spark.fsio`, VERDICT r11 #3) — the default is the
local filesystem; an object-store backend must provide ATOMIC
``replace`` (the sidecar publish) or the bracket's crash-safety claim
is void. See the fsio module docstring for the per-backend contract.
"""

from __future__ import annotations

import json
import os

from ..fsio import LOCAL_FS, StateFS

SIDECAR = "_APPEND_INPROGRESS"


def _cells_root(path: str, cells: str) -> str:
    return os.path.join(path, cells)


def _list_cell_files(root: str, fs: StateFS = LOCAL_FS) -> list[str]:
    out: list[str] = []
    if not fs.isdir(root):
        return out
    for dirpath, _dirs, files in fs.walk(root):
        rel = os.path.relpath(dirpath, root)
        for fn in files:
            out.append(fn if rel == "." else os.path.join(rel, fn))
    return sorted(out)


def rollback_torn_append(
    path: str, cells: str = "cells", fs: StateFS = LOCAL_FS
) -> bool:
    """Undo a torn/unacknowledged append: delete cell files not in the
    manifest, prune partition dirs it created, drop the sidecar.
    Returns True iff a torn batch was rolled back.

    The sidecar is SELF-DESCRIBING since r14: it records which root its
    manifest lists (``cells``), and the rollback honors the RECORDED
    root over the caller's default — without this, a torn DELETE
    (manifest = tombstone files) healed by an append's rollback (default
    root = cell files) would compare cell files against a tombstone
    manifest and destroy the index. Pre-r14 sidecars lack the key and
    fall back to the caller's argument."""
    side = os.path.join(path, SIDECAR)
    if not fs.isfile(side):
        return False
    manifest_doc = json.loads(fs.read_text(side))
    manifest = set(manifest_doc["files"])
    cells = manifest_doc.get("cells", cells)
    root = _cells_root(path, cells)
    for rel in _list_cell_files(root, fs):
        # the sidecar lives under root itself when cells='.' (the plain-IVF
        # layout) — it is protocol state, never a torn data file; it is
        # removed once, below, after the rollback completes
        if rel == SIDECAR:
            continue
        if rel not in manifest:
            fs.remove(os.path.join(root, rel))
    if fs.isdir(root):
        for dirpath, _dirs, files in fs.walk(root, topdown=False):
            if dirpath != root and not fs.listdir(dirpath):
                fs.rmdir(dirpath)
    fs.remove(side)
    return True


def begin_append(
    path: str, cells: str = "cells", fs: StateFS = LOCAL_FS
) -> None:
    """Open the append bracket: roll back any torn batch, then snapshot
    the pre-append cell listing into the sidecar (atomic)."""
    rollback_torn_append(path, cells, fs)
    side = os.path.join(path, SIDECAR)
    fs.write_text_atomic(
        side,
        json.dumps(
            {
                "files": _list_cell_files(_cells_root(path, cells), fs),
                "cells": cells,
            }
        ),
    )


def commit_append(path: str, fs: StateFS = LOCAL_FS) -> None:
    """Close the bracket — the appended batch is live."""
    fs.remove(os.path.join(path, SIDECAR))


def require_committed(path: str, what: str, fs: StateFS = LOCAL_FS) -> None:
    """Serving-side guard: refuse to probe an index whose last append
    never committed (or is running right now — single-writer contract)."""
    if fs.isfile(os.path.join(path, SIDECAR)):
        raise ValueError(
            f"{what} index at {path} has an in-progress or torn append "
            f"({SIDECAR} present) — retry the append (it rolls the torn "
            "batch back and re-appends), or remove the sidecar after "
            "rolling back manually. Serving a half-appended index would "
            "return rows from an unacknowledged batch."
        )
