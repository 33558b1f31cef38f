"""Versioned table writes with time travel — a table-format-lite layer
over the snapshot family: every write lands as a NEW immutable version
directory and an atomic pointer flip publishes it; readers can open the
latest version or any retained historical one, and vacuum trims history
by count.

This is the capability a training-data pipeline actually needs from a
table format at its simplest: reproduce last week's corpus exactly
(time travel to the version a model was trained on), publish atomically
(a half-written dataset is never visible), and bound storage (vacuum).
Where :mod:`gluestick_spark.operators.snapshot` keeps ONE current state
per stream (type-1), this keeps every published state until vacuumed.

Commit protocol: the version directory ``v=N`` is written completely
first; publishing is ONE ``os.replace`` of a one-line pointer file
(``_LATEST``) — atomic on POSIX, so readers see the old version or the
new one, never a torn table. A crash mid-write leaves an unpublished
``v=N`` directory that the next write simply supersedes (and vacuum
removes). Version numbering is monotone (max existing + 1), so
concurrent readers of older versions are never disturbed — their
directories are immutable until vacuumed.

Layout::

    path/
      _LATEST            one line: the published version number
      v=1/ ... v=N/      immutable Spark parquet directories

Local/posix-rename filesystems only (same contract as ``compact_files``);
object stores need a real table format's commit log.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_versioned",
    "read_versioned",
    "list_versions",
    "latest_version",
    "vacuum_versions",
]

_POINTER = "_LATEST"


def _vdir(path: str, v: int) -> str:
    return os.path.join(path, f"v={v}")


def list_versions(path: str) -> list[int]:
    """All version numbers present on disk (published or not), ascending."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(path: str) -> int | None:
    """The PUBLISHED version (pointer contents), or None before any
    successful publish. Unpublished crash leftovers don't count."""
    p = os.path.join(path, _POINTER)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def write_versioned(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next version and publish it atomically.
    Returns the new version number. The data write is a plain Spark
    parquet write (fully parallel); only the one-line pointer flip is
    driver-side."""
    os.makedirs(path, exist_ok=True)
    v = (max(list_versions(path), default=0)) + 1
    df.write.parquet(_vdir(path, v))
    tmp = os.path.join(path, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(path, _POINTER))  # atomic publish
    return v


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Open the published version (default) or a specific retained one —
    time travel. Raises on an unpublished/unknown version so a typo can't
    silently read a crash leftover."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise ValueError(f"no published version at {path}")
    cur = latest_version(path)
    if version not in list_versions(path) or (cur is not None and version > cur):
        raise ValueError(
            f"version {version} not available at {path} "
            f"(published: {cur}, on disk: {list_versions(path)})"
        )
    return spark.read.parquet(_vdir(path, version))


def vacuum_versions(path: str, keep: int) -> list[int]:
    """Delete all but the newest ``keep`` PUBLISHED-or-older versions
    (the published version itself is always retained, as is anything
    newer — an in-flight unpublished write is never vacuumed from under
    its writer). Returns the deleted version numbers."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    cur = latest_version(path)
    if cur is None:
        return []
    eligible = [v for v in list_versions(path) if v <= cur]
    doomed = eligible[:-keep] if len(eligible) > keep else []
    for v in doomed:
        shutil.rmtree(_vdir(path, v), ignore_errors=True)
    return doomed
