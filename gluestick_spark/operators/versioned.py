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

Commit protocol: the writer CLAIMS its version number with an exclusive
``os.mkdir`` of ``v=N`` (two concurrent writers can never claim the same
N — the loser's mkdir raises and it retries with N+1), writes the
directory completely, appends N to the ``_COMMITS`` log (atomic
``os.replace`` rewrite), then flips the one-line ``_LATEST`` pointer
(also ``os.replace``) — atomic on POSIX, so readers see the old version
or the new one, never a torn table. Publication is recorded EXPLICITLY:
a version is published iff it appears in ``_COMMITS`` (with a
``_SUCCESS``-marker fallback for tables written before the log existed).
A crash mid-write leaves an unpublished ``v=N`` directory that is
invisible to ``read_versioned``/``published_versions`` — even after
later writes publish higher numbers — and that vacuum removes.

Layout::

    path/
      _LATEST            one line: the published version number
      _COMMITS           one published version number per line (the log)
      v=1/ ... v=N/      immutable Spark parquet directories

Local/posix-rename filesystems only (same contract as ``compact_files``);
object stores need a real table format's conditional-put commit log.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_versioned",
    "read_versioned",
    "list_versions",
    "published_versions",
    "latest_version",
    "vacuum_versions",
]

_POINTER = "_LATEST"
_COMMITS = "_COMMITS"


def _vdir(path: str, v: int) -> str:
    return os.path.join(path, f"v={v}")


def list_versions(path: str) -> list[int]:
    """All version numbers present on disk (published or not), ascending.
    For anything that READS data use :func:`published_versions` — an
    on-disk directory may be a crash leftover."""
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


def _commit_log(path: str) -> set[int]:
    p = os.path.join(path, _COMMITS)
    if not os.path.isfile(p):
        return set()
    out: set[int] = set()
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    out.add(int(line))
                except ValueError:
                    continue
    return out


def _append_commit(path: str, v: int) -> None:
    # atomic rewrite (read + append + replace): a reader never sees a
    # torn log, and the final os.replace is the durability point
    existing = sorted(_commit_log(path) | {v})
    tmp = os.path.join(path, f".{_COMMITS}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(str(x) for x in existing) + "\n")
    os.replace(tmp, os.path.join(path, _COMMITS))


def published_versions(path: str) -> list[int]:
    """Versions that completed a publish, ascending — the only ones
    ``read_versioned`` will open. Source of truth is the ``_COMMITS``
    log; ONLY for legacy tables with no log at all, a version <= the
    pointer counts as published iff its directory holds Spark's
    ``_SUCCESS`` marker (a torn parquet directory never does). Once a
    log exists it is authoritative — a complete-looking directory that
    never reached the log (crash between data write and commit) stays
    unpublished forever, even after later writes bury it under the
    pointer."""
    cur = latest_version(path)
    if os.path.isfile(os.path.join(path, _COMMITS)):
        return sorted(_commit_log(path))
    out: set[int] = set()
    if cur is not None:
        for v in list_versions(path):
            if v <= cur and os.path.isfile(
                os.path.join(_vdir(path, v), "_SUCCESS")
            ):
                out.add(v)
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
    parquet write (fully parallel); only the version claim, commit-log
    append, and pointer flip are driver-side. The version number is
    CLAIMED with an exclusive ``os.mkdir`` before the write, so two
    concurrent writers get distinct version numbers (each publishes its
    own complete directory; last pointer flip wins the "latest" title,
    both remain readable via time travel)."""
    os.makedirs(path, exist_ok=True)
    v = (max(list_versions(path), default=0)) + 1
    while True:
        try:
            os.mkdir(_vdir(path, v))  # exclusive claim
            break
        except FileExistsError:
            v += 1
    df.write.mode("append").parquet(_vdir(path, v))
    _append_commit(path, v)
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
    silently read a crash leftover — including a torn ``v=N`` that later
    writes have since buried under the pointer (publication is tracked in
    the ``_COMMITS`` log, not inferred from directory listings)."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise ValueError(f"no published version at {path}")
    pub = published_versions(path)
    if version not in pub:
        raise ValueError(
            f"version {version} not published at {path} "
            f"(published: {pub}, on disk: {list_versions(path)})"
        )
    return spark.read.parquet(_vdir(path, version))


def vacuum_versions(path: str, keep: int) -> list[int]:
    """Delete all but the newest ``keep`` published versions, plus any
    unpublished crash leftovers OLDER than the pointer (a leftover below
    the published pointer can never be completed — version numbers are
    claimed monotonically — so it is garbage by construction). Anything
    newer than the pointer is never touched: it may be an in-flight
    writer's claim. Returns the deleted version numbers."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    cur = latest_version(path)
    if cur is None:
        return []
    pub = published_versions(path)
    doomed = pub[:-keep] if len(pub) > keep else []
    doomed += [v for v in list_versions(path) if v < cur and v not in pub]
    doomed = sorted(set(doomed))
    for v in doomed:
        shutil.rmtree(_vdir(path, v), ignore_errors=True)
    # keep the commit log consistent with what's actually readable
    log = _commit_log(path)
    if log & set(doomed):
        remaining = sorted(log - set(doomed))
        tmp = os.path.join(path, f".{_COMMITS}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(str(x) for x in remaining) + "\n")
        os.replace(tmp, os.path.join(path, _COMMITS))
    return doomed
