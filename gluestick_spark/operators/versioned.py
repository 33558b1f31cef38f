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
directory completely, records publication PER-VERSION with a
``v=N/_COMMITTED`` marker (created inside the directory the writer
exclusively owns — concurrent commits cannot lose each other's record,
unlike a shared-log rewrite), appends one line to the informational
``_COMMITS`` log via a single ``O_APPEND`` write (kernel-serialized —
never read-modify-rewrite), then flips the one-line ``_LATEST`` pointer
(``os.replace``) — atomic on POSIX, so readers see the old version
or the new one, never a torn table. A version is published iff its
``_COMMITTED`` marker exists or it appears in ``_COMMITS`` (pre-marker
tables), with a ``_SUCCESS``-marker fallback for tables older than the
log. A crash mid-write leaves an unpublished ``v=N`` directory that is
invisible to ``read_versioned``/``published_versions`` — even after
later writes publish higher numbers — and that vacuum removes once the
newest mtime anywhere under it (the whole tree, so committer-v1 task
files staging under ``v=N/_temporary/...`` count as activity) has aged
past a grace period — vacuum can't rmtree under a slow writer that
merely lost the pointer race.

Layout::

    path/
      _LATEST            one line: the published version number
      _COMMITS           one published version per line (append-only log)
      v=1/ ... v=N/      immutable Spark parquet directories
        _COMMITTED       per-version publication marker

All driver-side state-file operations ride the injectable ``fs=`` seam
(:mod:`gluestick_spark.fsio`, VERDICT r11 #3), defaulting to the local
filesystem. The protocol REQUIRES atomic ``replace`` (the pointer flip),
exclusive ``mkdir`` (the version claim), and serialized ``append_line``
(the log) from its backend — a plain object store satisfies none of
these with copy+delete; implement the seam over conditional-put or use
a real table format's commit log there (see the fsio docstring).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsio import LOCAL_FS, StateFS

__all__ = [
    "write_versioned",
    "read_versioned",
    "delete_where",
    "compact_version",
    "list_versions",
    "published_versions",
    "latest_version",
    "vacuum_versions",
]

_POINTER = "_LATEST"
_COMMITS = "_COMMITS"
_MARKER = "_COMMITTED"
_BASE_MARK = "_BASE.json"
_DELETES_DIR = "deletes.parquet"


def _vdir(path: str, v: int) -> str:
    return os.path.join(path, f"v={v}")


def list_versions(path: str, fs: StateFS = LOCAL_FS) -> list[int]:
    """All version numbers present on disk (published or not), ascending.
    For anything that READS data use :func:`published_versions` — an
    on-disk directory may be a crash leftover."""
    if not fs.isdir(path):
        return []
    out = []
    for name in fs.listdir(path):
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def _commit_log(path: str, fs: StateFS = LOCAL_FS) -> set[int]:
    p = os.path.join(path, _COMMITS)
    if not fs.isfile(p):
        return set()
    out: set[int] = set()
    for line in fs.read_text(p).splitlines():
        line = line.strip()
        if line:
            try:
                out.add(int(line))
            except ValueError:
                continue
    return out


def _record_commit(path: str, v: int, fs: StateFS = LOCAL_FS) -> None:
    # Publication record is PER-VERSION: a marker file inside v=N/, a
    # directory this writer owns exclusively (mkdir claim) — two
    # concurrent commits can never lose each other's record. The shared
    # _COMMITS log is kept as an informational/legacy index via a single
    # O_APPEND write (kernel-serialized append, never read-modify-
    # rewrite — the round-8 race: two near-simultaneous rewrites could
    # drop each other's version, orphaning a fully-written table).
    fs.write_text(os.path.join(_vdir(path, v), _MARKER), str(v))
    fs.append_line(os.path.join(path, _COMMITS), str(v))


def published_versions(path: str, fs: StateFS = LOCAL_FS) -> list[int]:
    """Versions that completed a publish, ascending — the only ones
    ``read_versioned`` will open. Source of truth is the per-version
    ``_COMMITTED`` marker (crash-between-data-and-commit leaves no
    marker, so a complete-looking directory stays unpublished forever,
    even after later writes bury it under the pointer); versions listed
    in the ``_COMMITS`` log also count (tables written before the marker
    existed), intersected with what is actually on disk so a vacuumed or
    externally-removed version drops out without a log rewrite. ONLY for
    legacy tables with no markers and no log, a version <= the pointer
    counts as published iff its directory holds Spark's ``_SUCCESS``
    marker (a torn parquet directory never does)."""
    on_disk = list_versions(path, fs)
    marked = {
        v
        for v in on_disk
        if fs.isfile(os.path.join(_vdir(path, v), _MARKER))
    }
    logged = _commit_log(path, fs)
    if marked or logged:
        return sorted(v for v in on_disk if v in marked or v in logged)
    cur = latest_version(path, fs)
    out: set[int] = set()
    if cur is not None:
        for v in on_disk:
            if v <= cur and fs.isfile(
                os.path.join(_vdir(path, v), "_SUCCESS")
            ):
                out.add(v)
    return sorted(out)


def latest_version(path: str, fs: StateFS = LOCAL_FS) -> int | None:
    """The PUBLISHED version (pointer contents), or None before any
    successful publish. Unpublished crash leftovers don't count."""
    p = os.path.join(path, _POINTER)
    if not fs.isfile(p):
        return None
    return int(fs.read_text(p).strip())


def write_versioned(df: DataFrame, path: str, fs: StateFS = LOCAL_FS) -> int:
    """Write ``df`` as the next version and publish it atomically.
    Returns the new version number. The data write is a plain Spark
    parquet write (fully parallel); only the version claim, commit-log
    append, and pointer flip are driver-side. The version number is
    CLAIMED with an exclusive ``os.mkdir`` before the write, so two
    concurrent writers get distinct version numbers (each publishes its
    own complete directory; last pointer flip wins the "latest" title,
    both remain readable via time travel)."""
    v = _claim_version(path, fs)
    df.write.mode("append").parquet(_vdir(path, v))
    _record_commit(path, v, fs)
    fs.write_text_atomic(os.path.join(path, _POINTER), str(v))  # atomic publish
    return v


def _delta_meta(path: str, v: int, fs: StateFS = LOCAL_FS) -> dict | None:
    """The delete-vector metadata of a delta version (``_BASE.json``:
    base version + key columns), or None for a flat data version."""
    import json

    p = os.path.join(_vdir(path, v), _BASE_MARK)
    if not fs.isfile(p):
        return None
    return json.loads(fs.read_text(p))


def _base_chain(path: str, v: int, fs: StateFS = LOCAL_FS) -> list[int]:
    """Versions that ``v`` transitively depends on (delta → base → …)."""
    out: list[int] = []
    m = _delta_meta(path, v, fs)
    while m is not None:
        b = int(m["base"])
        out.append(b)
        m = _delta_meta(path, b, fs)
    return out


def read_versioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fs: StateFS = LOCAL_FS,
) -> DataFrame:
    """Open the published version (default) or a specific retained one —
    time travel. Raises on an unpublished/unknown version so a typo can't
    silently read a crash leftover — including a torn ``v=N`` that later
    writes have since buried under the pointer (publication is tracked in
    the ``_COMMITS`` log, not inferred from directory listings).

    A DELTA version (:func:`delete_where`) is resolved merge-on-read:
    its base resolves recursively, then one anti-join against the delete
    vector — the read-side half of the deletion-vector design."""
    if version is None:
        version = latest_version(path, fs)
        if version is None:
            raise ValueError(f"no published version at {path}")
    pub = published_versions(path, fs)
    if version not in pub:
        raise ValueError(
            f"version {version} not published at {path} "
            f"(published: {pub}, on disk: {list_versions(path, fs)})"
        )
    m = _delta_meta(path, version, fs)
    if m is None:
        return spark.read.parquet(_vdir(path, version))
    base = read_versioned(spark, path, int(m["base"]), fs)
    dels = spark.read.parquet(
        os.path.join(_vdir(path, version), _DELETES_DIR)
    )
    return base.join(dels, list(m["keys"]), "left_anti")


def _claim_version(path: str, fs: StateFS = LOCAL_FS) -> int:
    """Claim the next version number with an exclusive mkdir (the
    write_versioned protocol, factored for delete_where)."""
    fs.makedirs(path, exist_ok=True)
    v = (max(list_versions(path, fs), default=0)) + 1
    while True:
        try:
            fs.mkdir(_vdir(path, v))  # exclusive claim
            return v
        except FileExistsError:
            v += 1


def delete_where(
    spark: SparkSession,
    path: str,
    condition: "Column | str",
    key_cols: "list[str] | str",
    fs: StateFS = LOCAL_FS,
) -> int:
    """DELETE rows from the versioned table as a MERGE-ON-READ delta
    version — the table-side takedown path matching the ANN-index
    tombstone story (r14): the new version holds ONLY the matched key
    tuples (the delete vector) plus a ``_BASE.json`` pointer, so a
    takedown/PII delete costs O(matched keys), never a table rewrite;
    :func:`read_versioned` resolves it with one anti-join. Returns the
    new version number.

    Time-travel semantics are the standard table-format ones: PRE-delete
    versions remain readable (reproducibility), so the PHYSICAL purge
    completes when (a) :func:`compact_version` materializes the deletes
    into a flat version and (b) :func:`vacuum_versions` ages the
    pre-delete versions out of retention — the documented GDPR flow.
    Vacuum is chain-aware: a base version referenced by any retained
    delta is never removed.

    Crash contract: claim → delete-vector write → base marker →
    ``_COMMITTED`` → pointer flip; a crash before the commit marker
    leaves an unpublished directory invisible to readers and vacuumable
    under the normal grace rules."""
    import json

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    cur = latest_version(path, fs)
    if cur is None:
        raise ValueError(f"no published version at {path} to delete from")
    base_df = read_versioned(spark, path, cur, fs=fs)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    doomed = base_df.where(cond).select(*keys).distinct()
    v = _claim_version(path, fs)
    doomed.write.mode("append").parquet(
        os.path.join(_vdir(path, v), _DELETES_DIR)
    )
    fs.write_text_atomic(
        os.path.join(_vdir(path, v), _BASE_MARK),
        json.dumps({"base": int(cur), "keys": keys}),
    )
    _record_commit(path, v, fs)
    fs.write_text_atomic(os.path.join(path, _POINTER), str(v))
    return v


def compact_version(
    spark: SparkSession, path: str, fs: StateFS = LOCAL_FS
) -> int:
    """Materialize the latest version into a FLAT data version (resolve
    the delta chain once, write the survivors) — the merge-on-read
    amortization step, and the first half of the physical-purge flow
    (vacuum the pre-delete history for the second). No-op (returns the
    current version) when the latest version is already flat."""
    cur = latest_version(path, fs)
    if cur is None:
        raise ValueError(f"no published version at {path}")
    if _delta_meta(path, cur, fs) is None:
        return cur
    return write_versioned(read_versioned(spark, path, cur, fs=fs), path, fs)


def _tree_mtime(
    root: str, stop_at: float | None = None, fs: StateFS = LOCAL_FS
) -> float:
    """Newest mtime anywhere under ``root`` (directories AND files,
    recursively). A plain ``getmtime(root)`` misses in-flight Spark
    writes: with Hadoop FileOutputCommitter v1 task files stage under
    ``v=N/_temporary/<attempt>/...`` and only move into ``v=N`` at job
    commit, so landing a task file refreshes a NESTED directory's mtime,
    never the parent's. Walking the tree sees that activity.

    ``stop_at`` short-circuits the walk (ADVICE r10): the moment any
    mtime > ``stop_at`` is seen the verdict is already "too fresh to
    vacuum", so the remaining O(files) stats are skipped — vacuum cost
    on a LIVE version tree is then O(1)-ish instead of O(files)."""
    try:
        newest = fs.getmtime(root)
    except OSError:
        return 0.0
    if stop_at is not None and newest > stop_at:
        return newest
    for dirpath, _dirnames, filenames in fs.walk(root):
        try:
            newest = max(newest, fs.getmtime(dirpath))
        except OSError:
            continue
        if stop_at is not None and newest > stop_at:
            return newest
        for name in filenames:
            try:
                newest = max(newest, fs.getmtime(os.path.join(dirpath, name)))
            except OSError:
                continue
            if stop_at is not None and newest > stop_at:
                return newest
    return newest


def vacuum_versions(
    path: str,
    keep: int,
    unpublished_grace_seconds: float = 3600.0,
    fs: StateFS = LOCAL_FS,
) -> list[int]:
    """Delete all but the newest ``keep`` published versions, plus
    unpublished crash leftovers OLDER than the pointer that have sat
    unmodified for at least ``unpublished_grace_seconds``. The grace
    period exists because a buried claim is NOT garbage by construction:
    a slow writer's lower-numbered claim can still be mid-write when a
    faster writer publishes a higher version, and an rmtree under it
    would let it commit a torn/deleted version. Staleness is judged by
    the newest mtime ANYWHERE under ``v=N`` (:func:`_tree_mtime`) — with
    committer-v1 staging an active writer's task files land under
    ``v=N/_temporary/...`` without touching ``v=N`` itself, so the
    top-level mtime alone would age out a live write. Anything newer
    than the pointer is never touched regardless of age, and the default
    grace (1h) is set above plausible single-job write durations; raise
    it for clusters whose jobs run longer. Returns the deleted version
    numbers.

    .. versionchanged:: round 10
       The default ``unpublished_grace_seconds`` was RAISED 900 → 3600:
       15 minutes sat below realistic large-write durations, so a slow
       writer's in-flight claim could be vacuumed mid-write. Callers
       that relied on the faster cleanup must now pass ``900``
       explicitly (existing call sites were audited — none did).
    .. versionchanged:: round 11
       The staleness walk short-circuits at the first fresh mtime, so
       probing a live multi-thousand-file version tree no longer stats
       every file on each vacuum call.

    The ``_COMMITS`` log is never rewritten (that would race a
    concurrent writer's append): ``published_versions`` intersects the
    log with what is on disk, so stale lines for vacuumed versions are
    inert."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    cur = latest_version(path, fs)
    if cur is None:
        return []
    pub = published_versions(path, fs)
    doomed = set(pub[:-keep] if len(pub) > keep else [])
    # chain protection (r14 merge-on-read deltas): a base a RETAINED
    # delta resolves through must survive, however old — removing it
    # would break every reader of the retained version
    protected: set[int] = set()
    for v in pub[-keep:] if len(pub) > keep else pub:
        protected.update(_base_chain(path, v, fs))
    doomed -= protected
    now = time.time()
    for v in list_versions(path, fs):
        if v < cur and v not in pub:
            fresh_cutoff = now - unpublished_grace_seconds
            mtime = _tree_mtime(_vdir(path, v), stop_at=fresh_cutoff, fs=fs)
            if mtime and mtime <= fresh_cutoff:
                doomed.add(v)
    out = sorted(doomed)
    for v in out:
        fs.rmtree(_vdir(path, v), ignore_errors=True)
    return out
