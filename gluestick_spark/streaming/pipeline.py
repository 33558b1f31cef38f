"""Structured Streaming pipelines.

The reference has no continuous streaming (SURVEY §2.11) — its "streams" are
Singer entity streams. This module is the engine's beyond-reference scale
path: the same operators applied incrementally.

- ``stream_from_directory``: file-source stream over a directory of parquet
  stream files (the Singer tap drop-dir pattern, made continuous).
- ``windowed_event_counts``: watermarked tumbling-window aggregation for
  late-arriving events.
- ``streaming_snapshot_upsert``: incremental snapshot maintenance — each
  micro-batch is upserted into the persistent snapshot via ``foreachBatch``
  (the streaming form of etl_utils.py:193-269's snapshot_records).

All run with ``trigger(availableNow=True)`` in tests (bounded execution);
on a cluster the same code runs continuously with checkpointing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "stream_from_directory",
    "windowed_event_counts",
    "streaming_snapshot_upsert",
    "streaming_dedup",
    "streaming_minhash_dedup",
    "streaming_url_dedup",
    "streaming_fingerprint_dedup",
    "streaming_quantiles",
    "compact_sketch_log",
    "read_streaming_dedup_output",
    "streaming_decontam",
    "streaming_bin_counts",
    "bin_counts_from_state",
    "streaming_agg_upsert",
    "sessionize",
    "streaming_interval_join",
    "streaming_scd2",
    "streaming_cdc",
    "compact_stream_state",
    "materialize_gram_state",
    "streaming_novelty",
    "materialize_corpus_sketch",
    "streaming_corpus_drift",
]


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only within the
    watermark horizon — the state TTL that makes continuous dedup viable at
    100 TB/day (a bare ``dropDuplicates`` on a stream accumulates state
    forever). Duplicates arriving later than ``watermark`` pass through:
    choose the horizon from the source's real redelivery window, and layer
    the batch :func:`~gluestick_spark.llm.dedup.exact_dedup` over the sink
    for full-history guarantees.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a time bound: each left row matches
    right rows with the same key whose timestamp falls in
    ``[left_ts − lookback, left_ts]`` — the attribution shape
    (purchase ← clicks in the preceding hour, alert ← metrics in the
    window before it).

    Both sides are watermarked; the interval condition is what makes the
    join's state BOUNDED: Spark derives from it how long each side's rows
    can still find a partner (left: ``watermark``; right: ``watermark +
    lookback``) and evicts state past that horizon. An unconstrained
    stream-stream join would buffer both streams forever — the 100 TB/day
    non-starter. Rows later than the watermark are dropped on input, the
    same contract as :func:`windowed_event_counts`.

    Column names must be disjoint (pre-alias each side — streaming joins
    have no suffixing). ``how`` may be ``"inner"`` or ``"leftOuter"``.
    Outer (null-padded) results for an unmatched left row emit only once
    the watermark passes ``left_ts`` — i.e. only after LATER data arrives
    to advance it; Spark does not flush join state at end-of-stream, so a
    bounded ``availableNow`` run emits outer rows only for left rows
    whose deadline the final watermark passed (the same
    only-finalized-results contract as windowed aggregation).

    Batch-equivalence: on static frames the same expression compiles to a
    range-predicate hash join, so the DuckDB oracle is a plain
    ``BETWEEN`` join — the driver row proves stream == batch.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"streaming_interval_join supports how='inner'/'leftOuter', got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how)


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: new files appearing under ``path`` become
    micro-batches. Schema must be supplied (streaming reads don't infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported stream format: {fmt}")


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts/sums. Late rows beyond the
    watermark are dropped; state is bounded (the point of the watermark at
    100 TB/day event volumes)."""
    group_cols = group_cols or ["event_type"]
    w = events.withWatermark(ts_col, watermark)
    return (
        w.groupBy(F.window(F.col(ts_col), window).alias("win"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE_SCHEMA = "session_start timestamp, last_ts timestamp, n long"


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization per user via
    ``applyInPandasWithState`` (arbitrary state Spark's built-in windows
    can't express — a session closes ``gap_minutes`` after its last event,
    however long it ran).

    State per user = (session_start, last_ts, n). A session is emitted when
    a later event exceeds the gap, or when event-time timeout fires (the
    watermark passed last_ts + gap — bounded state, the 100 TB/day
    requirement). Emission is append-mode: closed sessions only.
    """
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = _dt.timedelta(minutes=gap_minutes)

    def handle(key, pdf_iter, state: GroupState):
        (user,) = key
        cols = ["user_id", "session_start", "session_end", "n_events"]
        if state.hasTimedOut:
            s0, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user, s0, last, n)], columns=cols)
            return
        batches = [pdf[[ts_col]] for pdf in pdf_iter]
        rows = pd.concat(batches).sort_values(ts_col)
        if state.exists:
            s0, last, n = state.get
        else:
            s0, last, n = None, None, 0
        closed = []
        for ts in rows[ts_col]:
            if last is not None and (ts - last) > gap:
                closed.append((user, s0, last, n))
                s0, n = None, 0
            if s0 is None:
                s0 = ts
            last = ts
            n += 1
        state.update((s0, last, n))
        # close the open session once event time passes last + gap
        state.setTimeoutTimestamp(int(last.timestamp() * 1000) + int(gap.total_seconds() * 1000))
        yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            handle,
            SESSION_OUTPUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_agg_upsert(
    stream_df: DataFrame,
    stream: str,
    snapshot_dir: str,
    key_cols: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintained aggregate: each micro-batch's PARTIAL
    aggregates (per-key count + sums) are merged additively into a
    persistent snapshot — the materialized-view-maintenance pattern for
    algebraic aggregates.

    At any point the snapshot equals the batch
    ``groupBy(keys).agg(count, sums)`` over everything ingested so far
    (count/sum are mergeable; avg derives as sum/count downstream). This is
    the general-aggregate sibling of the KMV sketch merge
    (:mod:`gluestick_spark.llm.sketch`): history is never rescanned — a
    batch costs its own aggregation plus one merge over the (small,
    key-cardinality-sized) snapshot.

    Columns in the snapshot: (*key_cols, ``n_rows``, ``sum_{c}``…). The
    write reuses the crash-safe atomic snapshot swap. Exactly-once: the
    swap is atomic, but a batch REPLAYED after a crash between swap and
    checkpoint commit would double-merge — for strict exactly-once store
    the last merged batch_id inside the snapshot and skip already-merged
    ids (left as configuration for real deployments; availableNow tests
    are single-writer)."""
    from ..operators.snapshot import _write_snapshot
    from ..sources.reader import read_snapshots

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = batch_df.groupBy(*key_cols).agg(
            F.count("*").alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )
        prev = read_snapshots(spark, stream, snapshot_dir)
        if prev is not None:
            part = prev.unionByName(part).groupBy(*key_cols).agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            )
        _write_snapshot(part, stream, snapshot_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_topk(
    stream_df: DataFrame,
    col: str,
    stream: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    capacity: int = 4096,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintained frequent-items state — the streaming
    sibling of :func:`~gluestick_spark.llm.sketch.heavy_hitters`: each
    micro-batch contributes its EXACT per-term counts (one batch-local
    aggregate), merged into a persistent counter snapshot that is trimmed
    to ``capacity`` rows Space-Saving-style. History is never rescanned;
    a batch costs its own aggregate plus one merge over the
    capacity-bounded snapshot.

    Error contract (Metwally et al. merge rules): the snapshot keeps a
    FLOOR — the largest counter value ever trimmed away. A term absent
    from the snapshot has true count ≤ floor; a re-appearing term
    re-enters at ``floor + batch count`` (upper bound) with ``err =
    floor``, so every counter satisfies ``cnt − err ≤ true ≤ cnt``.
    While ``capacity`` exceeds the running distinct-term count nothing is
    ever trimmed, floor stays 0, every ``err`` is 0, and the snapshot is
    EXACT — the oracle-checked regime (stream-of-batches ≡ one batch
    groupBy count). Read results with :func:`topk_from_snapshot`.

    Snapshot rows: (``term``, ``cnt``, ``err``) plus one sentinel row
    (``term`` NULL, ``cnt`` = floor) — the same ride-along-bound pattern
    as batch ``heavy_hitters``' error sentinels. The trim decisions run
    driver-side windows/aggregates over ≤ capacity + batch-vocabulary
    rows, never over the stream's history.
    """
    from ..operators.snapshot import _write_snapshot
    from ..sources.reader import read_snapshots
    from pyspark.sql.window import Window

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    name = f"{stream}.topk"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bc = (
            batch_df.where(F.col(col).isNotNull())
            .select(F.col(col).cast("string").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("__bn__"))
        )
        prev = read_snapshots(spark, name, snapshot_dir)
        if prev is None:
            floor = 0
            counters = None
        else:
            row = prev.where(F.col("term").isNull()).agg(F.max("cnt")).first()
            floor = int(row[0] or 0)
            counters = prev.where(F.col("term").isNotNull())
        if counters is None:
            merged = bc.select(
                "term",
                (F.col("__bn__") + F.lit(floor)).alias("cnt"),
                F.lit(floor).cast("long").alias("err"),
            )
        else:
            merged = counters.join(bc, "term", "full_outer").select(
                "term",
                (
                    F.coalesce(F.col("cnt"), F.lit(floor))
                    + F.coalesce(F.col("__bn__"), F.lit(0))
                ).alias("cnt"),
                F.coalesce(F.col("err"), F.lit(floor)).cast("long").alias("err"),
            )
        # trim to capacity (snapshot-scale data: one small global window)
        w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
        ranked = merged.withColumn("__rn__", F.row_number().over(w))
        kept = ranked.where(F.col("__rn__") <= capacity).drop("__rn__")
        dropped_max = ranked.where(F.col("__rn__") > capacity).agg(
            F.max("cnt")
        ).first()[0]
        new_floor = max(floor, int(dropped_max or 0))
        sentinel = spark.createDataFrame(
            [(None, new_floor, None)], "term string, cnt long, err long"
        )
        _write_snapshot(kept.unionByName(sentinel), name, snapshot_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def topk_from_snapshot(
    spark, stream: str, snapshot_dir: str, k: int
) -> DataFrame:
    """Top-``k`` (``term``, ``cnt``, ``err``) from a
    :func:`streaming_topk` snapshot — ``cnt`` is an upper bound with
    ``cnt − err ≤ true ≤ cnt`` (err == 0 everywhere ⇒ exact). Order
    (cnt desc, term asc) keeps the limit boundary deterministic."""
    from ..sources.reader import read_snapshots

    snap = read_snapshots(spark, f"{stream}.topk", snapshot_dir)
    if snap is None:
        raise ValueError(f"no streaming_topk snapshot for {stream} in {snapshot_dir}")
    return (
        snap.where(F.col("term").isNotNull())
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(k)
    )


def streaming_minhash_dedup(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    available_now: bool = True,
    state_buckets: int | None = None,
) -> StreamingQuery:
    """Streaming MinHash near-dup dedup: each micro-batch is deduplicated
    against everything seen so far, and surviving docs are appended to
    ``out_dir``.

    **Batch equivalence**: when ids arrive in non-decreasing order across
    batches (the usual ingest-assigned-id case), the union of the emitted
    batches equals :func:`~gluestick_spark.llm.dedup.minhash_dedup` run once
    over the whole corpus — the greedy rule "drop the higher id of each
    verified pair" is prefix-stable, so deciding each doc when it arrives
    gives the same keep set. (With out-of-order ids an already-emitted doc
    can't be recalled; late lower-id near-dups then yield a superset.)

    Incremental index design (the 100 TB/day shape):

    - state ``buckets``: the persisted LSH band-bucket index
      (:func:`~gluestick_spark.llm.dedup.minhash_band_buckets` rows —
      bands × N tiny rows). Per batch only the BATCH's signatures are
      computed; history is read back as buckets, never re-shingled.
    - candidate join: (all buckets) ⋈ (batch buckets) on (band, bucket)
      with a < b — new⇆old and new⇆new pairs only; the old⇆old pairs were
      decided in earlier batches and are never re-derived.
    - verify: exact Jaccard, with shingles computed ONLY for candidate ids
      (semi-join into the docs state first) — per-batch cost scales with
      candidates, not corpus.
    - state ``docs`` holds every SEEN doc (kept or dropped): a new doc
      near-duplicating an already-dropped doc must still be dropped for
      batch parity.

    State appends are made idempotent on read (distinct) so a replayed
    micro-batch (foreachBatch's at-least-once) can't skew candidates; the
    ``out_dir`` append itself is at-least-once — resume from the checkpoint
    only, or key the sink by batch_id, as with any foreachBatch sink.

    **Bucketed state** (``state_buckets=N``, VERDICT r8 task 3): the band
    index and the docs state become catalog tables bucketed on
    (band, bucket) and ``__id__`` respectively, and the per-batch plan is
    restructured so the STATE side never exchanges: the replay-guard
    ``distinct``, the per-bucket width counts, the width filter join, the
    state×batch candidate join, and the docs semi-join all run
    bucket-locally (the union-then-repartition of the default path — a
    full O(state) shuffle per trigger — is replaced by width arithmetic
    ``total = state_width + batch_width`` and a split candidate join
    ``state×batch ∪ batch×batch``, both provably emitting the same pairs).
    Only batch-sized frames shuffle. Emitted rows are identical to the
    default path (pytest-pinned equivalence). State tables are EXTERNAL
    with files under ``state_dir`` (ADVICE r9 — delete ``state_dir`` to
    reset; fresh sessions re-register from disk; layout toggles on
    existing state raise loudly)."""
    import os

    from ..llm.dedup import (
        DEFAULT_MAX_BUCKET,
        _cap_buckets,
        jaccard_expr,
        minhash_band_buckets,
    )
    from ..llm.text import shingles_expr

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    buckets_path = os.path.join(state_dir, "minhash_buckets.parquet")
    docs_path = os.path.join(state_dir, "minhash_docs.parquet")
    buckets_loc = os.path.join(state_dir, "minhash_buckets_bt")
    docs_loc = os.path.join(state_dir, "minhash_docs_bt")
    buckets_tbl = _state_table_name(state_dir, "mh_buckets")
    docs_tbl = _state_table_name(state_dir, "mh_docs")
    _guard_state_layout_toggle(
        state_buckets, [buckets_path, docs_path], [buckets_loc, docs_loc]
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(id_col).alias("__id__"), F.col(text_col).alias("__text__")
        )
        bb = minhash_band_buckets(batch, "__text__", "__id__", num_perm, bands, shingle_n)
        if state_buckets:
            have_state = _ensure_bucketed_state(
                spark, buckets_tbl, buckets_loc, ["band", "bucket"], state_buckets
            )
            if have_state and not _ensure_bucketed_state(
                spark, docs_tbl, docs_loc, ["__id__"], state_buckets
            ):
                # ADVICE r10: a crash between the two state appends (or a
                # partial wipe) can leave bucket state without doc state;
                # without this check spark.table(docs_tbl) dies with an
                # opaque TABLE_OR_VIEW_NOT_FOUND inside foreachBatch.
                raise ValueError(
                    "torn state layout: minhash bucket state exists under "
                    f"{buckets_loc} but doc state is missing under "
                    f"{docs_loc} — a crash between the two state appends "
                    "or a partial wipe left the stream unresumable. Point "
                    "the stream at a fresh state_dir, or restore/delete "
                    "BOTH state tables together."
                )
        else:
            have_state = os.path.exists(buckets_path)
        if state_buckets and have_state:
            # state side stays on its bucket layout end-to-end: distinct,
            # width count, width-filter join, and the candidate join all
            # cluster on (band, bucket) with no Exchange
            bb_state = spark.table(buckets_tbl).distinct()
            docs_state = spark.table(docs_tbl).distinct()
            ws = bb_state.groupBy("band", "bucket").agg(
                F.count(F.lit(1)).alias("__ws__")
            )
            wb = bb.groupBy("band", "bucket").agg(
                F.count(F.lit(1)).alias("__wb__")
            )
            ok = (
                ws.join(wb, ["band", "bucket"], "full_outer")
                .where(
                    F.coalesce(F.col("__ws__"), F.lit(0))
                    + F.coalesce(F.col("__wb__"), F.lit(0))
                    <= F.lit(max_bucket)
                )
                .select("band", "bucket")
            )
            state_ok = bb_state.join(ok, ["band", "bucket"])
            batch_ok = bb.join(ok, ["band", "bucket"])

            def _pairs(left):
                return (
                    left.alias("l")
                    .join(
                        batch_ok.alias("r"),
                        (F.col("l.band") == F.col("r.band"))
                        & (F.col("l.bucket") == F.col("r.bucket"))
                        & (F.col("l.__id__") < F.col("r.__id__")),
                    )
                    .select(
                        F.col("l.__id__").alias("a"), F.col("r.__id__").alias("b")
                    )
                )

            cand = _pairs(state_ok).unionByName(_pairs(batch_ok)).distinct()
            cand_ids = cand.select(F.col("a").alias("__id__")).union(
                cand.select(F.col("b").alias("__id__"))
            ).distinct()
            shingled = F.array_distinct(
                shingles_expr(F.col("__text__"), shingle_n)
            ).alias("__sh__")
            sh = (
                docs_state.join(cand_ids, "__id__")
                .select("__id__", shingled)
                .unionByName(
                    batch.join(cand_ids, "__id__").select("__id__", shingled)
                )
            )
        else:
            if have_state and not state_buckets:
                all_bb = spark.read.parquet(buckets_path).distinct().unionByName(bb)
                old_docs = spark.read.parquet(docs_path).distinct()
                docs_all = old_docs.unionByName(batch)
            else:
                all_bb = bb
                docs_all = batch
            all_bb = _cap_buckets(
                all_bb.repartition("band", "bucket"), ["band", "bucket"], max_bucket
            )
            new_ids = batch.select("__id__").distinct()
            right = all_bb.join(new_ids, "__id__")
            cand = (
                all_bb.alias("l")
                .join(
                    right.alias("r"),
                    (F.col("l.band") == F.col("r.band"))
                    & (F.col("l.bucket") == F.col("r.bucket"))
                    & (F.col("l.__id__") < F.col("r.__id__")),
                )
                .select(F.col("l.__id__").alias("a"), F.col("r.__id__").alias("b"))
                .distinct()
            )
            cand_ids = cand.select(F.col("a").alias("__id__")).union(
                cand.select(F.col("b").alias("__id__"))
            ).distinct()
            docs_src = docs_all
            sh = docs_src.join(cand_ids, "__id__").select(
                "__id__",
                F.array_distinct(shingles_expr(F.col("__text__"), shingle_n)).alias("__sh__"),
            )
        drops = (
            cand.join(
                sh.select(F.col("__id__").alias("a"), F.col("__sh__").alias("__sha__")), "a"
            )
            .join(
                sh.select(F.col("__id__").alias("b"), F.col("__sh__").alias("__shb__")), "b"
            )
            .where(jaccard_expr(F.col("__sha__"), F.col("__shb__")) >= threshold)
            .select("b")
            .distinct()
        )
        kept = batch.join(drops, batch["__id__"] == drops["b"], "left_anti")
        kept.select(
            F.col("__id__").alias(id_col), F.col("__text__").alias(text_col)
        ).write.mode("append").parquet(out_dir)
        if state_buckets:
            _append_bucketed_state(
                bb, buckets_tbl, buckets_loc, ["band", "bucket"], state_buckets
            )
            _append_bucketed_state(
                batch, docs_tbl, docs_loc, ["__id__"], state_buckets
            )
        else:
            bb.write.mode("append").parquet(buckets_path)
            batch.write.mode("append").parquet(docs_path)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _state_table_name(state_dir: str, kind: str) -> str:
    """Deterministic catalog name for a bucketed state table, derived
    from the state directory path — a restarted stream resumes against
    the same table, and two streams with different state dirs never
    collide."""
    import hashlib
    import os

    digest = hashlib.md5(os.path.abspath(state_dir).encode()).hexdigest()[:12]
    return f"gs_state_{kind}_{digest}"


def _has_data_files(loc: str) -> bool:
    import os

    if not os.path.isdir(loc):
        return False
    for _root, _dirs, files in os.walk(loc):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _ensure_bucketed_state(
    spark, tbl: str, loc: str, bucket_cols: list[str], n: int
) -> bool:
    """Resolve a bucketed state table that LIVES UNDER state_dir (ADVICE
    r9: state must be where the docs say it is — deleting ``state_dir``
    resets the stream, catalog or no catalog). Returns True iff prior
    state exists. Three cases:

    - catalog table exists AND its location still holds data → resume.
    - catalog table exists but the location was wiped (user deleted
      ``state_dir`` for a fresh start) → DROP the stale entry so the
      stream genuinely restarts from empty instead of silently deduping
      against a ghost table.
    - data exists on disk but the catalog entry is gone (fresh Spark
      session / new warehouse, persistent ``state_dir``) → re-register
      an external bucketed table over the existing files so state is
      never silently abandoned.
    """
    exists = spark.catalog.tableExists(tbl)
    has_files = _has_data_files(loc)
    if exists and has_files:
        return True
    if exists and not has_files:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        return False
    if has_files:
        schema_ddl = spark.read.parquet(loc).schema.toDDL()
        cols = ", ".join(f"`{c}`" for c in bucket_cols)
        spark.sql(
            f"CREATE TABLE {tbl} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({cols}) INTO {n} BUCKETS "
            f"LOCATION '{loc}'"
        )
        return True
    return False


def _append_bucketed_state(
    df: DataFrame, tbl: str, loc: str, bucket_cols: list[str], n: int
) -> None:
    """Append a batch to a bucketed state table, creating it as an
    EXTERNAL table at ``loc`` (under state_dir) on first write."""
    w = df.write.mode("append").format("parquet").bucketBy(n, *bucket_cols)
    if not df.sparkSession.catalog.tableExists(tbl):
        w = w.option("path", loc)
    w.saveAsTable(tbl)


# The append-state layout this module writes, for compaction: flat
# per-batch parquet dirs, and bucketed external-table locations mapped
# to their catalog kind + bucket columns.
_STATE_FLAT_DIRS = (
    "minhash_buckets.parquet",
    "minhash_docs.parquet",
    "url_canon.parquet",
    "bin_counts.parquet",
)
_STATE_BUCKETED_DIRS = {
    "minhash_buckets_bt": ("mh_buckets", ["band", "bucket"]),
    "minhash_docs_bt": ("mh_docs", ["__id__"]),
    "url_canon_buckets": ("url_canon", ["__canon__"]),
}


def _catalog_num_buckets(spark, tbl: str) -> int | None:
    if not spark.catalog.tableExists(tbl):
        return None
    for row in spark.sql(f"DESCRIBE FORMATTED {tbl}").collect():
        if row["col_name"].strip() == "Num Buckets":
            return int(row["data_type"].strip())
    return None


def _compact_bucketed_state(
    spark, tbl: str, loc: str, bucket_cols: list[str], n: int,
    fs=None,
) -> int:
    """Bucket-preserving compaction of one external bucketed state
    table: rewrite into a temp location with the SAME bucket spec
    (repartition on the bucket columns first, so each bucket lands in
    one task → one file per bucket), then atomically exchange the data
    directories. Bucket ids ride in the part-file names, so the
    existing catalog entry serves the swapped files unchanged — the
    zero-state-side-Exchange plan property survives compaction
    (pytest-pinned). Same commit protocol as ``compact_files``:
    RENAME_EXCHANGE, two-rename fallback with ``.__old__`` self-heal.

    State-file moves ride the ``fs=`` seam (:mod:`gluestick_spark.fsio`);
    the RENAME_EXCHANGE fast path is attempted only on the local default
    (it is a syscall, not a seam operation) — any other backend always
    takes the three-rename fallback, whose ``rename`` must move whole
    directory trees."""
    import os

    from ..fsio import LOCAL_FS
    from ..sinks.layout import _exchange_dirs

    if fs is None:
        fs = LOCAL_FS
    norm = loc.rstrip("/")
    old = norm + ".__old__"
    if not fs.exists(loc) and fs.exists(old):
        fs.rename(old, loc)  # self-heal a crashed fallback swap
    elif fs.exists(old):
        fs.rmtree(old, ignore_errors=True)  # stale leftover
    tmp_loc = norm + ".__compacting__"
    tmp_tbl = tbl + "__compacting__"
    if fs.exists(tmp_loc):
        fs.rmtree(tmp_loc, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    (
        # read the FILES, not the table: the bucketed table's scan
        # already satisfies HashPartitioning(bucket_cols, n), so a
        # repartition on it is elided and every scan partition would
        # write its own file — the opposite of compaction
        spark.read.parquet(loc)
        .repartition(n, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .bucketBy(n, *bucket_cols)
        .option("path", tmp_loc)
        .saveAsTable(tmp_tbl)
    )
    if not (fs is LOCAL_FS and _exchange_dirs(tmp_loc, loc)):
        if fs.exists(old):
            fs.rmtree(old, ignore_errors=True)
        fs.rename(loc, old)
        fs.rename(tmp_loc, loc)
        fs.rename(old, tmp_loc)  # old files park at tmp for the cleanup
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")  # external: files untouched
    fs.rmtree(tmp_loc, ignore_errors=True)  # the pre-compaction files
    spark.catalog.refreshTable(tbl)
    return sum(
        1 for f in fs.listdir(loc) if f.endswith(".parquet")
    )


def compact_stream_state(
    spark,
    state_dir: str,
    target_rows_per_file: int = 1_000_000,
    state_buckets: int | None = None,
    fs=None,
) -> dict[str, int]:
    """Compact the append-state tables under ``state_dir`` (VERDICT r10
    #4): every ``foreachBatch`` state append lands one-plus small
    parquet files FOREVER — at 100× batch counts the listing dominates
    per-batch state reads (a small-files operational failure, not a
    correctness one). This composes :func:`~gluestick_spark.sinks.
    layout.compact_files` over the flat per-batch state dirs (minhash
    band index + docs, URL canon set, drift bin counts) and a
    bucket-preserving rewrite over the bucketed external state tables.
    Returns {state name: new file count} for everything it compacted.

    Contract — STOP the stream first (stop → compact → restart): the
    rewrite is row-preserving, so replay guards that dedup on read
    (``distinct()``, (bin, batch_id) keys) behave identically after
    compaction, but a stream appending CONCURRENTLY could write files
    into the directory between the temp rewrite and the atomic
    exchange, and those appends would be lost. True concurrent
    compaction needs a table format's commit log — out of scope here by
    design (same posture as ``compact_files``).

    ``state_buckets``: only needed when a bucketed state table is not
    in the catalog (fresh session) — must equal the stream's own
    ``state_buckets`` (the catalog value wins and is cross-checked when
    both are present; a mismatch raises rather than silently rewriting
    the layout a running stream depends on). Crash safety per table is
    ``compact_files``' exchange/self-heal protocol; a crash between two
    tables' compactions leaves each table individually consistent."""
    import os

    from ..fsio import LOCAL_FS
    from ..sinks.layout import compact_files

    if fs is None:
        fs = LOCAL_FS
    results: dict[str, int] = {}
    for name in _STATE_FLAT_DIRS:
        p = os.path.join(state_dir, name)
        if os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        ):
            results[name] = compact_files(spark, p, target_rows_per_file)
    for base, (kind, bucket_cols) in _STATE_BUCKETED_DIRS.items():
        loc = os.path.join(state_dir, base)
        # a crashed fallback swap parks the data at .__old__ — still ours;
        # heal BEFORE the catalog checks so registration sees the files
        if not fs.exists(loc) and fs.exists(loc + ".__old__"):
            fs.rename(loc + ".__old__", loc)
        if not _has_data_files(loc):
            continue
        tbl = _state_table_name(state_dir, kind)
        n_cat = _catalog_num_buckets(spark, tbl)
        if n_cat is None and state_buckets is None:
            raise ValueError(
                f"bucketed state at {loc} has no catalog entry in this "
                "session — pass state_buckets=N (the stream's own value) "
                "so compaction preserves the bucket layout"
            )
        if (
            n_cat is not None
            and state_buckets is not None
            and n_cat != state_buckets
        ):
            raise ValueError(
                f"state_buckets={state_buckets} does not match the "
                f"catalog's {n_cat} buckets for {tbl} — refusing to "
                "rewrite the layout a stream depends on"
            )
        n = n_cat if n_cat is not None else state_buckets
        _ensure_bucketed_state(spark, tbl, loc, bucket_cols, n)
        results[base] = _compact_bucketed_state(
            spark, tbl, loc, bucket_cols, n, fs=fs
        )
    return results


def _guard_state_layout_toggle(
    state_buckets: int | None, plain_paths: list[str], bucketed_locs: list[str]
) -> None:
    """``state_buckets`` cannot be toggled on an existing stream's state:
    enabling it would silently abandon the plain-parquet state and
    restart dedup from empty; disabling it would do the reverse. Refuse
    loudly when the OTHER layout's state already exists (ADVICE r9)."""
    if state_buckets and any(_has_data_files(p) for p in plain_paths):
        raise ValueError(
            "state_buckets=N was enabled but plain-parquet state already "
            f"exists under {plain_paths} — toggling the state layout on an "
            "existing stream would silently restart dedup from empty. "
            "Either keep state_buckets=None, or point the stream at a "
            "fresh state_dir (and re-seed state if needed)."
        )
    if not state_buckets and any(_has_data_files(p) for p in bucketed_locs):
        raise ValueError(
            "state_buckets=None but bucketed state already exists under "
            f"{bucketed_locs} — toggling the state layout on an existing "
            "stream would silently restart dedup from empty. Either keep "
            "state_buckets=N, or point the stream at a fresh state_dir."
        )


def streaming_url_dedup(
    stream_df: DataFrame,
    url_col: str,
    id_col: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    state_buckets: int | None = None,
) -> StreamingQuery:
    """Streaming canonical-URL dedup: each micro-batch is canonicalized
    (:func:`~gluestick_spark.llm.web.canonical_url_expr`), deduplicated
    within the batch (smallest id per canonical URL), then checked
    against the persisted canonical-URL state; survivors are appended to
    ``out_dir`` and their canonical URLs to the state. Parse-failure
    rows (NULL canonical) always pass through — the left-anti equality
    against state never matches NULL, which is exactly the batch
    operator's unjudgeable-row contract, for free.

    **Batch equivalence**: with ids non-decreasing across batches, the
    union of the emitted batches equals
    :func:`~gluestick_spark.llm.web.url_dedup` over the whole corpus —
    keep-first-arrival ≡ keep-min-id, so the shared oracle applies.
    (Out-of-order ids: an already-emitted row can't be recalled; a late
    lower id then yields a superset — same caveat as
    :func:`streaming_minhash_dedup`.)

    **At-least-once replay window** (ADVICE r8): a crash between the
    ``out_dir`` append and the state append replays the micro-batch
    against unchanged state, appending the SAME survivor rows a second
    time. Every emitted row therefore carries ``__batch_id__``; the
    replayed duplicates are byte-identical (same batch id, same rows),
    so :func:`read_streaming_dedup_output` collapses them with one
    distinct on read — the same device ``bin_counts_from_state`` uses.
    The write order (output before state) is deliberate: the opposite
    order would LOSE rows on the same crash (state says seen, output
    never written), and at-least-once + dedup-on-read beats at-most-once.

    Scale shape (continuous crawl-frontier dedup): per-batch cost is one
    narrow canonicalization, one batch-sized keyed aggregate, and ONE
    anti-join against the state — the state is a canonical-URL SET (one
    string row per distinct page ever kept), never the full history of
    rows. State appends are deduplicated on read (distinct) so a
    replayed micro-batch can't double-count.

    **Bucketed state** (``state_buckets=N``, VERDICT r8 task 3): the
    canonical set is kept as a catalog table BUCKETED on the canonical
    URL instead of a plain parquet directory. At crawl scale the state
    is billions of rows, and the default path re-shuffles ALL of it
    every trigger — once for the replay-guard ``distinct`` and again to
    co-locate the anti-join. Bucketing pre-hashes the table on the join
    key, so both the distinct and the state side of the anti-join run
    bucket-locally with NO Exchange (plan-gated); only the micro-batch
    (small by definition) shuffles, to ``N`` partitions. Per-batch
    network cost is then O(batch), not O(state). Emitted rows are
    identical to the default path (same math, different layout —
    pytest-pinned). The table is EXTERNAL with its files under
    ``state_dir`` (ADVICE r9): deleting ``state_dir`` genuinely resets
    the stream (a stale catalog entry over the wiped location is
    dropped on the next start), and a fresh session over a persistent
    ``state_dir`` re-registers the table from disk. ``state_buckets``
    cannot be toggled on an existing stream's state — the other
    layout's files present under ``state_dir`` raise loudly."""
    import os

    from ..llm.web import url_dedup

    canon_path = os.path.join(state_dir, "url_canon.parquet")
    canon_loc = os.path.join(state_dir, "url_canon_buckets")
    canon_tbl = _state_table_name(state_dir, "url_canon")
    _guard_state_layout_toggle(state_buckets, [canon_path], [canon_loc])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_kept = url_dedup(batch_df, url_col, id_col)
        if state_buckets:
            have_state = _ensure_bucketed_state(
                spark, canon_tbl, canon_loc, ["__canon__"], state_buckets
            )
            seen = spark.table(canon_tbl).distinct() if have_state else None
        else:
            have_state = os.path.exists(canon_path)
            seen = (
                spark.read.parquet(canon_path).distinct() if have_state else None
            )
        if seen is not None:
            survivors = batch_kept.join(
                seen,
                batch_kept["canonical_url"] == seen["__canon__"],
                "left_anti",
            )
        else:
            survivors = batch_kept
        # pin BEFORE the writes: the state append below targets the same
        # path the anti-join reads, and the second action would
        # otherwise re-evaluate the join against the just-updated state.
        # LAZY (r16): the out_dir write — which strictly precedes the
        # state append — materializes the pin, so the ordering guarantee
        # holds without the eager form's extra scheduled job per trigger
        survivors = survivors.localCheckpoint(eager=False)
        survivors.withColumn(
            "__batch_id__", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_dir)
        canon = survivors.where(F.col("canonical_url").isNotNull()).select(
            F.col("canonical_url").alias("__canon__")
        )
        if state_buckets:
            _append_bucketed_state(
                canon, canon_tbl, canon_loc, ["__canon__"], state_buckets
            )
        else:
            canon.write.mode("append").parquet(canon_path)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_fingerprint_dedup(
    stream_df: DataFrame,
    payload_col: str,
    id_col: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    hasher=None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming perceptual-fingerprint NEAR-dup dedup — the multimodal
    sibling of :func:`streaming_minhash_dedup` /
    :func:`streaming_url_dedup`, closing streaming parity for the
    image/audio dedup family (phash_cluster_dedup / audio_cluster_dedup
    are its batch twins; pass ``hasher=fake_audio_fingerprint`` for
    audio). Per micro-batch:

    1. fingerprint payloads through the injectable codec seam
       (``compute_phash`` — the one Arrow crossing);
    2. batch-internal near-dup pairs via the shared pigeonhole-exact
       Hamming LSH (:func:`~gluestick_spark.llm.multimodal.
       banded_hamming_pairs`), contracted to connected components;
    3. batch-vs-STATE matches: the persisted state is the (band, seg,
       fingerprint) segment set of every row EVER PROCESSED — kept AND
       dropped — because connectivity is pairwise regardless of keep
       status: storing dropped rows' fingerprints is exactly what makes
       a later chain link (C~B where B was dropped via B~A) collapse
       the way the batch transitive closure does;
    4. a batch component containing any state match drops whole;
       otherwise its min id survives. NULL fingerprints always pass
       through (the unjudgeable-row contract, via the anti-join).

    **Batch equivalence**: with ids non-decreasing across batches and
    components arriving min-first, the union of emitted batches equals
    ``phash_cluster_dedup`` over the whole corpus (shared oracle). A
    late edge MERGING two already-kept components cannot recall emitted
    rows — the result is then a superset (the documented
    streaming_minhash_dedup caveat).

    Same at-least-once replay window as :func:`streaming_url_dedup`
    (``__batch_id__``-tagged output, ``read_streaming_dedup_output``
    collapses replays; output written before state so a crash never
    loses rows). State rows are ``__batch__``-tagged and the state is
    read through ``distinct()``, so a replayed batch's re-appended
    segments collapse instead of double-counting toward join fan-out;
    :func:`compact_fingerprint_state` reclaims the physical duplicates
    (set-semantics matching makes compaction exactly invariant). Scale
    shape: per-batch cost is one codec pass + a batch-sized banded
    self-join + ONE (band, seg)-keyed join against state segments —
    state is O(distinct segments seen × bands) after compaction, the
    join is segment-bucketed, and the batch side is small by
    definition."""
    import os

    from ..llm.dedup import connected_components
    from ..llm.multimodal import (
        banded_hamming_pairs,
        compute_phash,
        fake_phash,
        fingerprint_segments,
    )

    h = hasher or fake_phash
    seg_path = os.path.join(state_dir, "fp_segments.parquet")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp = compute_phash(
            batch_df.select(id_col, payload_col), payload_col, [id_col], h,
            out_col="__fp__",
        )
        judged = fp.where(F.col("__fp__").isNotNull())
        # the component contraction and the two joins below consume the
        # codec output repeatedly — pin it once (small: batch-sized).
        # LAZY (r16): the component contraction's first bounded collect
        # materializes it, so the eager form's extra scheduled job per
        # trigger disappears
        judged = judged.localCheckpoint(eager=False)
        segs = fingerprint_segments(judged, id_col, "__fp__", bands)

        matched = None
        if os.path.exists(seg_path):
            # full-row distinct (tag included) collapses an at-least-once
            # replay's re-appended rows — same batch id, byte-identical —
            # while keeping legitimate cross-batch duplicates (harmless:
            # set-semantics matching + the final distinct). mergeSchema
            # (ADVICE r14 #3): a pre-r14 untagged state appended to by a
            # tagged batch has mixed per-file schemas — without the merge
            # whether __batch__ exists depends on which footer Spark
            # happens to pick, making the replay-collapse semantics
            # nondeterministic across reads.
            state = (
                spark.read.option("mergeSchema", "true")
                .parquet(seg_path)
                .distinct()
            )
            matched = (
                segs.join(
                    state.select(
                        F.col("band"), F.col("seg"),
                        F.col("__h__").alias("__hs__"),
                    ),
                    ["band", "seg"],
                )
                .where(
                    F.bit_count(
                        F.col("__h__").bitwiseXOR(F.col("__hs__"))
                    ) <= max_hamming
                )
                .select(F.col("__id__").alias("id"))
                .distinct()
            )
        pairs = banded_hamming_pairs(
            judged, id_col, "__fp__", max_hamming, bands, max_bucket=None
        )
        comp = connected_components(pairs, "id_a", "id_b")
        if matched is not None:
            bad_comps = (
                comp.join(matched, "id").select("component").distinct()
            )
            drop_in_comp = comp.join(
                F.broadcast(bad_comps), "component"
            ).select("id")
            clean = comp.join(F.broadcast(bad_comps), "component", "left_anti")
            drops = (
                matched.unionByName(drop_in_comp)
                .unionByName(
                    clean.where(F.col("id") != F.col("component")).select("id")
                )
                .distinct()
            )
        else:
            drops = comp.where(F.col("id") != F.col("component")).select("id")
        # no pin needed: survivors is consumed exactly once (the output
        # write below), and the state append it reads from (seg_path)
        # happens strictly AFTER that write completes — the r15 eager
        # checkpoint here was one dead scheduled job per trigger
        survivors = batch_df.join(
            drops.withColumnRenamed("id", id_col), id_col, "left_anti"
        )
        survivors.withColumn(
            "__batch_id__", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_dir)
        # ALL judged segments persist — kept and dropped (see docstring);
        # the __batch__ tag makes a replay's re-append byte-identical so
        # the read-side distinct collapses it, and
        # compact_fingerprint_state reclaims the physical duplicates
        segs.select("band", "seg", "__h__").withColumn(
            "__batch__", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(seg_path)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_quantiles(
    stream_df: DataFrame,
    value_col: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    probs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
    k: int = 200,
    group_cols: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming quantile monitor over MERGEABLE KLL sketches — the
    L124 sketch family given the :func:`streaming_corpus_drift`
    treatment: each micro-batch's per-group partial sketch
    (:func:`~gluestick_spark.llm.sketch.kll_sketch`) appends to a tiny
    sketch log under ``state_dir``; the cumulative per-group sketch
    (``kll_merge`` of the log — O(k·log n) doubles per group, never the
    data) estimates ``probs`` and one snapshot row set
    (*group_cols, ``prob``, ``value``, ``__batch_id__``) appends to
    ``out_dir`` per trigger — the latency/size-distribution trajectory
    of an arriving corpus, computed without ever rescanning history.

    **Stream ≡ batch by the KLL merge law**: the cumulative estimate
    carries the same pytest-pinned rank-error band as a one-shot
    ``kll_sketch`` over everything streamed (merge conserves weight
    exactly; the error constant degrades gracefully with chain length —
    the L124 contract). Replay safety: KLL merge is NOT idempotent
    (weights add), so the log rides ``__batch__``-tagged rows and the
    merge reads the log through ``distinct()`` — a replayed batch's
    duplicate row is byte-identical (same tag, same deterministic
    sketch) and collapses, never double-counts.

    Per-batch cost: one Arrow-batched partial-sketch pass over the
    batch (the documented KLL crossing) + a merge over the kilobyte
    log. State is O(k·log n · groups · batches) doubles — compact the
    log by rewriting it with one merged row per group when batches
    accumulate."""
    import os as _os

    from ..llm.sketch import kll_merge, kll_quantiles, kll_sketch

    gcols = list(group_cols or [])
    log_dir = _os.path.join(state_dir, "kll_log.parquet")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = kll_sketch(batch_df, value_col, k, gcols).withColumn(
            "__batch__", F.lit(batch_id).cast("long")
        )
        batch_sk.write.mode("append").parquet(log_dir)
        # distinct = the pre-compaction replay collapse (see docstring);
        # __batch__ stays in the key so identical sketches from DIFFERENT
        # batches survive; read_sketch_log's watermark filter closes the
        # post-compaction replay window (ADVICE r13 #2)
        log = read_sketch_log(spark, log_dir).distinct().drop("__batch__")
        est = kll_quantiles(kll_merge(log, k, gcols), list(probs), gcols)
        est.withColumn(
            "__batch_id__", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_WATERMARK_FILE = "_COMPACTED_THROUGH"
_COMPACTED_TAG = -1  # __batch__ sentinel for merged rows (real ids are >= 0)


def _log_watermark(log_dir: str) -> int | None:
    """Compacted-through watermark of a sketch log, or None if the log
    was never compacted. Stored INSIDE the log dir (underscore-prefixed,
    so Spark's parquet reader ignores it) — the atomic dir swap therefore
    publishes the compacted rows and their watermark TOGETHER; a separate
    sidecar would reopen the replay window in the crash gap between the
    two writes."""
    import json as _json
    import os as _os

    p = _os.path.join(log_dir, _WATERMARK_FILE)
    if not _os.path.isfile(p):
        return None
    with open(p) as f:
        return int(_json.load(f)["through"])


def read_sketch_log(spark, log_dir: str) -> DataFrame:
    """Read a sketch log with the post-compaction replay window closed
    (ADVICE r13 #2): rows re-appended by a micro-batch replayed AFTER a
    compaction already folded them in (``__batch__ <= watermark``) are
    dropped; compacted merged rows (tag ``-1``) and genuinely new
    batches pass. Pre-compaction replays still collapse under the
    caller's ``distinct()`` (byte-identical rows, same tag) — this
    filter closes the one window distinct cannot: a replayed partial
    sketch is NOT byte-identical to the merged row that absorbed it, so
    a weight-additive merge (KLL) would double-count it."""
    df = spark.read.parquet(log_dir)
    w = _log_watermark(log_dir)
    if w is not None:
        df = df.where(
            (F.col("__batch__") < 0) | (F.col("__batch__") > F.lit(int(w)))
        )
    return df


def compact_sketch_log(
    spark,
    log_dir: str,
    kind: str,
    k: int,
    group_cols: list[str] | None = None,
    assume_quiesced: bool = False,
) -> int:
    """Compact a sketch log (:func:`streaming_corpus_drift`'s
    ``sketch_log.parquet`` / :func:`streaming_quantiles`'
    ``kll_log.parquet``) to ONE merged row per group — the maintenance
    step both docstrings prescribe when batches accumulate. The merged
    row is tagged ``__batch__ = -1`` (the compacted sentinel) and the
    log's max REAL batch id is persisted as the ``_COMPACTED_THROUGH``
    watermark inside the new dir, so a micro-batch replayed AFTER the
    compaction (crash between its log append and the checkpoint commit)
    is dropped by :func:`read_sketch_log` instead of double-counting —
    the ADVICE r13 #2 window. The swap is atomic: write to a temp dir
    (watermark included), RENAME_EXCHANGE (two-rename fallback), so a
    concurrent trigger reads the old log or the new — never a
    half-compacted one. Returns the row count after compaction.

    ``kind``: ``'kmv'`` (merge idempotent — compaction is always safe)
    or ``'kll'`` (weights add — safe via the reader's distinct collapse
    for pre-compaction replays plus the watermark for post-compaction
    ones).

    Concurrent-append safety (ADVICE r14 #2): micro-batches commit
    serially within a stream, so at most the MAXIMUM real batch id in
    the listing can be a mid-commit partial. By default that batch is
    EXCLUDED from the fold — its rows pass through raw (replays of it
    still collapse under the reader's distinct, exactly as before any
    compaction) and the watermark only covers provably complete
    batches, so a partial listing can never silently drop the batch's
    remaining rows. ``assume_quiesced=True`` restores the full fold for
    single-writer maintenance windows where no trigger is in flight."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from ..llm.sketch import kll_merge, kmv_merge
    from ..sinks.layout import _exchange_dirs

    if kind not in ("kmv", "kll"):
        raise ValueError(f"kind must be 'kmv' or 'kll', got {kind!r}")
    gcols = list(group_cols or [])
    # read through the watermark filter: a stale replayed row must not be
    # baked into the merge either
    log = read_sketch_log(spark, log_dir).distinct()
    prev_w = _log_watermark(log_dir)
    max_real = log.where(F.col("__batch__") >= 0).agg(
        F.max("__batch__")
    ).first()[0]
    passthrough = None
    if not assume_quiesced and max_real is not None:
        # the max batch id may be a mid-commit partial (the only batch
        # that can be, given serial triggers): keep its rows raw and
        # fold only provably complete batches
        passthrough = log.where(F.col("__batch__") == F.lit(int(max_real)))
        log = log.where(F.col("__batch__") != F.lit(int(max_real)))
        max_real = log.where(F.col("__batch__") >= 0).agg(
            F.max("__batch__")
        ).first()[0]
    through = max(
        (v for v in (prev_w, max_real) if v is not None), default=None
    )
    body = log.drop("__batch__")
    merged = (
        kmv_merge(body, k, gcols) if kind == "kmv" else kll_merge(body, k, gcols)
    ).withColumn("__batch__", F.lit(_COMPACTED_TAG).cast("long"))
    if passthrough is not None:
        # a global (no-group) agg over an empty fold would mint a bogus
        # empty-sketch row — when everything sits in the excluded batch,
        # the "compaction" is just the passthrough
        if log.first() is None:
            merged = passthrough.select(*merged.columns).limit(0)
        merged = merged.unionByName(passthrough.select(*merged.columns))
    norm = log_dir.rstrip("/")
    tmp = norm + ".__compacting__"
    old = norm + ".__old__"
    _shutil.rmtree(tmp, ignore_errors=True)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    if through is not None:
        with open(_os.path.join(tmp, _WATERMARK_FILE), "w") as f:
            _json.dump({"through": int(through)}, f)
    if not _exchange_dirs(tmp, log_dir):
        _shutil.rmtree(old, ignore_errors=True)
        _os.rename(log_dir, old)
        _os.rename(tmp, log_dir)
        _os.rename(old, tmp)
    _shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(log_dir).count()


def compact_fingerprint_state(spark, state_dir: str) -> int:
    """Compact :func:`streaming_fingerprint_dedup`'s segment state
    (``fp_segments.parquet``) to ONE row per distinct ``(band, seg,
    __h__)`` — the maintenance step for the one stream state that
    otherwise only grows (VERDICT r13 missing-#3): replays re-append a
    batch's segments and legitimate near-identical payloads repeat
    segments across batches; matching is SET semantics, so physical
    deduplication is exactly invariant. Surviving rows are re-tagged
    with the state's max ``__batch__`` and the swap is atomic
    (RENAME_EXCHANGE, two-rename fallback) — a concurrent trigger reads
    the old state or the new, never a torn one. A batch replayed AFTER
    compaction re-appends rows the next compaction removes again;
    matching is unaffected either way (set semantics — the kmv-style
    idempotence argument, no watermark needed). Returns the row count
    after compaction."""
    import os as _os
    import shutil as _shutil

    from ..sinks.layout import _exchange_dirs

    seg_path = _os.path.join(state_dir, "fp_segments.parquet")
    # mergeSchema (ADVICE r14 #3): a mixed tagged/untagged state dir must
    # deterministically surface __batch__ regardless of footer pick order;
    # untagged files' rows read as null and fall out of the max
    state = spark.read.option("mergeSchema", "true").parquet(seg_path)
    if "__batch__" in state.columns:  # pre-r14 states carry no tag
        max_batch = state.agg(F.max("__batch__")).first()[0] or 0
        state = state.drop("__batch__")
    else:
        max_batch = 0
    compacted = state.dropDuplicates(["band", "seg", "__h__"]).withColumn(
        "__batch__", F.lit(int(max_batch)).cast("long")
    )
    norm = seg_path.rstrip("/")
    tmp = norm + ".__compacting__"
    old = norm + ".__old__"
    _shutil.rmtree(tmp, ignore_errors=True)
    compacted.write.mode("overwrite").parquet(tmp)
    if not _exchange_dirs(tmp, seg_path):
        _shutil.rmtree(old, ignore_errors=True)
        _os.rename(seg_path, old)
        _os.rename(tmp, seg_path)
        _os.rename(old, tmp)
    _shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(seg_path).count()


def read_streaming_dedup_output(spark, out_dir: str) -> DataFrame:
    """Read :func:`streaming_url_dedup` output with the at-least-once
    replay window closed: duplicate rows from a replayed micro-batch are
    byte-identical (same ``__batch_id__``), so one distinct collapses
    them; the tag is then dropped. The distinct is keyed on the full row
    including the batch id, so two DIFFERENT batches legitimately
    emitting the same id (out-of-order-id superset caveat) are NOT
    collapsed — only replays are."""
    raw = spark.read.parquet(out_dir)
    return raw.distinct().drop("__batch_id__")


def streaming_bin_counts(
    stream_df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintained histogram of a streaming column — the
    state side of a drift monitor: each micro-batch appends its own
    (bin, n, batch_id) counts; because bin counts are ADDITIVE, the
    summed state is EXACTLY the batch histogram of everything seen (no
    approximation, no merge error — the stream≡batch device applied to
    histograms). Read it back with :func:`bin_counts_from_state` and
    feed :func:`~gluestick_spark.operators.profile.drift_from_counts`
    against a reference histogram for a live distribution-shift audit.

    Scale shape: per batch ONE map-side-combined aggregate producing
    ≤ n_bins+1 rows — the state grows by bins×batches tiny rows, never
    by data volume. :func:`bin_counts_from_state` drops duplicate
    (bin, batch_id) rows on read, so a fully-replayed batch cannot
    double-count; a batch that crashed MID-append and then replayed can
    leave one partial row pair per bin (foreachBatch's at-least-once
    append limitation, shared with every append-state operator here) —
    resume from the checkpoint rather than re-feeding input to avoid it.
    """
    import os

    from ..operators.profile import bin_counts

    path = os.path.join(state_dir, "bin_counts.parquet")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bin_counts(batch_df, col, lo, hi, n_bins, "n").withColumn(
            "batch_id", F.lit(int(batch_id))
        ).write.mode("append").parquet(path)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bin_counts_from_state(
    spark, state_dir: str, name: str = "n"
) -> DataFrame:
    """Collapse the per-batch histogram state to the cumulative
    (bin, ``name``) histogram (duplicate batch_ids dropped first, so an
    at-least-once replay can't double-count)."""
    import os

    path = os.path.join(state_dir, "bin_counts.parquet")
    raw = spark.read.parquet(path).dropDuplicates(["bin", "batch_id"])
    return raw.groupBy("bin").agg(F.sum("n").alias(name))


def streaming_snapshot_upsert(
    stream_df: DataFrame,
    stream: str,
    snapshot_dir: str,
    pk: str | list[str],
    checkpoint_dir: str,
    available_now: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Maintain a persistent snapshot incrementally: every micro-batch is
    merged keep-last into ``{snapshot_dir}/{stream}.snapshot.parquet``.

    This is the streaming form of snapshot_records — same upsert plan per
    batch, exactly-once via the checkpoint + atomic swap."""
    from ..operators.snapshot import snapshot_records

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        snapshot_records(batch_df.sparkSession, batch_df, stream, snapshot_dir, pk=pk)
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_scd2(
    stream_df: DataFrame,
    stream: str,
    snapshot_dir: str,
    pk: str | list[str],
    ts_col: str,
    tracked_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> StreamingQuery:
    """Maintain an SCD type-2 HISTORY incrementally: every micro-batch is
    collapsed keep-last per key (latest ``ts_col`` wins, ties broken by
    ``tiebreak_cols`` desc — pass a unique id for determinism; within-batch
    history finer than the batch boundary is intentionally dropped — the
    standard CDC-compaction contract) and merged with
    :func:`~gluestick_spark.operators.scd2.scd2_merge` into
    ``{snapshot_dir}/{stream}.scd2.snapshot.parquet``.

    Where :func:`streaming_snapshot_upsert` keeps only the CURRENT row per
    key (type 1 — history destroyed), this keeps every closed version with
    its validity interval, feeding point-in-time joins
    (``operators/asof.py``) directly from the snapshot.

    Per-batch cost is O(current + batch) — scd2_merge never rewrites
    closed rows, so a year of history costs the same per merge as a day.
    Exactly-once via checkpoint + the snapshot's atomic temp-dir swap;
    batches must arrive in event-time order across triggers (the usual
    SCD2 precondition — see operators/scd2.py).
    """
    from ..operators.grouping import top_k_per_group
    from ..operators.scd2 import scd2_merge
    from ..operators.snapshot import _write_snapshot
    from ..sources.reader import read_snapshots

    keys = [pk] if isinstance(pk, str) else list(pk)
    name = f"{stream}.scd2"

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = top_k_per_group(batch_df, keys, order, 1).select(
            *keys, *tracked_cols, ts_col
        )
        history = read_snapshots(spark, name, snapshot_dir)
        if history is None:
            ts_type = batch_df.schema[ts_col].dataType.simpleString()
            history = latest.select(
                *keys, *tracked_cols,
                F.col(ts_col).alias("valid_from"),
                F.lit(None).cast(ts_type).alias("valid_to"),
            ).limit(0)
        merged = scd2_merge(history, latest, keys, ts_col, tracked_cols)
        _write_snapshot(merged, name, snapshot_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_cdc(
    stream_df: DataFrame,
    stream: str,
    snapshot_dir: str,
    pk: str | list[str],
    changes_dir: str,
    checkpoint_dir: str,
    compare_cols: list[str] | None = None,
    available_now: bool = True,
    order_col: str | None = None,
) -> StreamingQuery:
    """Turn a re-delivered full/partial table feed into a CHANGE stream:
    each micro-batch is collapsed keep-last per key (``table_diff``'s
    contract requires key-unique inputs — one trigger can pick up SEVERAL
    dump files, and duplicate keys would multiply through the full-outer
    join into contradictory change rows), then diffed against the
    persisted snapshot with
    :func:`~gluestick_spark.operators.cdc.table_diff` (inserts + updates;
    a batch is treated as an upsert feed, so absent keys are NOT deletes —
    feed explicit tombstones for that), the change rows land in
    ``changes_dir`` partitioned by ``batch_id`` (dynamic-overwrite per
    batch — replay-idempotent), and the snapshot is upserted for the next
    batch. ``order_col`` picks the within-batch winner (highest wins,
    like :func:`streaming_scd2`'s ``ts_col``); without it the collapse
    falls back to an arbitrary-but-deterministic keep-one (max over the
    remaining columns), so supply one whenever a trigger can span dumps.

    This is how a pipeline that only gets periodic dumps (the Singer-tap
    reality) produces an incremental feed for downstream SCD2 / sync
    consumers: per-batch cost is one hash join against the CURRENT
    snapshot (O(snapshot + batch)), and downstream reads change volume,
    not table volume.
    """
    from ..operators.cdc import table_diff
    from ..operators.grouping import top_k_per_group
    from ..operators.snapshot import snapshot_records
    from ..sources.reader import read_snapshots

    keys = [pk] if isinstance(pk, str) else list(pk)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # collapse keep-last per key BEFORE the diff: table_diff requires
        # key-unique inputs, and one trigger may contain multiple dumps
        order_cols = (
            [order_col] if order_col else [c for c in batch_df.columns if c not in keys]
        )
        if order_cols:
            batch_df = top_k_per_group(
                batch_df, keys, [F.col(c).desc() for c in order_cols], 1
            )
        else:  # key-only schema: any duplicate row is identical
            batch_df = batch_df.dropDuplicates(keys)
        snap = read_snapshots(spark, stream, snapshot_dir)
        if snap is None:
            snap = batch_df.limit(0)
        diff = table_diff(snap, batch_df, keys, compare_cols).where(
            F.col("change") != "delete"  # upsert feed: absence != deletion
        )
        # dynamic partition overwrite keyed on batch_id makes the change
        # write IDEMPOTENT: a crash between this write and the snapshot
        # commit re-runs the same batch_id against the old snapshot and
        # REPLACES its partition instead of double-appending. (Changes
        # must be written before the snapshot: the reverse order loses the
        # diff entirely on replay — the new snapshot diffs to empty.)
        (
            diff.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(changes_dir)
        )
        snapshot_records(spark, batch_df, stream, snapshot_dir, pk=keys)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_quality_filter(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    weights: list[float],
    threshold: float,
    out_dir: str,
    rejected_dir: str,
    checkpoint_dir: str,
    bias: float = 0.0,
    use_bigrams: bool = True,
    weight_scale: int = 1000,
    score_col: str = "clf_score",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming quality gate (VERDICT r9 #8 — the L105 composition):
    every micro-batch is scored with the fastText-style linear
    classifier (:func:`~gluestick_spark.llm.classifier.classifier_score`
    — hashed n-gram gather, exact int64 sum, one IEEE division) and
    split at ``threshold``: passing documents append to ``out_dir``
    (with their score), rejected ones to ``rejected_dir`` — the
    filter-the-firehose shape of a continuously-ingesting training
    pipeline, scoring each document exactly once on arrival.

    **Exact batch equivalence, no caveats** (the ``streaming_decontam``
    device): the classifier weights are frozen literals and batches
    carry no cross-batch state, so the union of the per-batch outputs
    IS the batch ``classifier_score`` + threshold over the whole corpus
    — the oracle row shares the classifier CTE chain verbatim. Emitted
    rows carry ``__batch_id__``; replayed appends are byte-identical
    and collapse under :func:`read_streaming_dedup_output`.

    A second score band (e.g. a frozen bigram-LM NLL window) composes
    the same way — score with frozen state inside the same foreachBatch
    and AND the predicates; it stays stateless and stream ≡ batch
    exactly. Per-batch cost: one narrow projection + two appends."""
    from ..llm.classifier import classifier_score

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # lazy pin (r16 job fold): the passing-side write right below
        # materializes it; the rejected-side write then reuses the pin
        scored = classifier_score(
            batch_df, text_col, weights, bias=bias, use_bigrams=use_bigrams,
            weight_scale=weight_scale, out_col=score_col,
        ).localCheckpoint(eager=False)
        tag = F.lit(batch_id).cast("long").alias("__batch_id__")
        passing = F.col(score_col) >= F.lit(float(threshold))
        scored.where(passing).select("*", tag).write.mode("append").parquet(
            out_dir
        )
        scored.where(~passing).select("*", tag).write.mode("append").parquet(
            rejected_dir
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_decontam(
    stream_df: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    out_dir: str,
    flagged_dir: str,
    checkpoint_dir: str,
    max_occurrences: int = 256,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact-substring decontamination: each micro-batch is
    checked against a persisted
    :func:`~gluestick_spark.llm.spans.materialize_substring_index`
    (the benchmark/eval corpus); clean documents append to ``out_dir``,
    contaminated documents' spans to ``flagged_dir`` — the
    filter-the-firehose shape of a continuously-ingesting training
    pipeline.

    **Exact batch equivalence, no caveats**: the reference index is
    static and batches carry no cross-batch state, so the union of the
    per-batch span sets IS the batch
    :func:`~gluestick_spark.llm.spans.substring_spans_against` over the
    whole corpus (unlike the dedup streams, there is no id-ordering
    assumption). Emitted rows carry ``__batch_id__``; replayed appends
    are byte-identical and collapse under
    :func:`read_streaming_dedup_output` on either directory.

    Per-batch cost: batch windows + candidate-bound verify against the
    partitioned index — O(batch), the reference is never re-tokenized.
    """
    from ..llm.spans import substring_spans_against

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # lazy pin (r16 job fold): the clean-side write's anti-join
        # materializes it; the flagged-side write then reuses the pin
        spans = substring_spans_against(
            spark, batch_df, index_path, id_col, text_col, max_occurrences
        ).localCheckpoint(eager=False)
        dirty = spans.select(id_col).distinct()
        clean = batch_df.join(dirty, id_col, "left_anti")
        tag = F.lit(batch_id).cast("long").alias("__batch_id__")
        clean.select("*", tag).write.mode("append").parquet(out_dir)
        spans.select("*", tag).write.mode("append").parquet(flagged_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_SEMDEDUP_META = "_SEMDEDUP_META.json"


def materialize_semdedup_ref(
    reference: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    max_cluster_size: int | None = None,
    assign: str = "auto",
) -> None:
    """Persist the FROZEN cross-corpus SemDeDup reference (VERDICT r13
    #7): the integer-Lloyd router state plus the assigned+prepared
    reference points (``cid``, quantized vector, squared norm) written
    parquet partitioned by cid — the store-once/serve-many form of
    :func:`~gluestick_spark.llm.cluster.semdedup_against`'s reference
    half. ``max_cluster_size`` is applied AT BUILD: oversized reference
    cells are dropped and their cids recorded in the meta, so serving
    knows corpus rows routed there are UNJUDGED (the semdedup cap
    contract — never a silent keep). The meta JSON is written LAST
    (tmp + atomic replace) — it is the commit marker; a torn build
    refuses to serve."""
    import json as _json
    import os as _os

    from ..llm.cluster import _assign_df, _prepare, kmeans

    _os.makedirs(path, exist_ok=True)
    meta_path = _os.path.join(path, _SEMDEDUP_META)
    if _os.path.isfile(meta_path):
        _os.remove(meta_path)  # invalidate before the rewrite
    _, state = kmeans(
        reference, vec_col, id_col, k=k, iters=iters, scale=scale,
        return_state=True, assign=assign,
    )
    capped: list[int] = []
    counts: list[int] = []
    if state:
        pts = _assign_df(_prepare(reference, vec_col, id_col, scale), state, assign)
        # per-cell TRUE counts (capped cells included) persist in the
        # meta: append_semdedup_ref re-derives the capped set from
        # counts + appended batches — capped cells' rows are physically
        # absent, so disk can never be the count of record
        sizes = {
            int(r["cid"]): int(r["n"])
            for r in pts.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        counts = [sizes.get(c, 0) for c in range(len(state))]
        if max_cluster_size is not None:
            if max_cluster_size < 1:
                raise ValueError(
                    f"max_cluster_size must be >= 1, got {max_cluster_size}"
                )
            # mirror semdedup_against's capped join EXACTLY: cells kept are
            # those with 0 < n <= cap; oversized AND empty cells both leave
            # their corpus rows unjudged (the batch op's inner join on the
            # ok-cell list has precisely that effect)
            capped = sorted(
                c
                for c in range(len(state))
                if sizes.get(c, 0) == 0 or sizes[c] > max_cluster_size
            )
            if capped:
                pts = pts.where(~F.col("cid").isin(capped))
        (
            pts.select("cid", F.col("__q__").alias("qr"), F.col("__xx__").alias("xxr"))
            .repartition(F.col("cid"))
            .write.partitionBy("cid")
            .mode("overwrite")
            .parquet(_os.path.join(path, "cells"))
        )
    meta = {
        "scale": int(scale),
        "k": int(k),
        "iters": int(iters),
        "id_col": id_col,
        "assign": assign,
        "capped": capped,
        "counts": counts,
        "max_cluster_size": (
            int(max_cluster_size) if max_cluster_size is not None else None
        ),
        "state": [[list(map(int, s)), int(n)] for s, n in state],
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, meta_path)


_SSD_LEDGER = "_append_counts"  # inside cells/: underscore-hidden, manifested


def append_semdedup_ref(
    new_ref_df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
) -> int:
    """Incrementally GROW a :func:`materialize_semdedup_ref` reference
    (VERDICT r14 #6 — the lifecycle asymmetry vs the ANN index family):
    the new reference rows are assigned against the FROZEN router
    (geometry unchanged ⇒ every existing verdict's cell and cosine rule
    unchanged), prepared in the same narrow projection, and appended
    into the cell partition dirs — O(batch), never a router retrain or
    cell rewrite. Returns the number of appended rows.

    Cap re-derivation: the meta's per-cell build ``counts`` plus a
    per-append count ledger (``cells/_append_counts/*.json``, written
    INSIDE the append bracket so a torn batch rolls its ledger back
    with its cell files) let :func:`_semdedup_capped` recompute the
    capped set at serve time from TRUE totals — a cell crossing
    ``max_cluster_size`` stops being judged, an empty cell that gains
    rows starts, exactly as a rebuild over the union with the same
    router would decide. (Build-capped cells' rows were never written,
    so disk alone can never be the count of record.) A capped reference
    whose meta predates the counts field refuses to append — rebuild
    once to record them.

    Crash safety is the shared ``_APPEND_INPROGRESS`` bracket: a torn
    append is rolled back (cells + ledger together) on the next append,
    and serving (:func:`streaming_semdedup`) refuses a torn reference
    loudly. The meta file is never rewritten — the router IS frozen."""
    import json as _json
    import os as _os
    import uuid as _uuid

    from ..llm.cluster import _assign_df, _prepare
    from ..llm.index_commit import (
        begin_append,
        commit_append,
        rollback_torn_append,
    )

    meta_path = _os.path.join(path, _SEMDEDUP_META)
    if not _os.path.isfile(meta_path):
        raise ValueError(
            f"semdedup reference at {path} is torn or absent (no "
            f"{_SEMDEDUP_META}) — run materialize_semdedup_ref first"
        )
    rollback_torn_append(path)  # self-heal: a retried append rolls back
    with open(meta_path) as f:
        meta = _json.load(f)
    state = [(list(map(int, s)), int(n)) for s, n in meta["state"]]
    if not state:
        raise ValueError(
            f"semdedup reference at {path} has an empty router — rebuild "
            "with materialize_semdedup_ref on a non-empty reference"
        )
    if meta.get("max_cluster_size") is not None and "counts" not in meta:
        raise ValueError(
            f"semdedup reference at {path} was built with a cap by a "
            "pre-append version (no per-cell counts in the meta) — "
            "rebuild once with materialize_semdedup_ref to record them"
        )
    pts = _assign_df(
        _prepare(new_ref_df, vec_col, id_col, meta["scale"]),
        state,
        meta["assign"],
        # feeds the count aggregate AND the append write; LAZY — the
        # count collect right below materializes it (r16 job fold)
    ).localCheckpoint(eager=False)
    appended = {
        int(r["cid"]): int(r["n"])
        for r in pts.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_rows = sum(appended.values())
    if n_rows == 0:
        return 0
    begin_append(path)
    (
        pts.select(
            "cid", F.col("__q__").alias("qr"), F.col("__xx__").alias("xxr")
        )
        .repartition(F.col("cid"))
        .write.partitionBy("cid")
        .mode("append")
        .parquet(_os.path.join(path, "cells"))
    )
    ledger_dir = _os.path.join(path, "cells", _SSD_LEDGER)
    _os.makedirs(ledger_dir, exist_ok=True)
    tmp = _os.path.join(ledger_dir, f".{_uuid.uuid4().hex}.tmp")
    dst = _os.path.join(ledger_dir, f"{_uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        _json.dump({"counts": appended}, f)
    _os.replace(tmp, dst)
    commit_append(path)
    return n_rows


def _semdedup_capped(path: str, meta: dict) -> set[int]:
    """The reference's CURRENT capped-cell set: build counts + every
    committed append ledger, judged against the persisted cap. A
    pre-counts meta (or an uncapped build) falls back to the frozen
    build-time list."""
    import json as _json
    import os as _os

    cap = meta.get("max_cluster_size")
    counts = meta.get("counts")
    if cap is None or counts is None:
        return set(meta.get("capped", []))
    totals = [int(v) for v in counts]
    ledger_dir = _os.path.join(path, "cells", _SSD_LEDGER)
    if _os.path.isdir(ledger_dir):
        for name in sorted(_os.listdir(ledger_dir)):
            if not name.endswith(".json"):
                continue
            with open(_os.path.join(ledger_dir, name)) as f:
                for cid, n in _json.load(f)["counts"].items():
                    totals[int(cid)] += int(n)
    return {c for c, t in enumerate(totals) if t == 0 or t > cap}


def _pruned_ref_cells(spark, ref_path: str, batch_cids: list) -> DataFrame:
    """The reference-cell scan a :func:`streaming_semdedup` micro-batch
    judges against, restricted to the batch's own distinct cids with a
    LITERAL ``cid IN (...)`` — partition pruning is structural (the
    filter rides the scan as a PartitionFilter, plan-gated), never a bet
    on dynamic pruning inside a foreachBatch plan (VERDICT r14 #4)."""
    import os as _os

    return spark.read.parquet(_os.path.join(ref_path, "cells")).where(
        F.col("cid").isin(list(batch_cids))
    )


def streaming_semdedup(
    stream_df: DataFrame,
    ref_path: str,
    vec_col: str,
    id_col: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming cross-corpus SemDeDup (VERDICT r13 #7 — the last
    batch-only dedup family given streaming parity): every micro-batch
    of embeddings is assigned against the PERSISTED frozen router
    (:func:`materialize_semdedup_ref`) and judged against the persisted
    reference cells with the exact int64 rational cosine rule; one
    (id, ``cid``, ``keep``, ``__batch_id__``) row per JUDGED corpus row
    appends to ``out_dir``. Rows assigned to a capped reference cell
    emit no row (unjudged — the cap contract).

    **Stream ≡ batch EXACTLY, no caveats**: the reference is frozen and
    each batch's verdicts depend only on that batch's rows, so the
    union of emitted batches equals
    :func:`~gluestick_spark.llm.cluster.semdedup_against` over the
    whole corpus (shared oracle; the streaming_decontam argument).
    Replays are byte-identical and collapse under
    :func:`read_streaming_dedup_output`.

    Per-batch cost: one narrow assignment over the batch + one
    cid-keyed join against the reference cells restricted to the
    batch's own distinct cids (collected, ≤ router size k — the
    ``cid IN (...)`` literal makes partition pruning STRUCTURAL, not a
    bet on dynamic pruning; plan-gated) — Σ_c |batch_c|·|ref_c|, the
    reference is never rescanned in full when the batch touches few
    cells."""
    import json as _json
    import os as _os
    from math import gcd

    from ..llm.cluster import _assign_df, _prepare

    meta_path = _os.path.join(ref_path, _SEMDEDUP_META)
    if not _os.path.isfile(meta_path):
        raise ValueError(
            f"semdedup reference at {ref_path} is torn or absent (no "
            f"{_SEMDEDUP_META}) — run materialize_semdedup_ref first"
        )
    from ..llm.index_commit import require_committed

    # a torn append_semdedup_ref must not serve half a reference batch
    require_committed(ref_path, "semdedup reference")
    with open(meta_path) as f:
        meta = _json.load(f)
    state = [(list(map(int, s)), int(n)) for s, n in meta["state"]]
    # capped set derived from TRUE totals (build counts + append
    # ledgers) — appends can cap a growing cell or uncap an empty one,
    # exactly as a rebuild over the union with the same router would
    capped = _semdedup_capped(ref_path, meta)
    scale = int(meta["scale"])
    # validate the RAW float (ADVICE r14 #5): 1.004 / -0.004 must raise,
    # not silently round into range
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")
    t = round(threshold * 100)
    num, den = t * t, 100 * 100
    g = gcd(num, den) or 1
    num, den = num // g, den // g
    from ..llm.cluster import _semdedup_verdicts

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = F.lit(batch_id).cast("long").alias("__batch_id__")
        if not state:  # empty reference: every row keeps, cid NULL
            out = batch_df.select(
                F.col(id_col),
                F.lit(None).cast("int").alias("cid"),
                F.lit(True).alias("keep"),
                tag,
            )
            out.write.mode("append").parquet(out_dir)
            return
        pts = _assign_df(
            _prepare(batch_df, vec_col, id_col, scale), state, meta["assign"]
        )
        if capped:
            pts = pts.where(~F.col("cid").isin(sorted(capped)))
        # pin the batch's assignment once (batch-sized): it feeds the cid
        # collect below plus the matched/out branches. LAZY (r16): the
        # cid collect right below materializes it — the eager form cost
        # one extra scheduled job per trigger (the retrieval
        # probe-checkpoint lesson)
        pts = pts.localCheckpoint(eager=False)
        # STRUCTURAL cell pruning (VERDICT r14 #4): the batch's distinct
        # cids are bounded by the router size k — collect them and
        # restrict the reference scan explicitly, so partition pruning is
        # guaranteed by the filter literal rather than left to dynamic
        # pruning (which foreachBatch plan shapes don't promise)
        batch_cids = [r["cid"] for r in pts.select("cid").distinct().collect()]
        cells = _pruned_ref_cells(spark, ref_path, batch_cids)
        # cross-corpus verdicts via the shared Arrow gram kernel (see
        # llm/cluster.py:_semdedup_verdicts) — same exact int64 decision
        # the per-pair fold join computed, one cid-keyed exchange
        id_type = pts.schema["__id__"].dataType
        both = pts.select(
            "__id__", "__q__", "__xx__", "cid", F.lit(1).alias("__side__")
        ).unionByName(
            cells.select(
                F.lit(None).cast(id_type).alias("__id__"),
                F.col("qr").alias("__q__"),
                F.col("xxr").alias("__xx__"),
                "cid",
                F.lit(0).alias("__side__"),
            )
        )
        out = _semdedup_verdicts(both, num, den, within=False).select(
            F.col("__id__").alias(id_col), "cid", "keep", tag
        )
        out.write.mode("append").parquet(out_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming novelty guardrail (VERDICT r11 #8): the L110 store-once
# pattern composed with llm/decontam.py:novelty_scores — the reference
# gram-hash set is materialized ONCE (optionally as a bucketed state
# table, plus its persisted Bloom bitmap), and every micro-batch scores
# its documents' n-gram novelty against it statelessly.
# ---------------------------------------------------------------------------

_GRAM_META = "_GRAM_META.json"


def materialize_gram_state(
    reference: DataFrame,
    state_dir: str,
    text_col: str,
    n: int = 3,
    buckets: int | None = None,
    bloom_m_bits: int = 1 << 23,
    bloom_k: int = 3,
    mode: str = "overwrite",
    fs=None,
) -> None:
    """Persist the reference corpus's DISTINCT word n-gram hashes at
    ``state_dir`` — ``ref_grams`` (flat parquet, or a bucketed external
    state table when ``buckets`` is set: probe joins then read the
    gram side with ZERO Exchange) plus the pre-aggregated Bloom bitmap
    (``bloom_words.parquet``, ≤ m/64 rows) so serving never rebuilds
    the filter. ``_GRAM_META.json`` (n, buckets, bloom geometry) is
    written LAST via atomic replace — the commit marker: a crash
    mid-materialize leaves no meta and :func:`streaming_novelty`
    refuses the torn state loudly.

    ``mode="append"`` adds a NEW reference batch O(batch): only grams
    absent from the stored set are appended (left_anti probe), keeping
    the table duplicate-free — the invariant the seen-count join needs
    — and the bitmap is extended by OR-merging the new grams' words.
    Geometry must match the stored meta."""
    import json as _json
    import os as _os

    from ..fsio import LOCAL_FS
    from ..llm.bloom import bloom_words
    from ..llm.decontam import ngram_hashes_expr

    fs = fs or LOCAL_FS
    spark = reference.sparkSession
    meta = {
        "n": n,
        "buckets": buckets,
        "bloom_m_bits": bloom_m_bits,
        "bloom_k": bloom_k,
    }
    meta_path = _os.path.join(state_dir, _GRAM_META)
    grams_loc = _os.path.join(state_dir, "ref_grams")
    words_loc = _os.path.join(state_dir, "bloom_words.parquet")
    tbl = "gram_state_" + __import__("hashlib").md5(
        state_dir.encode()
    ).hexdigest()[:12]
    grams = reference.select(
        F.explode(ngram_hashes_expr(F.col(text_col), n)).alias("__g__")
    ).distinct()
    if mode == "append":
        if not fs.isfile(meta_path):
            raise ValueError(
                f"gram state at {state_dir} is torn or absent (no "
                f"{_GRAM_META}) — run materialize_gram_state(mode="
                "'overwrite') to (re)build it"
            )
        stored = _json.loads(fs.read_text(meta_path))
        if stored != meta:
            raise ValueError(
                f"gram-state geometry mismatch: stored {stored}, got {meta}"
            )
        fs.remove(meta_path)  # re-entering the commit bracket
        existing = _read_gram_state_table(spark, state_dir, buckets)
        fresh = grams.join(existing, "__g__", "left_anti").localCheckpoint()
        if buckets is not None:
            _append_bucketed_state(fresh, tbl, grams_loc, ["__g__"], buckets)
        else:
            fresh.write.mode("append").parquet(grams_loc)
        new_words = bloom_words(fresh, "__g__", bloom_m_bits, bloom_k)
        merged = (
            spark.read.parquet(words_loc)
            .unionByName(new_words)
            .groupBy("__bw__")
            .agg(F.bit_or("__bb__").alias("__bb__"))
            .localCheckpoint()
        )
        merged.write.mode("overwrite").parquet(words_loc)
    else:
        if fs.isfile(meta_path):
            fs.remove(meta_path)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if fs.isdir(grams_loc):
            fs.rmtree(grams_loc)
        grams = grams.localCheckpoint()
        if buckets is not None:
            _append_bucketed_state(grams, tbl, grams_loc, ["__g__"], buckets)
        else:
            grams.write.mode("overwrite").parquet(grams_loc)
        bloom_words(grams, "__g__", bloom_m_bits, bloom_k).write.mode(
            "overwrite"
        ).parquet(words_loc)
    fs.write_text_atomic(meta_path, _json.dumps(meta))


def _read_gram_state_table(spark, state_dir: str, buckets: int | None):
    import os as _os

    grams_loc = _os.path.join(state_dir, "ref_grams")
    if buckets is not None:
        tbl = "gram_state_" + __import__("hashlib").md5(
            state_dir.encode()
        ).hexdigest()[:12]
        if _ensure_bucketed_state(spark, tbl, grams_loc, ["__g__"], buckets):
            return spark.table(tbl)
        raise ValueError(f"gram state missing under {state_dir}")
    return spark.read.parquet(grams_loc)


def streaming_novelty(
    stream_df: DataFrame,
    state_dir: str,
    id_col: str,
    text_col: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    fs=None,
) -> StreamingQuery:
    """Streaming per-document n-gram novelty against a persisted
    reference gram set (:func:`materialize_gram_state`): every
    micro-batch's documents get (n_grams, n_novel, novelty_ppm) rows
    appended to ``out_dir`` — the continuously-ingesting form of
    crawl-refresh triage (score each incoming document's novelty
    against the existing corpus ON ARRIVAL, before deciding to keep it).

    **Exact batch equivalence, no caveats** (the ``streaming_decontam``
    device): the reference gram set is static and batches carry no
    cross-batch state, so the union of the per-batch novelty rows IS
    the batch :func:`~gluestick_spark.llm.decontam.novelty_scores` over
    the whole corpus. Emitted rows carry ``__batch_id__``; replayed
    appends collapse under :func:`read_streaming_dedup_output`.

    Per-batch cost: two narrow text passes over the batch + the
    PERSISTED Bloom bitmap (read, never rebuilt) pre-filtering the
    exact join — the reference table is touched only by the surviving
    (seen + ~0.1% FP) gram stream; with a bucketed state the gram side
    joins with zero Exchange. Torn state (missing meta) raises."""
    import json as _json
    import os as _os

    from ..fsio import LOCAL_FS
    from ..llm.decontam import novelty_scores_against

    fs = fs or LOCAL_FS
    meta_path = _os.path.join(state_dir, _GRAM_META)
    if not fs.isfile(meta_path):
        raise ValueError(
            f"gram state at {state_dir} is torn or absent (no {_GRAM_META})"
            " — run materialize_gram_state first"
        )
    meta = _json.loads(fs.read_text(meta_path))
    words_loc = _os.path.join(state_dir, "bloom_words.parquet")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ref_grams = _read_gram_state_table(spark, state_dir, meta["buckets"])
        words = spark.read.parquet(words_loc)
        scored = novelty_scores_against(
            batch_df, ref_grams, text_col, id_col, n=meta["n"],
            bloom_m_bits=meta["bloom_m_bits"], bloom_k=meta["bloom_k"],
            bloom_words_df=words,
        )
        tag = F.lit(batch_id).cast("long").alias("__batch_id__")
        scored.select("*", tag).write.mode("append").parquet(out_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def materialize_corpus_sketch(
    df: DataFrame,
    path: str,
    text_col: str,
    n: int = 3,
    k: int = 1024,
    fs=None,
) -> None:
    """Persist a corpus's KMV gram sketch at ``path`` — ONE row
    (sorted array<long> of the k smallest portable md5 gram hashes,
    ≤ 8k bytes) plus ``_SKETCH_META.json`` (n, k; written LAST via
    atomic replace, the commit marker). The sketch-once half of
    :func:`streaming_corpus_drift` and of any pairwise corpus
    comparison (:func:`~gluestick_spark.llm.decontam.
    kmv_jaccard_from_sketches`)."""
    import json as _json
    import os as _os

    from ..fsio import LOCAL_FS
    from ..llm.decontam import ngrams_expr
    from ..llm.sketch import kmv_sketch

    fs = fs or LOCAL_FS
    meta_path = _os.path.join(path, "_SKETCH_META.json")
    if fs.isfile(meta_path):
        fs.remove(meta_path)
    grams = df.select(F.explode(ngrams_expr(F.col(text_col), n)).alias("__g__"))
    kmv_sketch(grams, "__g__", k).write.mode("overwrite").parquet(
        _os.path.join(path, "sketch.parquet")
    )
    fs.write_text_atomic(meta_path, _json.dumps({"n": n, "k": k}))


def streaming_corpus_drift(
    stream_df: DataFrame,
    ref_sketch_path: str,
    text_col: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    available_now: bool = True,
    fs=None,
) -> StreamingQuery:
    """Streaming corpus-drift monitor over MERGEABLE KMV sketches: each
    micro-batch's gram sketch is appended to a tiny sketch log under
    ``state_dir``; the cumulative corpus sketch (kmv_merge of the log —
    O(k·batches) longs, never the text) is compared against the
    persisted reference sketch (:func:`materialize_corpus_sketch`) and
    one (``__batch_id__``, ``k_used``, ``n_shared``,
    ``jaccard_est_ppm``) row appends to ``out_dir`` — the
    crawl-over-crawl drift trajectory, computed on arrival.

    **Exact batch equivalence by the KMV merge law**: the k-min of a
    union IS the merge of per-part k-mins, so the LAST batch's row
    equals the batch :func:`~gluestick_spark.llm.decontam.
    corpus_jaccard_kmv` over everything streamed — bit-for-bit, any
    batch split. Replay safety is ALGEBRAIC, not transactional: KMV
    merge is idempotent (merging a duplicate sketch changes nothing),
    so a replayed batch's duplicate log row cannot skew the cumulative
    sketch; out_dir rows collapse under
    :func:`read_streaming_dedup_output` as usual.

    Per-batch cost: one narrow gram pass over the batch + a merge over
    the ≤ k·batches-long sketch log. State is KILOBYTES regardless of
    corpus size — the mergeable-sketch streaming posture (compare the
    bucketed-gram state of :func:`streaming_novelty`, which buys
    exactness at gram-table cost)."""
    import json as _json
    import os as _os

    from ..fsio import LOCAL_FS
    from ..llm.decontam import kmv_jaccard_from_sketches, ngrams_expr
    from ..llm.sketch import kmv_merge, kmv_sketch

    fs = fs or LOCAL_FS
    meta_path = _os.path.join(ref_sketch_path, "_SKETCH_META.json")
    if not fs.isfile(meta_path):
        raise ValueError(
            f"reference sketch at {ref_sketch_path} is torn or absent (no "
            "_SKETCH_META.json) — run materialize_corpus_sketch first"
        )
    meta = _json.loads(fs.read_text(meta_path))
    n, k = int(meta["n"]), int(meta["k"])
    log_dir = _os.path.join(state_dir, "sketch_log.parquet")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grams = batch_df.select(
            F.explode(ngrams_expr(F.col(text_col), n)).alias("__g__")
        )
        batch_sketch = kmv_sketch(grams, "__g__", k).withColumn(
            "__batch__", F.lit(batch_id).cast("long")
        )
        batch_sketch.write.mode("append").parquet(log_dir)
        cum = kmv_merge(read_sketch_log(spark, log_dir), k).select(
            F.col("kmv").alias("__ka__")
        )
        ref = spark.read.parquet(
            _os.path.join(ref_sketch_path, "sketch.parquet")
        ).select(F.col("kmv").alias("__kb__"))
        est = kmv_jaccard_from_sketches(spark, cum, ref, k)
        tag = F.lit(batch_id).cast("long").alias("__batch_id__")
        est.select("*", tag).write.mode("append").parquet(out_dir)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
