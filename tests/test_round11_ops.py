"""Round-11 contracts: streaming state compaction (VERDICT r10 #4) and
the round's other new operator surfaces."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def _urls_df(spark, lo: int, hi: int):
    rows = [
        (i, f"https://www.example.com/page{i % 7}?utm_source=x&id={i % 5}")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def _run_url_stream(spark, d, stage, out, state, ckpt, **kw):
    from gluestick_spark.streaming.pipeline import (
        stream_from_directory,
        streaming_url_dedup,
    )

    d.coalesce(1).write.mode("append").parquet(stage)
    streaming_url_dedup(
        stream_from_directory(spark, stage, d.schema),
        "url", "doc_id", state, out, ckpt, **kw,
    ).awaitTermination()


# ----------------------------- r11: cross-corpus n-gram novelty -----------


def test_novelty_scores_known_geometry(spark):
    """novelty_ppm = floored ppm share of distinct n-grams absent from
    the reference; short docs (< n tokens) get 0 grams and NULL novelty;
    exact duplicates of reference text score 0."""
    from gluestick_spark.llm.decontam import novelty_scores

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),          # all 3 grams known
            (2, "entirely novel text never seen before"),  # all novel
            (3, "the quick brown cat sleeps"),         # 1 known of 3
            (4, "too short"),                          # < 3 tokens
            (5, None),                                 # null text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           novelty_scores(corpus, ref, "text", "doc_id", n=3).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_novel"] == 0
    assert out[1]["novelty_ppm"] == 0
    assert out[2]["n_grams"] == 4 and out[2]["n_novel"] == 4
    assert out[2]["novelty_ppm"] == 1_000_000
    assert out[3]["n_grams"] == 3 and out[3]["n_novel"] == 2
    assert out[3]["novelty_ppm"] == 666_666  # floor(1e6 * 2/3)
    assert out[4]["n_grams"] == 0 and out[4]["novelty_ppm"] is None
    assert out[5]["n_grams"] == 0 and out[5]["novelty_ppm"] is None


# ----------------------------- r11: schema-drift guard --------------------


def test_schema_drift_classes_and_guard(spark):
    """All four change classes detected (by name; nested types compare by
    simpleString); the breaking-drift guard raises on dropped/
    type_changed, tolerates added by default, and strict mode rejects
    added too."""
    from gluestick_spark.operators.expectations import (
        assert_no_breaking_drift,
        schema_drift,
    )

    before = spark.createDataFrame(
        [(1, "a", 2.0, [1])], "id long, name string, score double, tags array<int>"
    )
    after = (
        before.drop("name")
        .withColumn("extra", F.lit(True))
        .withColumn("score", F.col("score").cast("float"))
    )
    d = {r["column"]: r for r in schema_drift(before, after).collect()}
    assert d["name"]["change"] == "dropped" and d["name"]["type_after"] is None
    assert d["extra"]["change"] == "added" and d["extra"]["type_before"] is None
    assert d["score"]["change"] == "type_changed"
    assert (d["score"]["type_before"], d["score"]["type_after"]) == ("double", "float")
    assert d["id"]["change"] == "unchanged" and d["tags"]["change"] == "unchanged"

    with pytest.raises(ValueError, match="name: dropped"):
        assert_no_breaking_drift(before, after)
    # added-only drift passes by default, raises in strict mode
    widened = before.withColumn("extra", F.lit(1))
    assert_no_breaking_drift(before, widened)  # no raise
    with pytest.raises(ValueError, match="extra: added"):
        assert_no_breaking_drift(before, widened, allow_added=False)
    assert_no_breaking_drift(before, before)  # identical: no raise


# ----------------------------- r11: corpus-level n-gram overlap -----------


def test_corpus_gram_overlap_known_sets(spark):
    """Exact set algebra on a crafted pair: shared/total gram counts,
    Jaccard and containment ppm; empty-union NULL contract."""
    from gluestick_spark.llm.decontam import corpus_gram_overlap

    a = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )  # grams: {the quick brown, quick brown fox, brown fox jumps} = 3
    b = spark.createDataFrame(
        [(2, "the quick brown fox sleeps"), (3, "entirely different text here")],
        "doc_id long, text string",
    )  # grams: {the quick brown, quick brown fox, brown fox sleeps,
    #           entirely different text, different text here} = 5
    r = corpus_gram_overlap(a, b, "text", n=3).collect()[0]
    assert (r["n_grams_a"], r["n_grams_b"], r["n_shared"]) == (3, 5, 2)
    assert r["jaccard_ppm"] == 333_333          # floor(1e6 * 2/6)
    assert r["containment_a_in_b_ppm"] == 666_666  # floor(1e6 * 2/3)

    empty = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r2 = corpus_gram_overlap(empty, empty, "text", n=3).collect()[0]
    assert r2["n_grams_a"] == 0 and r2["jaccard_ppm"] is None


# ----------------------------- r11: exact-k deterministic sampling --------


def test_sample_exact_k_contract(spark):
    """Exactly min(k, n) rows; membership invariant to partitioning;
    reservoir-stable under corpus growth (a new key evicts at most one);
    different seeds give different draws; plan is TakeOrdered."""
    from gluestick_spark.llm.sampling import sample_exact_k

    d = spark.range(1000).select(F.col("id").alias("k"))
    got = sample_exact_k(d, "k", 50)
    ids = sorted(r["k"] for r in got.collect())
    assert len(ids) == 50
    # partition-invariant
    ids2 = sorted(r["k"] for r in sample_exact_k(d.repartition(7), "k", 50).collect())
    assert ids2 == ids
    # k > n -> everything
    assert sample_exact_k(d.where("k < 10"), "k", 50).count() == 10
    # reservoir stability: growing the corpus keeps a subset relationship
    bigger = sorted(
        r["k"] for r in
        sample_exact_k(spark.range(2000).select(F.col("id").alias("k")), "k", 50).collect()
    )
    kept = set(ids) & set(bigger)
    assert len(kept) >= 20  # old members only leave by eviction, not reshuffle
    # seeded independence
    seeded = sorted(r["k"] for r in sample_exact_k(d, "k", 50, seed="x").collect())
    assert seeded != ids
    plan = sample_exact_k(d, "k", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        sample_exact_k(d, "k", 0)


# ------------------------- VERDICT r10 #4: streaming state compaction -----


def test_compact_stream_state_flat_bounds_files_and_keeps_results(spark, tmp_dir):
    """Per-batch appends grow the flat canon-state file count without
    bound; compact_stream_state collapses it, the stream resumes on the
    compacted state, and emitted survivors match an uncompacted
    reference run exactly."""
    from gluestick_spark.streaming.pipeline import (
        compact_stream_state,
        read_streaming_dedup_output,
    )

    def run(base, compact_after=None):
        stage = os.path.join(base, "src")
        out = os.path.join(base, "out")
        state = os.path.join(base, "state")
        ckpt = os.path.join(base, "ckpt")
        for b in range(4):
            _run_url_stream(
                spark, _urls_df(spark, b * 10, b * 10 + 10),
                stage, out, state, ckpt,
            )
            if compact_after is not None and b == compact_after:
                n_before = len(_parquet_files(os.path.join(state, "url_canon.parquet")))
                res = compact_stream_state(spark, state, target_rows_per_file=10**6)
                assert res["url_canon.parquet"] >= 1
                n_after = len(_parquet_files(os.path.join(state, "url_canon.parquet")))
                assert n_after < n_before
        return read_streaming_dedup_output(spark, out)

    ref = run(os.path.join(tmp_dir, "ref"))
    got = run(os.path.join(tmp_dir, "cmp"), compact_after=2)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in ref.collect()
    )


def test_compact_stream_state_bucketed_preserves_plan_and_results(spark, tmp_dir):
    """Bucket-preserving compaction: after compacting the bucketed canon
    state, the state-side distinct still runs with ZERO Exchange (bucket
    ids survive in the file names), the file count collapses to ~one per
    bucket, and a post-compaction batch dedups correctly."""
    from gluestick_spark.streaming.pipeline import (
        _state_table_name,
        compact_stream_state,
        read_streaming_dedup_output,
    )

    base = os.path.join(tmp_dir, "b")
    stage, out = os.path.join(base, "src"), os.path.join(base, "out")
    state, ckpt = os.path.join(base, "state"), os.path.join(base, "ckpt")
    for b in range(3):
        _run_url_stream(
            spark, _urls_df(spark, b * 10, b * 10 + 10),
            stage, out, state, ckpt, state_buckets=4,
        )
    loc = os.path.join(state, "url_canon_buckets")
    n_before = len(_parquet_files(loc))
    res = compact_stream_state(spark, state, state_buckets=4)
    assert res["url_canon_buckets"] <= 4 < n_before

    tbl = _state_table_name(state, "url_canon")
    plan = spark.table(tbl).distinct()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    # the stream keeps deduping against the compacted state: a batch of
    # already-seen urls adds nothing
    canon_before = spark.table(tbl).distinct().count()
    out_before = read_streaming_dedup_output(spark, out).count()
    _run_url_stream(
        spark, _urls_df(spark, 0, 30),  # batches 0-2 verbatim: all seen
        stage, out, state, ckpt, state_buckets=4,
    )
    assert read_streaming_dedup_output(spark, out).count() == out_before
    assert spark.table(tbl).distinct().count() == canon_before

    # guard: mismatched bucket count refuses loudly
    with pytest.raises(ValueError, match="does not match"):
        compact_stream_state(spark, state, state_buckets=8)


def test_compact_stream_state_bucketed_crash_self_heals(spark, tmp_dir):
    """A crash between the two fallback renames leaves the state under
    .__old__ only; the next compaction call heals it before rewriting."""
    from gluestick_spark.streaming.pipeline import (
        _state_table_name,
        compact_stream_state,
    )

    base = os.path.join(tmp_dir, "c")
    stage, out = os.path.join(base, "src"), os.path.join(base, "out")
    state, ckpt = os.path.join(base, "state"), os.path.join(base, "ckpt")
    for b in range(2):
        _run_url_stream(
            spark, _urls_df(spark, b * 10, b * 10 + 10),
            stage, out, state, ckpt, state_buckets=4,
        )
    loc = os.path.join(state, "url_canon_buckets")
    rows_before = spark.read.parquet(loc).distinct().count()
    os.rename(loc, loc + ".__old__")  # simulated crash mid-swap
    res = compact_stream_state(spark, state, state_buckets=4)
    assert res["url_canon_buckets"] >= 1
    tbl = _state_table_name(state, "url_canon")
    spark.catalog.refreshTable(tbl)
    assert spark.read.parquet(loc).distinct().count() == rows_before


def test_compact_stream_state_missing_catalog_needs_buckets(spark, tmp_dir):
    """Fresh-session shape: bucketed state files on disk but no catalog
    entry — compaction refuses without state_buckets and succeeds with
    it (re-registering the table first)."""
    from gluestick_spark.streaming.pipeline import (
        _state_table_name,
        compact_stream_state,
    )

    base = os.path.join(tmp_dir, "d")
    stage, out = os.path.join(base, "src"), os.path.join(base, "out")
    state, ckpt = os.path.join(base, "state"), os.path.join(base, "ckpt")
    _run_url_stream(
        spark, _urls_df(spark, 0, 10), stage, out, state, ckpt, state_buckets=4
    )
    tbl = _state_table_name(state, "url_canon")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")  # catalog loss
    with pytest.raises(ValueError, match="state_buckets"):
        compact_stream_state(spark, state)
    res = compact_stream_state(spark, state, state_buckets=4)
    assert res["url_canon_buckets"] >= 1
    assert spark.catalog.tableExists(tbl)


def test_compact_stream_state_bin_counts_additive_after(spark, tmp_dir):
    """Drift bin-count state: compaction is row-preserving, so the
    (bin, batch_id)-keyed replay guard and the additive sums are
    unchanged."""
    from gluestick_spark.streaming.pipeline import (
        bin_counts_from_state,
        compact_stream_state,
        stream_from_directory,
        streaming_bin_counts,
    )

    base = os.path.join(tmp_dir, "e")
    stage = os.path.join(base, "src")
    state, ckpt = os.path.join(base, "state"), os.path.join(base, "ckpt")
    d1 = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    d2 = spark.createDataFrame([(float(i),) for i in range(50, 80)], "x double")
    for d in (d1, d2):
        d.coalesce(1).write.mode("append").parquet(stage)
        streaming_bin_counts(
            stream_from_directory(spark, stage, d.schema),
            "x", 0.0, 100.0, 10, state, ckpt,
        ).awaitTermination()
    before = sorted(
        (r["bin"], r["n"]) for r in bin_counts_from_state(spark, state).collect()
    )
    res = compact_stream_state(spark, state)
    assert res["bin_counts.parquet"] == 1
    after = sorted(
        (r["bin"], r["n"]) for r in bin_counts_from_state(spark, state).collect()
    )
    assert after == before
