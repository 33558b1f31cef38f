"""Round-9 fixes and additions: versioned-table per-version commit
markers (ADVICE r8 medium x2), resample_to_ratio zero-class contract,
band-index commit marker, streaming url-dedup replay tagging."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

# ----------------------------------- versioned per-version publication ----


def test_versioned_commit_log_is_append_only(spark, tmp_dir):
    """ADVICE r8 (medium): publication is recorded per-version, and the
    shared _COMMITS log is append-only — a concurrent writer's line can
    never be lost to a read-modify-rewrite, and a stale/foreign line is
    inert (intersected with on-disk versions)."""
    from gluestick_spark.operators.versioned import (
        published_versions,
        read_versioned,
        write_versioned,
    )

    path = os.path.join(tmp_dir, "tbl")
    write_versioned(spark.range(3), path)  # v=1
    # a concurrent writer's append lands between this writer's commits
    with open(os.path.join(path, "_COMMITS"), "a") as f:
        f.write("999\n")
    write_versioned(spark.range(5), path)  # v=2
    log = open(os.path.join(path, "_COMMITS")).read()
    assert "999" in log and "1" in log and "2" in log  # nothing rewritten
    assert published_versions(path) == [1, 2]  # phantom 999 inert
    assert read_versioned(spark, path).count() == 5


def test_versioned_marker_is_authoritative_without_log(spark, tmp_dir):
    """The per-version _COMMITTED marker alone proves publication: even
    with the _COMMITS log gone (e.g. lost in a copy), every properly
    committed version stays readable."""
    from gluestick_spark.operators.versioned import (
        published_versions,
        read_versioned,
        write_versioned,
    )

    path = os.path.join(tmp_dir, "tbl")
    write_versioned(spark.range(3), path)
    write_versioned(spark.range(7), path)
    os.remove(os.path.join(path, "_COMMITS"))
    assert published_versions(path) == [1, 2]
    assert read_versioned(spark, path, 1).count() == 3
    assert read_versioned(spark, path, 2).count() == 7


def test_versioned_vacuum_spares_inflight_claim(spark, tmp_dir):
    """ADVICE r8 (medium): a buried unpublished claim inside the grace
    window is an in-flight writer, not garbage — vacuum must not rmtree
    under it; after it ages out, it goes."""
    from gluestick_spark.operators.versioned import (
        vacuum_versions,
        write_versioned,
    )

    path = os.path.join(tmp_dir, "tbl")
    write_versioned(spark.range(2), path)  # v=1 published
    os.mkdir(os.path.join(path, "v=2"))  # slow writer's claim, mid-write
    write_versioned(spark.range(4), path)  # fast writer publishes v=3
    assert vacuum_versions(path, keep=10) == []  # claim spared
    assert os.path.isdir(os.path.join(path, "v=2"))
    # age the claim past the grace window
    old = 1.0
    os.utime(os.path.join(path, "v=2"), (old, old))
    assert vacuum_versions(path, keep=10) == [2]


# ----------------------------------------- resample_to_ratio contract -----


def test_resample_to_ratio_zero_class_yields_empty(spark):
    """ADVICE r8 (low): a weighted class with zero rows means the exact
    ratio is unachievable at any volume — u=0, empty output, not a
    silently wrong 5:3:0 mix."""
    from gluestick_spark.llm.sampling import resample_to_ratio

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(40)], "id long, c string"
    )
    out = resample_to_ratio(df, "id", "c", {"a": 2, "b": 1, "ghost": 1})
    assert out.count() == 0


def test_resample_to_ratio_still_exact_on_present_classes(spark):
    from gluestick_spark.llm.sampling import resample_to_ratio

    df = spark.createDataFrame(
        [(i, ["a", "a", "a", "b", "b", "c"][i % 6]) for i in range(120)],
        "id long, c string",
    )
    out = resample_to_ratio(df, "id", "c", {"a": 3, "b": 2, "c": 1})
    counts = {r["c"]: r["n"] for r in out.groupBy("c").agg(F.count("*").alias("n")).collect()}
    # n_a=60,w=3 -> 20; n_b=40,w=2 -> 20; n_c=20,w=1 -> 20; u=20
    assert counts == {"a": 60, "b": 40, "c": 20}


# -------------------------------------------- band-index commit marker ----


def test_band_index_requires_commit_marker(spark, tmp_dir):
    """ADVICE r8 (low): a torn rebuild (crash between the bands and
    shingles overwrites) must fail LOUDLY on read, not silently serve a
    mixed-corpora index."""
    from gluestick_spark.llm.dedup import (
        dedup_against_indexed,
        materialize_band_index,
    )

    docs = spark.createDataFrame(
        [(i, f"unique document body number {i} " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    path = os.path.join(tmp_dir, "bidx")
    materialize_band_index(docs, "text", "doc_id", path)
    marker = os.path.join(path, "_INDEX_COMMIT")
    assert os.path.isfile(marker)
    # sanity: committed index serves
    assert dedup_against_indexed(spark, docs, path, "text", "doc_id").count() == 0
    # torn rebuild: marker gone, read must raise
    os.remove(marker)
    with pytest.raises(ValueError, match="uncommitted"):
        dedup_against_indexed(spark, docs, path, "text", "doc_id")


def test_band_index_append_recommits(spark, tmp_dir):
    from gluestick_spark.llm.dedup import (
        dedup_against_indexed,
        materialize_band_index,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"unique document body number {i} " * 3) for i in range(lo, hi)],
        "doc_id long, text string",
    )
    path = os.path.join(tmp_dir, "bidx")
    materialize_band_index(mk(0, 6), "text", "doc_id", path)
    materialize_band_index(mk(6, 12), "text", "doc_id", path, mode="append")
    assert os.path.isfile(os.path.join(path, "_INDEX_COMMIT"))
    # a doc duplicated from the appended half is caught
    dup = mk(6, 7)
    assert dedup_against_indexed(spark, dup, path, "text", "doc_id").count() == 0


# ------------------------------------------- bucketed streaming state -----


def _run_url_stream(spark, tmp, d, **kw):
    from gluestick_spark.streaming.pipeline import (
        read_streaming_dedup_output,
        stream_from_directory,
        streaming_url_dedup,
    )

    stage, out = os.path.join(tmp, "src"), os.path.join(tmp, "out")
    state, ckpt = os.path.join(tmp, "state"), os.path.join(tmp, "ckpt")
    mid = d.count() // 2
    for cond in (F.col("doc_id") < mid, F.col("doc_id") >= mid):
        d.where(cond).coalesce(1).write.mode("append").parquet(stage)
        q = streaming_url_dedup(
            stream_from_directory(spark, stage, d.schema),
            "url", "doc_id", state, out, ckpt, **kw,
        )
        q.awaitTermination()
    return read_streaming_dedup_output(spark, out), state


def test_streaming_url_dedup_bucketed_state_equivalent(spark, tmp_dir):
    """VERDICT r8 task 3: the bucketed-state variant must emit exactly
    the default variant's rows, while its per-batch state plans run with
    NO state-side Exchange (replay-guard distinct and the anti-join's
    state side are bucket-local)."""
    from gluestick_spark.streaming.pipeline import _state_table_name

    d = spark.createDataFrame(
        [(i, f"https://site{i % 7}.com/page?utm_campaign=x&q={i % 7}")
         for i in range(40)],
        "doc_id long, url string",
    )
    plain, _ = _run_url_stream(spark, os.path.join(tmp_dir, "p"), d)
    bucketed, state = _run_url_stream(
        spark, os.path.join(tmp_dir, "b"), d, state_buckets=4
    )
    key = lambda r: (r["doc_id"], r["canonical_url"])
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, bucketed.collect())
    )

    tbl = _state_table_name(state, "url_canon")
    assert spark.catalog.tableExists(tbl)
    # replay-guard distinct: bucket-local, zero Exchange
    dedup_plan = spark.table(tbl).distinct()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in dedup_plan, dedup_plan
    # anti-join: ONLY the (small) batch side exchanges, never the state
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        seen = spark.table(tbl).distinct()
        batch = d.where("doc_id < 5").withColumn("canonical_url", F.col("url"))
        j = batch.join(
            seen, batch["canonical_url"] == seen["__canon__"], "left_anti"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_minhash_dedup_bucketed_state_equivalent(spark, tmp_dir):
    """The bucketed minhash state (band index on (band,bucket), docs on
    id) restructures the per-batch plan (split candidate join + width
    arithmetic instead of union-repartition) but must keep the emitted
    survivor set identical; the state-side distinct and width count run
    with zero Exchange."""
    from gluestick_spark.streaming.pipeline import (
        _state_table_name,
        stream_from_directory,
        streaming_minhash_dedup,
    )

    base = [
        "the quick brown fox jumps over the lazy dog again and again "
        f"variation {i} with some shared boilerplate text padding" for i in range(10)
    ]
    rows = [(i, base[i % 10] + (" extra" if i >= 10 else "")) for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    def run(tmp, **kw):
        stage, out = os.path.join(tmp, "src"), os.path.join(tmp, "out")
        state, ckpt = os.path.join(tmp, "state"), os.path.join(tmp, "ckpt")
        for cond in (F.col("doc_id") < 10, F.col("doc_id") >= 10):
            d.where(cond).coalesce(1).write.mode("append").parquet(stage)
            q = streaming_minhash_dedup(
                stream_from_directory(spark, stage, d.schema),
                "text", "doc_id", state, out, ckpt,
                threshold=0.5, **kw,
            )
            q.awaitTermination()
        return spark.read.parquet(out), state

    plain, _ = run(os.path.join(tmp_dir, "p"))
    bucketed, state = run(os.path.join(tmp_dir, "b"), state_buckets=4)
    assert sorted(r["doc_id"] for r in plain.collect()) == sorted(
        r["doc_id"] for r in bucketed.collect()
    )
    bt = _state_table_name(state, "mh_buckets")
    dt = _state_table_name(state, "mh_docs")
    assert spark.catalog.tableExists(bt) and spark.catalog.tableExists(dt)
    for probe in (
        spark.table(bt).distinct(),
        spark.table(bt).distinct().groupBy("band", "bucket").count(),
        spark.table(dt).distinct(),
    ):
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_streaming_minhash_torn_docs_state_raises(spark, tmp_dir):
    """ADVICE r10: bucket state present but docs state lost (crash
    between the two appends / partial wipe) must raise the designed
    torn-state ValueError, not an opaque TABLE_OR_VIEW_NOT_FOUND from
    spark.table() inside foreachBatch."""
    import shutil

    from pyspark.errors import StreamingQueryException

    from gluestick_spark.streaming.pipeline import (
        _state_table_name,
        stream_from_directory,
        streaming_minhash_dedup,
    )

    rows = [(i, f"document body number {i} with shared padding text") for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    stage, out = os.path.join(tmp_dir, "src"), os.path.join(tmp_dir, "out")
    state, ckpt = os.path.join(tmp_dir, "state"), os.path.join(tmp_dir, "ckpt")

    d.where("doc_id < 4").coalesce(1).write.mode("append").parquet(stage)
    streaming_minhash_dedup(
        stream_from_directory(spark, stage, d.schema),
        "text", "doc_id", state, out, ckpt,
        threshold=0.5, state_buckets=4,
    ).awaitTermination()

    # simulate the torn state: docs state gone, bucket state intact
    shutil.rmtree(os.path.join(state, "minhash_docs_bt"))
    spark.sql(f"DROP TABLE IF EXISTS {_state_table_name(state, 'mh_docs')}")

    d.where("doc_id >= 4").coalesce(1).write.mode("append").parquet(stage)
    with pytest.raises(StreamingQueryException, match="torn state"):
        streaming_minhash_dedup(
            stream_from_directory(spark, stage, d.schema),
            "text", "doc_id", state, out, ckpt,
            threshold=0.5, state_buckets=4,
        ).awaitTermination()


# --------------------------------------------- persisted IVF x SQ index ---


def test_sq_ivf_index_requires_router_commit(spark, tmp_dir):
    """_ROUTER.json is written LAST (atomic replace) — a torn build has
    no router and serving refuses loudly instead of probing a
    half-written index (the band-index lesson applied)."""
    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.first()["embedding"])
    path = os.path.join(tmp_dir, "idx")
    materialize_sq_ivf(emb, "embedding", "vec_id", path, n_clusters=4)
    assert sq_ivf_topk_indexed(spark, path, q, k=3, nprobe=2).count() == 3
    os.remove(os.path.join(path, "_ROUTER.json"))
    with pytest.raises(ValueError, match="uncommitted"):
        sq_ivf_topk_indexed(spark, path, q, k=3, nprobe=2)


def test_sq_ivf_append_serves_like_rebuild(spark, tmp_dir):
    """sq_ivf_append assigns the new batch against the FROZEN persisted
    router and appends codes into the cell directories — serving the
    grown index must equal in-query sq_ivf_topk over the union with the
    same router geometry... which a rebuild can't give (it would retrain
    on the union), so the honest check is: append(half2) onto
    index(half1) ≡ an index built from half1's router applied to both
    halves = every half2 vector present, scored identically to its
    standalone quantization."""
    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_append,
        sq_ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    h1, h2 = emb.where(F.col("vec_id") <= mid), emb.where(F.col("vec_id") > mid)
    q = list(emb.first()["embedding"])
    path = os.path.join(tmp_dir, "idx")
    materialize_sq_ivf(h1, "embedding", "vec_id", path, n_clusters=4)
    before = {r["vec_id"] for r in
              sq_ivf_topk_indexed(spark, path, q, k=50, nprobe=4).collect()}
    sq_ivf_append(h2, "embedding", "vec_id", path)
    after = sq_ivf_topk_indexed(spark, path, q, k=10**6, nprobe=4)
    got = {r["vec_id"]: r["score"] for r in after.collect()}
    # with all cells probed, EVERY vector of both halves is served
    assert set(got) == {r["vec_id"] for r in emb.collect()}
    assert before <= set(got)
    # appended vectors score exactly as their standalone SQ quantization
    from gluestick_spark.llm.similarity import sq_topk

    direct = {r["vec_id"]: r["score"]
              for r in sq_topk(h2, "embedding", "vec_id", q, k=10**6).collect()}
    assert all(got[v] == s for v, s in direct.items())
    # appending to a torn index refuses loudly
    os.remove(os.path.join(path, "_ROUTER.json"))
    with pytest.raises(ValueError, match="uncommitted"):
        sq_ivf_append(h2, "embedding", "vec_id", path)


def test_sq_ivf_index_empty_corpus(spark, tmp_dir):
    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_topk_indexed,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where(F.lit(False))
    path = os.path.join(tmp_dir, "idx")
    materialize_sq_ivf(emb, "embedding", "vec_id", path, n_clusters=4)
    out = sq_ivf_topk_indexed(spark, path, [0.1, 0.2], k=3, nprobe=2)
    assert out.count() == 0
    assert out.columns == ["vec_id", "score"]


# --------------------------------------------- corr_matrix width split ----


def _wide_frame(spark, p, rows=500):
    return spark.range(rows).select(
        *[
            ((F.col("id") * (k + 3)) % (17 + k)).cast("double").alias(f"c{k}")
            for k in range(p - 1)
        ],
        F.lit(7.0).alias("const"),
    )


def test_correlation_matrix_split_matches_single_aggregate(spark):
    """VERDICT r8 task 7 (equivalence half): at a width the single
    aggregate still handles (p=20, 210 terms), forcing the chunked path
    must produce EXACTLY the same results — same moment math, same
    driver-side division, NULL for the constant column."""
    from gluestick_spark.operators.profile import correlation_matrix

    p = 20
    df = _wide_frame(spark, p)
    cols = [f"c{k}" for k in range(p - 1)] + ["const"]
    single = correlation_matrix(df, cols, max_agg_terms=10**6).collect()
    split = correlation_matrix(df, cols, max_agg_terms=40).collect()
    assert len(single) == len(split) == p * (p - 1) // 2
    sm = {(r["col_a"], r["col_b"]): r["corr"] for r in single}
    pm = {(r["col_a"], r["col_b"]): r["corr"] for r in split}
    assert sm == pm
    assert all(v is None for (a, b), v in sm.items() if "const" in (a, b))


def test_correlation_matrix_p64_survives_via_split(spark):
    """VERDICT r8 task 7 (guard half): p=64 is 2080 aggregate terms — a
    single aggregate at that width killed the JVM in this very test
    suite's first draft. The default max_agg_terms must route it through
    the chunked path and the values must match numpy's corrcoef."""
    from gluestick_spark.operators.profile import correlation_matrix

    p = 64
    df = _wide_frame(spark, p, rows=300)
    cols = [f"c{k}" for k in range(p - 1)] + ["const"]
    out = correlation_matrix(df, cols).collect()  # default guard
    assert len(out) == p * (p - 1) // 2

    import numpy as np

    mat = np.array(
        [[((i * (k + 3)) % (17 + k)) for k in range(p - 1)] for i in range(300)],
        dtype="float64",
    )
    ref = np.corrcoef(mat, rowvar=False)
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in out}
    idx = {f"c{k}": k for k in range(p - 1)}
    for (a, b), v in got.items():
        if "const" in (a, b):
            assert v is None
        else:
            assert abs(v - ref[idx[a], idx[b]]) < 1e-9, (a, b, v)


# -------------------------------------------- substring overlap spans -----


def _spanset(out):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in out.collect()
    }


def test_substring_spans_exact_boundaries(spark):
    """Two docs share a 12-token passage at different offsets; with k=8
    the 5 overlapping window hits per doc must merge into ONE maximal
    span with exact [start, end) — the suffix-array guarantee the
    rolling-window + merge composition must reproduce."""
    from gluestick_spark.llm.spans import substring_overlap_spans

    shared = " ".join(f"s{i}" for i in range(12))
    a = "a0 a1 a2 " + shared + " a3 a4"          # span at tokens [3, 15)
    b = shared + " b0 b1 b2 b3 b4 b5 b6 b7 b8"   # span at tokens [0, 12)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = substring_overlap_spans(df, "doc_id", "text", k=8)
    assert _spanset(out) == {(1, 3, 15, 12), (2, 0, 12, 12)}


def test_substring_spans_cross_doc_only(spark):
    """A passage repeated INSIDE one document but never in another must
    produce no spans — this operator is the cross-document variant."""
    from gluestick_spark.llm.spans import substring_overlap_spans

    rep = " ".join(f"r{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, rep + " mid " + rep), (2, "totally different words here entirely " * 3)],
        "doc_id long, text string",
    )
    out = substring_overlap_spans(df, "doc_id", "text", k=8)
    assert out.count() == 0


def test_substring_spans_disjoint_spans_stay_separate(spark):
    """Two shared passages separated by unshared tokens must come back
    as TWO spans, not one merged blob."""
    from gluestick_spark.llm.spans import substring_overlap_spans

    p1 = " ".join(f"p{i}" for i in range(9))
    p2 = " ".join(f"q{i}" for i in range(9))
    df = spark.createDataFrame(
        [
            (1, p1 + " x1 x2 x3 " + p2),
            (2, p1 + " y1 y2 y3 y4 " + p2),
        ],
        "doc_id long, text string",
    )
    out = substring_overlap_spans(df, "doc_id", "text", k=8)
    spans = _spanset(out)
    assert {(d, e - s) for d, s, e, _ in spans} == {(1, 9), (2, 9)}
    assert len(spans) == 4  # two per doc


def test_substring_spans_cap_drops_pathological_gram(spark):
    """A gram above max_occurrences is dropped LOUDLY from detection
    (stated contract): with the boilerplate in every doc and a cap below
    its frequency, no spans come back; raising the cap finds them."""
    from gluestick_spark.llm.spans import substring_overlap_spans

    boiler = " ".join(f"b{i}" for i in range(8))
    df = spark.createDataFrame(
        [(i, f"u{i} " + boiler + f" v{i}") for i in range(10)],
        "doc_id long, text string",
    )
    capped = substring_overlap_spans(df, "doc_id", "text", k=8, max_occurrences=5)
    assert capped.count() == 0
    uncapped = substring_overlap_spans(df, "doc_id", "text", k=8, max_occurrences=64)
    assert uncapped.count() == 10  # the boiler span in every doc


def test_substring_index_decontamination(spark, tmp_dir):
    """Cross-corpus exact-substring check: a new doc embedding a
    reference passage is flagged with exact span boundaries; clean docs
    are not; a torn index refuses loudly; append extends coverage in
    O(batch)."""
    from gluestick_spark.llm.spans import (
        materialize_substring_index,
        substring_spans_against,
    )

    bench_text = " ".join(f"eval{i}" for i in range(12))
    ref = spark.createDataFrame(
        [(100, "r0 r1 " + bench_text + " r2")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (1, "n0 n1 n2 " + bench_text + " n3"),  # contaminated: [3, 15)
            (2, "completely original new words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    path = os.path.join(tmp_dir, "ssidx")
    materialize_substring_index(ref, "doc_id", "text", path, k=8)
    out = _spanset(substring_spans_against(spark, new, path, "doc_id", "text"))
    assert out == {(1, 3, 15, 12)}
    # append a second reference batch; doc 2's text now contaminates
    ref2 = spark.createDataFrame(
        [(101, "completely original new words here nothing shared at all")],
        "doc_id long, text string",
    )
    materialize_substring_index(ref2, "doc_id", "text", path, k=8, mode="append")
    out2 = _spanset(substring_spans_against(spark, new, path, "doc_id", "text"))
    assert (2, 0, 9, 9) in out2 and (1, 3, 15, 12) in out2
    os.remove(os.path.join(path, "_INDEX_COMMIT"))
    with pytest.raises(ValueError, match="uncommitted"):
        substring_spans_against(spark, new, path, "doc_id", "text")


def test_substring_dedup_keeps_first_occurrence_only(spark):
    """Lee et al. removal: the corpus-first occurrence (min (doc, start)
    per span string) keeps the passage; every other occurrence is cut;
    span-free docs pass through untouched."""
    from gluestick_spark.llm.spans import substring_dedup

    shared = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, "a0 a1 " + shared + " a2"),
            (2, shared + " b0 b1 b2 b3 b4 b5 b6"),
            (3, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(df, k=8).collect()}
    # doc 1 wins (smallest doc id) and keeps the passage
    assert out[1]["text_clean"] == "a0 a1 " + shared + " a2"
    assert out[1]["n_removed"] == 0
    # doc 2 loses its copy
    assert out[2]["text_clean"] == "b0 b1 b2 b3 b4 b5 b6"
    assert out[2]["n_removed"] == 10
    # untouched doc
    assert out[3]["n_removed"] == 0 and out[3]["text_clean"].startswith("c0")
    assert {r["n_tokens"] for r in out.values()} == {13, 17, 10}


# ----------------------------------------------- classifier scoring -------


def test_classifier_score_strategies_identical(spark):
    """literal (zero-shuffle fold) and join (broadcast weight table) are
    physical strategies over the same math — identical scores, including
    the bias fallback for a gram-less document."""
    from gluestick_spark.llm.classifier import classifier_score

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "lorem ipsum dolor sit amet"),
            (3, "the the the"),
            (4, "   "),  # no grams -> bias
            (5, "single"),  # unigram only, no bigrams
        ],
        "id long, text string",
    )
    w = [((b * 13) % 9 - 4) / 4.0 for b in range(32)]
    lit = classifier_score(d, "text", w, bias=0.25, assign="literal")
    jn = classifier_score(d, "text", w, bias=0.25, assign="join", id_col="id")
    lm = {r["id"]: r["clf_score"] for r in lit.collect()}
    jm = {r["id"]: r["clf_score"] for r in jn.collect()}
    assert lm == jm
    assert lm[4] == 0.25
    # literal path is shuffle-free
    plan = lit._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_classifier_score_monotone_in_weights(spark):
    """A document whose grams all land on positively-weighted buckets
    scores higher than one on negatively-weighted buckets — sanity that
    the gather indexes the right buckets."""
    from gluestick_spark.llm.classifier import classifier_score, hashed_ngrams_expr

    d = spark.createDataFrame([(1, "alpha beta gamma")], "id long, text string")
    buckets = d.select(
        F.explode(hashed_ngrams_expr(F.col("text"), 16)).alias("b")
    ).collect()
    hot = {r["b"] for r in buckets}
    w_pos = [1.0 if b in hot else -1.0 for b in range(16)]
    w_neg = [-1.0 if b in hot else 1.0 for b in range(16)]
    sp = classifier_score(d, "text", w_pos).first()["clf_score"]
    sn = classifier_score(d, "text", w_neg).first()["clf_score"]
    assert sp == 1.0 and sn == -1.0


# ------------------------------------- streaming url-dedup replay tag -----


def test_streaming_url_dedup_output_tagged_and_replay_dedupable(spark, tmp_dir):
    """ADVICE r8 (low): emitted rows carry __batch_id__, so an
    at-least-once replay (crash between the out_dir append and the state
    append) produces byte-identical duplicate rows that a distinct-on-
    read collapses — read_streaming_dedup_output is that read."""
    from gluestick_spark.streaming.pipeline import (
        read_streaming_dedup_output,
        stream_from_directory,
        streaming_url_dedup,
    )

    d = spark.createDataFrame(
        [(i, f"https://ex{i % 5}.com/p?utm_source=x&id={i % 5}") for i in range(20)],
        "doc_id long, url string",
    )
    stage = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    state = os.path.join(tmp_dir, "state")
    ckpt = os.path.join(tmp_dir, "ckpt")
    d.coalesce(1).write.mode("append").parquet(stage)
    q = streaming_url_dedup(
        stream_from_directory(spark, stage, d.schema),
        "url", "doc_id", state, out, ckpt,
    )
    q.awaitTermination()
    raw = spark.read.parquet(out)
    assert "__batch_id__" in raw.columns
    n = raw.count()
    assert n == 5
    # simulate the replay-duplicate window: the same batch's emitted rows
    # appended a second time with the SAME batch id
    raw.write.mode("append").parquet(out)
    assert spark.read.parquet(out).count() == 2 * n
    clean = read_streaming_dedup_output(spark, out)
    assert clean.count() == n
    assert "__batch_id__" not in clean.columns
