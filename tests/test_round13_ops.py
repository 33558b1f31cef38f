"""Round-13 regression tests: ADVICE-r12 closures (empty-sketch KMV
Jaccard, duplicate-id novelty parity) and the round's new operators."""

import pytest
from pyspark.sql import functions as F




# ---------------- ADVICE 1: kmv_jaccard empty sketch frames -------------


def test_kmv_jaccard_empty_sketch_frames(spark):
    """A 0-ROW sketch frame (grouped kmv_sketch over empty input emits
    no rows) must still yield the documented (0, 0, NULL) — the left
    join from range(1) keeps the comparison total where the old
    crossJoin dropped the default row."""
    from gluestick_spark.llm.decontam import kmv_jaccard_from_sketches
    from gluestick_spark.llm.sketch import kmv_sketch

    empty = spark.createDataFrame([], "t string, g string")
    # GROUPED sketch over empty input: zero rows
    sa0 = kmv_sketch(empty, "g", 16, ["t"]).select(F.col("kmv").alias("__ka__"))
    assert sa0.count() == 0
    full = kmv_sketch(
        spark.createDataFrame([("x",), ("y",)], "g string"), "g", 16
    ).select(F.col("kmv").alias("__kb__"))

    for a, b in [(sa0, full), (full.toDF("__ka__"), sa0.toDF("__kb__")),
                 (sa0, sa0.toDF("__kb__"))]:
        row = kmv_jaccard_from_sketches(spark, a, b, 16).first()
        if a is sa0 and b.columns == ["__kb__"] and b is not full:
            assert (row["k_used"], row["n_shared"]) == (0, 0)
            assert row["jaccard_est_ppm"] is None
        else:
            assert row is not None  # comparison stays total, 1 row

    # both empty: the documented (0, 0, NULL)
    row = kmv_jaccard_from_sketches(
        spark, sa0, sa0.toDF("__kb__"), 16
    ).first()
    assert (row["k_used"], row["n_shared"], row["jaccard_est_ppm"]) == (
        0,
        0,
        None,
    )


# ---------------- ADVICE 2: novelty duplicate-id parity ------------------


def test_novelty_scores_duplicate_ids_paths_agree(spark):
    """Rows sharing an id combine identically on the bloom and exact
    paths: one output row per distinct id, counts summed over the
    duplicate rows (the old bloom path computed per-ROW totals against
    a per-ID seen count — n_novel could go negative)."""
    from gluestick_spark.llm.decontam import novelty_scores

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),  # duplicate id 1
            (2, "zeta eta theta iota"),
            (3, "xx"),  # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )

    exact = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in novelty_scores(
            corpus, ref, "text", "doc_id", n=3, bloom_m_bits=None
        ).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in novelty_scores(
            corpus, ref, "text", "doc_id", n=3, bloom_m_bits=1 << 16
        ).collect()
    }
    assert exact == bloom
    assert set(exact) == {1, 2, 3}  # ID grain: one row per distinct id
    # id 1: rows combine — 2+2=4 grams, "beta gamma epsilon" is novel
    assert exact[1][0] == 4 and exact[1][1] == 1
    assert exact[2] == (2, 2, 1_000_000)  # fully novel
    assert exact[3] == (0, 0, None)  # too short: 0 grams, NULL novelty
    # n_novel never negative (the old bloom-path failure mode)
    assert all(v[1] >= 0 for v in bloom.values())


# ---------------- VERDICT 2: bloom pre-filter auto gate ------------------


def test_bloom_auto_gate(spark, tmp_dir):
    """The 'auto' default builds the Bloom pre-filter only when the
    reference exceeds the broadcast threshold (Catalyst's own size
    statistic) — a broadcastable reference takes the plain exact join,
    reclaiming the r12 bench overhead on contamination/novelty/overlap."""
    import os

    from gluestick_spark.llm.bloom import should_prefilter
    from gluestick_spark.llm.decontam import novelty_scores

    # file-backed reference: Catalyst reports real (file-size-based)
    # statistics; an in-memory LogicalRDD reports the unknown sentinel
    # and conservatively keeps the filter ON (also asserted below)
    p = os.path.join(tmp_dir, "ref.parquet")
    spark.createDataFrame([("alpha beta gamma",)], "text string").write.parquet(p)
    small = spark.read.parquet(p)
    assert should_prefilter(small) is False  # KBs vs default threshold
    assert should_prefilter(small, threshold_bytes=0) is True
    assert should_prefilter(small, threshold_bytes=-1) is True  # bcast off
    # unknown statistics (LogicalRDD sentinel) → conservative ON
    unknown = spark.createDataFrame([("alpha beta gamma",)], "text string")
    assert should_prefilter(unknown) is True

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )

    def n_joins(df):
        return (
            df._jdf.queryExecution().executedPlan().toString()
        ).count("BroadcastHashJoin")

    auto = novelty_scores(corpus, small, "text", "doc_id", n=2)
    forced = novelty_scores(
        corpus, small, "text", "doc_id", n=2, bloom_m_bits=1 << 16
    )
    # auto → exact path (no k probe joins); forced → k=3 extra joins
    assert n_joins(forced) >= n_joins(auto) + 3
    # same answer either way (the bit-identical contract)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, forced.collect())
    )
