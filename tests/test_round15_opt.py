"""Round-15 optimization pins: the Arrow gram kernel that replaced
semdedup's pairwise join must reproduce the join form's semantics
exactly — the null/ragged-vector null-dot behavior (zip_with pads the
shorter array with null, so such pairs never match), the strict-id
leader rule, and exactness past int64 (where the join form would have
raised under ANSI, the kernel computes with Python ints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gluestick_spark import get_spark
from gluestick_spark.llm.cluster import _semdedup_verdicts, semdedup


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-r15-opt")


def _pts(spark, rows):
    """(id, q, cid) -> the pts frame the kernel consumes; xx = q·q or
    NULL exactly as int_dot_expr computes it (null element -> null)."""
    def xx(q):
        if q is None or any(v is None for v in q):
            return None
        return sum(v * v for v in q)

    return spark.createDataFrame(
        [(i, q, xx(q), c) for i, q, c in rows],
        "__id__ long, __q__ array<long>, __xx__ long, cid int",
    )


def test_kernel_null_ragged_and_leader_rule(spark):
    rows = [
        (1, [1000, 0, 0], 0),
        (2, [1000, 0, 0], 0),    # dup of 1 (earlier id) -> dropped
        (3, [1000, 0], 0),       # shorter: never matches 3-dim rows
        (4, [1000, 0], 0),       # dup of 3 -> dropped
        (5, None, 0),            # null vector: inert
        (6, [1000, None, 0], 0), # null element: inert
        (7, [0, 1000, 0], 0),    # orthogonal: kept
        (8, [1000, 0, 0], 1),    # other cluster: its own leader, kept
    ]
    got = {
        r["__id__"]: r["keep"]
        for r in _semdedup_verdicts(
            _pts(spark, rows), num=81, den=100, within=True
        ).collect()
    }
    assert got == {
        1: True, 2: False, 3: True, 4: False,
        5: True, 6: True, 7: True, 8: True,
    }


def test_kernel_against_sides(spark):
    # side 0 = reference (id NULL, never emitted), side 1 = corpus
    both = spark.createDataFrame(
        [
            (None, [1000, 0], 1000000, 0, 0),   # ref anchor
            (None, None, None, 0, 0),           # null ref: matches nothing
            (1, [1000, 10], 1000100, 0, 1),     # near anchor -> dropped
            (2, [0, 1000], 1000000, 0, 1),      # orthogonal -> kept
            (3, None, None, 0, 1),              # null corpus row: kept
            (4, [1000, 0], 1000000, 1, 1),      # cluster with no ref -> kept
        ],
        "__id__ long, __q__ array<long>, __xx__ long, cid int, __side__ int",
    )
    got = {
        r["__id__"]: r["keep"]
        for r in _semdedup_verdicts(both, num=81, den=100, within=False).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_kernel_object_fallback_past_int64(spark):
    # magnitudes where den·dot² overflows int64: the kernel must fall
    # back to exact Python-int arithmetic (the join form would raise
    # under ANSI) and still decide the near-duplicate correctly —
    # end-to-end through semdedup (clean vectors, so kmeans trains fine)
    big = 2.0e4  # q = 2e7 after scale=1000 -> xx ~ 1.2e15, den*xx^2 ~ 1e32
    rows = [
        (1, [big, big, big]),
        (2, [big, big, big]),          # exact dup of 1 -> dropped
        (3, [big, -big, 0.0]),         # far from 1 -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["keep"]
        for r in semdedup(
            df, "embedding", "vec_id", k=1, iters=0, threshold=0.9
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}


def test_kernel_empty_input_schema(spark):
    empty = _pts(spark, []).where(F.lit(False))
    out = _semdedup_verdicts(empty, num=81, den=100, within=True)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["__id__", "cid", "keep"]


def test_rrf_leg_truncation_bounds_the_rank_window(spark):
    """rrf_fuse(leg_k=) on a single-query leg must (a) keep the exact
    fused result of rank-then-filter — including ties straddling the
    truncation boundary, where (score, id) total order decides — and
    (b) k-bound the rank window structurally: the physical plan takes
    the leg's top-leg_k rows (TakeOrderedAndProject) BELOW the window,
    never sorting the whole leg in one partition."""
    from gluestick_spark.llm.retrieval import rrf_fuse

    # 100-row leg; scores collide in coarse buckets so the boundary rank
    # (leg_k=7 below) falls inside a tie group decided by id asc
    leg = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(100)], "doc_id long, s double"
    )
    out = rrf_fuse([(leg, "s", False)], "doc_id", k_const=60, leg_k=7)
    got = {r["doc_id"]: r["rrf_score"] for r in out.collect()}
    # hand ranks: s desc, id asc — the whole top-7 sits inside the
    # 20-member s=4.0 tie group (ids 4, 9, 14, …), decided by id asc
    c = lambda r: 10**9 // (60 + r)  # noqa: E731
    assert got == {4 + 5 * j: c(j + 1) for j in range(7)}
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    # without leg_k the full ranking is demanded -> no truncation node
    full = rrf_fuse([(leg, "s", False)], "doc_id", k_const=60)
    fplan = full._sc._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" not in fplan


def test_minhash_verify_shingles_survivor_docs_once(spark):
    """The exact-Jaccard verify computes shingle sets once per candidate
    DOCUMENT per side (corpus semi-joined to the pinned pair ids) —
    never per pair occurrence (unbounded on dup-heavy corpora: the 10x
    replica probe measured 48 s vs 12 s) and never over every corpus
    document. Pins: (a) the candidate chain is pinned (ExistingRDD in
    the final plan, so the signature/bucket stages run once for the two
    semi-joins + pair join); (b) exactly TWO shingle computations (one
    per side) appear in the final plan — the shingle expression's
    'concat_ws( , slice(' spine is its stable fingerprint; (c) results
    equal brute force on a dup-heavy fixture."""
    from itertools import combinations

    from gluestick_spark.llm.dedup import minhash_near_dup_pairs
    from gluestick_spark.llm.text import shingles_expr
    from pyspark.sql import functions as F

    rows = [(i, f"the quick brown fox jumps over the lazy dog rep{i % 3}")
            for i in range(12)] + [(100, "an entirely different document "
            "about spark shuffles and joins at scale")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_near_dup_pairs(df, "text", "doc_id", threshold=0.7)
    got = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    # brute force over all pairs with the same shingle/jaccard exprs
    sh = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", F.array_distinct(shingles_expr(F.col("text"), 3)).alias("sh")
        ).collect()
    }
    def jac(a, b):
        sa, sb = set(sh[a]), set(sh[b])
        return len(sa & sb) / len(sa | sb) if sa | sb else 0.0
    want = {
        (a, b): jac(a, b)
        for a, b in combinations(sorted(sh), 2)
        if jac(a, b) >= 0.7
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    # AQE prints the final AND the initial plan; count in the final only
    plan = plan.split("== Initial Plan ==")[0]
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert plan.count("concat_ws( , slice(") == 2
