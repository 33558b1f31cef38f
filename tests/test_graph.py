"""operators/graph.py — deterministic PageRank unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gluestick_spark.operators.graph import pagerank

R0 = 10**9


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_zero_iters_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=0).collect()}
    assert got == {"a": R0, "b": R0, "c": R0}


def test_one_iter_hand_computed(spark):
    # a -> b, a -> c, b -> c.  outdeg: a=2, b=1.
    # flow(a each) = floor(85e9 / 200) = 425_000_000
    # flow(b)      = floor(85e9 / 100) = 850_000_000
    # base = 150_000_000
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=1).collect()}
    assert got == {
        "a": 150_000_000,  # no in-edges: base only (dangling mass dropped)
        "b": 150_000_000 + 425_000_000,
        "c": 150_000_000 + 425_000_000 + 850_000_000,
    }


def test_duplicate_edges_collapse(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "b")])
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=1).collect()}
    # simple graph: one edge a->b, outdeg(a)=1
    assert got["b"] == 150_000_000 + 850_000_000


def test_symmetric_pair_converges_symmetric(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    assert got["a"] == got["b"]


def test_null_edges_dropped(spark):
    e = _edges(spark, [("a", "b"), (None, "z"), ("z", None)])
    nodes = {r["node"] for r in pagerank(e, iters=1).collect()}
    assert nodes == {"a", "b"}


def test_validates_args(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping_pct=101)


def test_partition_invariance(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw = (
        ev.groupBy("user_id", "event_type")
        .count()
        .where(F.col("count") >= 2)
        .select(
            F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        )
    )
    edges = raw.unionAll(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    a = sorted((r["node"], r["rank"]) for r in pagerank(edges, iters=2).collect())
    b = sorted(
        (r["node"], r["rank"])
        for r in pagerank(edges.repartition(11, "dst"), iters=2).collect()
    )
    assert a == b and len(a) > 0


def test_total_mass_bounded(spark):
    # With damping 85 and no dangling redistribution, total mass can only
    # shrink or hold: sum(rank) <= N*r0 at every step.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    out = pagerank(e, iters=3)
    total = out.agg(F.sum("rank")).first()[0]
    assert total <= 3 * R0


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def test_triangle_hand_computed(spark):
    from gluestick_spark.operators.graph import triangle_count

    # K4 minus one edge: triangles {a,b,c} and {a,b,d}; edge c-d missing.
    e = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")],
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_dedup_and_direction_invariance(spark):
    from gluestick_spark.operators.graph import triangle_count

    # duplicated and reversed edges, plus a self-loop — same one triangle
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"), ("a", "a")],
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_free_graph_all_zero(spark):
    from gluestick_spark.operators.graph import triangle_count

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])  # path: no triangles
    got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_triangle_partition_invariance(spark):
    from pyspark.sql import functions as F
    from gluestick_spark.operators.graph import triangle_count

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "ok").where(F.col("src") < F.col("dst")).select("src", "dst")
    x = sorted((r["node"], r["n_triangles"]) for r in triangle_count(edges).collect())
    y = sorted(
        (r["node"], r["n_triangles"])
        for r in triangle_count(edges.repartition(9, "dst")).collect()
    )
    assert x == y and len(x) > 0


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------

def test_hits_hand_computed_one_iter(spark):
    from gluestick_spark.operators.graph import hits

    # u1 -> {a, b}, u2 -> {a}. After one iteration:
    #   raw authority: a = 2e6, b = 1e6 -> normalized a = 1e6, b = 5e5
    #   raw hub: u1 = 1e6 + 5e5, u2 = 1e6 -> normalized u1 = 1e6,
    #   u2 = floor(1e6*1e6/1.5e6) = 666_666
    e = _edges(spark, [("u1", "a"), ("u1", "b"), ("u2", "a")])
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(e, iters=1).collect()}
    assert got["a"] == (0, 10**6)
    assert got["b"] == (0, 500_000)
    assert got["u1"] == (10**6, 0)
    assert got["u2"] == (666_666, 0)


def test_hits_zero_iters_uniform(spark):
    from gluestick_spark.operators.graph import hits

    e = _edges(spark, [("a", "b")])
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(e, iters=0).collect()}
    assert got == {"a": (10**6, 10**6), "b": (10**6, 10**6)}


def test_hits_partition_invariance_and_range(spark):
    from pyspark.sql import functions as F
    from gluestick_spark.operators.graph import hits

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edges = (
        ev.groupBy("user_id", "event_type").count().where(F.col("count") >= 2)
        .select(
            F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        )
    )
    a = sorted(tuple(r) for r in hits(edges, iters=2).collect())
    b = sorted(tuple(r) for r in hits(edges.repartition(7, "src"), iters=2).collect())
    assert a == b and len(a) > 0
    assert all(0 <= h <= 10**6 and 0 <= au <= 10**6 for _, h, au in a)
    assert max(h for _, h, _au in a) == 10**6  # max-normalized


def test_hits_validates(spark):
    from gluestick_spark.operators.graph import hits

    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        hits(e, iters=-1)


def test_hits_no_global_window(spark):
    from gluestick_spark.operators.graph import hits

    e = _edges(spark, [("a", "b"), ("a", "c")])
    plan = hits(e, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # normalizations ride broadcast crossJoins
