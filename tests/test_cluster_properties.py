"""Property-based invariants for the cluster/PQ determinism contract.

The DuckDB oracles in __spark_entry__.py prove Spark ≡ DuckDB on the
testdata; these properties prove Spark ≡ a direct Python replay of the
documented integer algebra on randomized inputs — closing the triangle
(any engine disagreement would implicate the spec, not the data).

Few examples, deadline off: each example runs Spark jobs.
"""

from __future__ import annotations

from math import floor

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gluestick_spark.llm.cluster import kmeans, quantize_vec_expr

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_component = st.floats(
    min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
)


@given(
    vecs=st.lists(
        st.lists(_component, min_size=3, max_size=3), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_quantize_matches_python_floor_half_up(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    got = {
        r["id"]: list(r["q"])
        for r in df.select("id", quantize_vec_expr(F.col("v")).alias("q")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == [floor(x * 1000 + 0.5) for x in v]


def _py_kmeans_assign(rows, seeds):
    """Direct Python replay of the documented assignment algebra:
    exact-int numerator, round-then-divide double, ties to smallest cid."""
    out = {}
    for rid, q in rows:
        xx = sum(v * v for v in q)
        best = None
        for cid, (s, n) in enumerate(seeds):
            num = n * n * xx - 2 * n * sum(a * b for a, b in zip(q, s)) + sum(
                v * v for v in s
            )
            d = float(num) / float(n * n)
            if best is None or (d, cid) < best:
                best = (d, cid)
        out[rid] = best[1]
    return out


@given(
    vecs=st.lists(
        st.lists(_component, min_size=2, max_size=2), min_size=2, max_size=10
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_kmeans_seed_assignment_matches_python_replay(spark, vecs, k):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    out, state = kmeans(df, "v", "id", k=k, iters=0, return_state=True)
    got = {r["id"]: r["cid"] for r in out.collect()}
    qrows = [
        (i, [floor(x * 1000 + 0.5) for x in v]) for i, v in enumerate(vecs)
    ]
    assert got == _py_kmeans_assign(qrows, state)


@given(
    vecs=st.lists(
        st.lists(_component, min_size=2, max_size=2), min_size=2, max_size=8
    )
)
@settings(**_SETTINGS)
def test_kmeans_literal_join_equivalence_random(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    a = sorted(
        (r["id"], r["cid"])
        for r in kmeans(df, "v", "id", k=2, iters=1, assign="literal").collect()
    )
    b = sorted(
        (r["id"], r["cid"])
        for r in kmeans(df, "v", "id", k=2, iters=1, assign="join").collect()
    )
    assert a == b


def test_pq_distance_matches_manual_lookup(spark):
    """pq_topk's pq_dist equals a Python table-lookup over encode_pq's
    codes — the ADC contract, end to end."""
    from gluestick_spark.llm.pq import adc_table, encode_pq, pq_topk, train_pq

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq(vecs, "embedding", "vec_id", m=4, k=4, iters=1)
    q = [0.05 * ((i % 9) - 4) for i in range(64)]
    tab = adc_table(q, books)
    codes = {
        r["vec_id"]: list(r["code"])
        for r in encode_pq(vecs, "embedding", "vec_id", books).collect()
    }
    top = pq_topk(vecs, "embedding", "vec_id", q, books, k=15).collect()
    for r in top:
        expect = sum(tab[j][c] for j, c in enumerate(codes[r["vec_id"]]))
        assert r["pq_dist"] == expect
