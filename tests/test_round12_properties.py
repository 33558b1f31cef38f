"""Property tests for the round-12 operators: Spark implementations vs
independent brute-force Python references on random small corpora."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures inside @given bodies;
    # the session is process-wide anyway (the round-10 device)
    return spark


def _unimax_brute(caps: dict, budget: int) -> dict:
    """The paper's greedy loop (ascending by cap): fully allocate a
    source when its cap fits under the equal share of the remaining
    budget, then spread what's left uniformly with the remainder going
    to the smallest-(cap, group) uncapped sources. Exact integers —
    the documented contract of unimax_sample's closed form."""
    order = sorted(caps, key=lambda g: (caps[g], g))
    budget_left, quotas, remaining = budget, {}, order[:]
    while remaining:
        g = remaining[0]
        if caps[g] * len(remaining) <= budget_left:
            quotas[g] = caps[g]
            budget_left -= caps[g]
            remaining.pop(0)
        else:
            break
    if remaining:
        base, rem = divmod(budget_left, len(remaining))
        for idx, g in enumerate(remaining):
            quotas[g] = base + (1 if idx < rem else 0)
    return quotas


_groups = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None)
@given(
    _groups,
    st.integers(min_value=0, max_value=500),
    st.sampled_from([0.5, 1.0, 2.0, 3.5]),
)
def test_unimax_matches_bruteforce(spark_session_holder, sizes, budget, epochs):
    spark = spark_session_holder
    from gluestick_spark.llm.sampling import unimax_sample

    rows = [
        (f"g{gi}", gi * 1000 + i)
        for gi, n in enumerate(sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "src string, k long")
    out = unimax_sample(df, "src", "k", budget=budget, max_epochs=epochs)
    got = {r["src"]: r["cnt"] for r in out.groupBy("src").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    caps = {f"g{gi}": math.floor(n * epochs) for gi, n in enumerate(sizes)}
    want = {g: q for g, q in _unimax_brute(caps, budget).items() if q > 0}
    assert got == want, (sizes, budget, epochs, got, want)
    # invariants from the paper: never exceed the cap; total is exactly
    # min(budget, sum of caps); uncapped quotas uniform to within 1
    assert all(got.get(g, 0) <= caps[g] for g in caps)
    assert sum(got.values()) == min(budget, sum(caps.values()))
    uncapped = [q for g, q in got.items() if q < caps[g]]
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1
    # epoch tags: a row appears once per epoch 0..e-1, no gaps
    eps = out.groupBy("src", "k").agg(
        __import__("pyspark.sql.functions", fromlist=["collect_list"])
        .collect_list("epoch").alias("es")
    ).collect()
    for r in eps:
        assert sorted(r["es"]) == list(range(len(r["es"])))


def test_unimax_partition_invariance(spark_session_holder):
    spark = spark_session_holder
    from gluestick_spark.llm.sampling import unimax_sample

    rows = [(f"g{gi}", gi * 1000 + i) for gi in range(5) for i in range(20 + gi * 7)]
    df = spark.createDataFrame(rows, "src string, k long")
    a = sorted(
        map(tuple, unimax_sample(df, "src", "k", 90, 1.5).collect())
    )
    b = sorted(
        map(tuple, unimax_sample(df.repartition(13), "src", "k", 90, 1.5).collect())
    )
    assert a == b


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=25),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=2000),
    st.sampled_from([0.5, 1.0, 2.0]),
)
def test_unimax_weighted_matches_bruteforce(
    spark_session_holder, group_weights, budget, epochs
):
    """weight_col mode: allocation water-fills on weight sums; the
    fractional epoch is the greedy hash-rank prefix within the weight
    remainder — per group, delivered weight matches an independent
    brute force exactly and sits within one document's weight of quota."""
    import hashlib
    import math

    spark = spark_session_holder
    from pyspark.sql import functions as F

    from gluestick_spark.llm.sampling import unimax_sample

    rows = [
        (f"g{gi}", gi * 1000 + i, w)
        for gi, ws in enumerate(group_weights)
        for i, w in enumerate(ws)
    ]
    df = spark.createDataFrame(rows, "src string, k long, w long")
    out = unimax_sample(
        df, "src", "k", budget=budget, max_epochs=epochs, weight_col="w"
    )
    got = {
        r["src"]: r["tw"]
        for r in out.groupBy("src").agg(F.sum("w").alias("tw")).collect()
    }
    wsum = {f"g{gi}": sum(ws) for gi, ws in enumerate(group_weights)}
    caps = {g: math.floor(w * epochs) for g, w in wsum.items()}
    quotas = _unimax_brute(caps, budget)

    def khash(k):
        return int(hashlib.md5((str(k) + "\x1f").encode()).hexdigest()[:15], 16)

    want = {}
    for gi, ws in enumerate(group_weights):
        g = f"g{gi}"
        if wsum[g] == 0 or quotas.get(g, 0) <= 0:
            continue
        full, rem = divmod(quotas[g], wsum[g])
        docs = sorted(
            (khash(gi * 1000 + i), gi * 1000 + i, w) for i, w in enumerate(ws)
        )
        tot, cum = full * wsum[g], 0
        for _, _, w in docs:
            cum += w
            if cum <= rem:
                tot += w
            else:
                break
        if tot > 0 or full > 0 or rem > 0:
            want[g] = tot
    # compare only groups that produced rows; a group whose greedy
    # prefix is empty and full=0 emits nothing
    want = {g: t for g, t in want.items() if g in got or t > 0}
    got = {g: t for g, t in got.items()}
    for g in set(got) | set(want):
        assert got.get(g, 0) == want.get(g, 0), (g, got, want, quotas)
        if g in got and wsum[g] > 0:
            maxw = max(ws for ws in group_weights[int(g[1:])])
            assert quotas[g] - maxw < got[g] <= quotas[g] or got[g] == quotas[g]
