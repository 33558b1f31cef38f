"""Property-based invariants for round-6 operators (hypothesis).

Few examples, deadline off: each example runs Spark jobs — the point is
randomized structural coverage, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=12),
    window=st.integers(min_value=10, max_value=120),
)
@settings(**_SETTINGS)
def test_suppress_duplicates_kept_rows_spaced_beyond_window(spark, gaps, window):
    """Any two consecutive KEPT rows of a key are > window apart: a kept
    row starts a burst, so its gap to its immediate predecessor — which
    is at or after the previous kept row — exceeds the window."""
    from gluestick_spark.operators.sessions import suppress_duplicates

    t = dt.datetime(2024, 1, 1)
    ts, rows = t, [(1, t, 0)]
    for i, g in enumerate(gaps, 1):
        ts = ts + dt.timedelta(seconds=g)
        rows.append((1, ts, i))
    df = spark.createDataFrame(rows, "k long, ts timestamp, seq long")
    kept = sorted(
        r.ts for r in suppress_duplicates(df, ["k"], "ts", float(window)).collect()
    )
    assert kept[0] == t  # first row always kept
    for a, b in zip(kept, kept[1:]):
        assert (b - a).total_seconds() > window


@given(
    t_keys=st.sets(st.integers(min_value=0, max_value=15), min_size=1, max_size=10),
    s_keys=st.sets(st.integers(min_value=0, max_value=15), min_size=1, max_size=10),
    del_mod=st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_merge_into_key_accounting(spark, t_keys, s_keys, del_mod):
    """Output keys = (target − matched-deleted) ∪ inserted source keys,
    each exactly once."""
    from gluestick_spark.operators.merge import merge_into

    target = spark.createDataFrame([(k, float(k)) for k in t_keys], "k long, v double")
    source = spark.createDataFrame(
        [(k, float(k) * 10) for k in s_keys], "k long, v double"
    )
    out = merge_into(
        target,
        source,
        "k",
        when_matched_update={"v": F.col("s.v")},
        when_matched_delete=F.col("t.k") % del_mod == 0,
        when_not_matched_insert=True,
    )
    got = sorted(r.k for r in out.collect())
    deleted = {k for k in t_keys & s_keys if k % del_mod == 0}
    want = sorted((t_keys - deleted) | (s_keys - t_keys))
    assert got == want
