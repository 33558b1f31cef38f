"""Round-6 batch 3: fuzzy join, CDC diff, quality-aware cluster dedup,
BPE pair counts, embedding quantization, ORC reader."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gluestick_spark.llm.dedup import cluster_dedup_by
from gluestick_spark.llm.fuzzy import edit_distance_pairs
from gluestick_spark.llm.similarity import dequantize_expr, quantize_embeddings
from gluestick_spark.llm.text import bpe_pair_counts
from gluestick_spark.operators.cdc import table_diff


# ----------------------------------------------------------- fuzzy join ----


def test_edit_distance_pairs_finds_typos(spark):
    df = spark.createDataFrame(
        [
            (1, "spark engine"),
            (2, "spark enginx"),  # dist 1 from id 1
            (3, "spark enginexx"),  # dist 2 from id 1 (longer, crosses bucket)
            (4, "completely different"),
        ],
        "id long, t string",
    )
    got = sorted(
        (r.a, r.b, r.dist) for r in edit_distance_pairs(df, "id", "t", 2).collect()
    )
    assert (1, 2, 1) in got
    assert (1, 3, 2) in got  # adjacent length bucket still collides
    assert all(a != 4 and b != 4 for a, b, _ in got)


def test_edit_distance_pairs_matches_bruteforce(spark):
    import itertools

    words = ["alpha", "alphb", "alphab", "beta", "betta", "gamma", "gamm", "gammaa"]
    df = spark.createDataFrame(list(enumerate(words)), "id long, t string")
    got = sorted(
        (r.a, r.b, r.dist) for r in edit_distance_pairs(df, "id", "t", 2).collect()
    )

    def lev(s, t):
        # textbook DP, small inputs only
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[len(t)]

    want = sorted(
        (i, j, lev(words[i], words[j]))
        for i, j in itertools.combinations(range(len(words)), 2)
        if lev(words[i], words[j]) <= 2
    )
    assert got == want


def test_edit_distance_pairs_uniform_length_bruteforce(spark):
    """Adversarial for the q-gram prefix filter: 120 DISTINCT strings of
    IDENTICAL length over a 3-letter alphabet (length blocking alone is
    useless — one bucket). Seeded deterministic corpus; any pair the
    prefix filter loses fails the brute-force comparison."""
    import itertools
    import random

    rng = random.Random(7)
    words = list({"".join(rng.choice("abc") for _ in range(8)) for _ in range(150)})[:120]
    df = spark.createDataFrame(list(enumerate(words)), "id long, t string")
    got = sorted(
        (r.a, r.b, r.dist) for r in edit_distance_pairs(df, "id", "t", 2).collect()
    )

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[len(t)]

    want = sorted(
        (i, j, lev(words[i], words[j]))
        for i, j in itertools.combinations(range(len(words)), 2)
        if lev(words[i], words[j]) <= 2
    )
    assert got == want
    assert len(want) > 0  # the corpus actually exercises the verify stage


def test_edit_distance_pairs_short_and_empty_strings(spark):
    # padding guarantees every string (the empty one included) carries a
    # prefix gram; ed("", "a") = 1 must be found
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "xy")], "id long, t string"
    )
    got = sorted(
        (r.a, r.b, r.dist) for r in edit_distance_pairs(df, "id", "t", 2).collect()
    )
    assert got == [(1, 2, 1), (1, 3, 2), (1, 4, 2), (2, 3, 1), (2, 4, 2), (3, 4, 2)]


def test_edit_distance_pairs_max_dist_zero_is_exact_groups(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "off")], "id long, t string"
    )
    got = [(r.a, r.b, r.dist) for r in edit_distance_pairs(df, "id", "t", 0).collect()]
    assert got == [(1, 2, 0)]


def test_edit_distance_pairs_block_cols(spark):
    df = spark.createDataFrame(
        [(1, "same", "en"), (2, "same", "de")], "id long, t string, lang string"
    )
    assert edit_distance_pairs(df, "id", "t", 2).count() == 1
    assert edit_distance_pairs(df, "id", "t", 2, block_cols=["lang"]).count() == 0


# ------------------------------------------------------------- cdc diff ----


def test_table_diff_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c2", 30.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    got = {r.k: r for r in table_diff(old, new, "k").collect()}
    assert set(got) == {1, 3, 4}  # k=2 unchanged -> absent
    assert got[1].change == "delete" and got[1].old_v == "a" and got[1].new_v is None
    assert got[3].change == "update" and (got[3].old_v, got[3].new_v) == ("c", "c2")
    assert got[4].change == "insert" and got[4].new_x == 40.0 and got[4].old_x is None


def test_table_diff_null_safe(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    same = spark.createDataFrame([(1, None)], "k long, v string")
    assert table_diff(old, same, "k").count() == 0  # NULL == NULL: unchanged
    changed = spark.createDataFrame([(1, "x")], "k long, v string")
    assert table_diff(old, changed, "k").collect()[0].change == "update"


# ------------------------------------------------- quality-aware dedup -----


def test_cluster_dedup_by_keeps_best_quality(spark):
    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")  # {1,2,3}
    kept = sorted(r.doc_id for r in cluster_dedup_by(df, pairs, "doc_id", "q").collect())
    assert kept == [2, 9]  # best-quality survivor + untouched singleton


def test_cluster_dedup_by_tiebreak_min_id(spark):
    df = spark.createDataFrame([(5, 1.0), (7, 1.0)], "doc_id long, q double")
    pairs = spark.createDataFrame([(5, 7)], "a long, b long")
    kept = [r.doc_id for r in cluster_dedup_by(df, pairs, "doc_id", "q").collect()]
    assert kept == [5]


# ------------------------------------------------------ bpe pair counts ----


def test_bpe_pair_counts_exact(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b",), ("solo",), (None,)], "text string"
    )
    got = {(r.left, r.right): r.n for r in bpe_pair_counts(spark.createDataFrame(
        [("a b a b c",), ("a b",), ("solo",), (None,)], "text string"
    ), "text").collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    top1 = bpe_pair_counts(df, "text", k=1).collect()
    assert [(r.left, r.right, r.n) for r in top1] == [("a", "b", 3)]


# ----------------------------------------------------------- quantizers ----


def test_quantize_embeddings_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings(df, "embedding", "vec_id")
    rows = {r.vec_id: r for r in q.collect()}
    assert rows[1].scale == 1.0 / 127.0
    assert list(rows[1].qvec) == [64, -127, 32]  # floor(x*127/1 + .5)
    assert rows[2].scale == 0.0 and list(rows[2].qvec) == [0, 0, 0]
    # reconstruction error ≤ scale/2 per component
    back = q.where(F.col("vec_id") == 1).select(
        dequantize_expr(F.col("qvec"), F.col("scale")).alias("r")
    ).collect()[0].r
    for orig, rec in zip([0.5, -1.0, 0.25], back):
        assert abs(orig - rec) <= rows[1].scale / 2 + 1e-12


# ------------------------------------------------------------ orc reader ----


def test_read_orc_folder_and_reader_get(spark, tmp_dir):
    from gluestick_spark.sources.reader import Reader, read_orc_folder

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    df.coalesce(1).write.orc(os.path.join(tmp_dir, "stage"))
    (part,) = [
        f for f in os.listdir(os.path.join(tmp_dir, "stage")) if f.endswith(".orc")
    ]
    os.rename(
        os.path.join(tmp_dir, "stage", part),
        os.path.join(tmp_dir, "accounts-20240101.orc"),
    )
    got = read_orc_folder(spark, tmp_dir)
    assert set(got) == {"accounts"}
    assert sorted(map(tuple, got["accounts"].collect())) == [(1, "x"), (2, "y")]
    r = Reader(spark, input_dir=tmp_dir)
    assert sorted(map(tuple, r.get("accounts").collect())) == [(1, "x"), (2, "y")]


def test_edit_distance_pairs_duplicate_heavy_matches_bruteforce(spark):
    """Exact-group compression must not change the result set: duplicates
    produce C(m,2) distance-0 pairs plus cross-group pairs once each."""
    import itertools

    words = ["alpha", "alpha", "alpha", "alphb", "beta", "beta", "gamma"]
    df = spark.createDataFrame(list(enumerate(words)), "id long, t string")
    got = sorted(
        (r.a, r.b, r.dist)
        for r in edit_distance_pairs(df, "id", "t", 2).collect()
    )

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[len(t)]

    want = sorted(
        (i, j, lev(words[i], words[j]))
        for i, j in itertools.combinations(range(len(words)), 2)
        if lev(words[i], words[j]) <= 2
    )
    assert got == want
