"""Property tests for the round-11 operators: Spark implementations vs
independent brute-force Python references on random small corpora."""

from __future__ import annotations

import hashlib
from math import floor

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)


def _kmv_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str, n: int) -> set[str]:
    toks = [t.lower() for t in text.split() if t]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


_corpus = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=8),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None)
@given(_corpus, _corpus)
def test_novelty_scores_matches_bruteforce(spark_session_holder, raw_c, ref_c):
    spark = spark_session_holder
    from gluestick_spark.llm.decontam import novelty_scores

    raw = {i: " ".join(t) for i, t in enumerate(raw_c)}
    ref = {i: " ".join(t) for i, t in enumerate(ref_c)}
    raw_df = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    ref_df = spark.createDataFrame(list(ref.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in novelty_scores(raw_df, ref_df, "text", "doc_id", n=2).collect()
    }
    ref_set = set().union(*(_grams(t, 2) for t in ref.values())) if ref else set()
    for d, t in raw.items():
        gs = _grams(t, 2)
        novel = len(gs - ref_set)
        ppm = floor(1000000.0 * (float(novel) / float(len(gs)))) if gs else None
        assert got[d] == (len(gs), novel, ppm), (d, t)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40,
             unique=True),
    st.integers(min_value=1, max_value=20),
    st.sampled_from(["", "s1"]),
)
def test_sample_exact_k_matches_bruteforce(spark_session_holder, keys, k, seed):
    spark = spark_session_holder
    from gluestick_spark.llm.sampling import sample_exact_k

    df = spark.createDataFrame([(x,) for x in keys], "k long")
    got = sorted(r["k"] for r in sample_exact_k(df, "k", k, seed=seed).collect())
    want = sorted(
        sorted(keys, key=lambda x: (_kmv_hash(f"{x}\x1f{seed}"), x))[:k]
    )
    assert got == want


@settings(max_examples=12, deadline=None)
@given(_corpus, _corpus)
def test_corpus_gram_overlap_matches_bruteforce(spark_session_holder, a_c, b_c):
    spark = spark_session_holder
    from gluestick_spark.llm.decontam import corpus_gram_overlap

    a = {i: " ".join(t) for i, t in enumerate(a_c)}
    b = {i: " ".join(t) for i, t in enumerate(b_c)}
    a_df = spark.createDataFrame(list(a.items()), "doc_id long, text string")
    b_df = spark.createDataFrame(list(b.items()), "doc_id long, text string")
    r = corpus_gram_overlap(a_df, b_df, "text", n=2).collect()[0]
    ga = set().union(*(_grams(t, 2) for t in a.values())) if a else set()
    gb = set().union(*(_grams(t, 2) for t in b.values())) if b else set()
    shared, union = len(ga & gb), len(ga | gb)
    jac = floor(1000000.0 * (float(shared) / float(union))) if union else None
    cont = floor(1000000.0 * (float(shared) / float(len(ga)))) if ga else None
    assert (r["n_grams_a"], r["n_grams_b"], r["n_shared"]) == (
        len(ga), len(gb), shared,
    )
    assert r["jaccard_ppm"] == jac and r["containment_a_in_b_ppm"] == cont


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
