"""Property tests for the round-9 operators: the Spark implementations
must agree with independent brute-force Python references on random
small corpora (tiny alphabets force heavy overlap/collision pressure
that fixed fixtures can't)."""

from __future__ import annotations

import hashlib
from math import floor

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import functions as F

K = 4  # window size for the span properties


def _kmv_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_spans(docs: dict[int, list[str]], k: int, cap: int) -> set[tuple]:
    """Independent reference for substring_overlap_spans: enumerate all
    k-gram occurrences, apply the hash-group cap + cross-doc filter,
    verify by string, merge intervals per doc."""
    occ: dict[int, list[tuple[int, int, str]]] = {}
    by_hash: dict[int, list[tuple[int, int, str]]] = {}
    for d, toks in docs.items():
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            by_hash.setdefault(_kmv_hash(g), []).append((d, p, g))
    hits: dict[int, set[int]] = {}
    ok_occ = []
    for h, rows in by_hash.items():
        ds = {d for d, _, _ in rows}
        if len(rows) <= cap and len(ds) >= 2:
            ok_occ.extend(rows)
    by_gram: dict[str, list[tuple[int, int]]] = {}
    for d, p, g in ok_occ:
        by_gram.setdefault(g, []).append((d, p))
    for g, rows in by_gram.items():
        if len({d for d, _ in rows}) >= 2:
            for d, p in rows:
                hits.setdefault(d, set()).add(p)
    out = set()
    for d, ps in hits.items():
        s = e = None
        for p in sorted(ps):
            if s is None:
                s, e = p, p + k
            elif p <= e:
                e = p + k
            else:
                out.add((d, s, e, e - s))
                s, e = p, p + k
        if s is not None:
            out.add((d, s, e, e - s))
    return out


_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=24),
    min_size=2,
    max_size=6,
)


@settings(max_examples=20, deadline=None)
@given(_corpus)
def test_substring_spans_matches_bruteforce(spark_session_holder, corpus):
    spark = spark_session_holder
    from gluestick_spark.llm.spans import substring_overlap_spans

    docs = {i: toks for i, toks in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in substring_overlap_spans(
            df, "doc_id", "text", k=K, max_occurrences=8
        ).collect()
    }
    assert got == _brute_spans(docs, K, cap=8)


def _brute_substring_dedup(docs: dict[int, list[str]], k: int, cap: int):
    """Reference for substring_dedup: spans via _brute_spans, election
    per span STRING (min (doc, start)), token-level cut of the losers."""
    spans = _brute_spans(docs, k, cap)
    by_str: dict[str, list[tuple[int, int, int]]] = {}
    for d, s, e, _ in spans:
        key = " ".join(docs[d][s:e])
        by_str.setdefault(key, []).append((d, s, e))
    doomed: dict[int, list[tuple[int, int]]] = {}
    for key, rows in by_str.items():
        first = min((d, s) for d, s, _ in rows)
        for d, s, e in rows:
            if (d, s) != first:
                doomed.setdefault(d, []).append((s, e))
    out = {}
    for d, toks in docs.items():
        rm = doomed.get(d, [])
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in rm)
        ]
        out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(max_examples=20, deadline=None)
@given(_corpus)
def test_substring_dedup_matches_bruteforce(spark_session_holder, corpus):
    spark = spark_session_holder
    from gluestick_spark.llm.spans import substring_dedup

    docs = {i: toks for i, toks in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in substring_dedup(
            df, "doc_id", "text", k=K, max_occurrences=8
        ).collect()
    }
    assert got == _brute_substring_dedup(docs, K, cap=8)


def _brute_clf(texts: dict[int, str], weights, bias: float) -> dict[int, float]:
    wq = [int(floor(w * 1000 + 0.5)) for w in weights]
    out = {}
    for i, t in texts.items():
        toks = [x for x in t.lower().split() if x]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            out[i] = bias
            continue
        total = sum(wq[_kmv_hash(g) % len(wq)] for g in grams)
        out[i] = total / float(1000 * len(grams)) + bias
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "zz", "w"]), min_size=0, max_size=10),
        min_size=1,
        max_size=5,
    ),
    st.lists(
        st.floats(min_value=-2, max_value=2, allow_nan=False), min_size=4, max_size=16
    ),
)
def test_classifier_score_matches_bruteforce(spark_session_holder, corpus, weights):
    spark = spark_session_holder
    from gluestick_spark.llm.classifier import classifier_score

    texts = {i: " ".join(toks) for i, toks in enumerate(corpus)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_score(df, "text", weights, bias=0.125).collect()
    }
    assert got == _brute_clf(texts, weights, 0.125)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
