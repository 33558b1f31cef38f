"""Property tests for the round-10 operators: Spark implementations vs
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


def _grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute_dsir(
    raw: dict[int, str], tgt: dict[int, str], B: int, seed: str = ""
) -> dict[int, tuple[int, bool]]:
    """Reference for dsir_sample(return_all=True): bucket counts under
    both corpora, add-one quantized ratios, mean-ratio doc weight,
    rejection keep rule — every float op mirrors the engine's exactly."""
    nt: dict[int, int] = {}
    nr: dict[int, int] = {}
    for t in tgt.values():
        for g in _grams(t):
            b = _kmv_hash(g) % B
            nt[b] = nt.get(b, 0) + 1
    for t in raw.values():
        for g in _grams(t):
            b = _kmv_hash(g) % B
            nr[b] = nr.get(b, 0) + 1
    t_tot = sum(nt.values()) + B
    r_tot = sum(nr.values()) + B
    w = {
        b: floor(
            1000000.0
            * (
                (float(nt.get(b, 0) + 1) / float(t_tot))
                / (float(nr.get(b, 0) + 1) / float(r_tot))
            )
        )
        for b in range(B)
    }
    weights: dict[int, int] = {}
    for d, t in raw.items():
        gs = _grams(t)
        if not gs:
            weights[d] = 1_000_000
        else:
            s = sum(w[_kmv_hash(g) % B] for g in gs)
            weights[d] = floor(float(s) / float(len(gs)))
    wmax = max(weights.values())
    out = {}
    for d, wt in weights.items():
        h = _kmv_hash(f"{d}\x1f{seed}")
        kept = float(h) * float(wmax) < float(wt) * float(1 << 60)
        out[d] = (wt, kept)
    return out


_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None)
@given(_corpus, _corpus)
def test_dsir_sample_matches_bruteforce(spark_session_holder, raw_c, tgt_c):
    spark = spark_session_holder
    from gluestick_spark.llm.sampling import dsir_sample

    raw = {i: " ".join(toks) for i, toks in enumerate(raw_c)}
    tgt = {i: " ".join(toks) for i, toks in enumerate(tgt_c)}
    raw_df = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tgt_df = spark.createDataFrame(list(tgt.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dsir_weight_ppm"], r["kept"])
        for r in dsir_sample(
            raw_df, "doc_id", "text", tgt_df, n_buckets=16, return_all=True
        ).collect()
    }
    assert got == _brute_dsir(raw, tgt, B=16)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
