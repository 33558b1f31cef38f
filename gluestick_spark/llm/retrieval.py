"""Lexical retrieval: BM25 scoring over a tokenized corpus.

The retrieval half of a data pipeline (quality filtering by query
relevance, nearest-neighbor text search next to the embedding ANN in
:mod:`gluestick_spark.llm.similarity`). Okapi BM25:

    score(D, Q) = Σ_{t ∈ Q} idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale design: the query's term set is a tiny literal array, so per-doc term
frequencies come from one ``filter``+``explode`` of the already-tokenized
text — rows ∝ query-term OCCURRENCES in matching docs only, never the full
corpus vocabulary. Corpus stats (N, avgdl) and per-term document
frequencies are two small aggregates broadcast back; the final ranking is
a top-k (``TakeOrderedAndProject``), not a global sort. Everything is
built-in expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs for ``query`` by BM25: (id, ``bm25``), score desc,
    ties by id asc (deterministic). Docs sharing no query term never enter
    the ranking (inner semantics — they'd all score 0)."""
    terms = sorted({t.lower() for t in query.split() if t})
    if not terms:
        raise ValueError("query must contain at least one token")
    term_arr = F.array(*[F.lit(t) for t in terms])

    toks = F.transform(tokens_expr(F.col(text_col)), F.lower)
    base = df.select(
        F.col(id_col).alias("__id__"),
        toks.alias("__toks__"),
        F.size(toks).alias("__dl__"),
    )
    # corpus stats: one tiny agg row, broadcast-joined back
    stats = base.agg(
        F.count("*").alias("__n__"), F.avg("__dl__").alias("__avgdl__")
    )
    # rows = query-term occurrences only; per-doc tf by (doc, term) count
    hits = base.select(
        "__id__",
        "__dl__",
        F.explode(F.filter(F.col("__toks__"), lambda t: F.array_contains(term_arr, t))).alias(
            "__t__"
        ),
    )
    tf = hits.groupBy("__id__", "__t__").agg(
        F.count("*").alias("__tf__"), F.first("__dl__").alias("__dl__")
    )
    # per-term document frequency: ≤ |terms| rows, broadcast
    dfreq = tf.groupBy("__t__").agg(F.count("*").alias("__df__"))
    j = tf.join(F.broadcast(dfreq), "__t__").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("__n__") - F.col("__df__") + F.lit(0.5))
        / (F.col("__df__") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("__tf__") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl__") / F.col("__avgdl__")
    )
    contrib = idf * F.col("__tf__") * F.lit(k1 + 1.0) / denom
    scored = j.groupBy("__id__").agg(F.sum(contrib).alias("bm25"))
    return (
        scored.select(F.col("__id__").alias(id_col), "bm25")
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
