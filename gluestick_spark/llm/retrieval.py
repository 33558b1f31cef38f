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

__all__ = ["bm25_topk", "bm25_topk_batch", "tfidf_vectors", "rrf_fuse"]


def tfidf_vectors(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    n_docs: int | None = None,
) -> DataFrame:
    """Sparse TF-IDF document vectors: one row per (doc, term) —
    (``id_col``, ``token``, ``tf``, ``tfidf``) with the sklearn-style
    smooth idf ``ln((1+N)/(1+df)) + 1``. The classic featurization for
    linear quality classifiers (fastText-style filtering) and as the
    lexical side of hybrid retrieval next to :func:`bm25_topk`.

    Scale shape: tokenize once → explode → ONE (doc, token) hash aggregate
    for tf (map-side combine: shuffle rows ∝ distinct doc-term pairs, not
    occurrences); document frequencies are a second vocabulary-sized
    aggregate joined back by BROADCAST (a vocabulary is always tiny next
    to a corpus). ``n_docs`` comes from the caller (parquet footer /
    snapshot metadata) to keep the plan job-free; None falls back to one
    count job. ``min_df`` prunes hapax noise at the df aggregate, before
    the join fans it back out.
    """
    toks = F.transform(tokens_expr(F.col(text_col)), F.lower)
    ex = df.select(F.col(id_col), F.explode(toks).alias("token"))
    tf = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency DERIVES from tf (one row per distinct doc-term
    # pair already) — a count, not a second tokenize+explode+countDistinct
    # over the corpus; the shared subtree reuses tf's exchange
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    n = df.count() if n_docs is None else n_docs
    idf = F.log((F.lit(1.0) + F.lit(float(n))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return tf.join(F.broadcast(dfreq), "token").select(
        id_col,
        "token",
        "tf",
        (F.col("tf") * idf).alias("tfidf"),
    )


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


def bm25_topk_batch(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries_df: DataFrame,
    query_id_col: str,
    query_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched BM25 (VERDICT r14 #3): top-``k`` docs for EVERY query in
    ``queries_df`` in one pass — (``query_id_col``, id, ``bm25``), per
    query score desc / id asc, matching :func:`bm25_topk` run per query
    (same tokenizer on both sides: corpus via ``tokens_expr``, query
    text whitespace-split + lowercased + distinct).

    Scale shape — ONE tokenize of the corpus regardless of query count:
    the union of all query terms (a tiny broadcast set) gates the
    corpus explode, so rows ∝ occurrences of ANY query's terms; per-doc
    tf and per-term df are the same two aggregates as the single-query
    path; the (term → queries needing it) fan-out joins the tf frame
    against the broadcast query-term table, and per-query ranking is
    one query-partitioned window top-k. Cost Σ_q |matching docs_q| —
    one job for a whole eval set, zero driver loops.

    Float caveat (shared with every per-doc BM25 sum): per-(query, doc)
    scores sum ≥2 doubles, so the last ulp depends on aggregation
    order — callers comparing cross-engine (or batch-vs-single) should
    bucket scores (the 0.01-floor convention)."""
    qsplit = F.array_distinct(
        F.transform(
            F.filter(
                F.split(F.col(query_col), r"\s+"), lambda t: t != F.lit("")
            ),
            F.lower,
        )
    )
    qterms = queries_df.select(
        F.col(query_id_col).alias("__qid__"), F.explode(qsplit).alias("__t__")
    )
    terms = qterms.select("__t__").distinct()

    toks = F.transform(tokens_expr(F.col(text_col)), F.lower)
    base = df.select(
        F.col(id_col).alias("__id__"),
        toks.alias("__toks__"),
        F.size(toks).alias("__dl__"),
    )
    stats = base.agg(
        F.count("*").alias("__n__"), F.avg("__dl__").alias("__avgdl__")
    )
    # rows = occurrences of ANY query's terms only — the broadcast
    # semi-gate is the batch twin of the single-query literal filter
    hits = base.select(
        "__id__", "__dl__", F.explode(F.col("__toks__")).alias("__t__")
    ).join(F.broadcast(terms), "__t__")
    tf = hits.groupBy("__id__", "__t__").agg(
        F.count("*").alias("__tf__"), F.first("__dl__").alias("__dl__")
    )
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
    scored = (
        j.join(F.broadcast(qterms), "__t__")
        .groupBy("__qid__", "__id__")
        .agg(F.sum(contrib).alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__qid__").orderBy(
        F.col("bm25").desc(), F.col("__id__").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .select(
            F.col("__qid__").alias(query_id_col),
            F.col("__id__").alias(id_col),
            "bm25",
        )
        .orderBy(
            F.asc(query_id_col), F.col("bm25").desc(), F.col(id_col).asc()
        )
    )


def rrf_fuse(
    legs: list,
    id_col: str,
    k_const: int = 60,
    leg_k: int | None = None,
    k: int | None = None,
    scale: int = 1_000_000_000,
    query_col: str | None = None,
) -> DataFrame:
    """Hybrid-retrieval fusion by Reciprocal Rank Fusion (VERDICT r13
    #5): combine N ranked lists — typically the lexical :func:`bm25_topk`
    leg and an ANN embedding leg (sq_topk / ivf / pq) — into one ranking

        rrf(d) = Σ_legs ⌊scale / (k_const + rank_leg(d))⌋

    computed in EXACT integer arithmetic (``scale DIV (k+r)`` — each
    term floors one integer division, the ppm-weight device), so the
    fused score is replayable bit-for-bit cross-engine and ties are
    deterministic (score desc, id asc). ``legs`` is a list of
    ``(df, score_col, ascending)`` triples; each leg is ranked by
    ``(score asc|desc, id asc)`` — callers fusing float-scored legs
    should pre-round the score to a coarse grid when cross-engine rank
    stability matters (the bm25 0.01-bucket convention).

    Returns (``id_col``, ``rrf_score`` long, ``n_legs``), best first.
    ``leg_k`` truncates each leg to its top ranks before fusing (the
    standard fuse-top-N form); ``k`` limits the fused output.

    ``query_col`` (VERDICT r14 #3) makes the fusion PER QUERY: each
    leg must then carry that column (the batched retrieval outputs —
    :func:`bm25_topk_batch`, ``*_topk_indexed_batch`` — do), ranks are
    taken within each query (one query-partitioned window per leg, no
    single-partition bottleneck), fusion groups on (query, id), and
    ``k`` limits EACH query's fused list. The result gains the query
    column, ordered (query asc, score desc, id asc).

    Scale note: with ``leg_k`` set, an unbounded single-query leg is
    first truncated to its top ``leg_k`` rows by the SAME total order
    (score, id) via a distributed top-k (``TakeOrderedAndProject`` —
    per-partition heaps, never a full sort), so the rank window only
    ever sorts ``leg_k`` rows; a corpus-sized leg is therefore safe.
    Without ``leg_k`` the full ranking is demanded and uses one
    single-partition window per leg — feed top-k lists there. The
    per-query form ranks inside query partitions (distributed across
    queries). The fuse itself is one union + one groupBy."""
    from functools import reduce

    from pyspark.sql import Window

    if not legs:
        raise ValueError("legs must be non-empty")
    if k_const < 1 or scale < 1:
        raise ValueError("k_const >= 1 and scale >= 1 required")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = []
    for df, score_col, ascending in legs:
        order = [
            F.col(score_col).asc() if ascending else F.col(score_col).desc(),
            F.col(id_col).asc(),
        ]
        if query_col:
            w = Window.partitionBy(query_col).orderBy(*order)
        else:
            w = Window.orderBy(*order)
            if leg_k is not None:
                # k-bound the single-partition rank window: keep the top
                # leg_k rows by the SAME total order first (a distributed
                # TakeOrderedAndProject), so row_number sorts leg_k rows
                # instead of the whole leg. (score, id) is a total order,
                # so the surviving rows and their ranks are identical to
                # ranking the full leg and filtering __r__ <= leg_k.
                df = df.orderBy(*order).limit(int(leg_k))
        ranked = df.select(
            *[F.col(c) for c in keys],
            F.row_number().over(w).alias("__r__"),
        )
        if leg_k is not None:
            ranked = ranked.where(F.col("__r__") <= leg_k)
        parts.append(
            ranked.select(
                *keys,
                F.expr(
                    f"CAST({int(scale)} AS BIGINT) div "
                    f"(CAST({int(k_const)} AS BIGINT) + __r__)"
                ).alias("__c__"),
            )
        )
    allc = reduce(lambda a, b: a.unionByName(b), parts)
    fused = allc.groupBy(*keys).agg(
        F.sum("__c__").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_legs"),
    )
    final_order = (
        [F.asc(query_col)] if query_col else []
    ) + [F.col("rrf_score").desc(), F.col(id_col).asc()]
    if k is None:
        return fused.orderBy(*final_order)
    if query_col is None:
        return fused.orderBy(*final_order).limit(k)
    wq = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("__rn__", F.row_number().over(wq))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
        .orderBy(*final_order)
    )
