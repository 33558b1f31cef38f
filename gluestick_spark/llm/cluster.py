"""Embedding clustering (Lloyd's k-means) and SemDeDup-style semantic
deduplication — deterministic, exactly replayable across engines.

Beyond-reference LLM-pipeline operators (the reference at
/root/reference/gluestick is a pandas ETL toolkit with no vector ops):
a 100 TB training-data pipeline clusters its embedding space both to
prune semantic duplicates (SemDeDup, Abbas et al. 2023: cluster with
k-means, then drop all-but-one of each within-cluster near-duplicate
group) and to train ANN index geometry (our IVF index in
``llm/similarity.py`` is the consumer of these centroids).

Determinism contract (the honest-oracle device, same spirit as the
grid-snapped quantile edges in ``operators/features.py``):

* Vectors are **quantized to integers** first: ``q_i = floor(x_i *
  scale + 0.5)`` (default scale 1000 — three decimals). All distance
  and cosine decisions are then **exact 64-bit integer arithmetic**;
  the only floating-point steps are IEEE-754 double divisions of
  exactly-representable integers, which every engine rounds
  identically. A DuckDB oracle can therefore replay the FULL Lloyd
  iteration — including every boundary assignment — bit-for-bit.
* Centroids are kept as **(sum-vector, count)** integer pairs, never
  divided into float means. Squared distance to centroid c is
  ``d_c = (n_c² · x·x − 2 n_c · x·s_c + s_c·s_c) / n_c²`` — the
  numerator is exact int64; ties broken by smallest cluster id.
* Seeds are the ``k`` rows with the smallest portable 60-bit md5 hash
  of the id (``llm/sketch.py:kmv_hash_expr``) — deterministic and
  partition-invariant, no RNG.

Exactness bounds (documented, not checked per-row): with quantized
magnitude Q = S·max|x_i| and per-cluster count n_c, the distance
numerator is bounded by ``4·d·n_c²·Q²``, so int64 never overflows
while ``n_c ≤ √(2⁶³ / (4·d·Q²))`` — about **1.9·10⁵ points per
cluster** at d=64, S=1000, unit-norm inputs (pick k ∝ N/n_c to stay
inside it; Spark runs ANSI mode and DuckDB both RAISE on int64
overflow, so a violation is loud, never silent corruption). Beyond
2⁵³ the int→double cast rounds, but both engines round the same
int64 to the same IEEE double, so replay determinism holds all the
way to the overflow bound. SemDeDup's pairwise products are bounded
by Cauchy-Schwarz (``dot² ≤ xx_a·xx_b``), giving
``den·Q⁴·r⁴ < 2⁶³`` with r = max vector norm — safe for ≈unit-norm
embeddings at S=1000 (margin ~900×), loud overflow otherwise.

Scale posture (100 TB): the classic MLlib shape — points are
quantized once and persisted; each iteration is ONE map-side-combined
aggregate (k·(d+1) output values collected to the driver, the
iterative-algorithm state, like any MLlib driver loop). Assignment
has two physical strategies (``assign=`` / auto by k·d):

* ``literal`` — a pure narrow map against centroid LITERALS (no
  join, no shuffle). Ideal until the expression itself is the
  bottleneck: codegen size grows O(k·d).
* ``join`` — centroids as a **broadcast** DataFrame; the k-way
  expansion is collapsed by partial aggregation (min_by struct)
  before the single exchange, so shuffle volume stays N rows, never
  N·k. The large-k path (IVF codebooks, SemDeDup at k ∝ N).

SemDeDup's pairwise stage is blocked by cluster id — cost ∝
Σ_c |c|², the point of clustering first; pick k ∝
N/target_cluster_size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gluestick_spark.llm.sketch import kmv_hash_expr

__all__ = [
    "quantize_vec_expr",
    "int_dot_expr",
    "kmeans",
    "cluster_balanced_sample",
    "centroid_outliers",
    "semdedup",
    "semdedup_against",
    "ivf_topk_exact",
    "sq_ivf_topk",
    "materialize_sq_ivf",
    "sq_ivf_append",
    "sq_ivf_topk_indexed",
    "sq_ivf_topk_indexed_batch",
]


def quantize_vec_expr(col: Column, scale: int = 1000) -> Column:
    """``array<long>`` quantization: q_i = floor(x_i·scale + 0.5).

    floor(+0.5) instead of round() because engines disagree on
    banker's-vs-half-up rounding; floor is floor everywhere.
    """
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5))
    )


def int_dot_expr(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two ``array<long>`` columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _dot_lit_sql(q_sql: str, s: list[int]) -> str:
    """SQL text for the exact int64 dot of an array<long> column
    fragment against an integer-literal vector, unrolled as a
    left-associated sum — term order identical to the
    :func:`int_dot_expr` fold (``((0 + t₀) + t₁) + …`` ≡
    ``t₀ + t₁ + …``), so every partial sum (and thus ANSI overflow
    behavior) is the same. Unrolled ``element_at`` terms whole-stage
    codegen, unlike the interpreted higher-order-function fold, and —
    the reason this module builds SQL text at all — the whole
    expression crosses py4j ONCE instead of ~50 driver roundtrips per
    centroid (measured: 7.4 s of a 9.7 s kmeans build was expression
    construction chatter).

    Use for SINGLE dots (one query vector, a rerank distance). For the
    k-struct argmin use :func:`_dot_fold_sql`: k·d unrolled terms form
    ONE un-splittable expression whose generated method exceeds
    janino's 64 KB limit (observed on the PQ encode projection), and
    the failed compile + interpreted fallback costs more than the fold
    ever did."""
    return (
        " + ".join(
            f"element_at({q_sql}, {i + 1}) * {int(v)}L" for i, v in enumerate(s)
        )
        or "0L"
    )


def _dot_fold_sql(q_sql: str, s: list[int]) -> str:
    """SQL text for the same exact int64 dot as :func:`_dot_lit_sql`
    but in the ``aggregate(zip_with(...))`` fold form — byte-for-byte
    the runtime expression the Column API built before r15 (identical
    fold order, identical interpreted evaluation), just parsed in one
    py4j call. The fold keeps generated code size O(1) per centroid,
    which is what lets a k-struct argmin projection stay inside
    whole-stage codegen limits."""
    vals = ", ".join(f"{int(v)}L" for v in s)
    return (
        f"aggregate(zip_with({q_sql}, array({vals}), (x, y) -> x * y), "
        "0L, (acc, v) -> acc + v)"
    )


def _dist_struct_sqls(
    cents: list[tuple[list[int], int]],
    q_sql: str = "__q__",
    xx_sql: str = "__xx__",
    cids: list[int] | None = None,
) -> list[str]:
    """One ``struct(d, cid)`` SQL fragment per centroid literal — the
    shared body of the argmin assignment (:func:`_min_struct_expr`) and
    the batched top-``nprobe`` probe selection
    (:func:`_probe_cids_expr`). ``d`` is the exact rational squared
    distance as a double (int64 numerator, round-then-divide — the
    divisor ``CAST(n² AS DOUBLE)`` constant-folds to exactly
    ``float(n²)``, the same literal the Column builder emitted)."""
    labels = list(range(len(cents))) if cids is None else list(cids)
    out = []
    for cid, (s, n) in zip(labels, cents):
        ss = int(sum(v * v for v in s))
        nn = int(n) * int(n)
        num = f"{nn}L * {xx_sql} - {2 * int(n)}L * ({_dot_fold_sql(q_sql, s)}) + {ss}L"
        out.append(
            f"struct(CAST({num} AS DOUBLE) / CAST({nn} AS DOUBLE) AS d, "
            f"{int(cid)} AS cid)"
        )
    return out


def _assign_expr(
    cents: list[tuple[list[int], int]],
    q: str | None = None,
    xx: str | None = None,
    cids: list[int] | None = None,
) -> Column:
    """argmin-distance expression against centroid literals.

    Builds ``array_min`` over k (d, cid) structs — struct comparison is
    lexicographic, so exact distance ties break to the smallest cluster
    id. Pure narrow map: no join, no shuffle. ``q``/``xx`` are SQL text
    fragments defaulting to the internal prepared columns; PQ passes
    per-subspace column names. ``cids`` labels the entries explicitly
    (default: positional) — the device that lets appends assign against
    the LIVE subset of a rebalanced router whose dead cells left index
    gaps.
    """
    return _min_struct_expr(cents, q, xx, cids)["cid"]


def _min_struct_expr(
    cents: list[tuple[list[int], int]],
    q: str | None = None,
    xx: str | None = None,
    cids: list[int] | None = None,
) -> Column:
    """``struct(d, cid)`` of the nearest centroid (lexicographic
    ``array_min`` — exact distance ties break to the smallest cluster
    id). ``d`` is the rational squared distance as a double — the IEEE
    division of two exact int64s, replayable cross-engine. Parsed from
    SQL text in ONE ``F.expr`` call (plan-construction posture: k·d
    literal trees built through the Column API cost tens of thousands
    of py4j roundtrips per assignment — the round-15 profile's
    dominant driver-side cost across the whole kmeans family)."""
    sqls = _dist_struct_sqls(cents, q or "__q__", xx or "__xx__", cids)
    return F.expr(f"array_min(array({', '.join(sqls)}))")


def _probe_cids_expr(
    cents: list[tuple[list[int], int]],
    nprobe: int,
    q: str | None = None,
    xx: str | None = None,
    cids: list[int] | None = None,
) -> Column:
    """Per-row IVF probe selection as ONE Catalyst expression: the
    ``nprobe`` nearest live centroids of the row's quantized query
    vector, as an ``array<int>`` of cids. The algebra (exact int64
    numerator, round-then-divide double, ties to smallest cid via the
    struct's lexicographic sort) is term-for-term the driver-side
    :func:`_select_probes`, so batched probe selection ≡ the
    single-query path structurally — the device behind
    :func:`sq_ivf_topk_indexed_batch`."""
    sqls = _dist_struct_sqls(cents, q or "__q__", xx or "__xx__", cids)
    return F.expr(
        f"transform(slice(array_sort(array({', '.join(sqls)})), 1, "
        f"{int(nprobe)}), s -> s.cid)"
    )


def _prepare(df: DataFrame, vec_col: str, id_col: str, scale: int) -> DataFrame:
    q = quantize_vec_expr(F.col(vec_col), scale)
    return df.select(
        F.col(id_col).alias("__id__"),
        q.alias("__q__"),
    ).withColumn("__xx__", int_dot_expr(F.col("__q__"), F.col("__q__")))


# literal-assignment ceiling: past this many expression terms the codegen
# cost of k structs × d literals outweighs one extra exchange
_LITERAL_ASSIGN_MAX_TERMS = 4096


def _assign_df(
    pts: DataFrame, cents: list[tuple[list[int], int]], assign: str
) -> DataFrame:
    """pts + ``cid`` column under the chosen physical strategy.

    ``join`` broadcasts the centroid table and collapses the k-way
    expansion with a partial-aggregated ``min(struct(d, cid))`` — the
    grouping keys include ``__q__``/``__xx__`` (functionally dependent
    on ``__id__``) so the update aggregate still sees the vector without
    a second join. Exactly one exchange of N rows; the argmin semantics
    (struct lexicographic min → smallest distance, ties to smallest cid)
    are identical to the literal expression.
    """
    if assign == "auto":
        dim = len(cents[0][0]) if cents else 0
        assign = (
            "literal"
            if len(cents) * max(dim, 1) <= _LITERAL_ASSIGN_MAX_TERMS
            else "join"
        )
    if assign == "literal":
        return pts.withColumn("cid", _assign_expr(cents))
    if assign != "join":
        raise ValueError("assign must be 'literal', 'join', or 'auto'")
    spark = pts.sparkSession
    cdf = spark.createDataFrame(
        [
            (cid, [int(v) for v in s], int(n), int(sum(v * v for v in s)))
            for cid, (s, n) in enumerate(cents)
        ],
        "cid int, s array<long>, n long, ss long",
    )
    xs = int_dot_expr(F.col("__q__"), F.col("s"))
    num = (
        F.col("n") * F.col("n") * F.col("__xx__")
        - F.lit(2).cast("long") * F.col("n") * xs
        + F.col("ss")
    )
    d = num.cast("double") / (F.col("n") * F.col("n")).cast("double")
    return (
        pts.crossJoin(F.broadcast(cdf))
        .groupBy("__id__", "__q__", "__xx__")
        .agg(F.min(F.struct(d.alias("d"), F.col("cid").alias("cid"))).alias("__m__"))
        .select("__id__", "__q__", "__xx__", F.col("__m__.cid").alias("cid"))
    )


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    return_state: bool = False,
    assign: str = "auto",
):
    """Lloyd's k-means over an embedding column; returns (id, ``cid``).

    ``iters`` = number of centroid-update steps; the returned assignment
    is computed against the final centroids (so the points are assigned
    ``iters + 1`` times in total). Empty clusters keep their previous
    (sum, count) state. With ``return_state=True`` also returns the
    centroid state ``[(sum_vector, count), ...]`` indexed by cid.

    Each iteration runs ONE Spark job: a map-side-combined
    ``groupBy(cid)`` aggregate producing k rows of (count, d column
    sums) — the k·(d+1) integers collected per step are the driver-side
    algorithm state (MLlib pattern), not a data collect. ``assign``
    picks the assignment strategy (module docstring): ``literal`` /
    ``join`` / ``auto`` (by k·d); both produce IDENTICAL assignments —
    the choice is purely physical.
    """
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    pts = _prepare(df, vec_col, id_col, scale).persist()
    try:
        seed_rows = (
            pts.withColumn("__h__", kmv_hash_expr(F.col("__id__")))
            .orderBy("__h__", "__id__")
            .limit(k)
            .collect()
        )
        if not seed_rows:
            out = pts.select(
                F.col("__id__").alias(id_col), F.lit(0).alias("cid")
            ).where(F.lit(False))
            return (out, []) if return_state else out
        cents = [(list(r["__q__"]), 1) for r in seed_rows]
        dim = len(cents[0][0])

        # the k·(d+1) ints of driver-side state per step, fetched as ONE
        # array-of-sums aggregate expression (a single F.expr parse —
        # d separate sum() Columns cost ~6 py4j roundtrips each)
        sums_sql = ", ".join(
            f"sum(element_at(__q__, {i + 1}))" for i in range(dim)
        )
        for _ in range(iters):
            assigned = _assign_df(pts, cents, assign)
            rows = assigned.groupBy("cid").agg(
                F.count("*").alias("__n__"),
                F.expr(f"array({sums_sql}) AS __sums__"),
            ).collect()
            state = {
                int(r["cid"]): (
                    [int(v) for v in r["__sums__"]],
                    int(r["__n__"]),
                )
                for r in rows
            }
            cents = [state.get(c, cents[c]) for c in range(len(cents))]

        out = _assign_df(pts, cents, assign).select(
            F.col("__id__").alias(id_col), "cid"
        )
        return (out, cents) if return_state else out
    finally:
        # lazy unpersist: blocking=False keeps the returned plan usable
        pts.unpersist(False)


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_per_cluster: int,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    seed: str = "",
) -> DataFrame:
    """Topic-balanced corpus selection: cluster the embedding space with
    the replayable integer-Lloyd :func:`kmeans`, then keep EXACTLY
    ``n_per_cluster`` documents per cluster (fewer if a cluster is
    smaller) via the seeded-hash rank device
    (:func:`~gluestick_spark.llm.sampling.stratified_sample`). The
    cluster-diversity step of a curation pipeline: dominant topics are
    capped, small topics survive whole — the selection half of the
    SemDeDup-style recipe (:func:`semdedup` removes near-duplicates
    WITHIN a cluster; this balances ACROSS clusters). Returns
    (``id_col``, ``cid``) for the kept rows.

    Everything is replayable end-to-end: the Lloyd router is the exact
    int64 device (fixed iterations — the oracle unrolls them) and
    membership within a cluster is a pure function of (id, seed), so a
    DuckDB oracle replays clustering AND the per-cluster draw. Plan:
    the kmeans narrow assignment + ONE keyed window shuffle (rank
    within cid)."""
    from .sampling import stratified_sample

    assigned = kmeans(df, vec_col, id_col, k=k, iters=iters, scale=scale)
    return stratified_sample(assigned, id_col, ["cid"], n_per_cluster, seed)


def centroid_outliers(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    top_n: int = 50,
    assign: str = "auto",
) -> DataFrame:
    """The ``top_n`` points FARTHEST from their assigned k-means
    centroid — (``id_col``, ``cid``, ``dist_q`` long), distance-desc.
    The embedding-space outlier audit of a curation pipeline (the
    prune-the-fringe step of SSL-curation recipes, the complement of
    :func:`semdedup`'s prune-the-core): far-from-every-centroid points
    are the mislabeled/garbled/off-distribution candidates a reviewer
    reads first.

    ``dist_q = floor(d)`` where ``d`` is the exact rational squared
    distance in quantized units — int64-exact numerators divided by
    ``n²`` (this module's device), so the oracle replays training AND
    the ranking bit-for-bit. Ties break to the smallest id.

    Scale posture: training is :func:`kmeans` (one map-side-combined
    aggregate per iteration); the ranking pass is one narrow map
    against centroid literals (or the broadcast-join strategy at large
    k·d) followed by TakeOrderedAndProject — no extra shuffle beyond
    the assignment strategy's own.
    """
    _, cents = kmeans(
        df, vec_col, id_col, k=k, iters=iters, scale=scale,
        return_state=True, assign=assign,
    )
    if not cents:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cid int, dist_q long"
        )
    pts = _prepare(df, vec_col, id_col, scale)
    if assign == "auto":
        dim = len(cents[0][0])
        assign = (
            "literal"
            if len(cents) * max(dim, 1) <= _LITERAL_ASSIGN_MAX_TERMS
            else "join"
        )
    if assign == "literal":
        m = _min_struct_expr(cents)
        ranked = pts.select(
            F.col("__id__").alias(id_col),
            m["cid"].alias("cid"),
            F.floor(m["d"]).cast("long").alias("dist_q"),
        )
    else:
        spark = pts.sparkSession
        cdf = spark.createDataFrame(
            [
                (cid, [int(v) for v in s], int(n), int(sum(v * v for v in s)))
                for cid, (s, n) in enumerate(cents)
            ],
            "cid int, s array<long>, n long, ss long",
        )
        xs = int_dot_expr(F.col("__q__"), F.col("s"))
        num = (
            F.col("n") * F.col("n") * F.col("__xx__")
            - F.lit(2).cast("long") * F.col("n") * xs
            + F.col("ss")
        )
        d = num.cast("double") / (F.col("n") * F.col("n")).cast("double")
        ranked = (
            pts.crossJoin(F.broadcast(cdf))
            .groupBy("__id__")
            .agg(
                F.min(F.struct(d.alias("d"), F.col("cid").alias("cid"))).alias("__m__")
            )
            .select(
                F.col("__id__").alias(id_col),
                F.col("__m__.cid").alias("cid"),
                F.floor(F.col("__m__.d")).cast("long").alias("dist_q"),
            )
        )
    return ranked.orderBy(F.desc("dist_q"), F.asc(id_col)).limit(top_n)


def _semdedup_gram_kernel(num: int, den: int, within: bool):
    """mapInArrow task function for the SemDeDup pairwise verdicts —
    the guide-§4.2 shape: Spark does the cid-keyed distribution, the
    per-cluster cosine gram runs as ONE vectorized int64 matmul per
    cluster instead of Σ|c|² interpreted ``aggregate(zip_with(...))``
    fold evaluations on exploded pair rows (measured 5× on the
    sf0.1 embedding corpus; the fold was the row's whole exec cost).

    Exact-parity contract with the join form it replaces, argued case
    by case and pinned by tests:

    * arithmetic — numpy int64 ``Q @ Qᵀ`` and the rational comparison
      are the same exact integer ops; a per-group bound check
      (``d·maxq² < 2⁶³``, ``max(num,den)·maxxx² < 2⁶³`` — Cauchy-
      Schwarz gives ``dot² ≤ xx_a·xx_b``) falls back to Python-int
      (object-dtype) arithmetic when int64 could overflow, where the
      SQL form would have raised under ANSI: never a silent wrap.
    * null / ragged vectors — ``zip_with`` pads the shorter array with
      null, so in the join form any pair with a null element or
      differing lengths has a NULL dot and never matches. The kernel
      reproduces this structurally: rows with a null / null-element
      vector are inert (keep, match nothing), and pairs only form
      within the same vector length.
    * verdicts — ``within=True``: row j dropped iff ANY i<j (by id) in
      the same cluster matches. ``within=False``: corpus row (side 1)
      dropped iff ANY reference row (side 0) in the same cluster
      matches; only side-1 rows are emitted.

    Memory: a task accumulates its clusters' (id, q, xx) — bounded by
    the ``max_cluster_size`` contract times clusters-per-task, the
    same frame the join form shuffled."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        id_type = None
        acc: dict = {}
        for batch in batches:
            if id_type is None:
                id_type = batch.schema.field("__id__").type
            d = batch.to_pydict()
            ids, qs, xxs, cids = d["__id__"], d["__q__"], d["__xx__"], d["cid"]
            sides = d["__side__"] if not within else None
            for i in range(len(ids)):
                acc.setdefault(cids[i], []).append(
                    (ids[i], qs[i], xxs[i], 1 if within else sides[i])
                )
        if id_type is None:
            return  # empty partition: yield nothing (schema stays declared)
        out_id: list = []
        out_cid: list = []
        out_keep: list = []

        def judge(rows):
            """rows (id-sorted within) → keep flags for the side-1 rows."""
            # inert rows: null vector / null element — NULL dot in the
            # join form, so they match nothing in either direction
            clean = [
                (j, r)
                for j, r in enumerate(rows)
                if r[1] is not None
                and r[2] is not None
                and all(v is not None for v in r[1])
            ]
            keep = [True] * len(rows)
            by_len: dict = {}
            for j, r in clean:
                by_len.setdefault(len(r[1]), []).append(j)
            for _dim, idx in by_len.items():
                grp = [rows[j] for j in idx]
                Q = np.asarray([r[1] for r in grp], dtype=np.int64)
                xx = np.asarray([r[2] for r in grp], dtype=np.int64)
                maxq = int(np.abs(Q).max()) if Q.size else 0
                maxxx = int(np.abs(xx).max()) if xx.size else 0
                exact64 = (
                    Q.shape[1] * maxq * maxq < 2**63
                    and max(num, den) * maxxx * maxxx * 2 < 2**63
                )
                if exact64:
                    G = Q @ Q.T
                    cond = (G > 0) & (den * G * G > num * np.outer(xx, xx))
                else:  # Python-int exactness where int64 would overflow
                    Qo = Q.astype(object)
                    G = Qo @ Qo.T
                    xo = xx.astype(object)
                    cond = (G > 0) & (den * G * G > num * np.outer(xo, xo))
                if within:
                    # i<j is GLOBAL id order; idx is ascending in the
                    # id-sorted rows, so the within-group triangle is
                    # exactly the cluster triangle restricted to the
                    # group. The strict id inequality (not the position
                    # triangle) also skips duplicate-id pairs, exactly
                    # like the join form's __ida__ < __idb__.
                    n = len(idx)
                    ga = np.asarray([r[0] for r in grp], dtype=object)
                    lt = ga[:, None] < ga[None, :]
                    dropped = (cond & lt).any(axis=0)
                    for t in range(n):
                        if dropped[t]:
                            keep[idx[t]] = False
                else:
                    is_ref = np.asarray([r[3] == 0 for r in grp])
                    if is_ref.any():
                        hit = cond[is_ref, :].any(axis=0)
                        for t in range(len(idx)):
                            if grp[t][3] == 1 and hit[t]:
                                keep[idx[t]] = False
            return keep

        for cid, rows in acc.items():
            if within:
                # global id order drives the i<j leader rule; the
                # against mode needs no order (and reference rows carry
                # no id to sort by)
                rows.sort(key=lambda r: r[0])
            keep = judge(rows)
            for j, r in enumerate(rows):
                if r[3] == 1:
                    out_id.append(r[0])
                    out_cid.append(cid)
                    out_keep.append(keep[j])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_id, id_type),
                pa.array(out_cid, pa.int32()),
                pa.array(out_keep, pa.bool_()),
            ],
            ["__id__", "cid", "keep"],
        )

    return kernel


def _semdedup_verdicts(pts: DataFrame, num: int, den: int, within: bool) -> DataFrame:
    """(__id__, cid, keep) via the Arrow gram kernel; ``pts`` carries
    (__id__, __q__, __xx__, cid[, __side__]). One cid-keyed exchange —
    the same single shuffle the pairwise join form paid — then the
    verdicts are task-local."""
    out_id_type = pts.schema["__id__"].dataType.simpleString()
    cols = ["__id__", "__q__", "__xx__", "cid"] + (
        [] if within else ["__side__"]
    )
    return pts.select(*cols).repartition("cid").mapInArrow(
        _semdedup_gram_kernel(num, den, within),
        f"__id__ {out_id_type}, cid int, keep boolean",
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    threshold: float = 0.7,
    assign: str = "auto",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup: k-means-blocked semantic near-duplicate pruning.

    Returns (id, ``cid``, ``keep`` boolean). A row is dropped when an
    earlier id (smallest-id leader rule — the deterministic variant of
    the paper's keep-one-per-group) in the SAME cluster has quantized
    cosine > ``threshold``:

        dot(q_a, q_b) > 0  AND  den·dot² > num·(q_a·q_a)(q_b·q_b)

    where num/den is threshold² as an exact rational (threshold read at
    2-decimal precision), so the decision is pure int64 arithmetic —
    no float cosine anywhere. Pairwise work is blocked by cluster id:
    cost ∝ Σ_c |c|², never N².

    ``max_cluster_size`` (VERDICT r10 #2) is the loud giant-cluster cap
    — :func:`~gluestick_spark.operators.graph.triangle_count`'s
    ``max_degree`` contract applied to the Σ|c|² surface: one
    degenerate cluster holding 10% of a 100 TB corpus squares into an
    unrunnable stage. With the cap set, clusters LARGER than it are
    removed BEFORE the pairwise join and their member rows emit NO
    output rows (they were not judged — never a silent keep), exactly
    like hub nodes in the capped triangle count. The result is EXACT on
    the capped set: pairs never cross clusters, so judged rows carry
    the same verdicts the uncapped run would give them (pytest-pinned
    capped ≡ uncapped on bounded clusters). Deterministic and
    oracle-replayable — the cluster-size filter is one k-row broadcast
    semi-join on the replayed kmeans assignment. Per-cluster pairwise
    cost is then ≤ max_cluster_size², bounding the worst partition
    regardless of embedding skew.
    """
    from math import gcd

    t = round(threshold * 100)
    if not 0 <= t <= 100:
        raise ValueError("threshold must be in [0, 1]")
    if max_cluster_size is not None and max_cluster_size < 1:
        raise ValueError(
            f"max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    num, den = t * t, 100 * 100
    g = gcd(num, den) or 1
    num, den = num // g, den // g

    _, cents = kmeans(
        df, vec_col, id_col, k=k, iters=iters, scale=scale, assign=assign,
        return_state=True,
    )
    if not cents:
        return df.select(
            F.col(id_col), F.lit(0).alias("cid"), F.lit(True).alias("keep")
        ).where(F.lit(False))
    # assignment recomputed as the narrow _assign_df map against the
    # trained state — NOT kmeans' returned (id, cid) frame joined back on
    # id, which shuffled the corpus against itself (2 exchanges + a sort
    # per side) just to re-attach a column that is a pure function of the
    # vector (guide §2.4: remove shuffles outright). Identical cids by
    # construction: kmeans' own output IS _assign_df(pts, final_state).
    pts = _assign_df(_prepare(df, vec_col, id_col, scale), cents, assign)
    if max_cluster_size is not None:
        ok = (
            pts.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .where(F.col("__n__") <= max_cluster_size)
            .select("cid")
        )
        # k-bounded (≤ k rows): broadcast, never a shuffle of the corpus
        pts = pts.join(F.broadcast(ok), "cid")
    # pairwise verdicts via the Arrow gram kernel (one cid-keyed
    # exchange, per-cluster vectorized int64 matmul) — replaces the
    # blocked self-join + per-pair fold dot + distinct + left join
    return _semdedup_verdicts(pts, num, den, within=True).select(
        F.col("__id__").alias(id_col), "cid", "keep"
    )


def semdedup_against(
    corpus: DataFrame,
    reference: DataFrame,
    vec_col: str,
    id_col: str,
    ref_vec_col: str | None = None,
    ref_id_col: str | None = None,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    threshold: float = 0.7,
    assign: str = "auto",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """CROSS-CORPUS SemDeDup — :func:`semdedup`'s semantics with a
    reference corpus as the anchor set (the ``dedup_against`` posture
    applied to embeddings, completing the dedup matrix: n-gram
    cross-corpus, embedding within-corpus, embedding cross-corpus): a
    corpus row is flagged ``keep = false`` when ANY reference row in
    the SAME cluster exceeds the quantized-cosine threshold (the exact
    int64 rational rule of :func:`semdedup` — no float cosine
    anywhere). Returns (``id_col``, ``cid``, ``keep``) per corpus row.

    The router trains on the REFERENCE only (store-once/serve-many:
    re-scoring a new crawl batch against a frozen reference must not
    retrain — same frozen-router contract as ``sq_ivf_append``), and
    BOTH sides assign against the final centroids, so matches are
    judged within the shared cluster blocking exactly as SemDeDup
    defines them. Pairwise cost ∝ Σ_c |corpus_c|·|ref_c| — never N·M.

    ``max_cluster_size`` caps the REFERENCE side of the block (the
    :func:`semdedup` giant-cluster contract): reference cells larger
    than the cap are removed before the join and corpus rows assigned
    to them emit NO output row (unjudged — never a silent keep).

    An EMPTY reference keeps every corpus row (``cid`` NULL — there is
    no router to assign against). Deterministic and oracle-replayable
    end-to-end (frozen integer-Lloyd router + rational decisions)."""
    from math import gcd

    rv = ref_vec_col or vec_col
    rid = ref_id_col or id_col
    t = round(threshold * 100)
    if not 0 <= t <= 100:
        raise ValueError("threshold must be in [0, 1]")
    if max_cluster_size is not None and max_cluster_size < 1:
        raise ValueError(
            f"max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    num, den = t * t, 100 * 100
    g = gcd(num, den) or 1
    num, den = num // g, den // g

    _, state = kmeans(
        reference, rv, rid, k=k, iters=iters, scale=scale,
        return_state=True, assign=assign,
    )
    if not state:
        return corpus.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("cid"),
            F.lit(True).alias("keep"),
        )
    ref_pts = _assign_df(_prepare(reference, rv, rid, scale), state, assign)
    cor_pts = _assign_df(_prepare(corpus, vec_col, id_col, scale), state, assign)
    if max_cluster_size is not None:
        ok = (
            ref_pts.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .where(F.col("__n__") <= max_cluster_size)
            .select("cid")
        )
        # k-bounded: broadcast, never a corpus shuffle
        ref_pts = ref_pts.join(F.broadcast(ok), "cid")
        cor_pts = cor_pts.join(F.broadcast(ok), "cid")
    id_type = cor_pts.schema["__id__"].dataType
    both = cor_pts.select(
        "__id__", "__q__", "__xx__", "cid", F.lit(1).alias("__side__")
    ).unionByName(
        ref_pts.select(
            F.lit(None).cast(id_type).alias("__id__"),
            "__q__",
            "__xx__",
            "cid",
            F.lit(0).alias("__side__"),
        )
    )
    # cross-corpus verdicts via the Arrow gram kernel (one cid-keyed
    # exchange over both sides) — replaces the blocked corpus×reference
    # join + per-pair fold dot + distinct + left join
    return _semdedup_verdicts(both, num, den, within=False).select(
        F.col("__id__").alias(id_col), "cid", "keep"
    )


def ivf_topk_exact(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    scale: int = 1000,
    assign: str = "auto",
) -> DataFrame:
    """IVF top-k with a fully replayable coarse quantizer — (id,
    ``ivf_dist`` long), ordered by (dist, id).

    The engine's other IVF (``llm/similarity.py``) takes its codebook
    from MLlib k-means (seeded RNG — Spark-deterministic but not
    replayable in SQL), so its oracle can only check against recall-1
    brute force. THIS variant trains the coarse quantizer with the
    integer Lloyd loop above, so a DuckDB oracle replays training,
    probe selection, AND the pruned scan — a green row verifies the
    PRUNING SEMANTICS, not a lucky recall.

    Probe selection: the ``nprobe`` centroids nearest the query under
    the same exact algebra (round-then-divide double of the int64
    numerator, ties to smallest cid), chosen driver-side from the
    k·(d+1)-int state. Row distances are exact int64 squared L2 between
    quantized vectors.

    Plan: narrow assignment map (or broadcast join at large k·d) → a
    ``cid IN probes`` filter — with a materialized index this is
    partition pruning; inline it prunes at the scan filter — →
    ``TakeOrderedAndProject``. No shuffle of the corpus.
    """
    if nprobe < 1 or k < 1:
        raise ValueError("nprobe >= 1 and k >= 1 required")
    assigned_src, state = kmeans(
        df, vec_col, id_col, k=n_clusters, iters=iters, scale=scale,
        return_state=True, assign=assign,
    )
    if not state:
        return assigned_src.select(
            F.col(id_col), F.lit(0).cast("long").alias("ivf_dist")
        )
    probes, qq, qxx = _select_probes(state, query, scale, nprobe)

    pts = _prepare(df, vec_col, id_col, scale)
    pts = _assign_df(pts, state, assign).where(F.col("cid").isin(probes))
    # one parsed expression; the unrolled dot keeps the fold's exact
    # left-associated int64 term order (see _dot_lit_sql)
    dist = F.expr(
        f"{int(qxx)}L - 2L * ({_dot_lit_sql('__q__', qq)}) + __xx__"
    )
    return (
        pts.select(F.col("__id__").alias(id_col), dist.alias("ivf_dist"))
        .orderBy(F.col("ivf_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def sq_ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    scale: int = 1000,
) -> DataFrame:
    """Cluster-pruned QUANTIZED search — the production ANN serving
    shape both halves promise: the replayable integer-Lloyd IVF router
    (:func:`ivf_topk_exact`'s coarse quantizer and probe selection)
    prunes the corpus to ``nprobe`` cells, and int8 scalar quantization
    (:func:`~gluestick_spark.llm.similarity.sq_topk`'s scoring) ranks
    only the survivors. Returns (``id_col``, ``score`` double raw dot),
    score-desc, id-asc.

    Both stages keep their oracle contracts, so the COMPOSITION is
    replayable end-to-end: a DuckDB oracle re-trains the router,
    re-selects the probes, re-quantizes the pruned cells, and re-ranks —
    a green row verifies pruning semantics AND quantized scoring
    together, not recall luck.

    Plan shape: one narrow assignment map against the coarse-codebook
    LITERALS (the router k·d is small by design — this path deliberately
    uses the literal strategy so the original vector column rides along
    without a join-back), a ``cid IN probes`` filter (partition pruning
    against a :func:`~gluestick_spark.llm.similarity.materialize_ivf`
    layout), SQ encoding of the survivors, TakeOrderedAndProject. No
    corpus shuffle.
    """
    if nprobe < 1 or k < 1:
        raise ValueError("nprobe >= 1 and k >= 1 required")
    from .similarity import _sq_score_topk, quantize_embeddings, quantize_query

    _, state = kmeans(
        df, vec_col, id_col, k=n_clusters, iters=iters, scale=scale,
        return_state=True,
    )
    if not state:
        return df.sparkSession.createDataFrame([], f"{id_col} long, score double")
    probes, _, _ = _select_probes(state, query, scale, nprobe)

    pre = df.select(
        F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__")
    ).withColumn(
        "__q__", quantize_vec_expr(F.col("__v__"), scale)
    ).withColumn("__xx__", int_dot_expr(F.col("__q__"), F.col("__q__")))
    pruned = pre.withColumn("cid", _assign_expr(state)).where(
        F.col("cid").isin(probes)
    )
    enc = quantize_embeddings(
        pruned, "__v__", "__id__", out_col="__qv__", scale_col="__sc__"
    )
    qscale, qcodes = quantize_query(query)
    out = _sq_score_topk(enc, "__id__", qscale, qcodes, k)
    return out.withColumnRenamed("__id__", id_col)


def _select_probes(
    state: list[tuple[list[int], int]],
    query: list[float],
    scale: int,
    nprobe: int,
    dead: frozenset[int] | set[int] = frozenset(),
) -> tuple[list[int], list[int], int]:
    """Driver-side IVF probe selection against the k·(d+1)-int router
    state: the ``nprobe`` centroids nearest the quantized query under
    the exact rational algebra (int64 numerator, round-then-divide
    double, ties to smallest cid) — shared by the in-query paths and
    the persisted-index serving path so indexed ≡ direct is structural,
    not coincidental. Returns (probe cids, quantized query, its squared
    norm)."""
    from math import floor as _floor

    qq = [_floor(x * scale + 0.5) for x in query]
    qxx = sum(v * v for v in qq)
    scored = []
    for cid, (s, n) in enumerate(state):
        if cid in dead:
            continue  # rebalanced-away cell: tombstoned, never probed
        num = n * n * qxx - 2 * n * sum(a * b for a, b in zip(qq, s)) + sum(
            v * v for v in s
        )
        scored.append((float(num) / float(n * n), cid))
    probes = [cid for _, cid in sorted(scored)[: min(nprobe, len(scored))]]
    return probes, qq, qxx


def materialize_sq_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_clusters: int = 8,
    iters: int = 1,
    scale: int = 1000,
) -> None:
    """Build the PERSISTED IVF×SQ serving index — the store-once/
    serve-many form of :func:`sq_ivf_topk` (which trains the router and
    quantizes in-query, fine for one-off audits, wasteful for an ANN
    service answering millions of queries). One pass over the corpus:

    1. Train the replayable integer-Lloyd router (:func:`kmeans`).
    2. ONE narrow projection computes, per row, the router assignment
       (``cid``) AND the int8 SQ codes
       (:func:`~gluestick_spark.llm.similarity.sq_quantize_exprs`) —
       the original vector is read once and never joined back.
    3. Write (id, ``scale``, ``qvec`` int8) parquet **partitioned by
       cid** — the directory layout IS the inverted file (the
       :func:`~gluestick_spark.llm.similarity.materialize_ivf` device),
       holding the 4×-smaller codes instead of raw floats. A
       ``repartition(cid)`` coalesces each cell into whole files.
    4. Publish the router state (centroid sums/counts + scale) as
       ``_ROUTER.json``, written LAST via temp + atomic ``os.replace``
       — it is the commit marker: a crash mid-build leaves no router
       and :func:`sq_ivf_topk_indexed` refuses the torn index loudly
       (the band-index lesson, ADVICE r8).

    Serving cost is then ∝ probed cells × codes size: partition pruning
    skips the unprobed directories entirely and the probed bytes are
    quantized. At 100 TB this is the difference between scanning the
    corpus per query and scanning ~nprobe/k of a 4×-compressed index."""
    import json as _json
    import os as _os

    _, state = kmeans(
        df, vec_col, id_col, k=n_clusters, iters=iters, scale=scale,
        return_state=True,
    )
    from .similarity import sq_quantize_exprs

    _os.makedirs(path, exist_ok=True)
    from .index_commit import rollback_torn_append

    # A full rebuild supersedes any torn append (ADVICE r11): clear the
    # stale _APPEND_INPROGRESS sidecar NOW, or its manifest — naming only
    # pre-rebuild part files — would make the NEXT append's rollback
    # delete every rebuilt cell file (silent data loss).
    rollback_torn_append(path)
    router_path = _os.path.join(path, "_ROUTER.json")
    if _os.path.isfile(router_path):
        _os.remove(router_path)  # invalidate before the rewrite
    if state:
        sc_expr, q_expr = sq_quantize_exprs(F.col(vec_col))
        enc = df.select(
            F.col(id_col),
            sc_expr.alias("scale"),
            q_expr.alias("qvec"),
            quantize_vec_expr(F.col(vec_col), scale).alias("__q__"),
        ).withColumn(
            "__xx__", int_dot_expr(F.col("__q__"), F.col("__q__"))
        ).withColumn("cid", _assign_expr(state)).select(
            id_col, "scale", "qvec", "cid"
        )
        (
            enc.repartition(F.col("cid"))
            .write.partitionBy("cid")
            .mode("overwrite")
            .parquet(_os.path.join(path, "cells"))
        )
    router = {
        "scale": int(scale),
        "n_clusters": int(n_clusters),
        "iters": int(iters),
        "id_col": id_col,
        "state": [[list(map(int, s)), int(n)] for s, n in state],
    }
    tmp = router_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(router, f)
    _os.replace(tmp, router_path)


def sq_ivf_append(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
) -> None:
    """Incrementally GROW a :func:`materialize_sq_ivf` index: the new
    batch is assigned against the PERSISTED router (never retrained —
    assignment must stay consistent with what serving probes), SQ-encoded
    in the same narrow projection, and appended into the cell partition
    directories in place. The existing index is never read or rewritten,
    so ingest costs O(batch), not O(corpus) — the
    :func:`~gluestick_spark.llm.similarity.ivf_append` contract for the
    quantized composed index. The resulting index serves identically to
    a from-scratch build over the union (frozen router ⇒ same cell for
    every vector; cells just gain files — pytest-pinned).

    Crash safety is the ``_APPEND_INPROGRESS`` manifest bracket (ADVICE
    r10, :mod:`gluestick_spark.llm.index_commit`): the pre-append cell
    listing is snapshotted before the write and the sidecar removed
    after it. A torn append leaves the sidecar in place, so
    :func:`sq_ivf_topk_indexed` refuses LOUDLY while a RETRIED append
    rolls the torn batch back (deletes unmanifested cell files) and
    re-appends — a transient job failure no longer costs a full
    rebuild. (Spark's own job commit makes the parquet append
    internally atomic-ish, but a kill between task commits can leave a
    subset of cell files — the manifest closes that window.)

    Under distribution drift the cells skew over time; monitor cell
    sizes and rebuild with a retrained router when imbalance hurts probe
    cost. Id uniqueness across batches is the caller's contract."""
    import json as _json
    import os as _os

    from .index_commit import begin_append, commit_append, rollback_torn_append

    rollback_torn_append(path)  # self-heal: a retried append rolls back first
    router_path = _os.path.join(path, "_ROUTER.json")
    if not _os.path.isfile(router_path):
        raise ValueError(
            f"sq-ivf index at {path} is uncommitted (torn build or "
            "mid-rebuild) — re-run materialize_sq_ivf"
        )
    with open(router_path) as f:
        router = _json.load(f)
    state = [(list(map(int, s)), int(n)) for s, n in router["state"]]
    dead = set(router.get("dead", []))
    live = [(cid, sn) for cid, sn in enumerate(state) if cid not in dead]
    if not live:
        raise ValueError(
            f"sq-ivf index at {path} has an empty router — rebuild with "
            "materialize_sq_ivf on a non-empty corpus before appending"
        )
    from .similarity import sq_quantize_exprs

    sc_expr, q_expr = sq_quantize_exprs(F.col(vec_col))
    enc = df.select(
        F.col(id_col).alias(router["id_col"]),
        sc_expr.alias("scale"),
        q_expr.alias("qvec"),
        quantize_vec_expr(F.col(vec_col), router["scale"]).alias("__q__"),
    ).withColumn(
        "__xx__", int_dot_expr(F.col("__q__"), F.col("__q__"))
    ).withColumn(
        # assignment against the LIVE router entries with their TRUE cids
        # — a rebalanced index never routes new rows into a dead cell
        "cid",
        _assign_expr([sn for _, sn in live], cids=[cid for cid, _ in live]),
    ).select(
        router["id_col"], "scale", "qvec", "cid"
    )
    begin_append(path)  # manifest bracket (ADVICE r10)
    (
        enc.repartition(F.col("cid"))
        .write.partitionBy("cid")
        .mode("append")
        .parquet(_os.path.join(path, "cells"))
    )
    commit_append(path)


def sq_ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Serve top-k from a :func:`materialize_sq_ivf` index — identical
    results to in-query :func:`sq_ivf_topk` with the same geometry (the
    router state is persisted verbatim and :func:`_select_probes` is the
    same code, so indexed ≡ direct is structural; oracle-checked).

    Plan: probe selection is driver-side arithmetic on the persisted
    k·(d+1)-int router; the scan reads ONLY the ``nprobe`` probed cell
    directories (``cid IN (...)`` rides the scan as a PartitionFilter —
    plan-gated) and only the int8 codes; then one
    TakeOrderedAndProject. Query cost ∝ probed cells, independent of
    corpus size — the 100 TB serving shape."""
    import json as _json
    import os as _os

    if nprobe < 1 or k < 1:
        raise ValueError("nprobe >= 1 and k >= 1 required")
    router_path = _os.path.join(path, "_ROUTER.json")
    if not _os.path.isfile(router_path):
        raise ValueError(
            f"sq-ivf index at {path} is uncommitted (torn build or "
            "mid-rebuild) — re-run materialize_sq_ivf"
        )
    from .index_commit import require_committed

    require_committed(path, "sq-ivf")
    with open(router_path) as f:
        router = _json.load(f)
    state = [(list(map(int, s)), int(n)) for s, n in router["state"]]
    dead = set(router.get("dead", []))
    out_id = id_col or router["id_col"]
    from .similarity import _sq_score_topk, quantize_query

    if len(dead) >= len(state):
        return spark.createDataFrame([], f"{out_id} long, score double")
    probes, _, _ = _select_probes(
        state, query, router["scale"], nprobe, dead=dead
    )
    enc = (
        spark.read.parquet(_os.path.join(path, "cells"))
        .where(F.col("cid").isin(probes))
        .select(
            F.col(router["id_col"]).alias(out_id),
            F.col("scale").alias("__sc__"),
            F.col("qvec").alias("__qv__"),
        )
    )
    from .index_delete import filter_tombstoned

    enc = filter_tombstoned(
        spark, path, enc, out_id, stored_id_col=router["id_col"]
    )
    qscale, qcodes = quantize_query(query)
    return _sq_score_topk(enc, out_id, qscale, qcodes, k)


def sq_ivf_topk_indexed_batch(
    spark,
    path: str,
    queries_df: DataFrame,
    vec_col: str,
    query_id_col: str,
    k: int = 10,
    nprobe: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Batched serving against a :func:`materialize_sq_ivf` index
    (VERDICT r14 #2 — the retrieval-scale gap): answer a whole QUERY
    DATAFRAME in ONE job instead of a driver-side loop of per-query
    jobs. Returns (``query_id_col``, id, ``score``) — per query,
    row-for-row identical to :func:`sq_ivf_topk_indexed` with the same
    ``k``/``nprobe`` (agreement pytest-pinned):

    1. ONE narrow projection over the queries computes, per row, the
       router-scale quantization, the int8 SQ query codes
       (:func:`~gluestick_spark.llm.similarity.sq_quantize_exprs` — the
       Catalyst twin of the driver-side ``quantize_query``, bit-identical
       by construction), and the ``nprobe`` probe cells against the
       broadcast router literals (:func:`_probe_cids_expr`, the same
       exact algebra as :func:`_select_probes`).
    2. The union of all probed cids (collected — bounded by the router
       size, never by query count) restricts the cells scan with a
       LITERAL ``cid IN (...)`` partition filter, exactly the
       single-query pruning.
    3. One cid-keyed join scores every (query, candidate) pair with the
       exact int64 code dot × the two scales — cost Σ_q |probed
       cells_q|, ONE Spark job for the whole query set. AQE broadcasts
       the (small) exploded query side in practice.
    4. Per-query top-k via a ``query``-partitioned window (score desc,
       id asc — the single-query tie rule).

    Tombstoned ids are anti-joined out (delete propagation applies to
    batch serving identically). NULL query vectors are the caller's
    contract to filter, as everywhere in the family. Query-id
    uniqueness is the caller's contract; duplicate ids collapse into
    one ranking."""
    import json as _json
    import os as _os

    from pyspark.sql import Window

    if nprobe < 1 or k < 1:
        raise ValueError("nprobe >= 1 and k >= 1 required")
    router_path = _os.path.join(path, "_ROUTER.json")
    if not _os.path.isfile(router_path):
        raise ValueError(
            f"sq-ivf index at {path} is uncommitted (torn build or "
            "mid-rebuild) — re-run materialize_sq_ivf"
        )
    from .index_commit import require_committed

    require_committed(path, "sq-ivf")
    with open(router_path) as f:
        router = _json.load(f)
    state = [(list(map(int, s)), int(n)) for s, n in router["state"]]
    dead = set(router.get("dead", []))
    out_id = id_col or router["id_col"]
    live = [(cid, sn) for cid, sn in enumerate(state) if cid not in dead]

    def _empty() -> DataFrame:
        return (
            queries_df.select(F.col(query_id_col))
            .limit(0)
            .withColumn(out_id, F.lit(None).cast("long"))
            .withColumn("score", F.lit(None).cast("double"))
        )

    if not live:
        return _empty()
    from .similarity import sq_quantize_exprs

    sc_e, qc_e = sq_quantize_exprs(F.col(vec_col))
    qprep = queries_df.select(
        F.col(query_id_col).alias("__qid__"),
        sc_e.alias("__qsc__"),
        qc_e.alias("__qcodes__"),
        quantize_vec_expr(F.col(vec_col), router["scale"]).alias("__q__"),
    ).withColumn("__xx__", int_dot_expr(F.col("__q__"), F.col("__q__")))
    probes = _probe_cids_expr(
        [sn for _, sn in live], nprobe, cids=[cid for cid, _ in live]
    )
    qx = qprep.select(
        "__qid__", "__qsc__", "__qcodes__", F.explode(probes).alias("cid")
    ).localCheckpoint(eager=False)  # pinned: feeds the probed-cid collect
    # AND the join; lazy — the collect right below materializes it, an
    # eager checkpoint would cost one extra scheduled job per call
    probed = sorted({r["cid"] for r in qx.select("cid").distinct().collect()})
    if not probed:
        return _empty()
    cells = spark.read.parquet(_os.path.join(path, "cells")).where(
        F.col("cid").isin(probed)
    )
    cand = qx.join(cells, "cid").select(
        "__qid__",
        "__qsc__",
        F.col(router["id_col"]).alias(out_id),
        F.col("scale").alias("__sc__"),
        F.col("qvec").alias("__qv__"),
        F.col("__qcodes__"),
    )
    from .index_delete import filter_tombstoned

    cand = filter_tombstoned(
        spark, path, cand, out_id, stored_id_col=router["id_col"]
    )
    # exact int64 code dot × stored scale × query scale — the same IEEE
    # multiply order as _sq_score_topk, so scores are bit-identical
    idot = F.aggregate(
        F.zip_with(
            F.col("__qv__"),
            F.col("__qcodes__"),
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = idot.cast("double") * F.col("__sc__") * F.col("__qsc__")
    w = Window.partitionBy("__qid__").orderBy(F.desc("score"), F.asc(out_id))
    return (
        cand.select(F.col("__qid__"), F.col(out_id), score.alias("score"))
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .select(
            F.col("__qid__").alias(query_id_col), F.col(out_id), F.col("score")
        )
        .orderBy(F.asc(query_id_col), F.desc("score"), F.asc(out_id))
    )
