"""Similarity search over embedding columns (array<float>).

Scale design:
- **cosine_similarity / brute-force top-k**: the dot product is a JVM
  ``aggregate``/``zip_with`` expression over double arrays — no Python, no
  shuffle until the final top-k (``orderBy ... limit k`` → Spark's
  TakeOrderedAndProject, a per-partition heap + driver merge: O(N) scan,
  O(k) result, no full sort).
- **LSH-bucketed ANN (random hyperplanes)**: H seeded hyperplanes → H-bit
  signature → candidates share the query's bucket (multi-probe: hamming ≤ 1
  neighbors). Planes are generated driver-side from a fixed seed and inlined
  as literals — deterministic across runs. Bucket search touches ~N/2^H of
  the corpus.
- **IVF (inverted file)**: k centroid seeds chosen deterministically; each
  vector assigned to nearest centroid (one pass); queries probe the nearest
  ``nprobe`` centroids. Partition-prunable when the table is written
  partitioned by centroid id.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_pca",
    "pca_project",
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "cosine_similarity",
    "cosine_topk",
    "random_hyperplanes",
    "hyperplane_signature_expr",
    "hyperplane_signature_udf",
    "cosine_pairs_udf",
    "lsh_ann_topk",
    "ivf_assign",
    "ivf_topk",
    "materialize_ivf",
    "ivf_topk_indexed",
    "ivf_topk_indexed_batch",
    "train_ivf_centroids",
    "quantize_embeddings",
    "sq_quantize_exprs",
    "dequantize_expr",
    "quantize_query",
    "sq_topk",
    "materialize_sq",
    "sq_topk_indexed",
    "pool_embeddings",
    "ann_recall_audit",
]


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (double accumulation, JVM-side)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    ``scale = max(|v|)/127`` and ``q_i = floor(v_i/scale + 0.5)`` clamped
    to [−127, 127] — the standard 4× index-size compression before ANN
    serving (dot products on int8 then rescale by ``scale_a·scale_b``).

    Returns (``id_col``, ``scale_col`` double, ``out_col``
    array<tinyint>). All-zero vectors get scale 0 and an all-zero byte
    array; NULL vectors propagate NULL scale and NULL bytes (their
    dimension is unknowable — filter or impute upstream). Pure Catalyst
    array arithmetic (no UDF, no shuffle);
    ``floor(x + 0.5)`` rather than ``round`` because half-up-vs-half-even
    differs across engines while floor is IEEE-identical everywhere —
    which keeps the quantized bytes oracle-checkable and
    engine-portable. Reverse with :func:`dequantize_expr`."""
    scale, q = sq_quantize_exprs(F.col(vec_col))
    return df.select(F.col(id_col), scale.alias(scale_col), q.alias(out_col))


def sq_quantize_exprs(vec: Column) -> tuple[Column, Column]:
    """The (scale, int8-codes) expression pair behind
    :func:`quantize_embeddings`, exposed so composers (the IVF×SQ index
    build) can ride the quantization alongside other columns in ONE
    narrow projection instead of a join-back."""
    v = _as_double(vec)
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax > 0,
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / (amax / 127.0) + 0.5)),
            ).cast("tinyint"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return scale, q


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """Reconstruct approximate doubles from int8 quantization."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)


def quantize_query(query: list[float]) -> tuple[float, list[int]]:
    """Driver-side mirror of :func:`quantize_embeddings` for one vector:
    ``(scale, int8_codes)`` with bit-identical arithmetic (Python floats
    ARE IEEE doubles, so ``amax / 127.0`` and ``x / scale + 0.5`` round
    exactly as the JVM/Catalyst path does)."""
    amax = max((abs(float(x)) for x in query), default=0.0)
    if amax <= 0:
        return 0.0, [0] * len(query)
    scale = amax / 127.0
    import math

    codes = [
        max(-127, min(127, int(math.floor(float(x) / scale + 0.5))))
        for x in query
    ]
    return scale, codes


def sq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` by dot product over the int8-quantized index — the
    serving-side counterpart of :func:`quantize_embeddings`: score =
    ``int_dot(q_codes, v_codes) · scale_q · scale_v``, i.e. the dot
    product a quantized ANN index actually computes (4× less memory
    traffic than float64; int8 SIMD on real hardware). Returns
    (``id_col``, ``score`` double) ordered score-desc, id-asc.

    Determinism: codes and scales replay exactly in any engine (the
    quantizer is all floor/clamp on IEEE doubles), the integer dot is
    exact int64 (|code| ≤ 127 → no overflow below ~5·10¹⁴ dims), and
    the final score is two IEEE multiplies of identical doubles — so
    cross-engine ordering is bit-stable.

    Scale posture: quantization is a narrow projection; scoring is a
    pure Catalyst ``zip_with``/``aggregate`` fold against a literal
    code array (no UDF, no join); top-k is TakeOrderedAndProject — one
    scan over the (4× smaller) codes, zero shuffles. Composes with the
    IVF router (:func:`ivf_topk`) for cluster-pruned quantized search.
    """
    qscale, qcodes = quantize_query(query)
    enc = quantize_embeddings(df, vec_col, id_col, out_col="__qv__", scale_col="__sc__")
    return _sq_score_topk(enc, id_col, qscale, qcodes, k)


def _sq_score_topk(
    enc: DataFrame, id_col: str, qscale: float, qcodes: list[int], k: int
) -> DataFrame:
    """Shared SQ scoring tail: int64 code dot × the two scales, top-k.

    The dot is unrolled SQL text (one parse, whole-stage codegen) with
    the same left-associated int64 term order as the zip_with/aggregate
    fold it replaces — bit-identical sums, including overflow order."""
    idot = F.expr(
        " + ".join(
            f"CAST(element_at(__qv__, {i + 1}) AS BIGINT) * {int(c)}L"
            for i, c in enumerate(qcodes)
        )
        or "0L"
    )
    score = idot.cast("double") * F.col("__sc__") * F.lit(float(qscale))
    return (
        enc.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def materialize_sq(
    df: DataFrame,
    vec_col: str,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Build the SQ serving index: quantize once, write (id, ``scale``,
    ``qvec`` int8) parquet. This is where scalar quantization actually
    pays at scale — the persisted codes table is ~4× smaller than the
    float64 embeddings (8× vs float64 bytes, before parquet encoding),
    so every subsequent query scans a fraction of the I/O and the raw
    corpus is never re-read. Same store-once/probe-many contract as
    :func:`materialize_ivf`; compose with it (partition the codes by
    IVF centroid) for pruned quantized serving."""
    quantize_embeddings(
        df, vec_col, id_col, out_col="qvec", scale_col="scale"
    ).write.mode("overwrite").parquet(path)


def sq_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k against a :func:`materialize_sq` index — identical results
    to :func:`sq_topk` over the original vectors (the quantizer is
    deterministic, so indexed ≡ direct; oracle-checked), reading ONLY
    the compact codes table. One scan + TakeOrderedAndProject."""
    enc = spark.read.parquet(path).select(
        F.col(id_col),
        F.col("scale").alias("__sc__"),
        F.col("qvec").alias("__qv__"),
    )
    qscale, qcodes = quantize_query(query)
    return _sq_score_topk(enc, id_col, qscale, qcodes, k)


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    out_col: str = "pooled",
) -> DataFrame:
    """Element-wise MEAN of the vectors in each group — chunk-embedding →
    document-embedding pooling (and label → class-centroid aggregation),
    the standard reduction between a chunk-level embedder and a doc-level
    index. Returns (``group_col``, ``n_vecs``, ``out_col`` array<double>).

    Scale shape: ONE keyed shuffle (groupBy + collect_list with map-side
    size counting), then the element-wise sum is a pure Catalyst
    ``aggregate``/``zip_with`` fold over the collected list — no
    posexplode into (group, pos) rows, which would shuffle dim× more rows
    and need a second regroup. Per-group memory is that group's vectors
    (chunks-per-doc scale, not corpus scale); all vectors in a group must
    share one dimension."""
    vs = F.col("__vs__")
    zeros = F.transform(F.element_at(vs, 1), lambda _: F.lit(0.0))
    total = F.aggregate(
        vs, zeros, lambda acc, v: F.zip_with(acc, _as_double(v), lambda a, x: a + x)
    )
    mean = F.transform(total, lambda s: s / F.size(vs))
    return (
        df.where(F.col(vec_col).isNotNull())
        .groupBy(group_col)
        .agg(F.collect_list(vec_col).alias("__vs__"))
        .select(
            group_col,
            F.size(vs).alias("n_vecs"),
            mean.alias(out_col),
        )
    )


def cosine_similarity(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    out_col: str = "similarity",
) -> DataFrame:
    """Append cosine similarity vs a literal query vector. One projection."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return df.withColumn(out_col, cosine_expr(F.col(vec_col), q))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity (ties broken by id).

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — per
    partition heap, no global sort shuffle.
    """
    sim = cosine_similarity(df, vec_col, query)
    return sim.select(id_col, "similarity").orderBy(
        F.col("similarity").desc(), F.col(id_col).asc()
    ).limit(k)


def random_hyperplanes(dim: int, num_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (driver-side, seeded)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature (long) of ``vec`` against the hyperplanes."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(dot_expr(vec, pl) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def hyperplane_signature_udf(planes: list[list[float]]):
    """Arrow-batched signature: one ``N×dim @ dim×H`` matmul per batch.

    The pure-expression form (:func:`hyperplane_signature_expr`) expands to
    H lambda-aggregates, which overflows whole-stage codegen's 64 KB method
    limit at H≥16 and falls back to slow interpreted evaluation — this is
    the documented "Python is genuinely faster" case: a single BLAS matmul
    over an Arrow batch beats H interpreted array folds by orders of
    magnitude, locally and on a cluster.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # dim × H
    weights = np.array([1 << i for i in range(P.shape[1])], dtype=np.int64)

    def _sig(v):
        mask = v.notna()
        out = np.zeros(len(v), dtype=np.int64)
        if mask.any():
            m = np.stack(v[mask].to_numpy()).astype(np.float64)
            out[mask.to_numpy()] = ((m @ P) > 0) @ weights
        return pd.Series(out)

    # real class annotations: the module-level ``from __future__ import
    # annotations`` would stringify inline hints, which pandas_udf rejects
    _sig.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "long")


def cosine_pairs_udf():
    """Arrow-batched cosine between two vector columns (for candidate-pair
    verification): one einsum per batch instead of three interpreted array
    folds per row."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        out = np.zeros(len(a))
        mask = a.notna() & b.notna()
        if mask.any():
            ma = np.stack(a[mask].to_numpy()).astype(np.float64)
            mb = np.stack(b[mask].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", ma, mb)
            denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            out[mask.to_numpy()] = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
        return pd.Series(out)

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    num_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force scan to vectors whose
    hyperplane signature is within hamming distance ``multiprobe`` of the
    query's signature, then rank by exact cosine."""
    dim = len(query)
    planes = random_hyperplanes(dim, num_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            qsig |= 1 << i
    sig = hyperplane_signature_udf(planes)(F.col(vec_col))
    candidates = df.withColumn("__sig__", sig).where(
        F.bit_count(F.col("__sig__").bitwiseXOR(F.lit(qsig).cast("long"))) <= multiprobe
    )
    return cosine_topk(candidates.drop("__sig__"), vec_col, query, k, id_col)


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). One
    projection; write the result partitioned by ``out_col`` for
    partition-pruned probes at scale.

    Centroids are L2-normalized driver-side so the per-row work is one dot
    product per centroid; argmax(dot with unit centroid) == argmax(cosine)
    since the row norm is a constant positive factor. The argmax is
    array_max + array_position over a sims column — linear, not the
    exponential when-chain a running-best fold would build.
    """
    normed = []
    for c in centroids:
        if c is None:  # tombstoned slot (ivf_rebalance): never assigned
            normed.append(None)
            continue
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        normed.append([float(x) / n for x in c])
    sims = F.array(
        *[
            F.lit(float("-inf"))
            if c is None
            else dot_expr(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
            for c in normed
        ]
    )
    tmp = "__ivf_sims__"
    return (
        df.withColumn(tmp, sims)
        .withColumn(
            out_col,
            (F.array_position(F.col(tmp), F.array_max(F.col(tmp))) - 1).cast("int"),
        )
        .drop(tmp)
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    max_iter: int = 20,
    seed: int = 1,
) -> list[list[float]]:
    """Distributed k-means (MLlib, cosine distance) → centroid list for
    :func:`ivf_assign` / :func:`ivf_topk`.

    MLlib KMeans is the idiomatic Spark trainer: each Lloyd iteration is one
    map-side partial aggregation over the vectors (no driver-side data), so
    it scales to the full corpus. Train on a ``df.sample(...)`` when an
    approximate codebook is enough — IVF recall depends far more on
    ``nprobe`` than on exact centroids. Rule of thumb: ``n_centroids ≈
    sqrt(N)`` balances list length against probe fan-out.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, distanceMeasure="cosine"
    ).fit(v)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _probe_centroids(query: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """Driver-side: ids of the ``nprobe`` centroids nearest the query."""
    sims = []
    for i, c in enumerate(centroids):
        if c is None:  # tombstoned slot (ivf_rebalance): never probed
            continue
        denom = math.sqrt(sum(x * x for x in c)) * math.sqrt(sum(x * x for x in query))
        s = sum(a * b for a, b in zip(query, c)) / denom if denom else 0.0
        sims.append((s, i))
    return [i for _, i in sorted(sims, reverse=True)[:nprobe]]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe over an unmaterialized corpus: rank centroids by similarity
    to the query, brute-force only the ``nprobe`` nearest lists.

    This recomputes the nearest-centroid assignment over the full corpus per
    query — fine for one-off scans, wrong for a query workload at scale.
    For repeated probes build the index once with :func:`materialize_ivf`
    and use :func:`ivf_topk_indexed`, which reads only the probed partitions
    (partition-pruned scan: ~nprobe/n_centroids of the data).
    """
    probe = _probe_centroids(query, centroids, nprobe)
    assigned = ivf_assign(df, vec_col, centroids)
    candidates = assigned.where(F.col("centroid_id").isin(probe)).drop("centroid_id")
    return cosine_topk(candidates, vec_col, query, k, id_col)


def materialize_ivf(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Build the IVF index: assign once, write parquet partitioned by
    ``centroid_id``. One pass over the corpus; the directory layout IS the
    inverted file — each centroid's list is its own partition, so a probe
    reads nprobe directories and Spark's partition pruning skips the rest
    (the FileSourceScan carries ``centroid_id IN (...)`` as a
    PartitionFilter; see tests/test_plans.py).

    A repartition on ``centroid_id`` before the write coalesces each list
    into whole files (instead of every task writing a sliver of every
    partition — the small-files problem at 1000 executors); AQE splits
    skewed lists back out.
    """
    assigned = ivf_assign(df, vec_col, centroids)
    (
        assigned.repartition(F.col("centroid_id"))
        .write.partitionBy("centroid_id")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_append(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Incrementally GROW a :func:`materialize_ivf` index: assign only the
    new batch to the existing codebook and append its rows into the
    partition directories in place — the existing index is never read or
    rewritten, so ingesting a batch costs O(batch), not O(corpus). The
    resulting index answers probes identically to a from-scratch
    ``materialize_ivf`` over the union (same codebook ⇒ same partition for
    every vector; parquet partition dirs just gain files).

    The codebook is frozen by design — assignment must stay consistent
    with what :func:`ivf_topk_indexed` probes. Under distribution drift
    the lists skew over time; monitor list sizes and split hot cells
    with :func:`~gluestick_spark.llm.rebalance.ivf_rebalance`, or
    rebuild with retrained centroids. Id uniqueness is the caller's
    contract (pre-dedupe against the index for upsert semantics).

    Crash safety (r13 — parity with ``sq_ivf_append``/``pq_ivf_append``):
    the append runs inside the ``_APPEND_INPROGRESS`` manifest bracket
    (:mod:`gluestick_spark.llm.index_commit`, ``cells='.'`` — this
    family's partition dirs live directly under ``path``). A torn
    append leaves the sidecar in place so :func:`ivf_topk_indexed`
    refuses loudly, and a RETRIED append rolls the torn batch back
    (deletes unmanifested part files) before re-appending."""
    from .index_commit import begin_append, commit_append, rollback_torn_append

    rollback_torn_append(path, cells=".")  # self-heal a torn prior batch
    assigned = ivf_assign(df, vec_col, centroids)
    begin_append(path, cells=".")
    (
        assigned.repartition(F.col("centroid_id"))
        .write.partitionBy("centroid_id")
        .mode("append")
        .parquet(path)
    )
    commit_append(path)


def ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k probe against a :func:`materialize_ivf` index — reads ONLY the
    ``nprobe`` probed partitions (partition-pruned parquet scan), so probe
    cost is ~nprobe/n_centroids of the corpus instead of a full pass."""
    from .index_commit import require_committed

    require_committed(path, "ivf")  # a torn append must not be probed
    probe = _probe_centroids(query, centroids, nprobe)
    cand = spark.read.parquet(path).where(F.col("centroid_id").isin(probe))
    from .index_delete import filter_tombstoned

    cand = filter_tombstoned(spark, path, cand, id_col)
    return cosine_topk(cand.drop("centroid_id"), vec_col, query, k, id_col)


def train_pca(
    df: DataFrame,
    vec_col: str,
    k: int,
):
    """Distributed PCA (MLlib) over an embedding column → fitted model for
    :func:`pca_project`. Dimensionality reduction is the standard pre-ANN
    compression (IVF-PQ lineage): a 64→16 projection cuts every downstream
    distance computation and shuffle payload 4×, at the cost of the
    variance in the dropped components.

    MLlib computes the covariance spectrum with one distributed pass
    (RowMatrix Gram aggregation) — no driver-side N×d materialization.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    v = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v__"))
    return PCA(k=k, inputCol="__v__", outputCol="__p__").fit(v)


def pca_project(
    df: DataFrame,
    vec_col: str,
    model,
    out_col: str = "pca",
) -> DataFrame:
    """Project the embedding column through a fitted PCA model (JVM-side
    matrix multiply per row — no Python in the row path). Keeps all other
    columns; adds ``out_col`` (array<double> of length model.k)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    tmp = df.withColumn("__v__", array_to_vector(F.col(vec_col).cast("array<double>")))
    return (
        model.transform(tmp.withColumnRenamed("__v__", model.getInputCol())
                        if model.getInputCol() != "__v__" else tmp)
        .withColumn(out_col, vector_to_array(F.col(model.getOutputCol())))
        .drop(model.getInputCol(), model.getOutputCol())
    )


def ann_recall_audit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    corpus_rate: float = 1.0,
    n_queries: int = 4,
    seed: str = "",
    n_clusters: int = 8,
    nprobe: int = 2,
    pq_m: int = 4,
    pq_codes: int = 8,
    iters: int = 1,
    scale: int = 1000,
    rerank: int | None = None,
) -> DataFrame:
    """Production guardrail for the QUANTIZED/pruned ANN family — the
    :func:`~gluestick_spark.llm.dedup.lsh_recall_audit` contract applied
    to vector indexes (VERDICT r9 #6): SQ/PQ quantization loss and IVF
    probe misses are silent; nothing else in a serving pipeline measures
    them. On a deterministic hash sample of the corpus, compare EXACT
    float top-k against each index strategy's top-k and report recall@k
    — one row per index type:

    - ``sq``      — int8 scalar quantization (:func:`sq_topk`) vs exact
      float dot-product top-k (its own metric): pure quantization loss.
    - ``sq_ivf``  — router-pruned quantized search
      (``llm/cluster.py:sq_ivf_topk`` geometry) vs the same exact dot
      reference: quantization loss PLUS probe misses at ``nprobe``.
    - ``pq``      — product-quantization ADC (``llm/pq.py``) vs exact
      L2 top-k (ADC approximates distances): codebook loss.
    - ``pq_r``    — (only when ``rerank=R`` is set) IVFADC+R: the top-R
      ADC candidates re-scored with the exact int64 L2 on the quantized
      full vectors (VERDICT r10 #6) — quantifies how much refinement
      recovers of the codebook loss.

    Schema: (``index_type``, ``n_queries``, ``k``, ``n_exact``,
    ``n_hit``, ``recall_bp``) with ``recall_bp =
    floor(10000·n_hit/n_exact)`` and **10000 when the sample yields no
    exact results (vacuous recall — zero queries or an empty sample;
    stated contract, same as the LSH audit's no-true-pairs case)**.

    Determinism: the corpus sample and the query pick are the portable
    keyed hash (re-runs audit the SAME sample and queries); every
    per-query top-k is tie-broken by id; counts are exact integers.
    No SQL oracle — SQ/IVF/PQ training state and the float dot/L2
    reference are Spark-deterministic but not DuckDB-replayable at the
    audit's float precision (the PCA/BPE pytest-pinned evidence class).

    Scale: the exact side costs Q·|sample| scored rows per index type —
    pick ``corpus_rate ∝ 1/√N`` (or cap upstream) for a constant-cost
    audit; routers/codebooks train once on the sample and are reused
    across the Q queries. The Q driver-side top-k collects are k-row
    each — the audit is a report, not a data path."""
    if k < 1 or n_queries < 1:
        raise ValueError("k >= 1 and n_queries >= 1 required")
    from .sampling import _keyed_hash, hash_sample
    from gluestick_spark.llm.cluster import (
        _assign_expr,
        _select_probes,
        int_dot_expr,
        kmeans,
        quantize_vec_expr,
    )
    from gluestick_spark.llm.pq import adc_table, encode_pq, train_pq

    spark = df.sparkSession
    sample = (
        hash_sample(df, id_col, corpus_rate, seed) if corpus_rate < 1.0 else df
    )
    sample = sample.select(F.col(id_col), F.col(vec_col)).localCheckpoint(
        eager=False
    )
    qrows = (
        sample.orderBy(_keyed_hash(F.col(id_col), seed + "|q"), F.col(id_col))
        .limit(n_queries)
        .collect()
    )
    schema = (
        "index_type string, n_queries long, k long, n_exact long, "
        "n_hit long, recall_bp long"
    )
    if not qrows:
        vac = ["sq", "sq_ivf", "pq"] + (["pq_r"] if rerank is not None else [])
        rows = [(t, 0, k, 0, 0, 10000) for t in vac]
        return spark.createDataFrame(rows, schema)

    queries = [(r[id_col], list(r[vec_col])) for r in qrows]

    def _ids(top_df) -> list:
        return [r[id_col] for r in top_df.collect()]

    def _exact_dot(q: list[float]) -> list:
        qa = F.array(*[F.lit(float(x)) for x in q])
        return _ids(
            sample.select(
                F.col(id_col), dot_expr(F.col(vec_col), qa).alias("__s__")
            )
            .orderBy(F.desc("__s__"), F.asc(id_col))
            .limit(k)
        )

    def _exact_l2(q: list[float]) -> list:
        qa = F.array(*[F.lit(float(x)) for x in q])
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                qa,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return _ids(
            sample.select(F.col(id_col), d2.alias("__d__"))
            .orderBy(F.asc("__d__"), F.asc(id_col))
            .limit(k)
        )

    # shared trained state (train once, serve Q queries)
    enc_sq = quantize_embeddings(
        sample, vec_col, id_col, out_col="__qv__", scale_col="__sc__"
    ).localCheckpoint(eager=False)
    _, router = kmeans(
        sample, vec_col, id_col, k=n_clusters, iters=iters, scale=scale,
        return_state=True,
    )
    pre = (
        sample.withColumn("__q__", quantize_vec_expr(F.col(vec_col), scale))
        .withColumn("__xx__", int_dot_expr(F.col("__q__"), F.col("__q__")))
        .withColumn("cid", _assign_expr(router))
        .localCheckpoint(eager=False)
        if router
        else None
    )
    books = train_pq(sample, vec_col, id_col, m=pq_m, k=pq_codes, iters=iters, scale=scale)
    enc_pq = encode_pq(sample, vec_col, id_col, books, scale).localCheckpoint(
        eager=False
    )
    enc_pqr = None
    if rerank is not None:
        if rerank < k:
            raise ValueError(f"rerank must be >= k, got {rerank} < {k}")
        enc_pqr = enc_pq.join(
            sample.select(
                F.col(id_col),
                quantize_vec_expr(F.col(vec_col), scale).alias("qvec"),
            ),
            id_col,
        ).localCheckpoint(eager=False)

    types = ["sq", "sq_ivf", "pq"] + (["pq_r"] if rerank is not None else [])
    hits = {t: [0, 0] for t in types}  # [n_exact, n_hit]
    for _qid, q in queries:
        ex_dot = _exact_dot(q)
        ex_l2 = _exact_l2(q)
        qscale, qcodes = quantize_query(q)
        got_sq = _ids(_sq_score_topk(enc_sq, id_col, qscale, qcodes, k))
        hits["sq"][0] += len(ex_dot)
        hits["sq"][1] += len(set(ex_dot) & set(got_sq))
        if pre is not None:
            probes, _, _ = _select_probes(router, q, scale, nprobe)
            pruned = quantize_embeddings(
                pre.where(F.col("cid").isin(probes)), vec_col, id_col,
                out_col="__qv__", scale_col="__sc__",
            )
            got_ivf = _ids(_sq_score_topk(pruned, id_col, qscale, qcodes, k))
            hits["sq_ivf"][0] += len(ex_dot)
            hits["sq_ivf"][1] += len(set(ex_dot) & set(got_ivf))
        tab = adc_table(q, books, scale)
        from gluestick_spark.llm.pq import _adc_dist_expr

        got_pq = _ids(
            enc_pq.select(F.col(id_col), _adc_dist_expr(tab).alias("__d__"))
            .orderBy(F.asc("__d__"), F.asc(id_col))
            .limit(k)
        )
        hits["pq"][0] += len(ex_l2)
        hits["pq"][1] += len(set(ex_l2) & set(got_pq))
        if enc_pqr is not None:
            from math import floor as _floor

            from gluestick_spark.llm.pq import _rerank_tail

            qq = [_floor(x * scale + 0.5) for x in q]
            cand = (
                enc_pqr.select(
                    F.col(id_col),
                    _adc_dist_expr(tab).alias("pq_dist"),
                    F.col("qvec"),
                )
                .orderBy(F.asc("pq_dist"), F.asc(id_col))
                .limit(rerank)
            )
            got_pqr = _ids(_rerank_tail(cand, id_col, qq, k))
            hits["pq_r"][0] += len(ex_l2)
            hits["pq_r"][1] += len(set(ex_l2) & set(got_pqr))

    rows = []
    for t in types:
        n_exact, n_hit = hits[t]
        recall = 10000 if n_exact == 0 else int((10000 * n_hit) // n_exact)
        rows.append((t, len(queries), k, n_exact, n_hit, recall))
    return spark.createDataFrame(rows, schema)


def _probe_centroids_expr(
    centroids: list[list[float] | None], nprobe: int, qcol: str
) -> Column:
    """Per-row probe selection against FLOAT centroid literals — the
    Catalyst twin of :func:`_probe_centroids`, operation-for-operation
    (sequential left-fold sums, ``sqrt(cc)·sqrt(qq)`` denominator,
    ``0.0`` on zero denominator, descending similarity with ties to the
    LARGER centroid index — Python's ``sorted(reverse=True)`` on
    ``(s, i)`` tuples). ``qcol`` is the query-vector column NAME; the
    whole expression is SQL text parsed once (k·d float-literal Column
    trees cost thousands of py4j roundtrips — the r15 profile's
    driver-side tax). ``repr(float)``+``D`` renders each literal as the
    shortest roundtrip decimal, which Java parses back to the identical
    double, and the unrolled dot keeps the fold's left-associated IEEE
    order — probe choice is bit-identical. Returns ``array<int>``."""
    # left-fold x·x sum, same order as aggregate(transform(...))
    qn_sql = f"sqrt(aggregate(transform({qcol}, x -> x * x), 0.0D, (acc, x) -> acc + x))"
    structs = []
    for i, c in enumerate(centroids):
        if c is None:  # tombstoned slot (ivf_rebalance): never probed
            continue
        cn = math.sqrt(sum(x * x for x in c))
        # fold form, not unrolled: k·d unrolled terms in one expression
        # overflow janino's 64 KB method limit (see cluster._dot_fold_sql);
        # the fold is byte-identical to the pre-r15 Column-API runtime
        vals = ", ".join(f"{float(x)!r}D" for x in c)
        dot = (
            f"aggregate(zip_with({qcol}, array({vals}), (a, b) -> a * b), "
            "0.0D, (acc, x) -> acc + x)"
        )
        denom = f"({cn!r}D * __qn__)"
        s = f"CASE WHEN {denom} != 0.0D THEN ({dot}) / {denom} ELSE 0.0D END"
        # ascending sort on (-s, -i) == Python's descending (s, i)
        structs.append(f"struct(-({s}) AS d, {-i} AS mi)")
    return F.expr(
        "transform(slice(array_sort(array({ss})), 1, {np}), x -> -x.mi)".format(
            ss=", ".join(structs), np=int(nprobe)
        ).replace("__qn__", qn_sql)
    )


def ivf_topk_indexed_batch(
    spark,
    path: str,
    queries_df: DataFrame,
    centroids: list[list[float] | None],
    query_id_col: str,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched serving against a :func:`materialize_ivf` index — the
    plain-family member of the round-15 batched-retrieval trio (IVF×SQ:
    :func:`~gluestick_spark.llm.cluster.sq_ivf_topk_indexed_batch`,
    IVF×PQ: :func:`~gluestick_spark.llm.pq.pq_ivf_topk_indexed_batch`).
    ``queries_df`` carries (``query_id_col``, ``vec_col``); the result
    is (query, id, ``similarity``), per query row-for-row identical to
    :func:`ivf_topk_indexed` (agreement pytest-pinned).

    Plan: ONE narrow pass selects each query's ``nprobe`` probe lists
    against the float centroid literals (:func:`_probe_centroids_expr`);
    the union of probed ids (collected, bounded by the centroid count)
    prunes the partitioned scan; one ``centroid_id``-keyed join scores
    candidates with the column-to-column :func:`cosine_expr`; per-query
    top-k via a window (similarity desc, id asc). Tombstoned ids are
    anti-joined out. Cost Σ_q |probed lists_q| — one job, no driver
    loop."""
    from pyspark.sql import Window

    from .index_commit import require_committed

    if nprobe < 1 or k < 1:
        raise ValueError("nprobe >= 1 and k >= 1 required")
    require_committed(path, "ivf")  # a torn append must not be probed
    probes = _probe_centroids_expr(centroids, nprobe, vec_col)
    qx = queries_df.select(
        F.col(query_id_col).alias("__qid__"),
        F.col(vec_col).alias("__qv__"),
        F.explode(probes).alias("centroid_id"),
    ).localCheckpoint(eager=False)  # pinned: feeds the probed-id collect
    # AND the join; lazy — the collect below materializes it
    probed = sorted(
        {r["centroid_id"] for r in qx.select("centroid_id").distinct().collect()}
    )
    if not probed:
        return (
            queries_df.select(F.col(query_id_col))
            .limit(0)
            .withColumn(id_col, F.lit(None).cast("long"))
            .withColumn("similarity", F.lit(None).cast("double"))
        )
    cand = qx.join(
        spark.read.parquet(path).where(F.col("centroid_id").isin(probed)),
        "centroid_id",
    )
    from .index_delete import filter_tombstoned

    cand = filter_tombstoned(spark, path, cand, id_col)
    sim = cosine_expr(F.col(vec_col), F.col("__qv__"))
    w = Window.partitionBy("__qid__").orderBy(
        F.col("similarity").desc(), F.col(id_col).asc()
    )
    return (
        cand.select(F.col("__qid__"), F.col(id_col), sim.alias("similarity"))
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .select(
            F.col("__qid__").alias(query_id_col),
            F.col(id_col),
            F.col("similarity"),
        )
        .orderBy(
            F.asc(query_id_col), F.col("similarity").desc(), F.asc(id_col)
        )
    )
