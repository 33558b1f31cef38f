"""Product quantization (PQ) for embedding compression + ADC search —
deterministic, exactly replayable across engines.

Beyond-reference ANN operator (the reference at
/root/reference/gluestick is a pandas ETL toolkit with no vector ops).
PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") is the standard memory-reduction path for 100 TB-scale vector
corpora: split each d-dim vector into ``m`` subspaces, k-means each
subspace independently, and store only the ``m`` centroid ids — e.g.
64 floats (256 B) become 4 codes (4 B at k ≤ 256), a 64× compression
that lets a 1000-executor cluster hold the whole index in memory.
Search uses **asymmetric distance computation (ADC)**: the query stays
un-quantized; a tiny m×k lookup table of query→centroid distances is
computed once on the driver, and each row's approximate distance is
``Σ_j dtab[j][code_j]`` — a pure array-literal lookup, no vector math
per row.

Determinism contract (same device as ``llm/cluster.py``: the training
and encode paths reuse its integer-quantized Lloyd iteration, so a
DuckDB oracle replays codebook training, encoding, AND the search
bit-for-bit):

* Codebooks come from :func:`gluestick_spark.llm.cluster.kmeans` run
  per subspace — exact int64 state, hash-seeded, replayable.
* ADC table entries are **floored to integers**:
  ``dtab[j][c] = floor(10⁶ · num_c / n_c²)`` where the numerator is
  the exact int64 distance form. Python, Spark, and DuckDB all perform
  the identical IEEE-754 double division/multiply/floor, so the table
  is engine-independent; row distances are then exact int64 sums.

Scale posture (100 TB):

* **Training** samples fine (codebooks are statistics, not state) and
  runs m short driver-loop k-means — k·(d/m+1) ints per step.
* **Encode** is a single narrow projection: m argmin expressions over
  centroid literals (k·d total terms — k ≤ 256 stays well inside
  codegen limits), no join, no shuffle. Write the code column next to
  the id and drop the raw vectors.
* **Search** is scan + ``TakeOrderedAndProject``: per-partition
  partial top-k, only k rows per partition reach the driver — no
  global sort, no shuffle of the corpus.
"""

from __future__ import annotations

from math import floor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gluestick_spark.llm.cluster import (
    _assign_expr,
    int_dot_expr,
    kmeans,
    quantize_vec_expr,
)

__all__ = ["train_pq", "encode_pq", "pq_topk", "adc_table"]

Codebook = list[tuple[list[int], int]]  # [(sum_vector, count)] per centroid


def _subdim(df: DataFrame, vec_col: str, m: int) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("cannot train PQ on an empty frame")
    d = int(row["d"])
    if d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    return d // m


def train_pq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    scale: int = 1000,
) -> list[Codebook]:
    """Train ``m`` per-subspace codebooks; returns their integer states.

    Each subspace j covers dims ``[j·d/m, (j+1)·d/m)`` and is clustered
    independently with the deterministic Lloyd loop. Train on a sample
    at scale — the codebook is a statistic, not per-row state.
    """
    ds = _subdim(df, vec_col, m)
    books: list[Codebook] = []
    for j in range(m):
        sub = df.select(
            F.col(id_col), F.slice(F.col(vec_col), j * ds + 1, ds).alias("__sub__")
        )
        _, state = kmeans(
            sub, "__sub__", id_col, k=k, iters=iters, scale=scale,
            return_state=True,
        )
        if not state:
            raise ValueError("cannot train PQ on an empty frame")
        books.append(state)
    return books


def encode_pq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[Codebook],
    scale: int = 1000,
) -> DataFrame:
    """(id, ``code`` array<int>) — ONE narrow projection, no shuffle.

    code[j] is the argmin centroid of subspace j (exact int64 distance,
    ties to the smallest cid — identical semantics to kmeans assign).
    """
    m = len(codebooks)
    ds = len(codebooks[0][0][0])
    codes = []
    for j, book in enumerate(codebooks):
        q = quantize_vec_expr(F.slice(F.col(vec_col), j * ds + 1, ds), scale)
        xx = int_dot_expr(q, q)
        codes.append(_assign_expr(book, q=q, xx=xx))
    return df.select(F.col(id_col), F.array(*codes).alias("code"))


def adc_table(
    query: list[float], codebooks: list[Codebook], scale: int = 1000
) -> list[list[int]]:
    """m×k integer ADC table: floor(10⁶ · ‖q_j − c‖²) per centroid.

    Pure Python over exact ints + one IEEE division per entry — DuckDB
    reproduces every entry with the same double arithmetic.
    """
    m = len(codebooks)
    ds = len(codebooks[0][0][0])
    if len(query) != m * ds:
        raise ValueError(f"query dim {len(query)} != m·d/m = {m * ds}")
    qq = [floor(x * scale + 0.5) for x in query]
    tab: list[list[int]] = []
    for j, book in enumerate(codebooks):
        sub = qq[j * ds : (j + 1) * ds]
        xx = sum(v * v for v in sub)
        row = []
        for s, n in book:
            num = n * n * xx - 2 * n * sum(a * b for a, b in zip(sub, s)) + sum(
                v * v for v in s
            )
            # round-then-divide, exactly like Spark's cast("double")/lit and
            # DuckDB's CAST(... AS DOUBLE)/CAST(... AS DOUBLE): Python's
            # int/int would correctly-round the RATIONAL, which diverges
            # from round-first engines once |num| > 2^53
            row.append(floor(1e6 * (float(num) / float(n * n))))
        tab.append(row)
    return tab


def pq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    codebooks: list[Codebook],
    k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Top-k nearest rows to ``query`` under the PQ-ADC distance.

    Returns (id, ``pq_dist`` long) ordered by (pq_dist, id) — exact
    int64 sums of table entries, so the ranking (including every tie)
    replays identically in the oracle. Plan shape:
    ``TakeOrderedAndProject`` — per-partition partial top-k, no global
    sort, no shuffle.
    """
    tab = adc_table(query, codebooks, scale)
    enc = encode_pq(df, vec_col, id_col, codebooks, scale)
    dist = None
    for j, row in enumerate(tab):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in row])
        term = F.element_at(arr, F.element_at("code", j + 1) + 1)
        dist = term if dist is None else dist + term
    return (
        enc.select(F.col(id_col), dist.alias("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
