"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point — these must survive 100 TB):
- **exact_dedup**: hash-groupBy. One shuffle on the content hash; keep-min
  representative is a window on the hash key. At scale, AQE handles skew
  (identical boilerplate documents land in one hash bucket).
- **minhash_lsh**: shingle → one xxhash64 → K affine permutations mod 2³¹-1
  (all JVM expressions) → band into B buckets → self-join per bucket →
  verify candidates with exact Jaccard. The *only* pairwise work happens
  inside LSH buckets, never across the full corpus (O(N²) avoided). Bucket
  join is a shuffle on (band_id, band_hash); hot buckets (e.g. empty docs)
  are the skew risk — ``max_bucket`` drops buckets over the cap before the
  self-join (implemented in ``_cap_buckets``, available on every bucketed
  operator here).
- **simhash**: 64-bit signature per doc from token hashes — pure expressions
  (explode-free: aggregate over the token array), near-dups = signatures at
  hamming distance ≤ d found by banding the 64 bits into chunks.
- **ngram_jaccard**: exact verified Jaccard for candidate pairs.

All hashes are Spark's ``xxhash64`` — deterministic across runs/executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..partitioning import ensure_min_partitions as _parallelize
from .text import shingles_expr, tokens_expr

__all__ = [
    "exact_dedup",
    "lsh_geometry",
    "plan_lsh_geometry",
    "lsh_candidate_probability",
    "minhash_signature_expr",
    "minhash_band_buckets",
    "minhash_lsh_candidates",
    "minhash_near_dup_pairs",
    "minhash_dedup",
    "cross_corpus_near_dup_pairs",
    "dedup_against",
    "materialize_band_index",
    "dedup_against_indexed",
    "cross_corpus_near_dup_pairs_indexed",
    "connected_components",
    "cluster_dedup",
    "cluster_dedup_by",
    "cluster_size_histogram",
    "simhash_expr",
    "simhash_signature_udf",
    "simhash_near_dups",
    "jaccard_expr",
    "lsh_recall_audit",
    "containment_pairs",
    "embedding_near_dups",
    "embedding_dedup",
]

# Default bucket-width cap for the bucketed self-joins below. A bucket of
# width w contributes w·(w-1)/2 candidate pairs; 8192 bounds any single
# bucket at ~33M pairs — far above anything a healthy signature
# distribution produces (expected width is held near ``target_bucket`` by
# the adaptive geometry), so it only trims degenerate buckets (empty docs,
# boilerplate) that would otherwise go quadratic at corpus scale. It is
# deliberately larger than the whole corpus at every oracle-test scale
# (sf≤0.1 ⇒ N≤5000 docs < 8192), so the exact-oracle comparisons can never
# see it bind.
DEFAULT_MAX_BUCKET = 8192


def lsh_geometry(
    n: int,
    target_bucket: int = 16,
    min_bits: int = 4,
    max_bits: int = 15,
) -> int:
    """Piece width (bits) for a bucketed LSH self-join, sized to corpus ``n``.

    Expected bucket width under a uniform signature is n / 2^bits; holding it
    near ``target_bucket`` keeps the per-bucket self-join constant-cost as the
    corpus grows: bits ≈ log2(n) − log2(target_bucket). A fixed piece width
    (the round-3 design) means bucket width — and candidate pairs — grow
    linearly (quadratically) with n; this is the 100×-scale fix.

    ``max_bits`` defaults to 15 so chunks×bits stays under the 63 sign-safe
    bits of a long signature with the default 4 chunks. Beyond
    n ≈ target·2^15 per-bucket width grows again — cap it with
    ``max_bucket`` (see :data:`DEFAULT_MAX_BUCKET`).
    """
    import math

    if n <= target_bucket:
        return min_bits
    bits = math.ceil(math.log2(n / target_bucket))
    return max(min_bits, min(max_bits, bits))


def plan_lsh_geometry(
    num_perm: int = 64,
    threshold: float = 0.7,
    lean: str = "balanced",
) -> tuple[int, int, float]:
    """Choose MinHash banding ``(bands, rows, curve_threshold)`` from a
    similarity threshold — the standard S-curve planner (Leskovec/
    Rajaraman/Ullman, *Mining of Massive Datasets* §3.4): with ``b``
    bands of ``r`` rows a pair of similarity ``s`` becomes a candidate
    with probability ``1 − (1 − s^r)^b``, whose inflection sits at
    approximately ``(1/b)^(1/r)``. Picking the geometry by hand (the
    bands=16 default) is fine until the threshold moves; at 100 TB a
    mis-leaned curve either floods the verify stage (too much recall)
    or silently drops true pairs (too little).

    ``lean`` breaks the discretization tie the divisor grid forces:

    - ``"balanced"`` — inflection nearest the threshold;
    - ``"recall"``   — nearest inflection AT OR BELOW the threshold (the
      curve is already steep at the target similarity, so true pairs at
      the threshold are reliably surfaced; verify-stage cost rises);
    - ``"precision"`` — nearest inflection AT OR ABOVE the threshold
      (candidate volume bounded; true pairs near the threshold may be
      missed — pair with :func:`lsh_recall_audit`).

    Driver-side pure arithmetic (no data touched); compose with
    :func:`lsh_recall_audit` to MEASURE what the chosen curve delivers
    on the actual shingle distribution."""
    if num_perm < 1:
        raise ValueError(f"num_perm must be >= 1, got {num_perm}")
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if lean not in ("balanced", "recall", "precision"):
        raise ValueError(f"unknown lean {lean!r}")
    cands = []
    for b in range(1, num_perm + 1):
        if num_perm % b == 0:
            r = num_perm // b
            cands.append((b, r, (1.0 / b) ** (1.0 / r)))
    if lean == "recall":
        ok = [c for c in cands if c[2] <= threshold]
        if ok:
            return max(ok, key=lambda c: c[2])  # closest from below
    elif lean == "precision":
        ok = [c for c in cands if c[2] >= threshold]
        if ok:
            return min(ok, key=lambda c: c[2])  # closest from above
    return min(cands, key=lambda c: abs(c[2] - threshold))


def lsh_candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(pair of Jaccard similarity ``s`` becomes an LSH candidate) under
    (bands, rows) banding: ``1 − (1 − s^rows)^bands``. The audit-side
    companion of :func:`plan_lsh_geometry`."""
    return 1.0 - (1.0 - s**rows) ** bands


def _cap_buckets(buckets: DataFrame, key_cols: list[str], max_bucket: int | None) -> DataFrame:
    """Drop LSH buckets wider than ``max_bucket`` before the self-join.

    A bucket of width w contributes w·(w-1)/2 candidate pairs — one degenerate
    bucket (empty docs, boilerplate) makes the join quadratic at corpus scale.
    Docs in an oversized bucket are near-identical under the signature; exact
    hash dedup (:func:`exact_dedup`) already collapses the truly identical
    ones, so dropping the pathological bucket loses only pathological pairs.
    The width count is a window over the same (band, bucket) partitioning the
    join shuffles on, so AQE reuses the exchange.
    """
    if max_bucket is None:
        return buckets
    w = Window.partitionBy(*key_cols)
    return (
        buckets.withColumn("__bw__", F.count("*").over(w))
        .where(F.col("__bw__") <= max_bucket)
        .drop("__bw__")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: str | list[str],
    id_col: str,
) -> DataFrame:
    """Keep one representative row (min ``id_col``) per exact content hash.

    Plan: md5 projection → window on hash ordered by id → filter rank 1.
    Single shuffle, map-side-combinable.
    """
    cols = [content_cols] if isinstance(content_cols, str) else list(content_cols)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    w = Window.partitionBy("__h__").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h__", h)
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__h__", "__rn__")
    )


# MinHash permutation family: each shingle is hashed ONCE (xxhash64 → 31-bit
# via mod p), then permutation i is the affine map h → (aᵢ·h + bᵢ) mod p —
# the standard universal-hashing construction (64 long mul-adds per shingle
# instead of 64 full string hashes; ~4x faster and codegen-friendly).
# p = 2³¹-1 keeps aᵢ·h < 2⁶² so ANSI-mode long arithmetic can't overflow.
_MINHASH_P = 2_147_483_647


def _minhash_perms(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P)) for _ in range(num_perm)]


def minhash_signature_expr(shingles: Column, num_perm: int = 64) -> Column:
    """MinHash signature as a single per-row expression (array<long> of
    length ``num_perm``) — **zero shuffle**.

    The permutation constants live in a literal array and the hashed-shingle
    array is bound as a lambda variable (evaluated once per row — lambda
    bodies get no common-subexpression elimination), so the whole signature
    is one nested loop: ``transform(perms, p -> array_min(transform(hs,
    h -> (h·pₐ + p_b) mod p)))``. Same O(num_perm · shingles) arithmetic as
    an explode + groupBy formulation, but with no N×S-row shuffle — at
    corpus scale that shuffle IS the cost, so the per-row form wins
    asymptotically (and measures faster locally too).

    NOTE — do not "optimize" this into an Arrow pandas_udf (the simhash
    hybrid pattern): in this Spark build, a pandas UDF whose argument is a
    higher-order-function expression loses its ArrowEvalPython extraction
    on every query after the first in a session (the raw PythonUDF lands
    in an interpreted projection → INTERNAL_ERROR "Cannot evaluate
    expression"); reproduced on a vanilla session, reverted here. The
    interpreted-lambda fold costs ~1.9s over 5000 docs at sf0.1 — real but
    not worth a correctness-flaky path.
    """
    perm_arr = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _minhash_perms(num_perm)
        ]
    )
    hs = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P)))

    def per_row(hsv: Column) -> Column:
        return F.transform(
            perm_arr,
            lambda p: F.array_min(
                F.transform(hsv, lambda h: F.pmod(h * p["a"] + p["b"], F.lit(_MINHASH_P)))
            ),
        )

    return F.element_at(F.transform(F.array(hs), per_row), 1)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) via :func:`minhash_signature_expr` — one
    narrow projection, no shuffle. Empty docs shingle to ``[""]`` (see
    ``shingles_expr``), so every row gets a well-defined signature."""
    sig = minhash_signature_expr(
        F.array_distinct(shingles_expr(F.col(text_col), shingle_n)), num_perm
    )
    return _parallelize(df, id_col).select(
        F.col(id_col).alias("__id__"), sig.alias("__sig__")
    )


def minhash_band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(``__id__``, ``band``, ``bucket``) LSH band-bucket rows — the
    persistable half of the LSH index. Two docs are candidates iff they
    share a (band, bucket). bands × N tiny rows, no shuffle of its own;
    the streaming dedup stores exactly this frame as its incremental
    index state."""
    with_sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    return _explode_bands(with_sig, num_perm, bands)


def _explode_bands(with_sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(``__id__``, band, bucket) rows from a (``__id__``, ``__sig__``)
    signature frame — the banding half of :func:`minhash_band_buckets`,
    shared with the shingle-store-fed index build."""
    rows_per_band = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("__sig__", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return with_sig.select("__id__", F.explode(band_structs).alias("bb")).select(
        "__id__", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Returns distinct (``a``, ``b``) id pairs (a < b) that collide in ≥1 band.
    rows = bands × rows_per_band; two docs with Jaccard j collide w.p.
    1-(1-j^r)^b. Defaults (64 perms, 16 bands of 4) target j ≳ 0.5.
    ``max_bucket`` caps bucket width (see :func:`_cap_buckets`) — set it at
    corpus scale to keep one hot bucket from going quadratic.
    """
    buckets = minhash_band_buckets(df, text_col, id_col, num_perm, bands, shingle_n)
    # Materialization point: the self-join below reads `buckets` twice, and
    # without an exchange here each branch would recompute the signatures
    # from the scan (the per-row signature has no shuffle of its own). One
    # repartition on the join keys makes the signature stage a shared
    # shuffle both branches reuse — and the join needs exactly this
    # partitioning anyway, so it adds no extra data movement. Rows are just
    # (id, band, bucket): ~bands×N tiny rows vs the old N×shingles shuffle.
    buckets = buckets.repartition("band", "bucket")
    buckets = _cap_buckets(buckets, ["band", "bucket"], max_bucket)
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id__") < F.col("r.__id__")),
        )
        .select(F.col("l.__id__").alias("a"), F.col("r.__id__").alias("b"))
        .distinct()
    )
    return pairs


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def lsh_recall_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    sample_rate: float = 0.1,
    seed: str = "",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Production guardrail for the LSH candidate generator: on a
    deterministic hash sample of the corpus, compute the EXACT
    ≥-threshold pair set (brute force — affordable because it is the
    sample) and the LSH candidate set, and report how many true pairs
    the banding actually surfaced. One row:
    (``n_sampled``, ``n_exact``, ``n_candidates``, ``n_hit``,
    ``recall_bp``) with ``recall_bp = floor(10000·n_hit / n_exact)``
    (10000 when the sample holds no true pairs — vacuous recall).

    Run this on every corpus refresh: banding geometry tuned for one
    shingle distribution silently loses recall when the distribution
    shifts (shorter docs → fewer shingles → noisier signatures), and
    nothing else in a dedup pipeline will tell you.

    Determinism: the sample is the portable keyed hash (re-runs audit
    the SAME sample); counts are exact integers. No SQL oracle — the
    candidate set depends on xxhash64 signatures DuckDB cannot replay
    (same evidence class as PCA/BPE training: pytest-pinned).

    Scale: brute force costs |sample|² pairwise Jaccards — pick
    ``sample_rate ∝ 1/√N`` (or cap the sampled count upstream) for a
    constant-cost audit; the LSH side is the normal banding cost on the
    sample.
    """
    from .sampling import hash_sample

    s = hash_sample(df, id_col, sample_rate, seed)
    sh = _shingle_sets(s, text_col, id_col, shingle_n, "a").localCheckpoint(
        eager=False
    )
    shb = sh.select(
        F.col("a").alias("b"), F.col("__sh_a__").alias("__sh_b__")
    )
    exact = (
        sh.crossJoin(shb)
        .where(F.col("a") < F.col("b"))
        .where(
            jaccard_expr(F.col("__sh_a__"), F.col("__sh_b__"))
            >= F.lit(float(threshold))
        )
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    cand = minhash_lsh_candidates(
        s, text_col, id_col, num_perm, bands, shingle_n, max_bucket
    )
    hit = exact.join(cand, ["a", "b"], "left_semi")
    counts = (
        s.agg(F.count("*").alias("n_sampled"))
        .crossJoin(F.broadcast(exact.agg(F.count("*").alias("n_exact"))))
        .crossJoin(F.broadcast(cand.agg(F.count("*").alias("n_candidates"))))
        .crossJoin(F.broadcast(hit.agg(F.count("*").alias("n_hit"))))
    )
    recall = F.when(F.col("n_exact") == 0, F.lit(10000).cast("long")).otherwise(
        F.floor(
            (F.col("n_hit") * F.lit(10000)).cast("long").cast("double")
            / F.col("n_exact").cast("double")
        )
    )
    return counts.select(
        "n_sampled", "n_exact", "n_candidates", "n_hit",
        recall.alias("recall_bp"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    tau_pct: int = 80,
    max_doc_freq: int = 20,
) -> DataFrame:
    """Directed near-CONTAINMENT pairs: (``src``, ``dst``, ``n_common``,
    ``n_src``, ``containment``) where ≥ ``tau_pct``% of src's rare
    shingles also appear in dst. The asymmetric dedup case Jaccard
    misses entirely: a short document quoted whole inside a long one
    has tiny Jaccard (|A∩B|/|A∪B| is diluted by B's size) but
    containment |A∩B|/|A| ≈ 1 — quote inclusion, boilerplate wrapping,
    article-plus-comments pages.

    Semantics note (the honest part): both the numerator and |A| are
    counted over the RARE-shingle subset — shingles appearing in more
    than ``max_doc_freq`` documents are dropped FIRST (stop-shingle
    suppression). That is what makes the inverted-index join bounded —
    per-gram join cost ≤ df² ≤ cap·df, so total cost ≤ cap·|grams|,
    linear in the corpus at fixed cap — and the oracle replays the
    same cap, so the filter is part of the contract, not a hidden
    approximation. Documents with ZERO rare shingles (pure boilerplate)
    cannot be judged and emit no pairs.

    Determinism: the threshold test is exact integer arithmetic
    (``100·n_common ≥ tau_pct·n_src``); ``containment`` is the IEEE
    division of two exact int64s. No floats anywhere else.

    Scale posture (100 TB): explode → ONE doc-frequency aggregate
    (map-side combined) → frequency-capped inverted-index self-join
    keyed by shingle → two keyed aggregates. The gram frame is
    persisted once (reused by the DF count and the join); no all-pairs
    stage exists at any step.
    """
    if not 0 < tau_pct <= 100:
        raise ValueError(f"tau_pct must be in (0, 100], got {tau_pct}")
    if max_doc_freq < 2:
        raise ValueError(f"max_doc_freq must be >= 2, got {max_doc_freq}")
    # grams is deliberately NOT materialized: it is evaluated twice (the
    # DF aggregate and the rare join) — at corpus scale recomputing the
    # shingle explosion twice is cheaper than storing it (several× the
    # corpus in exploded strings). rare IS lazily localCheckpointed: it
    # is post-cap (bounded), feeds three downstream uses, and a plain
    # persist would be voided by any unpersist-before-return.
    grams = _parallelize(df, id_col).select(
        F.col(id_col).alias("src"),
        F.explode(
            F.array_distinct(shingles_expr(F.col(text_col), shingle_n))
        ).alias("__g__"),
    )
    gdf = grams.groupBy("__g__").agg(F.count("*").alias("__df__"))
    rare = (
        grams.join(gdf.where(F.col("__df__") <= max_doc_freq), "__g__")
        .select("src", "__g__")
        .localCheckpoint(eager=False)
    )
    sizes = rare.groupBy("src").agg(F.count("*").alias("n_src"))
    common = (
        rare.join(
            rare.select(F.col("src").alias("dst"), "__g__"), "__g__"
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes, "src")
        .where(
            F.lit(100).cast("long") * F.col("n_common")
            >= F.lit(int(tau_pct)).cast("long") * F.col("n_src")
        )
        .select(
            "src",
            "dst",
            "n_common",
            "n_src",
            (
                F.col("n_common").cast("double") / F.col("n_src").cast("double")
            ).alias("containment"),
        )
    )
    return out


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Verified near-dup pairs: LSH candidates → exact-Jaccard verify.

    Returns (``a``, ``b``, ``jaccard``) with a < b and jaccard ≥ ``threshold``.
    Unlike the raw candidate set (which carries band-collision false
    positives), this output is exact-similarity-defined: when the banding has
    full recall at ``threshold`` it equals the brute-force all-pairs result,
    which is what the correctness oracle checks.

    At scale the verify joins shingle arrays back in — two
    broadcast-or-shuffle hash joins on the id column, never O(N²).
    """
    # Pinned: (a, b) id pairs only — tiny rows, the connected_components
    # edge pattern — because the verify below references the candidate
    # set three times (two survivor semi-joins + the pair join) and the
    # signature/bucket chain must run once, not three times.
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_perm, bands, shingle_n, max_bucket
    ).localCheckpoint(eager=False)
    # Exact-Jaccard verify: shingle once per candidate DOCUMENT per side
    # (corpus semi-joined to the pair ids), then hash-join the arrays to
    # the pairs. This dominates both alternatives in every regime:
    # shingling every corpus doc pays for non-candidates (sparse-dup
    # corpora), while shingling per pair OCCURRENCE recomputes a hot
    # doc's set once per partner — on dup-heavy corpora pairs/doc is
    # unbounded (a replica family of R contributes C(R,2) pairs; the
    # 10x replica probe measured 48 s vs 12 s). Survivor-doc scale is
    # min(corpus, 2·pairs) by construction (guide §8: every pass but
    # the last operates on a lightweight proxy / survivors).
    def _survivor_shingles(key: str) -> DataFrame:
        ids = cand.select(F.col(key).alias(id_col)).distinct()
        return df.join(ids, id_col, "leftsemi").select(
            F.col(id_col).alias(key),
            F.array_distinct(shingles_expr(F.col(text_col), shingle_n)).alias(
                f"__sh{key}__"
            ),
        )

    # arrays arrive as real join-output columns, so jaccard_expr's two
    # reads (intersect + union) never recompute the shingle HOF (which
    # gets no codegen CSE)
    j = cand.join(_survivor_shingles("a"), "a").join(_survivor_shingles("b"), "b")
    return (
        j.withColumn("jaccard", jaccard_expr(F.col("__sha__"), F.col("__shb__")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate removal: LSH candidates → exact-Jaccard verify →
    drop the higher id of each confirmed pair (union-find-free greedy,
    deterministic). Returns the deduplicated DataFrame."""
    verified = minhash_near_dup_pairs(
        df, text_col, id_col, threshold, num_perm, bands, shingle_n, max_bucket
    )
    drop_ids = verified.select(F.col("b").alias(id_col)).distinct()
    return df.join(drop_ids, on=id_col, how="left_anti")


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): for every node u, connect each strictly-larger neighbor to
    min(N(u) ∪ {u}). One groupBy-min + one hash join back on u — no
    collect_list, so a hot node never materializes its adjacency in one task.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("mn"), F.col("u"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large→small; for every node u,
    connect u and each smaller neighbor to its minimum smaller neighbor."""
    dir_ = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = dir_.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        dir_.join(mins, "u")
        .where(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .union(mins.select(F.col("u"), F.col("mn").alias("v")))
        .distinct()
    )


_CC_LOCAL_MAX_EDGES = 1 << 16
"""Edge-count threshold below which :func:`connected_components` solves
the graph with driver-side union-find instead of the distributed star
loop. The same size-adaptive strategy switch as a broadcast join: a
verified near-dup pair graph is orders of magnitude smaller than its
corpus, and when it fits comfortably on the driver (64k edges ≈ 1 MB),
every distributed round — two aggregates, two joins, a checkpoint and a
convergence check of SUB-SECOND data — is pure scheduling floor (and at
cluster scale, pure driver round-trips). Above the threshold the
O(log n)-round star contraction runs unchanged. Both paths produce the
identical (id, min-of-component) labeling."""


def _cc_union_find(rows) -> dict:
    """Min-root union-find over collected (u, v) edge rows — the exact
    labeling the star-contraction fixpoint produces."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ru, rv = find(row[0]), find(row[1])
        if ru == rv:
            continue
        lo, hi = (ru, rv) if ru < rv else (rv, ru)
        parent[hi] = lo
    return {x: find(x) for x in parent} | {
        r: r for r in set(parent.values()) if parent.get(r, r) == r
    }


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs via alternating
    large-star/small-star contraction (Kiveris et al., MR-CC). Every node's
    label converges to the smallest id in its component. Returns
    (``id``, ``component``).

    This is the transitive-closure complement to the greedy pair-drop in
    :func:`minhash_dedup`: real corpus dedup clusters A~B~C even when A and
    C never collide directly, then keeps one representative per cluster
    (:func:`cluster_dedup`).

    Scale shape: each round is two groupBy-min aggregates + two hash joins,
    all keyed on node id. Unlike min-label propagation (rounds = component
    diameter — a chain of k successive near-edits needs k rounds),
    star contraction halves tree heights every alternation: **O(log n)
    rounds regardless of diameter**, so a pathological edit-chain corpus
    can't blow the iteration budget. Convergence = the edge set reaching a
    fixpoint (a star forest centered on component minima), checked with two
    cheap count jobs per round over the (shrinking) edge set;
    ``localCheckpoint`` truncates lineage so plans stay flat across rounds.

    Graphs at or under :data:`_CC_LOCAL_MAX_EDGES` distinct edges skip
    the loop entirely: the collected edge list (bounded, ~1 MB) goes
    through min-root union-find on the driver — identical labels, zero
    distributed rounds (r15; the broadcast-join-style size switch).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # LAZY pin + one bounded limit-collect replaces the r15 eager
    # checkpoint + count + collect (3 scheduled jobs → 1 for every graph
    # at or under the local bound — the common case; the collect is
    # bounded to _CC_LOCAL_MAX_EDGES+1 rows either way, so an oversized
    # graph wastes at most ~1 MB of driver transfer before taking the
    # distributed path)
    edges = (
        pairs.where(F.col(a_col) != F.col(b_col))
        .select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probe = edges.limit(_CC_LOCAL_MAX_EDGES + 1).collect()
    if len(probe) <= _CC_LOCAL_MAX_EDGES:
        labels = _cc_union_find(probe)
        spark = pairs.sparkSession
        from pyspark.sql.types import StructField, StructType

        utype = edges.schema["u"].dataType
        schema = StructType(
            [
                StructField("id", utype, True),
                StructField("component", utype, True),
            ]
        )
        return spark.createDataFrame(
            sorted(labels.items()), schema
        )
    n_edges = edges.count()
    # Nodes come from the CHECKPOINTED edge set, not from `pairs`: the pairs
    # frame is typically an expensive un-cached plan (LSH + verify), and
    # reading it a second time would re-run that whole pipeline when the
    # result is evaluated. Self-pair-only nodes (a == b) carry no edge and
    # need no label (cluster_dedup keeps unlabeled rows as-is).
    nodes = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    for _ in range(max_iter):
        # lazy pin: the convergence count right below materializes it
        new_edges = _small_star(_large_star(edges)).localCheckpoint(
            eager=False
        )
        n_new = new_edges.count()
        # Sets are distinct-deduped: equal counts + empty (new − old) ⇒ equal.
        if n_new == n_edges and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new
    else:
        # Fail loudly: returning an unconverged forest would silently split
        # real clusters (under-dedup). O(log n) rounds means hitting this
        # bound indicates a bug or an adversarial graph, not normal data.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            f"raise max_iter"
        )
    # Fixpoint is a star forest: non-root nodes have exactly one edge u→min;
    # roots (component minima, and nodes that arrived in no pair) label
    # themselves.
    return nodes.join(edges, nodes.id == edges.u, "left").select(
        "id", F.coalesce(F.col("v"), F.col("id")).alias("component")
    )


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Keep one representative row (the min id) per near-dup cluster, where
    clusters are the connected components of ``pairs``. Rows in no pair are
    kept as-is. The drop set is (nodes) − (component representatives) — an
    anti-join, never a full-table shuffle of ``df``."""
    comps = connected_components(pairs, a_col, b_col)
    drop_ids = comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop_ids, on=id_col, how="left_anti")


def cluster_dedup_by(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: str,
    a_col: str = "a",
    b_col: str = "b",
    descending: bool = True,
) -> DataFrame:
    """Like :func:`cluster_dedup`, but the survivor of each near-dup
    cluster is chosen by ``order_col`` (default: highest value wins — e.g.
    a quality score, so dedup keeps the BEST copy, not the lowest id; ties
    break on min id for determinism). Rows in no pair are kept as-is.

    This is the real-pipeline form: corpus dedup that drops the
    higher-quality replica loses data quality for free, and the choice
    costs nothing extra — one join of the component table (pairs-scale,
    not corpus-scale) against df's (id, order) projection, one rank window
    keyed on the component, then the same anti-join as cluster_dedup. df
    is still never fully shuffled.
    """
    from pyspark.sql.window import Window

    comps = connected_components(pairs, a_col, b_col)
    ranked = comps.join(
        df.select(F.col(id_col).alias("id"), F.col(order_col).alias("__o__")),
        "id",
    )
    order_val = F.col("__o__").desc() if descending else F.col("__o__").asc()
    w = Window.partitionBy("component").orderBy(order_val, F.col("id").asc())
    drop_ids = (
        ranked.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop_ids, on=id_col, how="left_anti")


def cluster_size_histogram(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Dedup telemetry: the distribution of near-dup cluster sizes —
    (``cluster_size``, ``n_clusters``), clusters ≥ 2 only (singletons
    never enter ``pairs``). The report every dedup run should publish:
    a sudden mass of giant clusters means a boilerplate explosion or a
    broken near-dup threshold, caught BEFORE :func:`cluster_dedup` deletes
    most of a corpus.

    Plan: connected components (O(log n) star-contraction rounds), then
    two map-side-combined aggregates over the tiny (id, component) table.
    """
    comps = connected_components(pairs, a_col, b_col)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    dim: int | None = None,
    num_planes: int | None = None,
    chunks: int = 4,
    seed: int = 42,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    target_bucket: int = 16,
    n: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH banding.

    ``num_planes`` seeded random hyperplanes give each vector a sign-bit
    signature; the signature is banded into ``chunks`` pieces and pairs
    agreeing on ≥1 piece (same piece id + value) are candidates — near-equal
    embeddings agree on most sign bits, so by pigeonhole any pair within
    ``chunks-1`` differing bits shares a piece. Candidates are verified with
    exact cosine ≥ ``threshold``. Returns (a, b, cosine) with a < b.

    Scale: buckets carry only (id, chunk, piece); vectors are joined back
    for the verify step — two hash joins on the id, never an N² cross join.
    Piece width (num_planes/chunks bits) sets bucket fan-out: 2^width
    buckets per chunk, expected width n/2^width. With ``num_planes=None``
    (the default) the width adapts to the corpus via :func:`lsh_geometry`,
    sized from ``n`` — pass it when you already know the corpus size
    (geometry needs only the order of magnitude), else one ``count()`` job
    runs (cheap for a parquet scan, a full materialization for a derived
    frame). This holds expected bucket width near ``target_bucket`` so the
    self-join stays linear as n grows — a fixed geometry makes candidate
    pairs grow as n²/buckets. Recall per piece is
    (1−θ/π)^width for angle θ, so wider pieces trade recall for cost; raise
    ``chunks`` to win it back (overall recall 1−(1−(1−θ/π)^width)^chunks).
    """
    from .similarity import cosine_pairs_udf, hyperplane_signature_udf, random_hyperplanes

    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    if num_planes is None:
        bits_per = lsh_geometry(n if n is not None else df.count(), target_bucket)
        num_planes = chunks * bits_per
    planes = random_hyperplanes(dim, num_planes, seed)
    bits_per = num_planes // chunks
    sig = hyperplane_signature_udf(planes)(F.col(vec_col))
    base = _parallelize(df, id_col).select(F.col(id_col).alias("__id__"), sig.alias("__sig__"))
    # Materialization point: the bucket self-join below reads this twice;
    # an exchange AFTER the signature UDF makes it a shared shuffle stage
    # (computed once) instead of re-running the UDF over the corpus per
    # branch. Keyed by id — high cardinality — so local parallelism is
    # preserved; the join adds its own tiny (chunk, piece) exchanges.
    base = base.repartition("__id__")

    pieces = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("__sig__", c * bits_per)
                .bitwiseAND(F.lit((1 << bits_per) - 1))
                .alias("piece"),
            )
            for c in range(chunks)
        ]
    )
    keyed = base.select("__id__", F.explode(pieces).alias("p")).select(
        "__id__", F.col("p.chunk").alias("chunk"), F.col("p.piece").alias("piece")
    )
    keyed = _cap_buckets(keyed, ["chunk", "piece"], max_bucket)
    l, r = keyed.alias("l"), keyed.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.__id__") < F.col("r.__id__")),
        )
        .select(F.col("l.__id__").alias("a"), F.col("r.__id__").alias("b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
    return (
        cand.join(vecs.withColumnRenamed("__id__", "a").withColumnRenamed("__v__", "__va__"), "a")
        .join(vecs.withColumnRenamed("__id__", "b").withColumnRenamed("__v__", "__vb__"), "b")
        .withColumn("cosine", cosine_pairs_udf()(F.col("__va__"), F.col("__vb__")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def embedding_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    **kwargs,
) -> DataFrame:
    """Drop the higher id of each embedding-cosine near-dup pair (same
    greedy rule as :func:`minhash_dedup`)."""
    pairs = embedding_near_dups(df, vec_col, id_col, threshold, **kwargs)
    drop_ids = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(drop_ids, on=id_col, how="left_anti")


def simhash_expr(text: Column, bits: int = 64) -> Column:
    """SimHash signature (long) from whitespace tokens.

    For each bit position, sum +1/-1 over token hashes and take the sign.
    Expressed with aggregate() over the token array — one pass, no explode,
    no UDF.
    """
    toks = F.array_distinct(tokens_expr(F.lower(text)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(bit_sum(i) > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_signature_udf():
    """Arrow-batched SimHash from an ``array<long>`` of token hashes.

    Hybrid split: token strings are hashed JVM-side (``xxhash64`` inside
    codegen); the 64-bit majority vote — which as pure expressions is 64
    array folds per row and overflows whole-stage codegen — is one numpy
    bit-matrix per batch. Bit-identical to :func:`simhash_expr`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts

    def _sig(hashes):
        out = np.zeros(len(hashes), dtype=np.uint64)
        for j, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            ones = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            out[j] = ((ones * 2 > len(h)) * weights).sum(dtype=np.uint64)
        return pd.Series(out.astype(np.int64))

    _sig.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "long")


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into ``chunks``
    pieces; pairs agreeing on ≥1 piece are candidates (pigeonhole: any pair
    within hamming ≤ chunks-1 shares a piece); verify by exact hamming
    distance ≤ ``max_hamming``. Returns (a, b, hamming).

    ``chunks=None`` (default) resolves to ``max_hamming + 1`` — the FEWEST
    chunks that still guarantee full recall at ``max_hamming``, hence the
    WIDEST pieces (64//chunks bits) and the largest bucket fan-out
    2^width per chunk. The round-3 fixed ``chunks=8`` gave 8-bit pieces
    (256 buckets) even when 16-bit pieces (65536 buckets) were admissible;
    bucket width — and the self-join — grows as N/2^width, so maximizing
    width is the 100×-scale fix. The pigeonhole guarantee makes the verified
    output exactly the all-pairs hamming ≤ ``max_hamming`` set regardless of
    geometry. For corpora where N/2^width still explodes (64-bit signatures
    cap width at 16 for d ≤ 3), ``max_bucket`` bounds any one bucket's
    contribution (see :func:`_cap_buckets` / :data:`DEFAULT_MAX_BUCKET`).
    """
    if chunks is None:
        # Clamped at 16 chunks (4-bit pieces): beyond max_hamming=15 the
        # full-recall guarantee is unattainable with a 64-bit signature
        # anyway (and at that radius banding barely prunes — candidates
        # approach all-pairs). So recall is guaranteed for max_hamming ≤ 15
        # and best-effort above.
        chunks = min(16, max_hamming + 1)
    bits_per = 64 // chunks
    token_hashes = F.transform(
        F.array_distinct(tokens_expr(F.lower(F.col(text_col)))), lambda t: F.xxhash64(t)
    )
    base = _parallelize(df, id_col).select(
        F.col(id_col).alias("__id__"),
        simhash_signature_udf()(token_hashes).alias("__sig__"),
    )
    # shared materialization for the two self-join branches (see
    # embedding_near_dups): the exchange sits AFTER the signature UDF so it
    # runs once, keyed by high-cardinality id to keep parallelism
    base = base.repartition("__id__")

    pieces = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("__sig__", c * bits_per)
                .bitwiseAND(F.lit((1 << bits_per) - 1))
                .alias("piece"),
            )
            for c in range(chunks)
        ]
    )
    keyed = base.select("__id__", "__sig__", F.explode(pieces).alias("p")).select(
        "__id__", "__sig__", F.col("p.chunk").alias("chunk"), F.col("p.piece").alias("piece")
    )
    keyed = _cap_buckets(keyed, ["chunk", "piece"], max_bucket)
    l, r = keyed.alias("l"), keyed.alias("r")
    ham = F.bit_count(F.col("l.__sig__").bitwiseXOR(F.col("r.__sig__")))
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.__id__") < F.col("r.__id__")),
        )
        .select(F.col("l.__id__").alias("a"), F.col("r.__id__").alias("b"), ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def cross_corpus_near_dup_pairs(
    df_new: DataFrame,
    df_ref: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Verified near-dup pairs BETWEEN two corpora — (``new_id``,
    ``ref_id``, ``jaccard``) with jaccard ≥ ``threshold`` — the batch form
    of "does this new crawl overlap the corpus I already have". Unlike the
    self-join family, within-corpus duplicates on either side are NOT
    reported: the join is strictly new × ref, so candidate volume scales
    with cross-corpus bucket collisions only.

    Scale shape mirrors :func:`minhash_lsh_candidates`: each side shuffles
    its (id, band, bucket) rows once (bands × N tiny rows, capped hot
    buckets per side), the candidate join is an equi-join on
    (band, bucket), and the exact-Jaccard verify joins shingles back by
    id. Id spaces may overlap between the corpora — pairs are oriented
    (new, ref), never compared by id order."""
    bn = minhash_band_buckets(df_new, text_col, id_col, num_perm, bands, shingle_n)
    br = minhash_band_buckets(df_ref, text_col, id_col, num_perm, bands, shingle_n)
    return _cross_pairs_core(
        bn,
        br,
        ("text", df_new, text_col, id_col, shingle_n),
        ("text", df_ref, text_col, id_col, shingle_n),
        threshold,
        max_bucket,
    )


def _shingle_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int, out: str
) -> DataFrame:
    return _parallelize(df, id_col).select(
        F.col(id_col).alias(out),
        F.array_distinct(shingles_expr(F.col(text_col), shingle_n)).alias(f"__sh_{out}__"),
    )


def _cross_pairs_core(
    bn: DataFrame,
    br: DataFrame,
    new_side,
    ref_side,
    threshold: float,
    max_bucket: int | None,
) -> DataFrame:
    """Shared tail of the cross-corpus candidate+verify plan: capped
    bucket equi-join (cost ∝ cross collisions) then exact-Jaccard verify.
    Both the direct and index-backed paths end here, so indexed ≡ direct
    by construction.

    Each side is either ``("text", df, text_col, id_col, shingle_n)`` —
    a raw corpus, shingled once per candidate DOCUMENT (the corpus
    semi-joined to the candidate ids; never per pair occurrence, which
    is unbounded on dup-heavy corpora, and never over every corpus
    document) — or ``("shingles", frame)`` — a persisted index whose
    stored shingle sets join directly (reading the store is the hash
    join's probe, not recomputation). The candidate pair set is pinned
    (id pairs only) because the text sides reference it for their
    survivor semi-joins."""
    bn = _cap_buckets(bn.repartition("band", "bucket"), ["band", "bucket"], max_bucket)
    br = _cap_buckets(br.repartition("band", "bucket"), ["band", "bucket"], max_bucket)
    cand = (
        bn.select(F.col("__id__").alias("new_id"), "band", "bucket")
        .join(br.select(F.col("__id__").alias("ref_id"), "band", "bucket"),
              ["band", "bucket"])
        .select("new_id", "ref_id")
        .distinct()
    )
    if new_side[0] == "text" or ref_side[0] == "text":
        cand = cand.localCheckpoint(eager=False)

    def _attach(j: DataFrame, side, key: str) -> DataFrame:
        if side[0] == "shingles":
            return j.join(side[1], key)
        _, sdf, text_col, id_col, shingle_n = side
        ids = cand.select(F.col(key).alias(id_col)).distinct()
        # shingle arrays computed once per surviving doc, attached as
        # real join-output columns (jaccard_expr's intersect + union
        # never recompute the HOF, which gets no codegen CSE)
        sh = sdf.join(ids, id_col, "leftsemi").select(
            F.col(id_col).alias(key),
            F.array_distinct(shingles_expr(F.col(text_col), shingle_n)).alias(
                f"__sh_{key}__"
            ),
        )
        return j.join(sh, key)

    j = _attach(_attach(cand, new_side, "new_id"), ref_side, "ref_id")
    return (
        j.withColumn("jaccard", jaccard_expr(F.col("__sh_new_id__"), F.col("__sh_ref_id__")))
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "ref_id", "jaccard")
    )


def dedup_against(
    df_new: DataFrame,
    df_ref: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Drop every ``df_new`` document with a near-duplicate in ``df_ref``
    (the incoming-crawl-vs-existing-corpus filter; the batch sibling of
    ``streaming_minhash_dedup``'s per-batch step). Returns the surviving
    ``df_new`` rows; ``df_ref`` is never modified and within-``df_new``
    duplicates are deliberately kept — run :func:`minhash_dedup` on the
    survivors for that."""
    pairs = cross_corpus_near_dup_pairs(
        df_new, df_ref, text_col, id_col, threshold,
        num_perm, bands, shingle_n, max_bucket,
    )
    doomed = pairs.select(F.col("new_id").alias(id_col)).distinct()
    return df_new.join(doomed, id_col, "left_anti")


# ------------------------------------------------------------------------
# Persisted LSH band index: sign the reference corpus ONCE, reuse it for
# every incoming crawl. materialize writes (band, bucket) rows plus the
# verify-stage shingle sets as parquet; the indexed dedup path reads them
# back instead of re-signing the reference — recurring-crawl ingest cost
# is O(new batch), the reference side untouched (same shape as
# ``similarity.materialize_ivf`` / ``ivf_topk_indexed``).
# ------------------------------------------------------------------------


def materialize_band_index(
    df_ref: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    mode: str = "overwrite",
) -> None:
    """Persist ``df_ref``'s LSH index at ``path``: ``bands/`` holds the
    (``__id__``, band, bucket) rows, ``shingles/`` the per-doc distinct
    shingle sets, ``_META.json`` the geometry. ``mode="append"`` adds a
    NEW reference batch to an existing index (O(batch) — nothing is
    re-signed; geometry must match the stored meta).

    Crash safety (ADVICE r8): the multi-step rewrite (shingles, then
    bands, then meta) is bracketed by a ``_INDEX_COMMIT`` marker —
    removed FIRST, re-written (atomic ``os.replace``) only after every
    component landed. A crash mid-rebuild leaves no marker, and
    ``_read_band_index`` refuses to serve the torn index loudly instead
    of silently mixing band and shingle tables from different corpora.

    One corpus pass (overwrite mode): the shingle sets are written
    FIRST, and the band signatures are derived from the just-written
    shingle store instead of re-shingling the corpus — the store IS the
    materialization the second pass needs (identical signatures: the
    stored arrays are the distinct shingle sets the signature fold
    consumes, and min/band-hash do not depend on array order). Append
    mode keeps the direct two-read form — the batch is small by the
    O(batch) contract, and the stored dir then holds OLD batches the
    band derivation must not re-emit."""
    import json as _json
    import os as _os

    meta = {"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n}
    meta_path = _os.path.join(path, "_META.json")
    commit_path = _os.path.join(path, "_INDEX_COMMIT")
    if mode == "append" and _os.path.isfile(meta_path):
        with open(meta_path) as f:
            stored = _json.load(f)
        if stored != meta:
            raise ValueError(
                f"band-index geometry mismatch: stored {stored}, got {meta}"
            )
    _os.makedirs(path, exist_ok=True)
    # invalidate BEFORE touching any component: readers fail loudly on a
    # mid-rebuild index rather than joining mismatched halves
    if _os.path.isfile(commit_path):
        _os.remove(commit_path)
    sh_path = _os.path.join(path, "shingles")
    _shingle_sets(df_ref, text_col, id_col, shingle_n, "__id__").withColumnRenamed(
        "__sh___id____", "__sh__"
    ).write.mode(mode).parquet(sh_path)
    if mode == "overwrite":
        stored = df_ref.sparkSession.read.parquet(sh_path)
        bb = _explode_bands(
            stored.select(
                "__id__",
                minhash_signature_expr(F.col("__sh__"), num_perm).alias("__sig__"),
            ),
            num_perm,
            bands,
        )
    else:
        bb = minhash_band_buckets(
            df_ref, text_col, id_col, num_perm, bands, shingle_n
        )
    bb.write.mode(mode).parquet(_os.path.join(path, "bands"))
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    tmp = commit_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, commit_path)


def _read_band_index(spark, path: str):
    import json as _json
    import os as _os

    if not _os.path.isfile(_os.path.join(path, "_INDEX_COMMIT")):
        raise ValueError(
            f"band index at {path} is uncommitted (torn write or "
            "mid-rebuild) — re-run materialize_band_index"
        )
    with open(_os.path.join(path, "_META.json")) as f:
        meta = _json.load(f)
    bands_df = spark.read.parquet(_os.path.join(path, "bands"))
    sh_ref = spark.read.parquet(_os.path.join(path, "shingles")).select(
        F.col("__id__").alias("ref_id"), F.col("__sh__").alias("__sh_ref_id__")
    )
    return bands_df, sh_ref, meta


def cross_corpus_near_dup_pairs_indexed(
    spark,
    df_new: DataFrame,
    index_path: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """:func:`cross_corpus_near_dup_pairs` against a materialized
    reference index — identical result (the candidate+verify tail is the
    same code path); only the new side is signed this run. Geometry comes
    from the index's ``_META.json``, so a drifted caller can't silently
    compare incompatible signatures."""
    br, sh_ref, meta = _read_band_index(spark, index_path)
    bn = minhash_band_buckets(
        df_new, text_col, id_col, meta["num_perm"], meta["bands"], meta["shingle_n"]
    )
    return _cross_pairs_core(
        bn,
        br,
        ("text", df_new, text_col, id_col, meta["shingle_n"]),
        ("shingles", sh_ref),  # persisted shingles: the join probes the store
        threshold,
        max_bucket,
    )


def dedup_against_indexed(
    spark,
    df_new: DataFrame,
    index_path: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """:func:`dedup_against` backed by a materialized reference index —
    the recurring-crawl fast path. Result is identical to the direct
    form; the reference corpus is read as its persisted (band, bucket)
    and shingle-set parquet, never re-signed."""
    pairs = cross_corpus_near_dup_pairs_indexed(
        spark, df_new, index_path, text_col, id_col, threshold, max_bucket
    )
    doomed = pairs.select(F.col("new_id").alias(id_col)).distinct()
    return df_new.join(doomed, id_col, "left_anti")


def component_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float],
    seed: str = "",
    split_col: str = "split",
    component_col: str = "component",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Leakage-safe train/val/test split (r14): near-duplicate
    CONNECTED COMPONENTS never straddle a split boundary. A plain
    :func:`~gluestick_spark.llm.sampling.hash_split` on the row id keeps
    each row's assignment stable but lets two near-identical documents
    land in train AND test — evaluation contamination by construction.
    Here each row is first labeled with its component over ``pairs``
    (:func:`connected_components` min-id labels; rows appearing in no
    pair are their own singleton component), then the split hashes the
    COMPONENT key — every member of a dup cluster travels together,
    with hash_split's contiguous-band nesting stability intact.

    Adds ``component_col`` and ``split_col``. Scale shape: the component
    labeling is the O(log n)-round star contraction over the PAIR graph
    only (near-dup pairs, not the corpus); the join back and the split
    are one keyed join + a narrow projection."""
    from .sampling import hash_split

    comp = connected_components(pairs, a_col, b_col).select(
        F.col("id").alias(id_col), F.col("component").alias(component_col)
    )
    withc = df.join(comp, id_col, "left").withColumn(
        component_col, F.coalesce(F.col(component_col), F.col(id_col))
    )
    return hash_split(withc, component_col, weights, seed=seed, split_col=split_col)
