"""Entity resolution: blocked multi-field record linkage — the
Fellegi–Sunter-shaped "is this incoming CRM row the same customer?"
matcher an ETL pipeline runs before snapshot upserts can key on a
stable id. (The pandas reference at /root/reference/gluestick leaves
matching to its users; this is the beyond-reference operator for it.)

Determinism contract (this repo's integer device): every matching
DECISION is exact 64-bit integer arithmetic.

* Per-field similarity in basis points:
  ``sim = floor((maxlen − lev)·10000 / maxlen)`` with
  ``lev = levenshtein(a, b)`` and ``maxlen = max(|a|, |b|)`` — the
  floor of an IEEE division of exact int64s, replayable in any engine
  with a classic Levenshtein (DuckDB's matches the JVM's; proven by
  the fuzzy-join oracles). Both-empty compares as identical (10000);
  NULLs are treated as empty strings.
* Match rule: ``Σ wᵢ·simᵢ ≥ threshold_pct · 100 · Σ wᵢ`` — all int64,
  no float ever enters the decision.
* Best-match selection: ``min(struct(−score, id))`` — highest score,
  ties to the smallest candidate id. Deterministic, no window sort.

Scale posture (100 TB of CRM rows): candidate generation is ONE
equi-join on the caller's blocking key — the classic linkage trade
(recall vs cost) made explicit: pairs ∝ Σ_block |L_b|·|R_b|, so pick
blocks accordingly (nation+zip, phonetic bucket, …) and compose with
``operators/skew.py`` salting or a block-size cap when a block is
pathological. Per-pair scoring is pure codegen (levenshtein +
arithmetic); the best-match reduction is one map-side-combined
aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["entity_matches", "field_similarity_expr"]


def field_similarity_expr(a: Column, b: Column) -> Column:
    """Basis-point string similarity (0–10000), NULL-safe (module
    docstring)."""
    la = F.coalesce(a.cast("string"), F.lit(""))
    rb = F.coalesce(b.cast("string"), F.lit(""))
    mx = F.greatest(F.length(la), F.length(rb))
    lev = F.levenshtein(la, rb)
    return F.when(mx == 0, F.lit(10000).cast("long")).otherwise(
        F.floor(
            ((mx - lev) * F.lit(10000)).cast("long").cast("double")
            / mx.cast("double")
        )
    )


def entity_matches(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    fields: list[tuple[str, str, int]],
    block_left: Column,
    block_right: Column,
    threshold_pct: int = 70,
    best_match: bool = True,
) -> DataFrame:
    """Match ``right`` rows (incoming) against ``left`` (master) —
    (``id_right``, ``id_left``, ``score_bp``). ``fields`` is a list of
    ``(left_col, right_col, integer_weight)``; candidates share a
    blocking key; a pair matches when its weighted similarity clears
    ``threshold_pct`` (exact-integer rule, module docstring).
    ``best_match=True`` keeps each incoming row's single best master
    (ties to the smallest master id); ``False`` emits every pair above
    the threshold. ``score_bp`` is the weighted mean similarity in
    basis points (floored). Rows whose blocking key is NULL never
    enter the candidate join (SQL equality semantics) — route
    unkeyable rows to a fallback block explicitly if they must be
    matched."""
    if not fields:
        raise ValueError("fields must be non-empty")
    if not 0 < threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in (0, 100], got {threshold_pct}")
    weights = [int(w) for _, _, w in fields]
    if any(w <= 0 for w in weights):
        raise ValueError("field weights must be positive integers")
    wsum = sum(weights)

    l = left.select(
        F.col(id_left).alias("__lid__"),
        block_left.alias("__bk__"),
        *[F.col(lc).alias(f"__l{i}__") for i, (lc, _, _) in enumerate(fields)],
    )
    r = right.select(
        F.col(id_right).alias("__rid__"),
        block_right.alias("__bk__"),
        *[F.col(rc).alias(f"__r{i}__") for i, (_, rc, _) in enumerate(fields)],
    )
    pairs = l.join(r, "__bk__")
    score_num = None
    for i, (_, _, w) in enumerate(fields):
        term = F.lit(int(w)).cast("long") * field_similarity_expr(
            F.col(f"__l{i}__"), F.col(f"__r{i}__")
        )
        score_num = term if score_num is None else score_num + term
    matched = pairs.where(
        score_num >= F.lit(int(threshold_pct) * 100 * wsum).cast("long")
    ).select(
        "__rid__",
        "__lid__",
        score_num.alias("__s__"),
    )
    if best_match:
        matched = (
            matched.groupBy("__rid__")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__s__")).alias("negs"),
                        F.col("__lid__").alias("lid"),
                    )
                ).alias("__m__")
            )
            .select(
                "__rid__",
                F.col("__m__.lid").alias("__lid__"),
                (-F.col("__m__.negs")).alias("__s__"),
            )
        )
    return matched.select(
        F.col("__rid__").alias(id_right),
        F.col("__lid__").alias(id_left),
        F.floor(
            F.col("__s__").cast("double") / F.lit(float(wsum))
        ).cast("long").alias("score_bp"),
    )
