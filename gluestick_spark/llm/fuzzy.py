"""Fuzzy (edit-distance) self-join — typo-tolerant near-dup detection for
SHORT strings (titles, names, product labels), the record-linkage /
entity-resolution primitive.

Scale design — the naive formulation is an O(N²) cross join with a
per-pair Levenshtein; the classic rewrite is **blocking + verify**:

1. Length blocking: edit distance ≤ k implies the lengths differ by ≤ k,
   so bucketing lengths at width k+1 means qualifying pairs land in the
   same OR adjacent buckets. The build side is replicated to its bucket
   and both neighbors (3×), the probe side stays at 1× — every qualifying
   pair collides exactly once, and the join is a plain equi-join on the
   bucket id (plus any caller-supplied exact-match ``block_cols``, the
   usual entity-resolution move: block on country/zip/first-token, then
   fuzzy within the block).
2. Verify: JVM ``levenshtein(a, b, k)`` — Spark's threshold form
   short-circuits to O(k·min(len)) per pair instead of O(len²), and
   whole-stage codegen keeps it off the Python path entirely.

Replication is 3× the probe side — constant, independent of N; the
quadratic term only survives INSIDE a (bucket × block) group, which is
what ``block_cols`` exists to keep small. Skewed blocks degrade to AQE
skew-split sort-merge, never a cartesian of the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_pairs"]


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs (``a`` < ``b``, ``dist``) with Levenshtein distance ≤
    ``max_dist`` on ``text_col``, optionally required to match exactly on
    ``block_cols`` first. NULL texts never match (SQL comparison
    semantics)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    blocks = list(block_cols or [])
    w = max_dist + 1
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id__"),
        F.col(text_col).alias("__t__"),
        (F.length(text_col) / w).cast("long").alias("__lb__"),
        *[F.col(c) for c in blocks],
    )
    probe = base
    build = base.select(
        F.col("__id__").alias("__id2__"),
        F.col("__t__").alias("__t2__"),
        F.explode(
            F.array(F.col("__lb__") - 1, F.col("__lb__"), F.col("__lb__") + 1)
        ).alias("__lb__"),
        *[F.col(c).alias(f"__b_{c}__") for c in blocks],
    )
    cond = [probe["__lb__"] == build["__lb__"]] + [
        probe[c] == build[f"__b_{c}__"] for c in blocks
    ]
    # a < b also dedupes the (bucket, neighbor-bucket) double-count: each
    # unordered pair meets exactly once per colliding bucket, and the
    # neighbor replication makes each qualifying pair collide exactly once
    # in the probe row's own bucket.
    joined = probe.join(build, cond).where(F.col("__id__") < F.col("__id2__"))
    dist = F.levenshtein(F.col("__t__"), F.col("__t2__"), max_dist)
    return (
        joined.withColumn("__d__", dist)
        # threshold form returns -1 when the distance exceeds max_dist
        .where(F.col("__d__") >= 0)
        .select(
            F.col("__id__").alias("a"),
            F.col("__id2__").alias("b"),
            F.col("__d__").alias("dist"),
        )
    )
