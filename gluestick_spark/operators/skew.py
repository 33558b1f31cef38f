"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits an
oversized SORT-MERGE partition at runtime and is the first answer to skew —
it's on in :mod:`gluestick_spark.session`. Salting is the complement for
the cases AQE can't fix: a shuffled HASH join's build side, a skewed key
feeding a downstream aggregation that must stay co-partitioned, or an
engine/version where the skew split doesn't trigger (e.g. the skewed side
below the split threshold but still stalling one task). It is the standard
manual pattern: spread each hot left key over ``salt`` sub-keys, replicate
the right side ``salt``× so every sub-key still finds its match.

Cost model (why this is a *choice*, not a default): the right side is
replicated ``salt`` times through the shuffle — use it when
``salt × |right| ≪ |left hot partition|``. The salt values come from
``rand`` — the OUTPUT is provably salt-invariant (every left row joins the
one replica carrying its salt), so results are deterministic even though
task placement isn't.

Spark-first notes: the salt column is a plain projection, the join is a
normal equi-join on (keys…, salt) that Catalyst plans like any other —
broadcast still wins if the replicated right side is tiny (which is fine:
broadcast has no skew problem at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's hot
    keys spread across ``salt`` sub-partitions. Supports ``inner`` and
    ``left`` (each left row carries exactly one salt value, so left-outer
    multiplicity is preserved; right-outer would see every unmatched right
    row ``salt`` times and is rejected).

    Result is identical to ``left.join(right, on, how)`` for any ``salt``;
    only the shuffle layout changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'/'left', got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    l2 = left.withColumn("__salt__", F.floor(F.rand(seed) * salt).cast("int"))
    r2 = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return l2.join(r2, keys + ["__salt__"], how).drop("__salt__")
