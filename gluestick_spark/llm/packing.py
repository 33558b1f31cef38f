"""Sequence packing: group documents into token-budgeted bins.

LLM pre-training consumes fixed-length context windows; feeding one short
document per window wastes most of it. Packing concatenates documents into
bins of ~``budget`` tokens. The classic greedy packer is sequential (bin
state depends on every prior doc) — unusable as-is on a distributed corpus.

This operator uses the standard scale decomposition instead:

1. **Shard** by a portable hash of the key into ``n_shards`` independent
   streams (a pure projection — shard choice is deterministic and
   engine-reproducible, like :mod:`gluestick_spark.llm.sampling`).
2. **Order within the shard** by (hash, key) — a deterministic shuffle, so
   bin contents don't correlate with input order or source layout.
3. **Exclusive running token sum** over the shard window, and
   ``local_bin = floor(running_sum / budget)``: contiguous runs of docs
   whose cumulative size crosses each budget boundary start a new bin.

Semantics (deterministic, SQL-expressible — the DuckDB oracle reproduces
bin ids exactly): a bin's total tokens is ≤ ``budget + max_doc_tokens - 1``
— the bounded overflow every streaming packer accepts (the doc that crosses
the boundary finishes its bin). Docs longer than ``budget`` get a bin of
their own plus spill; cap or chunk them first
(:func:`gluestick_spark.llm.text.chunk_documents`) for hard guarantees.

Scale shape: one hash shuffle on the shard id + an in-partition sort — the
same plan at any corpus size. No global sort, no sequential driver loop;
each shard's window state is one running sum. ``n_shards`` bounds
parallelism loss (default 256 ≫ executor count) and each shard wastes at
most one partially-filled trailing bin, so fill efficiency is
1 − O(n_shards · budget / total_tokens) — negligible at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import _keyed_hash

__all__ = ["pack_documents"]

# local_bin is packed into the low bits of the global bin id; 2^33 bins/shard
# keeps ids unique while staying well inside long range for n_shards ≤ 2^20.
_BIN_STRIDE = 1 << 33


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_col: str,
    n_shards: int = 256,
    seed: str = "",
) -> DataFrame:
    """Assign every row a ``pack_id`` (token-budgeted bin) and ``pack_pos``
    (its position inside the bin). See module docstring for semantics.

    ``token_col`` must be a non-negative token count (precompute with
    ``word_count_expr`` / ``bpe_token_count_expr``).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _keyed_hash(F.col(key_col), seed)
    sharded = df.withColumn("__h__", h).withColumn(
        "__shard__", F.pmod(F.col("__h__"), F.lit(n_shards)).cast("int")
    )
    # Every window below shares ONE partitioning (__shard__) and ONE
    # ordering (__h__, key): a single Exchange + sort serves the running
    # sum, the row numbers, and the bin-start scan. pack_pos is derived
    # from the same sort (bins are contiguous runs) instead of a second
    # window partitioned by pack_id — which would be a second full shuffle.
    w = Window.partitionBy("__shard__").orderBy(F.col("__h__"), F.col(key_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    local_bin = F.floor(start / F.lit(budget))
    packed = (
        sharded.withColumn("__bin__", local_bin)
        .withColumn("__rn__", F.row_number().over(w))
        .withColumn(
            "__st__",
            F.when(F.col("__bin__") != F.lag("__bin__", 1, -1).over(w), F.col("__rn__")),
        )
        .withColumn("__binstart__", F.max("__st__").over(run))
        .drop("__st__")
    )
    return (
        packed.withColumn(
            "pack_id", F.col("__shard__").cast("long") * _BIN_STRIDE + F.col("__bin__")
        )
        .withColumn("pack_pos", (F.col("__rn__") - F.col("__binstart__") + 1).cast("int"))
        .drop("__h__", "__shard__", "__bin__", "__rn__", "__binstart__")
    )
