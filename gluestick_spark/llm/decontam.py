"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set.

Training corpora must not contain eval-benchmark text; the standard check
(GPT-3 appendix C, The Pile, FineWeb) is n-gram overlap: a document is
contaminated when it shares ≥ ``min_overlap`` distinct word n-grams with
any benchmark item.

Scale design: the benchmark side is SMALL (thousands of items) and the
corpus is the 100 TB side, so the join must stream the corpus exactly once:

1. both sides → distinct n-gram **hashes** (``xxhash64`` — 8 bytes each,
   never the n-gram strings) via the same tokenizer as the rest of
   :mod:`gluestick_spark.llm.text`;
2. corpus side explodes to (doc, hash) rows; benchmark side collapses to
   distinct (hash, bench_id) rows — a frame proportional to the benchmark,
   which Spark's planner broadcasts (or hash-joins if a huge eval suite);
3. inner join on the hash + groupBy (doc, bench) counting distinct shared
   hashes ≥ ``min_overlap``.

The corpus is touched by one projection + one aggregate; no corpus×corpus
pair ever exists. False positives from hash collisions are ~2⁻⁶⁴ per pair
— negligible against n-gram overlap noise itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr

__all__ = ["ngram_hashes_expr", "contamination_pairs", "decontaminate"]


def ngram_hashes_expr(col, n: int = 8, lowercase: bool = True):
    """Distinct xxhash64 hashes of the word ``n``-grams of a text column
    (array<long>). Documents shorter than ``n`` tokens produce an empty
    array — too short to witness contamination at this n."""
    toks = tokens_expr(col)
    if lowercase:
        toks = F.transform(toks, F.lower)
    # NB Spark's sequence(1, k) DESCENDS when k < 1 — short docs must short-
    # circuit to an empty index list, not sequence into slice(…, 0, …).
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))


def contamination_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_text: str,
    corpus_id: str,
    bench_text: str,
    bench_id: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """(``doc_id``, ``bench_id``, ``n_shared``) for every corpus document
    sharing ≥ ``min_overlap`` distinct word ``n``-grams with a benchmark
    item. See module docstring for the one-pass join shape."""
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.explode(ngram_hashes_expr(F.col(corpus_text), n)).alias("__g__"),
    )
    b = bench.select(
        F.col(bench_id).alias("bench_id"),
        F.explode(ngram_hashes_expr(F.col(bench_text), n)).alias("__g__"),
    ).distinct()
    return (
        c.join(b, "__g__")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("__g__").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_text: str,
    corpus_id: str,
    bench_text: str,
    bench_id: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop contaminated documents from the corpus (anti-join on the
    flagged ids — the corpus frame itself is never reshuffled)."""
    flagged = (
        contamination_pairs(
            corpus, bench, corpus_text, corpus_id, bench_text, bench_id, n, min_overlap
        )
        .select(F.col("doc_id").alias(corpus_id))
        .distinct()
    )
    return corpus.join(flagged, corpus_id, "left_anti")
