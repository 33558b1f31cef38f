"""Linear quality-classifier inference over hashed n-gram features —
the fastText-style corpus filter (Joulin et al. 2016, "Bag of Tricks
for Efficient Text Classification") that GPT-3/LLaMA-lineage pipelines
run over every crawled document to score "looks like reference text"
vs "looks like spam" before mixing.

Beyond-reference LLM-pipeline operator (the reference at
/root/reference/gluestick is a pandas ETL toolkit with no text-model
surface). This is INFERENCE only, by design: training a classifier is
a one-off offline job (fastText itself, sklearn, anything); applying
it to 100 TB of crawl is the Spark-shaped problem, and a linear model
over hashed n-grams is pure Catalyst — tokenize, hash, gather weights,
average — with no Python in the row path and zero shuffles in the
literal-weights strategy.

Determinism contract (house style): weights are quantized to int64
milli-units (``floor(w·scale + 0.5)``), the per-document accumulation
is an exact int64 sum, and the final score is ONE IEEE division of
exact integers plus one IEEE add of the bias literal — replayable
bit-for-bit in DuckDB. The gram hash is the portable 60-bit md5
(``llm/sketch.py:kmv_hash_expr``), the same device every other oracle
row uses.

Weight-table strategies (the kmeans-assign pattern):

* ``literal`` — weights as an array literal indexed by bucket;
  scoring is a narrow ``aggregate`` fold over the gram array. Zero
  shuffle, zero joins; right up to a few thousand buckets.
* ``join`` — grams explode into rows, buckets **broadcast-join** the
  weight table, ONE keyed shuffle re-aggregates per document. The
  fastText-sized path (2M buckets can't be a literal).

Composes with :func:`~gluestick_spark.llm.sampling.mix_corpora` /
``hash_split`` for quality-bucket mixing: score → threshold →
per-bucket sampling rates.
"""

from __future__ import annotations

from math import floor

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketch import kmv_hash_expr
from .text import tokens_expr

__all__ = [
    "hashed_ngrams_expr",
    "classifier_score",
]


def hashed_ngrams_expr(
    text: Column, n_buckets: int, use_bigrams: bool = True
) -> Column:
    """Array of hashed-gram bucket ids for ``text``: lowercased
    whitespace unigrams plus (optionally) adjacent-pair bigrams, each
    mapped to ``[0, n_buckets)`` with the portable 60-bit md5 hash.
    Pure Catalyst; the hash is non-negative so ``pmod`` ≡ ``%`` and the
    DuckDB replay is exact."""
    toks = tokens_expr(F.lower(text))
    grams = toks
    if use_bigrams:
        # greatest(.., 0): a 0/1-token document has no bigrams, and
        # slice raises on a negative length in ANSI mode
        n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
        bigrams = F.zip_with(
            F.slice(toks, 1, n_pairs),
            F.slice(toks, 2, n_pairs),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        grams = F.concat(toks, bigrams)
    return F.transform(
        grams, lambda g: F.pmod(kmv_hash_expr(g), F.lit(n_buckets)).cast("int")
    )


def classifier_score(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    use_bigrams: bool = True,
    weight_scale: int = 1000,
    out_col: str = "clf_score",
    assign: str = "auto",
    id_col: str | None = None,
) -> DataFrame:
    """Score every document with a linear model over hashed n-gram
    features: ``score = (Σ_g w[h(g)]) / N + bias`` — the mean gathered
    weight over the document's grams (unigrams + bigrams), i.e. exactly
    what a 1-output fastText linear layer computes over bag-of-grams
    input. Returns ``df`` plus ``out_col`` (double); documents with no
    grams score ``bias``.

    ``weights`` has one float per bucket (``n_buckets = len(weights)``);
    each is quantized to ``floor(w·weight_scale + 0.5)`` int64 so the
    accumulation is exact and the score replays cross-engine (two IEEE
    ops on exact inputs — no rounding needed in the oracle). Raw scores
    are returned rather than sigmoid probabilities: ``exp`` differs in
    the last ulp across libm implementations, and thresholding —
    the only thing a corpus filter does with the score — is monotone.

    ``assign='literal'`` (default for ≤4096 buckets): zero-shuffle
    narrow fold. ``assign='join'``: grams explode, the weight table
    broadcast-joins, one keyed shuffle per document re-aggregates —
    requires ``id_col`` (unique) and is the 2M-bucket fastText shape.
    Both strategies produce identical scores (pytest-pinned)."""
    n_buckets = len(weights)
    if n_buckets < 1:
        raise ValueError("weights must be non-empty")
    wq = [int(floor(float(w) * weight_scale + 0.5)) for w in weights]
    if assign == "auto":
        assign = "literal" if n_buckets <= 4096 else "join"

    grams = hashed_ngrams_expr(F.col(text_col), n_buckets, use_bigrams)
    if assign == "literal":
        # one parsed literal instead of n_buckets py4j lit() roundtrips
        warr = F.expr(
            "CAST(array(" + ",".join(str(int(v)) for v in wq) + ") AS ARRAY<BIGINT>)"
        )
        total = F.aggregate(
            grams,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.element_at(warr, h + F.lit(1)),
        )
        n = F.size(grams)
        score = F.when(
            n > 0,
            total.cast("double")
            / (F.lit(int(weight_scale)).cast("long") * n.cast("long")).cast("double")
            + F.lit(float(bias)),
        ).otherwise(F.lit(float(bias)))
        return df.withColumn(out_col, score)

    if assign != "join":
        raise ValueError("assign must be 'literal', 'join', or 'auto'")
    if not id_col:
        raise ValueError("assign='join' requires id_col")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(b, v) for b, v in enumerate(wq)], "__bucket__ int, __wq__ long"
    )
    exploded = df.select(
        F.col(id_col).alias("__cid__"), F.explode(grams).alias("__bucket__")
    )
    sums = (
        exploded.join(F.broadcast(wdf), "__bucket__")
        .groupBy("__cid__")
        .agg(F.sum("__wq__").alias("__sq__"), F.count(F.lit(1)).alias("__n__"))
    )
    score = (
        F.col("__sq__").cast("double")
        / (F.lit(int(weight_scale)).cast("long") * F.col("__n__")).cast("double")
        + F.lit(float(bias))
    )
    return (
        df.join(sums, df[id_col] == sums["__cid__"], "left")
        .withColumn(
            out_col, F.coalesce(score, F.lit(float(bias)))
        )
        .drop("__cid__", "__sq__", "__n__")
    )
