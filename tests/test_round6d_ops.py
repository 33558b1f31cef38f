"""Round-6 batch 4: TF-IDF vectors, embedding pooling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gluestick_spark.llm.retrieval import tfidf_vectors
from gluestick_spark.llm.similarity import pool_embeddings


def test_tfidf_exact_small(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.token): (r.tf, r.tfidf)
        for r in tfidf_vectors(df, "text", "doc_id", n_docs=2).collect()
    }
    idf_a = math.log(3.0 / 3.0) + 1.0  # df=2
    idf_b = math.log(3.0 / 2.0) + 1.0  # df=1
    assert got[(1, "a")] == (2, 2 * idf_a)
    assert got[(1, "b")][0] == 1 and abs(got[(1, "b")][1] - idf_b) < 1e-12
    assert got[(2, "c")][0] == 1


def test_tfidf_min_df_prunes(spark):
    df = spark.createDataFrame(
        [(1, "common rare1"), (2, "common rare2")], "doc_id long, text string"
    )
    toks = {r.token for r in tfidf_vectors(df, "text", "doc_id", min_df=2).collect()}
    assert toks == {"common"}


def test_pool_embeddings_mean_and_count(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (1, [3.0, 6.0]),
            (2, [10.0, 20.0]),
        ],
        "g long, v array<double>",
    )
    got = {r.g: (r.n_vecs, list(r.pooled)) for r in pool_embeddings(df, "g", "v").collect()}
    assert got[1] == (2, [2.0, 4.0])
    assert got[2] == (1, [10.0, 20.0])


def test_pool_embeddings_single_shuffle(spark):
    df = spark.createDataFrame([(1, [1.0])], "g long, v array<double>")
    plan = pool_embeddings(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_table_stats_counts_and_exact_ndv(spark):
    from gluestick_spark.operators.profile import table_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, s string"
    )
    got = {r.column: (r.n, r.n_null, r.n_distinct_est) for r in
           table_stats(df, ["id", "s"], k=64).collect()}
    assert got["id"] == (4, 0, 4.0)  # below k -> exact
    assert got["s"] == (4, 1, 2.0)  # NULL not counted toward NDV


def test_table_stats_estimates_above_k(spark):
    from gluestick_spark.operators.profile import table_stats

    df = spark.range(1000).select(F.col("id"))
    est = table_stats(df, ["id"], k=64).collect()[0].n_distinct_est
    assert 700 <= est <= 1400  # ~1/sqrt(62) standard error
