"""simhash_signature_udf must be bit-identical to the pure-expression form."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gluestick_spark.llm.dedup import simhash_expr, simhash_signature_udf
from gluestick_spark.llm.text import tokens_expr


def test_udf_matches_expression_form(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < 50)
    )
    token_hashes = F.transform(
        F.array_distinct(tokens_expr(F.lower(F.col("text")))), lambda t: F.xxhash64(t)
    )
    both = d.select(
        "doc_id",
        simhash_expr(F.col("text")).alias("expr_sig"),
        simhash_signature_udf()(token_hashes).alias("udf_sig"),
    )
    rows = both.collect()
    assert rows
    for r in rows:
        assert r["expr_sig"] == r["udf_sig"], r["doc_id"]


def test_udf_empty_and_null_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=""), Row(doc_id=2, text=None)])
    token_hashes = F.transform(
        F.array_distinct(tokens_expr(F.lower(F.col("text")))), lambda t: F.xxhash64(t)
    )
    rows = df.select("doc_id", simhash_signature_udf()(token_hashes).alias("s")).collect()
    assert [r["s"] for r in rows] == [0, 0]
