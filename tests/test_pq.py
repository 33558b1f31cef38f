"""llm/pq.py — product quantization unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gluestick_spark.llm.pq import adc_table, encode_pq, pq_topk, train_pq

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(vecs):
    return train_pq(vecs, "embedding", "vec_id", m=4, k=4, iters=1)


def test_train_shapes(books):
    assert len(books) == 4
    for book in books:
        assert 1 <= len(book) <= 4
        for s, n in book:
            assert len(s) == 16 and n >= 1


def test_train_validates(spark, vecs):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(vecs, "embedding", "vec_id", m=7)
    empty = vecs.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        train_pq(empty, "embedding", "vec_id", m=4)


def test_encode_is_narrow_and_valid(vecs, books):
    enc = encode_pq(vecs, "embedding", "vec_id", books)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    rows = enc.collect()
    assert len(rows) == vecs.count()
    for r in rows:
        assert len(r["code"]) == 4
        assert all(0 <= c < len(books[j]) for j, c in enumerate(r["code"]))


def test_adc_table_validates(books):
    with pytest.raises(ValueError, match="query dim"):
        adc_table([0.0] * 63, books)


def test_adc_table_shape_and_sign(books):
    tab = adc_table([0.1] * 64, books)
    assert len(tab) == 4 and all(len(row) == len(b) for row, b in zip(tab, books))
    # squared distances scaled by 1e6: never below -1 (floor of a tiny
    # negative rounding residue is the only way under 0)
    assert all(v >= -1 for row in tab for v in row)


def test_pq_topk_self_query_first(vecs, books):
    q = vecs.where("vec_id = 0").first()["embedding"]
    top = pq_topk(vecs, "embedding", "vec_id", list(q), books, k=5).collect()
    assert len(top) == 5
    # ADC distance of the query to its own code cell is the minimum the
    # quantizer can give that cell; vec 0 must rank first here
    assert top[0]["vec_id"] == 0
    dists = [r["pq_dist"] for r in top]
    assert dists == sorted(dists)


def test_pq_topk_plan_is_take_ordered(vecs, books):
    q = [0.0] * 64
    top = pq_topk(vecs, "embedding", "vec_id", q, books, k=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_pq_partition_invariance(vecs, books):
    q = vecs.where("vec_id = 1").first()["embedding"]
    a = pq_topk(vecs, "embedding", "vec_id", list(q), books, k=10).collect()
    b = pq_topk(
        vecs.repartition(13, "label"), "embedding", "vec_id", list(q), books, k=10
    ).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in a] == [
        (r["vec_id"], r["pq_dist"]) for r in b
    ]
