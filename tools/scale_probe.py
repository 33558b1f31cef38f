"""Empirical scaling probe for the dedup/LSH operators.

Replicates the sf0.1 documents/embeddings tables R× (ids remapped, text
lightly perturbed per replica so the corpus isn't one giant duplicate
class) and times each operator at 1× and R×. A scale-safe operator should
grow ~linearly (exponent ≈ 1 in t ~ N^e); a missing bucket cap or an
accidental cross join shows up as e → 2.

Usage: python tools/scale_probe.py [R]   (default R=10)

Prints one JSON line per operator plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(df: DataFrame, r: int) -> DataFrame:
    """R copies; ids remapped to stay unique, each replica's text gets a
    replica-tag token appended so replicas are near-dups, not exact dups
    (the realistic hard case for MinHash/SimHash)."""
    n = df.count()
    reps = df.crossJoin(F.broadcast(
        df.sparkSession.range(r).select(F.col("id").alias("__rep__"))
    ))
    return reps.select(
        (F.col("doc_id") + F.col("__rep__") * n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("__rep__")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def replicate_vecs(df: DataFrame, r: int) -> DataFrame:
    n = df.count()
    reps = df.crossJoin(F.broadcast(
        df.sparkSession.range(r).select(F.col("id").alias("__rep__"))
    ))
    # tiny deterministic per-replica offset on one component keeps replicas
    # near-identical (cosine ≈ 1) without being byte-equal
    bump = (F.col("__rep__").cast("double") / 1e4)
    return reps.select(
        (F.col("vec_id") + F.col("__rep__") * n).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding"), 1, 63),
            F.array(F.element_at("embedding", 64) + bump),
        ).alias("embedding"),
    )


def timed(fn, warm: int = 1) -> tuple[float, int]:
    """(seconds, result rows). Rows matter for reading the exponent: when
    the output itself grows linearly with N (near-dup replicas → each doc
    pairs with its replica siblings), time exponent ≈ 1 is optimal — the
    operator is output-bound, not blowing up."""
    for _ in range(warm):
        fn()
    t0 = time.time()
    rows = fn()
    return round(time.time() - t0, 3), int(rows)


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from gluestick_spark import get_spark
    from gluestick_spark.llm.dedup import (
        cluster_dedup,
        exact_dedup,
        embedding_near_dups,
        minhash_dedup,
        minhash_near_dup_pairs,
        simhash_near_dups,
    )

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    vecs1 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # materialize the replicated inputs so replication cost stays out of
    # the operator timings
    docsR = replicate_docs(docs1, r).persist()
    vecsR = replicate_vecs(vecs1, r).persist()
    n1, nR = docs1.count(), docsR.count()
    v1, vR = vecs1.count(), vecsR.count()

    cap = 200  # max_bucket: the 100 TB guard the probe is checking
    ops = {
        "exact_dedup": (
            lambda: exact_dedup(docs1, ["text"], "doc_id").count(),
            lambda: exact_dedup(docsR, ["text"], "doc_id").count(),
        ),
        "minhash_dedup": (
            lambda: minhash_dedup(docs1, "text", "doc_id", max_bucket=cap).count(),
            lambda: minhash_dedup(docsR, "text", "doc_id", max_bucket=cap).count(),
        ),
        "simhash_near_dups": (
            lambda: simhash_near_dups(docs1, "text", "doc_id", max_bucket=cap).count(),
            lambda: simhash_near_dups(docsR, "text", "doc_id", max_bucket=cap).count(),
        ),
        "embedding_near_dups": (
            lambda: embedding_near_dups(
                vecs1, "embedding", "vec_id", threshold=0.95, dim=64, max_bucket=cap
            ).count(),
            lambda: embedding_near_dups(
                vecsR, "embedding", "vec_id", threshold=0.95, dim=64, max_bucket=cap
            ).count(),
        ),
        # transitive-closure dedup: minhash pairs -> connected components ->
        # keep representatives. Replica groups are 10-node near-cliques, so
        # the iterative label propagation converges in ~2 rounds at both
        # scales; the probe catches any superlinear blowup in the loop.
        "cluster_dedup": (
            lambda: cluster_dedup(
                docs1,
                minhash_near_dup_pairs(docs1, "text", "doc_id", threshold=0.7, max_bucket=cap),
                "doc_id",
            ).count(),
            lambda: cluster_dedup(
                docsR,
                minhash_near_dup_pairs(docsR, "text", "doc_id", threshold=0.7, max_bucket=cap),
                "doc_id",
            ).count(),
        ),
    }

    import math

    summary = {}
    for name, (small, big) in ops.items():
        t1, rows1 = timed(small)
        tR, rowsR = timed(big)
        ratio = (nR / n1) if name != "embedding_near_dups" else (vR / v1)
        exponent = round(math.log(max(tR, 1e-3) / max(t1, 1e-3)) / math.log(ratio), 2)
        rec = {
            "op": name,
            "t_1x": t1,
            f"t_{r}x": tR,
            "scale_exponent": exponent,
            "rows_1x": rows1,
            f"rows_{r}x": rowsR,
        }
        summary[name] = exponent
        print(json.dumps(rec), flush=True)

    print(json.dumps({"summary_exponents": summary, "r": r, "n_docs_1x": n1}))


if __name__ == "__main__":
    main()
