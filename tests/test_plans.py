"""Physical-plan shape tests: lock in the scale posture.

These assert the properties that matter at 100 TB — predicate pushdown to
the parquet scan, column pruning, broadcast of dimension tables, top-k via
TakeOrderedAndProject (no global sort), no row-at-a-time Python in JVM hot
paths, and minimal shuffle counts — so a refactor that silently regresses
the plan fails CI even though results stay correct.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _queries():
    import __spark_entry__ as em

    return em.queries()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(_queries()["pricing_summary"](spark, SF))
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    assert "isnotnull(l_shipdate" in scan_lines[0]


def test_column_pruning_reaches_scan(spark):
    plan = _plan(_queries()["explode_json_to_cols"](spark, SF))
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    # events has 6 columns; only the 2 used may be read
    assert "event_id" in scan_lines[0] and "props" in scan_lines[0]
    for unused in ("user_id", "event_type", "value"):
        assert unused not in scan_lines[0]


def test_dimension_joins_broadcast(spark):
    plan = _plan(_queries()["shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(_queries()["ann_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no full-sort node


def test_json_explode_stays_jvm_side(spark):
    plan = _plan(_queries()["explode_json_to_cols"](spark, SF))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF
    assert "ArrowEvalPython" not in plan  # not even vectorized Python


def test_snapshot_upsert_single_shuffle(spark):
    plan = _plan(_queries()["snapshot_upsert"](spark, SF))
    assert plan.count("+- Exchange") + plan.count(":- Exchange") <= 1


def test_lsh_signature_is_arrow_vectorized(spark):
    plan = _plan(_queries()["embedding_near_dups"](spark, SF))
    assert "ArrowEvalPython" in plan  # pandas_udf matmul, Arrow-batched
    assert "BatchEvalPython" not in plan


def test_exact_dedup_is_one_shuffle(spark):
    plan = _plan(_queries()["dedup_exact"](spark, SF))
    # one exchange for the hash-window (plus optionally the parallelize
    # repartition, which is a no-op at scale)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_drop_redundant_snapshot_not_force_broadcast(spark, tmp_path):
    """The hash snapshot grows with every row ever seen — it must never carry
    a forced broadcast hint (VERDICT r1 #3). The logical plan must contain no
    ResolvedHint on the anti-join; size-based/AQE broadcast remains allowed."""
    from pyspark.sql import functions as F

    from gluestick_spark.operators.snapshot import drop_redundant

    df = spark.range(100).select(F.col("id").alias("pk"), (F.col("id") * 2).alias("v"))
    out_dir = str(tmp_path)
    drop_redundant(spark, df, "t", out_dir, pk="pk")  # seeds the hash snapshot
    result = drop_redundant(spark, df, "t", out_dir, pk="pk")
    qe = result._jdf.queryExecution()
    analyzed = qe.analyzed().toString()
    optimized = qe.optimizedPlan().toString()
    # no hint node and no hint annotation on the join; a size-based
    # BroadcastHashJoin chosen by the planner/AQE is fine and not asserted on
    for marker in ("ResolvedHint", "UnresolvedHint", "strategy=broadcast"):
        assert marker not in analyzed and marker not in optimized


def test_salted_join_matches_plain_join(spark):
    """salted_join is row-for-row equivalent to the plain equi-join, and the
    join actually happens on (key, salt) so hot keys spread across shards."""
    from pyspark.sql import functions as F

    from gluestick_spark.partitioning import salted_join

    # skewed fact: 900 rows of key=1, a few of others
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    got = salted_join(fact, dim, ["k"], salt=8).orderBy("v")
    want = fact.join(dim, ["k"]).orderBy("v")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]
    assert "__salt__" not in got.columns
    plan = _plan(salted_join(fact, dim, ["k"], salt=8))
    assert "__salt__" in plan  # join condition includes the shard id
    left = salted_join(fact, dim.where("k >= 45"), ["k"], salt=4, how="left")
    assert left.count() == fact.count()


def test_ivf_indexed_probe_partition_pruning(spark, tmp_path):
    """The materialized-IVF probe must read ONLY the nprobe probed lists:
    the parquet scan carries centroid_id as a PartitionFilter and the
    pruned file set covers exactly the probed partition directories."""
    from gluestick_spark.llm.similarity import (
        ivf_topk_indexed,
        materialize_ivf,
        random_hyperplanes,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.where("vec_id = 0").first()["embedding"])
    cents = random_hyperplanes(len(q), 8, seed=7)
    path = str(tmp_path / "ivf_idx")
    materialize_ivf(emb, "embedding", cents, path)

    top = ivf_topk_indexed(spark, path, q, cents, k=5, nprobe=2)
    plan = _plan(top)
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    assert "PartitionFilters" in scan_lines[0] and "centroid_id" in scan_lines[0]

    # empirical pruning: the executed scan's numPartitions metric must be
    # exactly nprobe (inputFiles() is relation-level and ignores filters,
    # so read the FileSourceScan metrics instead)
    import os

    all_parts = {d for d in os.listdir(path) if d.startswith("centroid_id=")}
    assert len(all_parts) > 2
    rows = top.collect()
    leaves = top._jdf.queryExecution().executedPlan().collectLeaves()
    scanned = None
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numPartitions":
                scanned = kv._2().value()
    assert scanned == 2, f"scan read {scanned} partitions, expected nprobe=2"

    # and the probe agrees with assigning-then-filtering (same candidates)
    from gluestick_spark.llm.similarity import ivf_topk

    direct = ivf_topk(emb, "embedding", q, cents, k=5, nprobe=2).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in direct]


def test_sq_ivf_indexed_probe_partition_pruning(spark, tmp_path):
    """The persisted IVF×SQ index must serve a probe by reading ONLY the
    nprobe probed cell directories (cid rides the scan as a
    PartitionFilter; executed numPartitions == nprobe) and ONLY the
    code columns — and the served top-k must equal the in-query
    sq_ivf_topk with the same geometry (indexed ≡ direct)."""
    import os

    from gluestick_spark.llm.cluster import (
        materialize_sq_ivf,
        sq_ivf_topk,
        sq_ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.where("vec_id = 0").first()["embedding"])
    path = str(tmp_path / "sq_ivf_idx")
    materialize_sq_ivf(emb, "embedding", "vec_id", path, n_clusters=8, iters=1)

    all_parts = {
        d for d in os.listdir(os.path.join(path, "cells")) if d.startswith("cid=")
    }
    assert len(all_parts) > 3

    top = sq_ivf_topk_indexed(spark, path, q, k=5, nprobe=3)
    plan = _plan(top)
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    assert "PartitionFilters" in scan_lines[0] and "cid" in scan_lines[0]
    # codes-only read: the raw float embedding never enters the plan
    assert "embedding" not in plan and "qvec" in plan

    rows = top.collect()
    leaves = top._jdf.queryExecution().executedPlan().collectLeaves()
    scanned = None
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numPartitions":
                scanned = kv._2().value()
    assert scanned == 3, f"scan read {scanned} partitions, expected nprobe=3"

    direct = sq_ivf_topk(
        emb, "embedding", "vec_id", q, k=5, n_clusters=8, nprobe=3, iters=1
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in rows] == [
        (r["vec_id"], r["score"]) for r in direct
    ]


def test_pq_ivf_indexed_probe_partition_pruning(spark, tmp_path):
    """VERDICT r9 #2: the persisted IVF×PQ index must serve a probe by
    reading ONLY the nprobe probed cell directories (cid rides the scan
    as a PartitionFilter; executed numPartitions == nprobe) and ONLY the
    m-int code column — and the served top-k must equal the in-query
    pq_ivf_topk with the same geometry (indexed ≡ direct)."""
    import os

    from gluestick_spark.llm.pq import (
        materialize_pq_ivf,
        pq_ivf_topk,
        pq_ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.where("vec_id = 0").first()["embedding"])
    path = str(tmp_path / "pq_ivf_idx")
    materialize_pq_ivf(
        emb, "embedding", "vec_id", path, m=4, n_codes=8, n_clusters=8, iters=1
    )

    all_parts = {
        d for d in os.listdir(os.path.join(path, "cells")) if d.startswith("cid=")
    }
    assert len(all_parts) > 3

    top = pq_ivf_topk_indexed(spark, path, q, k=5, nprobe=3)
    plan = _plan(top)
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    assert "PartitionFilters" in scan_lines[0] and "cid" in scan_lines[0]
    # codes-only read: the raw float embedding never enters the plan
    assert "embedding" not in plan and "code" in plan

    rows = top.collect()
    leaves = top._jdf.queryExecution().executedPlan().collectLeaves()
    scanned = None
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numPartitions":
                scanned = kv._2().value()
    assert scanned == 3, f"scan read {scanned} partitions, expected nprobe=3"

    direct = pq_ivf_topk(
        emb, "embedding", "vec_id", q, k=5, m=4, n_codes=8, n_clusters=8,
        nprobe=3, iters=1,
    ).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in rows] == [
        (r["vec_id"], r["pq_dist"]) for r in direct
    ]


def test_substring_dedup_single_tokenization(spark):
    """VERDICT r9 #3: substring_dedup must tokenize the corpus ONCE — a
    single localCheckpointed (id, tokens) relation shared by detect →
    elect → cut. The executed plan therefore holds at most 2 source
    scans (in practice 0 FileScans: every consumer reads the checkpoint
    RDD); the naive lineage had 15."""
    from gluestick_spark.llm.spans import substring_dedup

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    out = substring_dedup(d, "doc_id", "text", k=10, max_occurrences=64)
    assert out.count() == d.count()  # materialize (checkpoint lands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 2, f"{len(scans)} source scans:\n{plan}"
    assert "ExistingRDD" in plan  # the shared checkpoint relation


def test_driver_contract_registry():
    """queries() and oracle_sql() must stay key-identical and ordered the
    same — the driver zips them, and the first 50 form the correctness
    window. Guard the contract so a registration edit can't silently skew
    the window or orphan an oracle."""
    import __spark_entry__ as em

    qs = list(em.queries())
    os_ = list(em.oracle_sql())
    assert qs == os_
    assert len(qs) >= 50

    # No duplicate keys in the SOURCE literals: dicts silently dedupe, so
    # a re-registered name misstates the tail listing and invites count
    # drift (bm25_scores did exactly this in round 7). Parse the source.
    import ast
    import inspect

    src = inspect.getsource(em)
    tree = ast.parse(src)
    for fn in ("queries", "oracle_sql"):
        node = next(
            n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name == fn
        )
        dicts = [n for n in ast.walk(node) if isinstance(n, ast.Dict)]
        keys = [
            k.value
            for d in dicts
            for k in d.keys
            if isinstance(k, ast.Constant)
        ]
        dupes = {k for k in keys if keys.count(k) > 1}
        assert not dupes, f"duplicate literal keys in {fn}(): {sorted(dupes)}"


def test_embedding_oracle_geometry_alignment():
    """q_embedding_near_dups uses adaptive geometry (lsh_geometry(n)); the
    DuckDB oracle hardcodes the sf0.01 instantiation (n=500 → 5-bit pieces,
    20 planes). If lsh_geometry's defaults change, this pins the mismatch
    loudly instead of as a driver hash-fail."""
    import __spark_entry__ as em
    from gluestick_spark.llm.dedup import lsh_geometry

    bits = lsh_geometry(500)
    assert bits == 5  # sf0.01 embeddings count is 500
    sql = em.oracle_sql()["embedding_near_dups"]
    assert f"* {bits})) & {(1 << bits) - 1}" in sql
    # one VALUES tuple per hyperplane: chunks(4) × bits
    assert sql.count("]::DOUBLE[])") == 4 * bits


def test_pack_documents_single_shuffle(spark):
    """Packing runs on ONE exchange + ONE sort: pack_pos derives from the
    shard sort (bins are contiguous runs), never a second window shuffled
    on pack_id."""
    plan = _plan(_queries()["pack_documents"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") == 1


def test_bm25_plan_shapes(spark):
    """BM25 ends in a top-k (TakeOrderedAndProject — no global sort); the
    1-row stats frame rides a broadcast, and nothing degrades to a
    CartesianProduct."""
    plan = _plan(_queries()["bm25_scores"](spark, SF).limit(10))
    assert "CartesianProduct" not in plan
    from gluestick_spark.llm.retrieval import bm25_topk

    d = spark.read.parquet(f"{SF}/documents.parquet")
    topk = bm25_topk(d, "text", "doc_id", "spark join", k=5)
    p2 = _plan(topk)
    assert "TakeOrderedAndProject" in p2 and "CartesianProduct" not in p2


def test_contamination_plan_no_cartesian(spark):
    """Decontamination joins on gram hashes — a hash join, never a corpus
    × benchmark nested loop."""
    plan = _plan(_queries()["contamination_check"](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_no_exchange(spark, tmp_dir):
    """Two tables bucketed on the same key/count join with ZERO Exchange —
    the co-located-join layout (the recurring-shuffle eliminator at 100 TB)."""
    import pyspark.sql.functions as F

    from gluestick_spark.sinks.layout import write_bucketed

    a = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], 8, sort_cols=["k"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_segment_dedup_two_exchanges(spark):
    """segment_dedup = election shuffle (segment) + reassembly shuffle
    (doc): exactly the two keyed Exchanges, both with map-side partial
    aggregation (the skew posture for boilerplate spans)."""
    from gluestick_spark.llm.spans import segment_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(segment_dedup(docs, "doc_id", "text", 4))
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 2, plan
    assert "partial_" in plan  # map-side combine on the election aggregate
    assert "CartesianProduct" not in plan


def test_heavy_hitters_broadcast_verify(spark):
    """heavy_hitters' exact recount joins the candidate set by BROADCAST —
    the candidate table is capacity-bounded, never shuffled at corpus
    scale — and the final top-k is TakeOrderedAndProject."""
    import pyspark.sql.functions as F

    from gluestick_spark.llm.sketch import heavy_hitters
    from gluestick_spark.llm.text import tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    words = docs.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
    plan = _plan(heavy_hitters(words, "w", k=10))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_expectations_row_rules_single_scan(spark):
    """Every row-local rule folds into ONE aggregate over ONE scan: the
    plan has exactly one FileScan and no Exchange other than the final
    single-partition gather."""
    from gluestick_spark.operators.expectations import check_expectations

    o = spark.read.parquet(f"{SF}/orders.parquet")
    plan = _plan(
        check_expectations(
            o,
            [
                {"rule": "not_null", "col": "o_orderkey"},
                {"rule": "in_range", "col": "o_totalprice", "min": 0, "max": 1e9},
                {"rule": "in_set", "col": "o_orderstatus", "values": ["O", "F", "P"]},
            ],
        )
    )
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_scd2_closed_rows_not_rejoined(spark):
    """scd2_merge's closed partition must pass through OUTSIDE the
    full-outer join (one join total): at 100 TB the closed history dwarfs
    the current set and must never enter a shuffle."""
    import datetime as dt

    from pyspark.sql import Row

    from gluestick_spark.operators.scd2 import scd2_merge

    hist = spark.createDataFrame(
        [Row(k=1, v="a", valid_from=dt.datetime(2024, 1, 1), valid_to=None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame(
        [Row(k=1, v="b", ts=dt.datetime(2024, 2, 1))], "k long, v string, ts timestamp"
    )
    plan = _plan(scd2_merge(hist, batch, "k", "ts", ["v"]))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1, plan


def test_fuzzy_pairs_no_cartesian(spark):
    """edit_distance_pairs is an equi-join on (length bucket) — never a
    nested-loop cross join, even though the predicate is a distance."""
    import pyspark.sql.functions as F

    from gluestick_spark.llm.fuzzy import edit_distance_pairs
    from gluestick_spark.llm.text import tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    titles = docs.select(
        "doc_id", F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6), " ").alias("t")
    )
    plan = _plan(edit_distance_pairs(titles, "doc_id", "t", 3))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cap_per_domain_single_exchange(spark):
    """Per-domain capping is ONE keyed shuffle (the rank window on the
    extracted domain) — domain extraction itself is pure codegen in the
    same stage as the scan."""
    import pyspark.sql.functions as F

    from gluestick_spark.llm.web import cap_per_domain

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.concat(F.lit("https://"), F.col("source"), F.lit(".com/x")).alias("url")
    )
    plan = _plan(cap_per_domain(docs, "url", "doc_id", 10))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan


def test_clip_outliers_projection_stays_in_scan_stage(spark):
    """After the (separate) percentile aggregate, the clip itself is a pure
    projection: the returned frame's plan has NO Exchange — it pipelines
    inside the scan."""
    from gluestick_spark.operators.features import clip_outliers

    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    out, _ = clip_outliers(ev, ["value"], 0.05, 0.95)
    plan = _plan(out)
    assert "Exchange" not in plan, plan


def test_correlation_matrix_runs_one_aggregate_job(spark):
    """All pairwise correlations come from ONE driver-side aggregate row;
    the returned long-form frame is a local relation (p²-bounded), never a
    corpus-shaped plan."""
    from gluestick_spark.operators.profile import correlation_matrix

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = correlation_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])
    plan = _plan(out)
    assert "FileScan" not in plan, plan  # result detached from the corpus


def test_fuzzy_prefix_gram_frequency_is_broadcast(spark):
    """The gram-frequency table (alphabet^q-bounded) joins by BROADCAST —
    never a shuffled join against the gram stream."""
    import pyspark.sql.functions as F

    from gluestick_spark.llm.fuzzy import edit_distance_pairs
    from gluestick_spark.llm.text import tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    titles = docs.select(
        "doc_id", F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6), " ").alias("t")
    )
    plan = _plan(edit_distance_pairs(titles, "doc_id", "t", 2))
    assert "BroadcastHashJoin" in plan, plan


def test_domain_stats_no_unpartitioned_window(spark):
    """The corpus-share total must ride a 1-row broadcast (crossJoin over
    a separate aggregate), never an unpartitioned window — Window
    partitionBy() funnels the whole domain aggregate through ONE task at
    crawl scale (VERDICT r7 #1)."""
    plan = _plan(_queries()["domain_stats"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_second_wave_column_pruning_exact(spark):
    """Every second-wave scan reads ONLY the columns its query needs —
    a scan that drags full rows through a 2-column projection wastes
    the dominant cost at 100 TB (pushed projection = free I/O savings)."""
    import re

    want = {
        "events_pivot": {"event_type", "ts", "value"},
        "docs_cube": {"lang", "n_chars", "source"},
        "alpha_sample": {"doc_id", "lang"},
        "length_drift": {"lang", "n_chars"},
        "melt_part": {"p_partkey", "p_retailprice", "p_size"},
        "contact_normalize": {"c_custkey"},
    }
    qs = _queries()
    for name, expect in want.items():
        plan = _plan(qs[name](spark, SF))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
        assert cols == expect, f"{name}: scan reads {sorted(cols)}"
