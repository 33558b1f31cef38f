"""One-off probe: can the no_oracle queries be given exact SQL oracles?

Checks at sf0.01:
1. ivf_topk / lsh_ann_topk vs brute-force top-k (recall==1?)
2. minhash verified pairs (LSH cands + exact jaccard >= t) vs DuckDB
   brute-force all-pairs jaccard >= t (recall of the LSH stage)
3. DuckDB shingle construction == Spark shingles_expr
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gluestick_spark import get_spark
from gluestick_spark.llm.dedup import minhash_lsh_candidates, jaccard_expr
from gluestick_spark.llm.text import shingles_expr

SF = "/root/testdata/sf0.01"
spark = get_spark("probe")
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import __spark_entry__ as E

# --- 1. topk recall ---
brute = {r["vec_id"] for r in E.q_ann_topk(spark, SF).collect()}
ivf = {r["vec_id"] for r in E.q_ivf_topk(spark, SF).collect()}
lsh = {r["vec_id"] for r in E.q_lsh_ann(spark, SF).collect()}
print("ivf == brute:", ivf == brute, "| missing:", brute - ivf, "extra:", ivf - brute)
print("lsh == brute:", lsh == brute, "| missing:", brute - lsh, "extra:", lsh - brute)

# --- 3. duckdb shingles == spark shingles ---
SHINGLE_SQL = """
SELECT doc_id, CASE WHEN len(toks) >= 3
  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
  ELSE [array_to_string(toks, ' ')] END AS sh
FROM (SELECT doc_id,
  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS toks
  FROM documents)
"""
ddb = {r[0]: r[1] for r in con.sql(SHINGLE_SQL).fetchall()}
sp = {
    r["doc_id"]: r["sh"]
    for r in spark.read.parquet(f"{SF}/documents.parquet")
    .select("doc_id", shingles_expr(F.col("text"), 3).alias("sh"))
    .collect()
}
bad = [k for k in sp if sp[k] != ddb.get(k)]
print("shingle mismatches:", len(bad), bad[:3])
if bad:
    k = bad[0]
    print(" spark:", sp[k][:5], "\n duck :", ddb[k][:5])

# --- 2. minhash verified pairs vs brute force ---
d = spark.read.parquet(f"{SF}/documents.parquet")
for bands in (16, 32):
    cand = minhash_lsh_candidates(d, "text", "doc_id", num_perm=64, bands=bands)
    sh = d.select(
        F.col("doc_id").alias("__id__"),
        F.array_distinct(shingles_expr(F.col("text"), 3)).alias("__sh__"),
    )
    ver = (
        cand.join(sh.withColumnRenamed("__id__", "a").withColumnRenamed("__sh__", "__sha__"), "a")
        .join(sh.withColumnRenamed("__id__", "b").withColumnRenamed("__sh__", "__shb__"), "b")
        .where(jaccard_expr(F.col("__sha__"), F.col("__shb__")) >= 0.8)
        .select("a", "b")
    )
    spairs = {(r["a"], r["b"]) for r in ver.collect()}
    bpairs = {
        (a, b)
        for a, b in con.sql(
            f"""
    WITH sh AS (SELECT doc_id, list_distinct(sh) AS sh FROM ({SHINGLE_SQL})),
    pairs AS (
      SELECT l.doc_id a, r.doc_id b,
        len(list_intersect(l.sh, r.sh))::DOUBLE / len(list_distinct(list_concat(l.sh, r.sh))) j
      FROM sh l JOIN sh r ON l.doc_id < r.doc_id)
    SELECT a, b FROM pairs WHERE j >= 0.8
    """
        ).fetchall()
    }
    print(
        f"minhash bands={bands}: spark_verified={len(spairs)} brute={len(bpairs)} "
        f"missed={len(bpairs - spairs)} extra={len(spairs - bpairs)}"
    )
