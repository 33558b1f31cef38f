import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (SELECT a AS node FROM pairs UNION SELECT b FROM pairs),
roles AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnt AS (SELECT node, count(*) AS n_triangles FROM roles GROUP BY node)
SELECT n.node, CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN cnt c ON c.node = n.node
"""
import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
oracle = sorted((int(a), int(b)) for a, b in con.sql(SQL).fetchall())
print("oracle nodes:", len(oracle), "total tri*3:", sum(b for _, b in oracle))

from pyspark.sql import functions as F
from gluestick_spark import get_spark
from gluestick_spark.operators.graph import triangle_count
spark = get_spark()
li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey")
a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
edges = a.join(b, "ok").where(F.col("src") < F.col("dst")).select("src", "dst")
got = sorted((r["node"], r["n_triangles"]) for r in triangle_count(edges).collect())
print("spark nodes:", len(got), "total tri*3:", sum(b for _, b in got))
print("match:", got == oracle)
