"""Verify pagerank Spark output == DuckDB unrolled replay."""
import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
ITERS, PCT, R0, MINCNT = 3, 85, 10**9, 14
BASE = (100 - PCT) * R0 // 100


def pagerank_sql():
    parts = [f"""WITH raw AS (
  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst
  FROM events GROUP BY user_id, event_type HAVING count(*) >= {MINCNT}
),
edges AS (
  SELECT src, dst FROM raw UNION SELECT dst AS src, src AS dst FROM raw
),
nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({R0} AS BIGINT) AS rank FROM nodes)"""]
    prev = "r0"
    for t in range(1, ITERS + 1):
        parts.append(f""",
c{t} AS (
  SELECT e.dst AS node,
         SUM(CAST(floor(CAST({PCT} * r.rank AS DOUBLE) / CAST(100 * o.deg AS DOUBLE)) AS BIGINT)) AS inflow
  FROM edges e JOIN outdeg o ON o.src = e.src JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
),
r{t} AS (
  SELECT n.node, CAST({BASE} AS BIGINT) + COALESCE(c.inflow, 0) AS rank
  FROM nodes n LEFT JOIN c{t} c ON c.node = n.node
)""")
        prev = f"r{t}"
    parts.append(f"\nSELECT node, rank FROM {prev}")
    return "".join(parts)


import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
oracle = sorted((a, int(b)) for a, b in con.sql(pagerank_sql()).fetchall())
print("oracle nodes:", len(oracle), "top:", sorted(oracle, key=lambda x: -x[1])[:3])

from pyspark.sql import functions as F
from gluestick_spark import get_spark
from gluestick_spark.operators.graph import pagerank
spark = get_spark()
ev = spark.read.parquet(f"{SF}/events.parquet")
raw = (ev.groupBy("user_id", "event_type").count().where(F.col("count") >= MINCNT)
       .select(F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
               F.concat(F.lit("t:"), F.col("event_type")).alias("dst")))
edges = raw.unionAll(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
got = sorted((r["node"], r["rank"]) for r in pagerank(edges, iters=ITERS).collect())
print("spark nodes:", len(got))
print("match:", got == oracle)
if got != oracle:
    diffs = [(g, o) for g, o in zip(got, oracle) if g != o]
    print("first diffs:", diffs[:5], len(diffs))
