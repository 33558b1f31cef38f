import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
ITERS, SCALE, MINCNT = 2, 10**6, 10


def hits_sql():
    parts = [f"""WITH e AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst
  FROM events GROUP BY user_id, event_type HAVING count(*) >= {MINCNT}
),
nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
h0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS hub FROM nodes)"""]
    ph = "h0"
    for t in range(1, ITERS + 1):
        parts.append(f""",
ar{t} AS (
  SELECT n.node, COALESCE(s.v, 0) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS v
    FROM e JOIN {ph} h ON h.node = e.src GROUP BY e.dst
  ) s ON s.node = n.node
),
a{t} AS (
  SELECT r.node,
         CAST(floor(CAST(r.v * {SCALE} AS DOUBLE) / CAST(m.mx AS DOUBLE)) AS BIGINT) AS authority
  FROM ar{t} r CROSS JOIN (SELECT MAX(v) AS mx FROM ar{t}) m
),
hr{t} AS (
  SELECT n.node, COALESCE(s.v, 0) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, CAST(SUM(a.authority) AS BIGINT) AS v
    FROM e JOIN a{t} a ON a.node = e.dst GROUP BY e.src
  ) s ON s.node = n.node
),
h{t} AS (
  SELECT r.node,
         CAST(floor(CAST(r.v * {SCALE} AS DOUBLE) / CAST(m.mx AS DOUBLE)) AS BIGINT) AS hub
  FROM hr{t} r CROSS JOIN (SELECT MAX(v) AS mx FROM hr{t}) m
)""")
        ph = f"h{t}"
    parts.append(f"""
SELECT h.node, h.hub, a.authority
FROM h{ITERS} h JOIN a{ITERS} a ON a.node = h.node""")
    return "".join(parts)


import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
oracle = sorted((a, int(b), int(c)) for a, b, c in con.sql(hits_sql()).fetchall())
print("oracle:", len(oracle), [r for r in oracle if r[0].startswith('t:')][:3])

from pyspark.sql import functions as F
from gluestick_spark import get_spark
from gluestick_spark.operators.graph import hits
spark = get_spark()
ev = spark.read.parquet(f"{SF}/events.parquet")
edges = (ev.groupBy("user_id", "event_type").count().where(F.col("count") >= MINCNT)
         .select(F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
                 F.concat(F.lit("t:"), F.col("event_type")).alias("dst")))
got = sorted((r["node"], r["hub"], r["authority"]) for r in hits(edges, iters=ITERS).collect())
print("spark :", len(got))
print("match:", got == oracle)
if got != oracle:
    print([ (g,o) for g,o in zip(got,oracle) if g!=o ][:4])
