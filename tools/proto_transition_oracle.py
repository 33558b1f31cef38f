import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
SQL = """
WITH seq AS (
  SELECT event_type AS s,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
pairs AS (
  SELECT s AS from_state, nxt AS to_state, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
SELECT p.from_state, p.to_state, p.n,
       CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
FROM pairs p JOIN tot t USING (from_state)
"""
import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
oracle = sorted((a, b, int(c), float(d)) for a, b, c, d in con.sql(SQL).fetchall())
print("oracle:", len(oracle), oracle[:2])

from gluestick_spark import get_spark
from gluestick_spark.operators.sessions import transition_matrix
from gluestick_spark.functions.datetimes import as_timestamp
spark = get_spark()
_e = spark.read.parquet(f"{SF}/events.parquet"); ev = _e.withColumn("ts", as_timestamp(_e, "ts"))
got = sorted((r["from_state"], r["to_state"], r["n"], r["p"])
             for r in transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"]).collect())
print("spark :", len(got), got[:2])
print("match:", got == oracle)
