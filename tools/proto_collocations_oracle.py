import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
MIN, K = 5, 50

SQL = rf"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '') AS t
  FROM documents
),
pairs AS (
  SELECT t[u.i] AS "left", t[u.i + 1] AS "right", count(*) AS n
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
lt AS (SELECT "left", CAST(SUM(n) AS BIGINT) AS lt FROM pairs GROUP BY 1),
rt AS (SELECT "right", CAST(SUM(n) AS BIGINT) AS rt FROM pairs GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM pairs)
SELECT p."left", p."right", p.n AS n_pair,
       (CAST(p.n AS DOUBLE) * CAST(t.N AS DOUBLE))
       / (CAST(l.lt AS DOUBLE) * CAST(r.rt AS DOUBLE)) AS lift
FROM pairs p JOIN lt l ON l."left" = p."left"
             JOIN rt r ON r."right" = p."right"
             CROSS JOIN tot t
WHERE p.n >= {MIN}
ORDER BY n_pair DESC, p."left", p."right" LIMIT {K}
"""

import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
oracle = [(a, b, int(c), float(d)) for a, b, c, d in con.sql(SQL).fetchall()]
print("oracle:", len(oracle), oracle[:3])

from gluestick_spark import get_spark
from gluestick_spark.llm.text import collocations
spark = get_spark()
d = spark.read.parquet(f"{SF}/documents.parquet")
got = [(r["left"], r["right"], r["n_pair"], r["lift"])
       for r in collocations(d, "text", min_count=MIN, k=K).collect()]
print("spark :", len(got), got[:3])
print("match:", got == oracle)
if got != oracle:
    for g, o in zip(got, oracle):
        if g != o:
            print("diff:", g, o); break
