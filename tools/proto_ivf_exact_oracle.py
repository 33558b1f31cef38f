import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
NC, NPROBE, ITERS, SCALE, K = 8, 2, 1, 1000, 15
sys.path.insert(0, "/root/repo/tools")
from proto_kmeans_oracle import kmeans_sql  # k=8 iters=2 default — need iters=1
import proto_kmeans_oracle as pk

SQL = f"""
WITH km AS ({pk.kmeans_sql(k=NC, iters=ITERS)}),
-- final centroids replay: re-derive cent{ITERS} like the kmeans chain does
qx AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
qxx AS (SELECT id, q, CAST(list_dot_product(q, q) AS BIGINT) AS xx FROM qx),
cent0 AS (
  SELECT row_number() OVER (ORDER BY {pk.HASH}, id) - 1 AS cid, q AS s, CAST(1 AS BIGINT) AS n
  FROM qxx ORDER BY {pk.HASH}, id LIMIT {NC}
),
assign1 AS (
  SELECT id, cid FROM (
    SELECT x.id, c.cid,
           row_number() OVER (PARTITION BY x.id ORDER BY
             CAST(c.n*c.n*x.xx - 2*c.n*CAST(list_dot_product(x.q, c.s) AS BIGINT)
                  + CAST(list_dot_product(c.s, c.s) AS BIGINT) AS DOUBLE) / CAST(c.n*c.n AS DOUBLE), c.cid) AS rn
    FROM qxx x CROSS JOIN cent0 c) WHERE rn = 1
),
sums1 AS (
  SELECT a.cid, t.i AS i, SUM(x.q[t.i]) AS sv
  FROM assign1 a JOIN qxx x USING (id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t GROUP BY a.cid, t.i
),
cnts1 AS (SELECT cid, count(*) AS n FROM assign1 GROUP BY cid),
cent1 AS (
  SELECT s.cid, list(s.sv ORDER BY s.i) AS s, c.n
  FROM sums1 s JOIN cnts1 c USING (cid) GROUP BY s.cid, c.n
  UNION ALL SELECT c0.cid, c0.s, c0.n FROM cent0 c0 WHERE c0.cid NOT IN (SELECT cid FROM cnts1)
),
qv AS (
  SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT)) AS q,
         CAST(list_dot_product(
           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT)),
           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT))) AS BIGINT) AS xx
  FROM embeddings WHERE vec_id = 0
),
probes AS (
  SELECT c.cid FROM cent1 c, qv v
  ORDER BY CAST(c.n*c.n*v.xx - 2*c.n*CAST(list_dot_product(v.q, c.s) AS BIGINT)
                + CAST(list_dot_product(c.s, c.s) AS BIGINT) AS DOUBLE) / CAST(c.n*c.n AS DOUBLE), c.cid
  LIMIT {NPROBE}
)
SELECT x.id AS vec_id,
       v.xx - 2*CAST(list_dot_product(x.q, v.q) AS BIGINT) + x.xx AS ivf_dist
FROM qxx x JOIN km ON km.vec_id = x.id, qv v
WHERE km.cid IN (SELECT cid FROM probes)
ORDER BY ivf_dist, vec_id LIMIT {K}
"""

import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
oracle = [(int(a), int(b)) for a, b in con.sql(SQL).fetchall()]
print("oracle:", oracle[:4], len(oracle))

from gluestick_spark import get_spark
from gluestick_spark.llm.cluster import ivf_topk_exact
spark = get_spark()
e = spark.read.parquet(f"{SF}/embeddings.parquet")
q = list(e.where("vec_id = 0").first()["embedding"])
got = [(r["vec_id"], r["ivf_dist"]) for r in
       ivf_topk_exact(e, "embedding", "vec_id", q, k=K, n_clusters=NC, nprobe=NPROBE, iters=ITERS).collect()]
print("spark :", got[:4], len(got))
print("match:", got == oracle)
