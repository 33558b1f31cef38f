"""Verify pq_topk Spark output == DuckDB PQ replay."""
import sys
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"
M, K, ITERS, SCALE, DS, TOPK = 4, 8, 1, 1000, 16, 20
HASH = "CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS UBIGINT)"


def lloyd_ctes(tag, lo, hi, k=K, iters=ITERS, scale=SCALE, ds=DS):
    parts = [f"""qx_{tag} AS (
  SELECT vec_id AS id,
         list_transform(embedding[{lo}:{hi}],
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
qxx_{tag} AS (
  SELECT id, q, CAST(list_dot_product(q, q) AS BIGINT) AS xx FROM qx_{tag}
),
cent0_{tag} AS (
  SELECT row_number() OVER (ORDER BY {HASH}, id) - 1 AS cid,
         q AS s, CAST(1 AS BIGINT) AS n
  FROM qxx_{tag} ORDER BY {HASH}, id LIMIT {k}
)"""]
    prev = f"cent0_{tag}"
    for t in range(1, iters + 2):
        parts.append(f""",
assign{t}_{tag} AS (
  SELECT id, cid FROM (
    SELECT x.id, c.cid,
           row_number() OVER (
             PARTITION BY x.id
             ORDER BY CAST(c.n*c.n*x.xx - 2*c.n*CAST(list_dot_product(x.q, c.s) AS BIGINT)
                           + CAST(list_dot_product(c.s, c.s) AS BIGINT) AS DOUBLE)
                      / CAST(c.n*c.n AS DOUBLE),
                      c.cid
           ) AS rn
    FROM qxx_{tag} x CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        if t <= iters:
            parts.append(f""",
sums{t}_{tag} AS (
  SELECT a.cid, t.i AS i, SUM(x.q[t.i]) AS sv
  FROM assign{t}_{tag} a JOIN qxx_{tag} x USING (id)
  CROSS JOIN (SELECT unnest(range(1, {ds + 1})) AS i) t
  GROUP BY a.cid, t.i
),
cnts{t}_{tag} AS (SELECT cid, count(*) AS n FROM assign{t}_{tag} GROUP BY cid),
cent{t}_{tag} AS (
  SELECT s.cid, list(s.sv ORDER BY s.i) AS s, c.n
  FROM sums{t}_{tag} s JOIN cnts{t}_{tag} c USING (cid) GROUP BY s.cid, c.n
  UNION ALL
  SELECT c0.cid, c0.s, c0.n FROM {prev} c0
  WHERE c0.cid NOT IN (SELECT cid FROM cnts{t}_{tag})
)""")
            prev = f"cent{t}_{tag}"
    return "".join(parts), f"assign{iters + 1}_{tag}", prev


def pq_sql():
    blocks, finals = [], []
    for j in range(M):
        lo, hi = j * DS + 1, (j + 1) * DS
        ctes, assign_name, cent_name = lloyd_ctes(j, lo, hi)
        qv = f"""qv_{j} AS (
  SELECT list_transform(embedding[{lo}:{hi}],
           x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id = 0
),
dt_{j} AS (
  SELECT c.cid,
         CAST(floor(1000000.0 *
           (CAST(c.n*c.n*CAST(list_dot_product(v.q, v.q) AS BIGINT)
                 - 2*c.n*CAST(list_dot_product(v.q, c.s) AS BIGINT)
                 + CAST(list_dot_product(c.s, c.s) AS BIGINT) AS DOUBLE)
            / CAST(c.n*c.n AS DOUBLE))) AS BIGINT) AS dv
  FROM {cent_name} c, qv_{j} v
)"""
        blocks.append(ctes + ",\n" + qv)
        finals.append((assign_name, f"dt_{j}"))
    joins = f"FROM {finals[0][0]} a0 JOIN {finals[0][1]} d0 ON d0.cid = a0.cid"
    for j in range(1, M):
        joins += f"\n  JOIN {finals[j][0]} a{j} ON a{j}.id = a0.id JOIN {finals[j][1]} d{j} ON d{j}.cid = a{j}.cid"
    dist = " + ".join(f"d{j}.dv" for j in range(M))
    return ("WITH " + ",\n".join(blocks) +
            f"\nSELECT a0.id AS vec_id, ({dist}) AS pq_dist\n{joins}\n"
            f"ORDER BY pq_dist, vec_id LIMIT {TOPK}")


import duckdb
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
oracle = [(int(a), int(b)) for a, b in con.sql(pq_sql()).fetchall()]
print("oracle:", oracle[:5], "...", len(oracle))

from gluestick_spark import get_spark
from gluestick_spark.llm.pq import train_pq, pq_topk
spark = get_spark()
e = spark.read.parquet(f"{SF}/embeddings.parquet")
books = train_pq(e, "embedding", "vec_id", m=M, k=K, iters=ITERS, scale=SCALE)
qrow = e.where("vec_id = 0").select("embedding").first()
got = [(r["vec_id"], r["pq_dist"]) for r in
       pq_topk(e, "embedding", "vec_id", list(qrow["embedding"]), books, k=TOPK, scale=SCALE).collect()]
print("spark :", got[:5], "...", len(got))
print("match:", got == oracle)
