"""Prototype: verify kmeans/semdedup Spark output == DuckDB Lloyd replay."""
import sys

K, ITERS, SCALE, DIM = 8, 2, 1000, 64
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

HASH = "CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS UBIGINT)"


def kmeans_sql(k=K, iters=ITERS, scale=SCALE, dim=DIM):
    parts = [f"""
WITH qx AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5)) AS q
  FROM embeddings
),
qxx AS (
  SELECT id, q, CAST(list_dot_product(q, q) AS BIGINT) AS xx FROM qx
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY {HASH}, id) - 1 AS cid, q AS s, CAST(1 AS BIGINT) AS n
  FROM qxx ORDER BY {HASH}, id LIMIT {k}
)"""]
    prev = "cent0"
    for t in range(1, iters + 2):
        parts.append(f""",
assign{t} AS (
  SELECT id, cid FROM (
    SELECT x.id, c.cid,
           row_number() OVER (
             PARTITION BY x.id
             ORDER BY CAST(c.n*c.n*x.xx - 2*c.n*CAST(list_dot_product(x.q, c.s) AS BIGINT)
                           + CAST(list_dot_product(c.s, c.s) AS BIGINT) AS DOUBLE)
                      / CAST(c.n*c.n AS DOUBLE),
                      c.cid
           ) AS rn
    FROM qxx x CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        if t <= iters:
            parts.append(f""",
sums{t} AS (
  SELECT a.cid, t.i AS i, SUM(x.q[t.i]) AS sv
  FROM assign{t} a JOIN qxx x USING (id)
  CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) t
  GROUP BY a.cid, t.i
),
cnts{t} AS (SELECT cid, count(*) AS n FROM assign{t} GROUP BY cid),
cent{t} AS (
  SELECT s.cid, list(s.sv ORDER BY s.i) AS s, c.n
  FROM sums{t} s JOIN cnts{t} c USING (cid) GROUP BY s.cid, c.n
  UNION ALL
  SELECT c0.cid, c0.s, c0.n FROM {prev} c0
  WHERE c0.cid NOT IN (SELECT cid FROM cnts{t})
)""")
            prev = f"cent{t}"
    parts.append(f"\nSELECT id AS vec_id, cid FROM assign{iters + 1} ORDER BY vec_id")
    return "".join(parts)


def main():
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.sql(kmeans_sql()).fetchall()
    print("oracle rows:", len(oracle), "cluster sizes:",
          con.sql(f"SELECT cid, count(*) FROM ({kmeans_sql()}) GROUP BY cid ORDER BY cid").fetchall())

    from gluestick_spark import get_spark
    from gluestick_spark.llm.cluster import kmeans, semdedup
    spark = get_spark()
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sorted((r["vec_id"], r["cid"]) for r in kmeans(e, "embedding", "vec_id", k=K, iters=ITERS, scale=SCALE).collect())
    exp = [(int(a), int(b)) for a, b in oracle]
    print("kmeans match:", got == exp)
    if got != exp:
        diff = [(g, x) for g, x in zip(got, exp) if g != x]
        print("first diffs:", diff[:10], "n_diff:", len(diff))

    # semdedup drop counts at a few thresholds
    for tau in (0.5, 0.6, 0.7, 0.8):
        sd = semdedup(e, "embedding", "vec_id", k=K, iters=ITERS, scale=SCALE, threshold=tau)
        n_drop = sd.where(~sd.keep).count()
        print(f"semdedup tau={tau}: dropped {n_drop}/500")


if __name__ == "__main__":
    main()
