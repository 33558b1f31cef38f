"""A/B a Spark conf override over a set of bench queries (measurement-only
tool, guide §1): runs each named query min-of-N with the noop sink in THIS
process's session, which is built with ``--conf k=v`` overrides on top of
the engine defaults. Run it twice (with and without overrides) in separate
processes and compare.

Usage:
  PYTHONPATH=/root/repo python tools/ab_conf.py --runs 3 \
      --conf spark.sql.adaptive.coalescePartitions.minPartitionSize=64k \
      fuzzy_pairs substring_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from gluestick_spark import get_spark

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("gluestick-ab", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    n = spark.read.parquet(os.path.join(args.sf, "nation.parquet"))
    r = spark.read.parquet(os.path.join(args.sf, "region.parquet"))
    n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").agg(
        F.count("*")
    ).collect()

    qs = entry_mod.queries()
    out = {}
    for name in args.queries:
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(name, out[name], flush=True)
    print(json.dumps({"conf": extra, "results": out}))


if __name__ == "__main__":
    main()
