"""Per-query profiling harness (optimization guide §1): times each named
query with the SAME methodology as bench.py (noop sink, min-of-N), but
additionally splits

  build_s  — time spent in the query FUNCTION (plan construction; for
             operators that train driver-side — kmeans/pq/ivf — this
             includes their training jobs and collects)
  exec_s   — the noop-sink write of the returned plan
  n_jobs   — Spark jobs launched per full run (jobGroup-scoped), the
             scheduler-floor multiplier on sub-second rows

and can dump .explain("formatted") per query for the plans/ artifacts.

Usage:
  PYTHONPATH=/root/repo python tools/profile_query.py [--runs N]
      [--plans-dir plans/r15 --suffix before] [--sf SF_DIR] q1 q2 ...
  (no query names = every query in bench.py's BENCH_QUERIES)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES
    from gluestick_spark import get_spark

    spark = get_spark("gluestick-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py
    from pyspark.sql import functions as F

    n = spark.read.parquet(os.path.join(args.sf, "nation.parquet"))
    r = spark.read.parquet(os.path.join(args.sf, "region.parquet"))
    n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").agg(
        F.count("*")
    ).collect()

    qs = entry_mod.queries()
    names = args.queries or [q for q in BENCH_QUERIES]
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        best = None
        for attempt in range(args.runs):
            group = f"prof:{name}:{attempt}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "n_jobs": jobs,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            if attempt == 0:
                best["cold_s"] = rec["total_s"]
        out[name] = best
        print(
            f"{best['total_s']:8.2f}s  (build {best['build_s']:6.2f}  exec "
            f"{best['exec_s']:6.2f}  jobs {best['n_jobs']:3d}  cold "
            f"{best.get('cold_s', 0):6.2f})  {name}",
            flush=True,
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
    total = round(sum(v["total_s"] for v in out.values()), 2)
    print(f"TOTAL {total}s over {len(out)} queries")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
