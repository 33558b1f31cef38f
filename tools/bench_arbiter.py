"""Back-to-back same-tree arbiter for flagged bench regressions.

BENCH deltas at the ~1s scale have a measured ±30% noise band (the
round-8 arbiter showed ±32% swings on identical code). When a round's
`regressions_gt_10pct` flags a query, this script times the suspects
N times back-to-back INSIDE ONE session (same JVM, same code, same box
state) — if the spread across same-tree runs swallows the flagged
delta, the flag was noise; if the runs agree with each other but not
with the prior round, the regression is real and worth a bisect.

Usage: python tools/bench_arbiter.py [query ...]   (default: the
round-8 flagged trio packed_encoded_docs / encoded_docs / bpe_pairs)
Prints one JSON line with per-run timings and the max/min spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("ARBITER_RUNS", "3"))


def main() -> None:
    names = sys.argv[1:] or ["encoded_docs", "packed_encoded_docs", "bpe_pairs"]
    import __spark_entry__ as em
    from gluestick_spark import get_spark

    spark = get_spark("bench-arbiter")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    out: dict[str, dict] = {}

    def run_once(fn):
        # SAME materialization as bench.py (noop sink): .count() lets
        # Catalyst's count-preserving-join elimination skip entire
        # subtrees (part_triangles' left join dropped the whole wedge
        # computation — warm "3s" vs a real 16s), which silently
        # arbitered the wrong plan.
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = qs[name]
        run_once(fn)  # warm (plan + IO caches)
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            run_once(fn)
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "runs": runs,
            "spread_pct": round(100 * (max(runs) / min(runs) - 1), 1),
        }
    print(json.dumps({"arbiter": out, "sf_dir": SF_DIR, "runs_per_query": RUNS}))


if __name__ == "__main__":
    main()
