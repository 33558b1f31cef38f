"""Driver-environment simulation: run the full correctness sweep under a
BARE SparkSession (no ENGINE_CONF) — exactly what the round driver does.

Anything that silently depends on gluestick_spark.session defaults (UTC,
nanosAsLong, AQE, mapKeyDedupPolicy…) instead of ``__spark_entry__._prep``
fails here before it fails in the driver's CORRECTNESS run.

Usage: PYTHONPATH=/root/repo python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import TABLES, canon  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[32]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):  # tolerate partial sf dirs like check_correctness
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # the driver's smoke check first
    flagship = entry_mod.entry(spark)
    assert flagship.count() >= 0

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails: list[str] = []
    for name, fn in qs.items():
        try:
            sr, sc, sh = canon(fn(spark, sf_dir).toPandas())
            orr, oc, oh = canon(con.sql(oracles[name]).df())
            ok = sr == orr and sc == oc and sh == oh
            print(("OK  " if ok else "FAIL") + f"  {name}: spark={sr} oracle={orr}")
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001 — report every query
            print(f"ERR   {name}: {str(e)[:200]}")
            fails.append(name)
    if fails:
        print("FAILS:", fails)
        sys.exit(1)
    print(f"ALL {len(qs)} MATCH under a bare driver session")


if __name__ == "__main__":
    main()
