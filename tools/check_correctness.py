"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 in Spark AND the matching
``oracle_sql()`` in DuckDB; compares row count, schema width, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple). Usage:

    PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.reindex(sorted(df.columns), axis=1)
    # Mirror the driver harness (CORRECTNESS_r01 traceback): it canonicalizes
    # with DataFrame.sort_values over ALL columns — which raises TypeError on
    # list-valued cells — and hashes full-precision values (a %.10g formatter
    # here masked the driver's last-bit double mismatches in round 1).
    df = df.sort_values(by=list(df.columns))

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}:{cell(x)}" for k, x in sorted(v.items())) + "}"
        return str(v)

    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    import hashlib

    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from gluestick_spark import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={sn} oracle={on} cols={'=' if sc == oc else f'{sc} vs {oc}'} hash={'=' if sh == oh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if status == "FAIL" and sc == oc and sn == on:
            s_sorted = sdf.reindex(sorted(sdf.columns), axis=1)
            o_sorted = odf.reindex(sorted(odf.columns), axis=1)
            print("  spark sample:", s_sorted.head(3).to_dict("records"))
            print("  oracle sample:", o_sorted.head(3).to_dict("records"))

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
