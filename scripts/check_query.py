"""Check a subset of queries against their DuckDB oracles, same
comparison as driver_mimic but filtered: `python scripts/check_query.py
name1 name2 [--sf /root/testdata/sf0.001]`.  Development aid for
iterating on one operator without the full ~6-min sweep.
"""
from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.tables import TABLE_NAMES  # noqa: E402
from scripts.driver_mimic import value_hash  # noqa: E402


def main(argv):
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i:i + 2]
    names = argv or sys.exit("usage: check_query.py name [name...] [--sf dir]")

    spark = get_spark("check-query")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries, oracles = E.queries(), E.oracle_sql()
    bad = [n for n in names if n not in queries]
    assert not bad, f"unknown queries: {bad}"

    failed = []
    for name in names:
        t0 = time.monotonic()
        df = queries[name](spark, sf)
        rows = df.collect()
        cols = df.columns
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"[{name}] ROWS-ONLY rows={len(rows)} ({dt:.1f}s)")
            continue
        o = con.execute(oracles[name])
        o_rows, o_cols = o.fetchall(), [d[0] for d in o.description]
        try:
            sh, oh = value_hash(rows, cols), value_hash(o_rows, o_cols)
        except TypeError as e:
            print(f"[{name}] CANON-UNSAFE: {e}")
            failed.append(name)
            continue
        ok = len(rows) == len(o_rows) and sorted(cols) == sorted(o_cols) \
            and sh == oh
        tag = "MATCH" if ok else "MISMATCH"
        print(f"[{name}] {tag} rows={len(rows)}/{len(o_rows)} "
              f"cols={sorted(cols)}/{sorted(o_cols)} hash={sh}/{oh} ({dt:.1f}s)")
        if not ok:
            failed.append(name)
            for r in rows[:3]:
                print("  spark:", r)
            for r in o_rows[:3]:
                print("  duck :", r)
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("ALL OK")


if __name__ == "__main__":
    main(sys.argv[1:])
