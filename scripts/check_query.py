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
from scripts.driver_mimic import (  # noqa: E402
    dtype_conflicts, fetch_oracle, fetch_spark, nan_count_conflicts,
    value_hash)


def main(argv):
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            sys.exit("usage: check_query.py name [name...] [--sf dir]")
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
        if name not in oracles:
            print(f"[{name}] ROWS-ONLY rows={df.count()} "
                  f"({time.monotonic()-t0:.1f}s)")
            continue
        # fetch BOTH sides through pandas, exactly like the driver:
        # fetchall()'s Python ints hide HUGEINT->float64 dtype drift
        cols, kinds, rows = fetch_spark(df)
        o_cols, o_kinds, o_rows = fetch_oracle(con, oracles[name])
        dt = time.monotonic() - t0
        conflicts = dtype_conflicts(cols, kinds, o_cols, o_kinds)
        if conflicts:
            print(f"[{name}] DTYPE-MISMATCH: {'; '.join(conflicts)} — "
                  "cast the integer side AS BIGINT in the oracle")
            failed.append(name)
            continue
        nanc = nan_count_conflicts((cols, kinds, rows),
                                   (o_cols, o_kinds, o_rows))
        if nanc:
            print(f"[{name}] NAN-COUNT-MISMATCH: {'; '.join(nanc)}")
            failed.append(name)
            continue
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
