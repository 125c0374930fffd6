"""Drive the repo exactly as the round driver does: import __spark_entry__,
smoke entry() at sf0.001, then run every queries()[name] at sf0.01 and
compare to oracle_sql()[name] via DuckDB (row-count + sorted-column
order-insensitive value-hash). This is the repo's public surface.
"""
from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.tables import TABLE_NAMES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _canon_cell(v):
    """Canonicalize one cell the strict way.  The REAL driver
    canonicalizes results through pandas (sort_values + row hashing),
    which raises `TypeError: unhashable type: 'list'` on ARRAY/MAP
    cells — the failure that turned `agg_approx_percentiles` (r2) and
    `table_diff`/`inverted_index` (r4) red AFTER they passed the old
    str-tuple hash here.  Locally-green must imply driver-green, so:

    * complex cells (list/dict/set/ndarray — incl. Spark Row structs,
      which are tuple subclasses) raise loudly;
    * floats hash by their exact bit pattern (`float.hex`), so no
      string-shortening path can mask a representation difference.
    """
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return "f" + v.hex()
    if isinstance(v, (str, int)):  # bool is int; str() disambiguates
        return "s" + str(v) if isinstance(v, str) else "i" + str(v)
    if isinstance(v, (bytes, bytearray)):
        # Spark BinaryType collects as bytearray, the DuckDB side
        # returns bytes — reject BOTH so a binary output column fails
        # symmetrically whichever side hashes first
        raise TypeError(
            "BINARY cell: the driver's pandas canonicalization cannot "
            "hash binary output columns — encode with hex()/base64 in "
            "BOTH the query and its oracle")
    if isinstance(v, (list, tuple, set, dict)) or (
            type(v).__module__ == "numpy" and hasattr(v, "__len__")):
        raise TypeError(
            f"unhashable cell type {type(v).__name__} ({v!r:.60}): the "
            "driver's pandas canonicalization cannot hash ARRAY/MAP/"
            "STRUCT output columns — serialize with array_join/to_json "
            "in BOTH the query and its oracle")
    return "o" + str(v)  # date/datetime/Decimal: repr-stable


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(
        tuple(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in norm:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    spark = get_spark("driver-mimic")

    t0 = time.monotonic()
    df = E.entry(spark)
    rows = df.collect()
    print(f"[entry] OK rows={len(rows)} cols={df.columns} "
          f"({time.monotonic()-t0:.1f}s)")
    print(f"[entry] first row: {rows[0].asDict() if rows else None}")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    extra = set(oracles) - set(queries)
    assert not extra, f"oracle_sql keys missing from queries: {extra}"
    print(f"[contract] {len(queries)} queries, {len(oracles)} with oracle, "
          f"{len(set(queries)-set(oracles))} rows-only")

    failed = []
    for name in sorted(queries):
        t0 = time.monotonic()
        try:
            sdf = queries[name](spark, SF_ORACLE)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] SPARK ERROR: {e}")
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: rows={len(srows)} "
                  f"({time.monotonic()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] ORACLE ERROR: {e}")
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        try:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        except TypeError as e:
            # canon-unsafe output (ARRAY/MAP/BINARY cell): record the
            # query as failed and keep sweeping — the whole point of
            # the strict canonicalizer is to surface EVERY offender
            failed.append(name)
            print(f"[{name}] CANON-UNSAFE: {e}")
            continue
        ok_hash = sh == oh
        status = "MATCH" if (ok_cols and ok_rows and ok_hash) else "MISMATCH"
        if status == "MISMATCH":
            failed.append(name)
        print(f"[{name}] {status} rows={len(srows)}/{len(orows)} "
              f"hash={sh}/{oh} ({time.monotonic()-t0:.1f}s)")
        if not ok_cols:
            print(f"    cols spark={sorted(scols)} oracle={sorted(ocols)}")

    print(f"\n{'FAIL: ' + str(failed) if failed else 'ALL OK'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
