"""Sweep every registered query's OUTPUT for driver-canonicalization
hazards, the failure class that produced the only red rows of rounds
2 and 4 (`agg_approx_percentiles` r2; `table_diff`, `inverted_index`,
`events_debounce` r4): the real driver canonicalizes results through
pandas (`sort_values` + value hashing), which

  (a) cannot hash ARRAY/MAP cells at all — `TypeError: unhashable
      type: 'list'` — so any hash-tier query emitting a complex-typed
      column ERRs in official verification even when it MATCHes its
      DuckDB oracle locally, and
  (b) canonicalizes floats its own way, so raw un-rounded DOUBLE
      pass-throughs are the one place two bit-identical engines can
      still diverge (events_debounce, r4); explicitly-rounded columns
      (4-8 dp, the house style) have always verified green.

Usage: `python scripts/output_audit.py [--sf DIR]` (default sf0.01,
the driver's verification SF: the complex-COLUMN check is schema-level
and scale-independent, but the float-CELL check is data-dependent — a
group that happens to hold one row at a tiny SF emits round numbers
that mask an unrounded avg).  Exit 1 if any HASH-TIER query has a
complex-typed (ARRAY/MAP/STRUCT/BINARY) output column or emits a
float cell that is not round-8 idempotent (see unrounded_cells for
why 8, not the 4-dp house style).
Rows-only queries' output FLAGS are reported but never fatal (the
driver only row-counts that tier); an execution ERROR is fatal for
every tier — the real driver fails an erroring rows-only query too.
`tests/test_registry.py` runs the same complex-type check as a pytest
gate over the schemas (cheap, no execution).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T  # noqa: E402

from mvp_mini_etl_pipeline_1762911573_spark.registry import (  # noqa: E402
    all_oracles, all_queries,
)
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402

COMPLEX = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def complex_cols(schema):
    return [f.name for f in schema.fields if isinstance(f.dataType, COMPLEX)]


def float_cols(schema):
    return [f.name for f in schema.fields
            if isinstance(f.dataType, (T.DoubleType, T.FloatType))]


def unrounded_cells(rows, cols, names, limit=3):
    """Float cells that are not fixed points of round(., 8) — i.e. raw
    full-precision doubles that no explicit rounding produced.  The
    threshold is 8 dp, not the repo's 4-dp style rule, because driver
    history shows 6-8 dp rounded outputs verify green (window_ewma,
    regr_by_group, embedding_quantize...) while the one red hash row
    (events_debounce r4) was a RAW pass-through double."""
    idx = [cols.index(n) for n in names]
    bad: dict[str, list[float]] = {}
    for r in rows:
        for i in idx:
            v = r[i]
            if v is None or v != v:  # null / NaN are canonical
                continue
            if v in (float("inf"), float("-inf")):
                continue
            if round(v, 8) != v and len(bad.setdefault(cols[i], [])) < limit:
                bad[cols[i]].append(v)
    return bad


def main(argv):
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            sys.exit("usage: output_audit.py [--sf DIR]")
        sf = argv[i + 1]
    spark = get_spark("output-audit")
    queries, oracles = all_queries(), all_oracles()

    fatal = []
    for name, fn in queries.items():
        tier = "hash" if name in oracles else "rows-only"
        try:
            df = fn(spark, sf)
            cc = complex_cols(df.schema)
            fc = float_cols(df.schema)
            ur = unrounded_cells(df.collect(), df.columns, fc) if fc else {}
        except Exception as e:  # noqa: BLE001
            fatal.append(name)
            print(f"[{name}] ERROR: {e}")
            continue
        flags = []
        if cc:
            flags.append(f"complex-cols={cc}")
        if ur:
            flags.append("unrounded=" + str(
                {k: [repr(v) for v in vs] for k, vs in ur.items()}))
        if flags:
            line = f"[{name}] ({tier}) " + " ".join(flags)
            if tier == "hash":
                fatal.append(name)
                print("FATAL " + line)
            else:
                print("note  " + line)
    print(f"\n{'FATAL: ' + str(sorted(set(fatal))) if fatal else 'ALL CLEAN'}")
    sys.exit(1 if fatal else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
