"""Drive the repo exactly as the round driver does: import __spark_entry__,
smoke entry() at sf0.001, then run every queries()[name] at sf0.01 and
compare to oracle_sql()[name] via DuckDB (row-count + sorted-column
order-insensitive value-hash). This is the repo's public surface.

FETCH-PATH FIDELITY (round-6 hardening): the real driver materializes
BOTH sides through pandas — Spark via ``toPandas()``, DuckDB via
``.df()`` — before hashing.  Round 5's ``events_debounce`` red proved
that fetching the oracle via ``fetchall()`` (Python ints) masks pandas
dtype asymmetries: DuckDB returns HUGEINT for an integer window SUM,
which pandas converts to float64, while Spark's LongType arrives as
int64 — ``10`` hashes equal to ``10.0`` under ``fetchall()`` but NOT
under the driver's pandas canonicalization.  So this gate now fetches
through the SAME pandas path and additionally compares the dtype-kind
vectors (int-vs-float asymmetry on a column is an instant fail with a
named diagnosis, before the opaque hash mismatch).
"""
from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

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
      string-shortening path can mask a representation difference —
      and an int64 column on one side vs float64 on the other (the
      events_debounce HUGEINT trap) mismatches by construction;
    * pandas missing sentinels (None/NaN/NaT/pd.NA) all canonicalize
      to the null byte: each engine widens its own NULLs to whichever
      sentinel its dtype dictates, and the pairing is symmetric.
    """
    if v is None or v is pd.NaT or v is pd.NA:
        return "\x00"
    if isinstance(v, (bool, np.bool_)):
        return "i" + str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "\x00" if f != f else "f" + f.hex()
    if isinstance(v, (int, np.integer)):
        return "i" + str(int(v))
    if isinstance(v, str):
        return "s" + str(v)
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
    return "o" + str(v)  # date/datetime/Timestamp/Decimal: repr-stable


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


def _pd_frame(df: pd.DataFrame):
    """(cols, dtype-kinds, row-tuples) from a pandas frame — the shared
    canonical shape for BOTH engines.  Kind normalization: unsigned
    ints count as ints ('u'→'i'); everything else keeps pandas' own
    ``dtype.kind`` ('i' int, 'f' float, 'b' bool, 'M' datetime,
    'O' object)."""
    cols = list(df.columns)
    kinds = ["i" if df[c].dtype.kind == "u" else df[c].dtype.kind
             for c in cols]
    rows = list(df.itertuples(index=False, name=None))
    return cols, kinds, rows


def fetch_spark(sdf):
    """Fetch a Spark DataFrame the way the driver does: toPandas()."""
    return _pd_frame(sdf.toPandas())


def fetch_oracle(con, sql):
    """Fetch a DuckDB result the way the driver does: .df() — NOT
    fetchall(), whose Python ints hide HUGEINT→float64 coercion."""
    return _pd_frame(con.execute(sql).df())


def dtype_conflicts(scols, skinds, ocols, okinds):
    """Column-name-aligned dtype-kind asymmetries that are guaranteed
    driver hash mismatches.  ANY unequal kind pair (after the 'u'→'i'
    normalization in _pd_frame) is flagged with a named diagnosis —
    ADVICE r6: the original {int, float} special case let bool-vs-int
    and object-vs-float (e.g. an uncast DECIMAL arriving as Python
    Decimal from Spark toPandas vs float64 from DuckDB .df()) fall
    through to an opaque hash mismatch.  The {i, f} pair keeps its
    events_debounce-specific remediation text (uncast HUGEINT source,
    the only pair with a known one-line fix)."""
    omap = dict(zip(ocols, okinds))
    out = []
    for c, sk in zip(scols, skinds):
        ok = omap.get(c)
        if ok is None or sk == ok:
            continue
        if {sk, ok} == {"i", "f"}:
            out.append(f"{c}: spark={'int' if sk == 'i' else 'float'} "
                       f"vs oracle={'int' if ok == 'i' else 'float'} "
                       "(uncast HUGEINT source — CAST the oracle "
                       "column AS BIGINT)")
        else:
            out.append(f"{c}: dtype-kind spark='{sk}' vs oracle='{ok}' "
                       "— align the output types in query and oracle")
    return out


def nan_count_conflicts(sdf_pd_like, odf_pd_like):
    """Per-column real-NaN count asymmetries (ADVICE r6): _canon_cell
    folds float NaN into the NULL sentinel because pandas float64
    columns represent BOTH NULL and NaN as np.nan — post-pandas the
    two are indistinguishable to the REAL driver as well, so folding
    is faithful there.  But in OBJECT-dtype columns None and float
    NaN stay distinct Python objects, and a genuine NaN-on-one-engine
    vs NULL-on-the-other divergence would be silently hashed equal.
    This companion check counts float-NaN cells per column (the count
    is kind-agnostic: in a float64 column that total is NULL+NaN
    combined — the best pandas can see — while in an object column it
    is real float-NaN cells only; both fall out of the same isnan test
    over the row tuples, no kind inspection needed) so a count
    asymmetry is flagged by name instead of slipping through.  Takes
    (cols, kinds, rows) triples — kinds is carried for signature
    symmetry with dtype_conflicts' inputs but unused here."""
    (scols, _skinds, srows), (ocols, _okinds, orows) = \
        sdf_pd_like, odf_pd_like

    def counts(cols, rows):
        idx = {c: i for i, c in enumerate(cols)}
        out = {}
        for c in cols:
            i = idx[c]
            out[c] = sum(
                1 for r in rows
                if isinstance(r[i], float) and r[i] != r[i])
        return out

    sc, oc = counts(scols, srows), counts(ocols, orows)
    return [f"{c}: spark NaN-count={sc[c]} vs oracle={oc.get(c)}"
            for c in scols if c in oc and sc[c] != oc[c]]


def main():
    # Optional overrides (round-10): `--sf DIR` re-points the oracle
    # scale (the judge spot-checks at sf0.1 — locally-green must imply
    # judge-green THERE too, not just at the driver's sf0.01), and any
    # bare args restrict the sweep to those query names.
    argv = sys.argv[1:]
    sf_oracle, only = SF_ORACLE, None
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            raise SystemExit(
                "usage: driver_mimic.py [--sf DIR] [name...]")
        sf_oracle = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if argv:
        only = set(argv)

    spark = get_spark("driver-mimic")

    t0 = time.monotonic()
    df = E.entry(spark)
    rows = df.collect()
    print(f"[entry] OK rows={len(rows)} cols={df.columns} "
          f"({time.monotonic()-t0:.1f}s)")
    print(f"[entry] first row: {rows[0].asDict() if rows else None}")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_oracle}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    if only is not None:
        missing = only - set(queries)
        assert not missing, f"unknown query names: {sorted(missing)}"
        queries = {k: v for k, v in queries.items() if k in only}
        oracles = {k: v for k, v in oracles.items() if k in only}
    extra = set(oracles) - set(queries)
    assert not extra, f"oracle_sql keys missing from queries: {extra}"
    print(f"[contract] {len(queries)} queries, {len(oracles)} with oracle, "
          f"{len(set(queries)-set(oracles))} rows-only")

    failed = []
    for name in sorted(queries):
        t0 = time.monotonic()
        try:
            sdf = queries[name](spark, sf_oracle)
            if name not in oracles:
                n = sdf.count()
                print(f"[{name}] rows-only: rows={n} "
                      f"({time.monotonic()-t0:.1f}s)")
                continue
            scols, skinds, srows = fetch_spark(sdf)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] SPARK ERROR: {e}")
            continue
        try:
            ocols, okinds, orows = fetch_oracle(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] ORACLE ERROR: {e}")
            continue
        conflicts = dtype_conflicts(scols, skinds, ocols, okinds)
        if conflicts:
            failed.append(name)
            print(f"[{name}] DTYPE-MISMATCH: {'; '.join(conflicts)}")
            continue
        nanc = nan_count_conflicts((scols, skinds, srows),
                                   (ocols, okinds, orows))
        if nanc:
            failed.append(name)
            print(f"[{name}] NAN-COUNT-MISMATCH: {'; '.join(nanc)} — "
                  "one engine emits NaN where the other emits NULL "
                  "(or a value); the pandas canon would fold these")
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
