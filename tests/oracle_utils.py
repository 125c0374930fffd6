"""Local mirror of the driver's DuckDB-oracle comparison.

Stricter than the driver on purpose: exact value equality (so any
float-summation nondeterminism fails HERE, before the driver's
value-hash gate sees it) plus a normalized-dtype check (Spark INT vs
DuckDB INTEGER fine; int-vs-float or int-vs-str mismatch fails).
"""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    # array-valued cells (Spark ArrayType / DuckDB LIST): normalize
    # elementwise to a tuple — pd.isna on a sequence is ambiguous
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if pd.isna(v):
        return None
    return v


def _kind(dtype) -> str:
    k = dtype.kind  # i,u,f,O,b,M
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "obj", "M": "ts"}.get(k, k)


def normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict]:
    df = df[sorted(df.columns)]
    kinds = {c: _kind(df[c].dtype) for c in df.columns}
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    # NULL must sort DISTINCTLY from "" (r13 empty-keys axis: a cube
    # over a corpus containing real empty strings has NULL-subtotal
    # and ''-value rows whose old shared sort key "" made the
    # canonical order ambiguous — identical row SETS failed the
    # positional compare).  \x00/\x01 prefixes keep the key total.
    rows.sort(key=lambda r: tuple(
        "\x00" if x is None else "\x01" + str(x) for x in r))
    return rows, kinds


def compare(spark_df, duck_con, sql: str, name: str = "?") -> None:
    sp = spark_df.toPandas()
    ora = duck_con.execute(sql).fetch_df()

    assert sorted(sp.columns) == sorted(ora.columns), (
        f"[{name}] column mismatch: spark={sorted(sp.columns)} "
        f"oracle={sorted(ora.columns)}")

    sp_rows, sp_kinds = normalize(sp)
    ora_rows, ora_kinds = normalize(ora)

    for c in sp_kinds:
        sk, ok = sp_kinds[c], ora_kinds[c]
        if len(sp_rows) and sk != ok and {sk, ok} != {"int", "float"}:
            raise AssertionError(
                f"[{name}] dtype kind mismatch on {c}: spark={sk} oracle={ok}")

    assert len(sp_rows) == len(ora_rows), (
        f"[{name}] row count: spark={len(sp_rows)} oracle={len(ora_rows)}")

    for i, (a, b) in enumerate(zip(sp_rows, ora_rows)):
        if a != b:
            # int/float cross-width equality (3 == 3.0) is fine
            if len(a) == len(b) and all(
                (x == y) or (x is None and y is None)
                or (isinstance(x, (int, float)) and isinstance(y, (int, float))
                    and float(x) == float(y))
                for x, y in zip(a, b)
            ):
                continue
            raise AssertionError(
                f"[{name}] first row mismatch at sorted-row {i}:\n"
                f"  spark : {a}\n  oracle: {b}")
