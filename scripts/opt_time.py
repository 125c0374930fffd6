"""Per-query timing harness for the r13 OPTIMIZATION round.

Mirrors bench.py's methodology exactly (same session factory, same
warm-up, one discarded cold run then min-of-N-warm on ``.count()``)
but for a named subset of queries, so a single optimization can be
measured in ~30 s instead of a ~6 min full-bench run.  Also dumps
``explain('formatted')`` per query with ``--explain DIR``.

Usage:
    python scripts/opt_time.py [--sf DIR] [--warms N] [--explain DIR]
                               [--materialize] name [name ...]

``--materialize`` warms the users/edges caches first (bench.py does
this and times them separately); without it, the first query that
needs an entity pays the derivation inside its own cold run — which
is what the driver's CORRECTNESS sweep sees, so measure both ways
when touching users/edges consumers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warms, explain_dir, materialize = 2, None, False
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif a == "--warms":
            warms = int(argv[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = argv[i + 1]; i += 2
        elif a == "--materialize":
            materialize = True; i += 1
        else:
            names.append(a); i += 1
    spark = get_spark("opt_time")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # bench.py's session warm-up: one scan+shuffle and one checkpoint
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").count().collect()
    spark.range(1).localCheckpoint(eager=True)
    if materialize:
        from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
            warm_edges_cache)
        from mvp_mini_etl_pipeline_1762911573_spark.tables import (
            warm_users_cache)
        t0 = time.monotonic()
        warm_users_cache(spark, sf_dir)
        print(f"# users_materialize: {round(time.monotonic()-t0, 3)}s")
        t0 = time.monotonic()
        warm_edges_cache(spark, sf_dir)
        print(f"# edges_materialize: {round(time.monotonic()-t0, 3)}s")

    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        cold = round(time.monotonic() - t0, 3)
        ws = []
        for _ in range(warms):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            ws.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min-warm {min(ws)}s (cold {cold}s, warms {ws}) "
              f"rows={n}", flush=True)
        if explain_dir:
            import io
            from contextlib import redirect_stdout
            os.makedirs(explain_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())


if __name__ == "__main__":
    main()
