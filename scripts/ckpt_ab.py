"""In-SESSION eager-vs-lazy checkpoint A/B (r14).

Suite-level interleaving (ab_loop/bench_ab) cannot cancel this VM's
~5-10-minute speed phases: a full suite pass per side means one side
regularly lands wholly inside a slow phase (observed pairwise deltas
of +200%/-70% for the same change).  This harness alternates the two
modes PER QUERY within one Spark session via the temporary
SPARK_GRAFT_CKPT_EAGER shim, so each eager/lazy pair runs seconds
apart on the same JVM with the same caches.

Usage: python scripts/ckpt_ab.py [--reps N] name [name ...]
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
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        else:
            names.append(argv[i]); i += 1
    spark = get_spark("ckpt_ab")
    queries = all_queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").count().collect()
    spark.range(1).localCheckpoint(eager=True)
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        warm_edges_cache)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import (
        warm_users_cache)
    warm_users_cache(spark, sf_dir)
    warm_edges_cache(spark, sf_dir)

    results: dict[str, dict[str, list[float]]] = {
        n: {"eager": [], "lazy": []} for n in names}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()          # discard one cold run
        for rep in range(reps):
            for mode in ("eager", "lazy"):
                os.environ["SPARK_GRAFT_CKPT_EAGER"] = (
                    "1" if mode == "eager" else "0")
                warms = []
                for _ in range(2):
                    t0 = time.monotonic()
                    fn(spark, sf_dir).count()
                    warms.append(time.monotonic() - t0)
                results[name][mode].append(min(warms))
        e, l = results[name]["eager"], results[name]["lazy"]
        pw = ["%+.0f%%" % (100 * (b - a) / a) for a, b in zip(e, l)]
        import statistics
        print(f"{name}: eager med {statistics.median(e):.3f}s "
              f"lazy med {statistics.median(l):.3f}s  pairwise {pw}",
              flush=True)


if __name__ == "__main__":
    main()
