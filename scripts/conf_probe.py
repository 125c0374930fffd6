"""A/B a config bundle inside ONE session pair: time queries with the
stock session, then with extra confs applied (runtime-settable SQL
confs only), alternating per round so VM drift cancels.

Usage: python scripts/conf_probe.py ROUNDS "k=v,k=v" name [name...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark


def timeq(spark, fn, sf_dir, warms=2):
    fn(spark, sf_dir).count()
    ts = []
    for _ in range(warms):
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        ts.append(round(time.monotonic() - t0, 3))
    return min(ts), ts


def main():
    rounds = int(sys.argv[1])
    confs = dict(kv.split("=", 1) for kv in sys.argv[2].split(","))
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("conf_probe")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").count().collect()
    spark.range(1).localCheckpoint(eager=True)
    queries = all_queries()
    base = {k: spark.conf.get(k, None) for k in confs}
    for i in range(rounds):
        for label, cset in (("stock", {k: v for k, v in base.items()}),
                            ("tuned", confs)):
            for k, v in cset.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for name in names:
                m, ts = timeq(spark, queries[name], sf_dir)
                print(f"{label}{i} {name}: min {m} {ts}", flush=True)


if __name__ == "__main__":
    main()
