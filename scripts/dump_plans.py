"""Dump `.explain("formatted")` for named queries to a directory —
plan capture only, no job execution (driver-side planning).

Usage: python scripts/dump_plans.py OUTDIR [--sf DIR] name [name ...]
       python scripts/dump_plans.py OUTDIR --suffix _before ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    outdir = argv.pop(0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = ""
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]; i += 2
        else:
            names.append(argv[i]); i += 1
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    queries = all_queries()
    import io
    from contextlib import redirect_stdout
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}{suffix}.txt ({txt.count('Exchange')} Exchange refs)",
              flush=True)


if __name__ == "__main__":
    main()
