"""Sweep every registered query through the SQLMetrics profiler and
flag scale-smells: shuffle volume far above the scan volume (work
amplification), disk spill, and cartesian/nested-loop joins on
non-trivial inputs.  Complements explain_audit.py (plan shapes for a
curated slice) with MEASURED numbers for the whole registry.

Usage: python scripts/shuffle_audit.py [--sf dir] [name ...]
Prints one line per query: scan rows, shuffle records, ratio, spill;
a trailing summary lists the flagged queries.  Ratio flags are a
triage signal, not a verdict — iterative algorithms (CC, PageRank,
BFS) legitimately re-shuffle per round.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from mvp_mini_etl_pipeline_1762911573_spark.plans.profiler import profile  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402

RATIO_FLAG = 4.0      # shuffle_records > 4x scan_rows => inspect
SPILL_FLAG = 1        # any disk spill at this scale => inspect


def main(argv):
    sf = "/root/testdata/sf0.001"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i:i + 2]
    spark = get_spark("shuffle-audit")
    queries = all_queries()
    names = argv or list(queries)

    flagged = []
    for name in names:
        t0 = time.monotonic()
        try:
            s = profile(queries[name](spark, sf))["summary"]
        except Exception as exc:  # noqa: BLE001 — audit keeps going
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
            flagged.append((name, "error"))
            continue
        ratio = (s["shuffle_records"] / s["scan_rows"]
                 if s["scan_rows"] else 0.0)
        marks = []
        if ratio > RATIO_FLAG:
            marks.append(f"ratio {ratio:.1f}x")
        if s["spill_disk_bytes"] >= SPILL_FLAG:
            marks.append(f"spill {s['spill_disk_bytes']}B")
        tag = "  <== " + ", ".join(marks) if marks else ""
        print(f"{name:32s} scan={s['scan_rows']:>8} "
              f"shuf={s['shuffle_records']:>8} "
              f"bcast={s['n_broadcasts']} "
              f"({time.monotonic() - t0:.1f}s){tag}")
        if marks:
            flagged.append((name, ", ".join(marks)))

    print(f"\n# {len(names)} audited, {len(flagged)} flagged")
    for name, why in flagged:
        print(f"#   {name}: {why}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
