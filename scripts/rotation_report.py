"""Derive the CORRECTNESS-window rotation candidates programmatically.

Reads every CORRECTNESS_r*.json in the repo root, computes each
registered query's LATEST official row (the last round the driver
checked it), and prints:

  * queries with NO official row yet (debuts — always window them the
    round they land), then
  * greens sorted stalest-first (oldest latest-row, then name),

sized to the window.  `registry.py`'s WINDOW_PRIORITY should be this
list, newest-work-first — the round-2 and round-3 rotation notes both
drifted from hand-counting, which is exactly what this script replaces
(ADVICE r3 item 1).

Usage: python scripts/rotation_report.py [--all]
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762911573_spark.registry import (  # noqa: E402
    WINDOW_SIZE, all_oracles, all_queries)


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(f"{REPO_ROOT}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    show_all = "--all" in sys.argv
    latest = latest_rows()
    registered = list(all_queries())
    gone = sorted(set(latest) - set(registered))
    if gone:
        print(f"# WARNING: official rows for unregistered names: {gone}")

    # rows-only queries (no DuckDB oracle) are structurally excluded
    # from WINDOW_PRIORITY — the driver records only `err: no_oracle`
    # for them, a wasted slot.  Skipping them here keeps the printed
    # list copy-pasteable (r8 verdict: `bpe_encode` surfaced at
    # candidate slot 47 and was a hand-edit trap).
    oracles = all_oracles()
    rows_only = sorted(n for n in registered if n not in oracles)
    registered = [n for n in registered if n in oracles]

    debuts = [n for n in registered if n not in latest]
    greens = sorted((n for n in registered if n in latest),
                    key=lambda n: (latest[n], n))
    print(f"# {len(registered)} oracle-checked queries ({len(rows_only)} "
          f"rows-only excluded: {', '.join(rows_only)}), {len(debuts)} "
          f"without an official row, window = {WINDOW_SIZE}")
    ranked = [(n, "debut") for n in debuts] + \
             [(n, f"r{latest[n]}") for n in greens]
    cut = len(ranked) if show_all else WINDOW_SIZE
    for i, (name, tag) in enumerate(ranked[:cut]):
        marker = "" if i < WINDOW_SIZE else "  (beyond window)"
        print(f"{i + 1:3d}. {name}  [{tag}]{marker}")


if __name__ == "__main__":
    main()
