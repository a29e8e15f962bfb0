#!/usr/bin/env python3
"""Mechanical acceptance gate for committing a bench record.

Usage: python3 tools/accept_bench_record.py /tmp/bench.json tools/bench_records/r14_reps3_idle.json

A record is copied into bench_records/ ONLY if BOTH conditions hold
(conjunctive — round-13's records passed a ratio-only gate at load
2.5-2.8 and measurably inflated c13/c14; see VERDICT r13 "What's
wrong #2"):
  1. load_avg < 1.0      (pre-run 1-min load: nothing else was running)
  2. ratio_vs_idle >= 0.95  (this run's effective-core throughput matches
                             the committed known-idle calibration — an
                             external co-tenant can halve effective cores
                             while this cgroup's loadavg reads ~0)
plus failed == 0. Anything else: re-run later at true idle.
"""
import json
import shutil
import sys

def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        d = json.load(f)
    load = d.get("load_avg", -1)
    ratio = d.get("ratio_vs_idle", -1)
    failed = d.get("failed", 1)
    errs = []
    if not (0 <= load < 1.0):
        errs.append(f"load_avg {load} not in [0, 1.0)")
    if ratio < 0.95:
        errs.append(f"ratio_vs_idle {ratio} < 0.95")
    if failed != 0:
        errs.append(f"failed={failed}")
    if errs:
        print("REJECT (do not commit; retry at true idle): " + "; ".join(errs))
        return 1
    shutil.copy(src, dst)
    print(f"ACCEPT -> {dst} (load_avg {load}, ratio_vs_idle {ratio}, "
          f"total {d.get('value')}s, reps {d.get('reps')})")
    return 0

if __name__ == "__main__":
    sys.exit(main())
