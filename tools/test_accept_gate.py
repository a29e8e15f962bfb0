#!/usr/bin/env python3
"""Self-test for accept_bench_record.py — replays the round-14 incident.

The known-bad r14 capture (not committed; reconstructed here from its
documented profile: 1-min load 0.69 / 15-min 1.75, shared queries
uniformly ~+19% vs the prior record) must REJECT on BOTH new checks
(15-min load and diffuse median drift), and the actually-committed r14
record (load_avg_15 backfilled to idle, identical queries) must ACCEPT.

Run after any change to accept_bench_record.py:
  python3 tools/test_accept_gate.py
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "accept_bench_record.py")
COMMITTED = os.path.join(HERE, "bench_records", "r14_default_idle.json")


def run(src, dst, *extra):
    p = subprocess.run(
        [sys.executable, GATE, src, dst, "--dry-run", *extra],
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def main() -> int:
    with open(COMMITTED) as f:
        good = json.load(f)

    # the known-bad capture: same catalog, every query ~+19%, 1-min load
    # fine, 15-min tail hot — exactly the shape that passed the old gate
    bad = dict(good)
    bad["queries"] = {k: round(v * 1.19, 3) for k, v in good["queries"].items()}
    bad["value"] = round(sum(bad["queries"].values()), 3)
    bad["load_avg"], bad["load_avg_5"], bad["load_avg_15"] = 0.69, 0.75, 1.75
    bad["ratio_vs_idle"] = 1.0

    # the committed record, as the current Bench would have emitted it
    # (load_avg_15 present and idle)
    good2 = dict(good)
    good2["load_avg_5"], good2["load_avg_15"] = 0.1, 0.2

    failures = []
    with tempfile.TemporaryDirectory() as td:
        bad_p = os.path.join(td, "bad.json")
        good_p = os.path.join(td, "good.json")
        with open(bad_p, "w") as f:
            json.dump(bad, f)
        with open(good_p, "w") as f:
            json.dump(good2, f)
        # both diff against the committed r14 record explicitly, so the
        # test is insulated from whatever records later rounds add
        rc, out = run(bad_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 1:
            failures.append(f"bad capture: expected REJECT rc=1, got {rc}\n{out}")
        if "load_avg_15 1.75" not in out:
            failures.append(f"bad capture: 15-min check did not fire\n{out}")
        if "diffuse shared-query inflation" not in out:
            failures.append(f"bad capture: median-drift check did not fire\n{out}")
        rc, out = run(good_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 0:
            failures.append(f"committed record: expected ACCEPT rc=0, got {rc}\n{out}")
        # a capture whose catalog shares <20 queries with the baseline
        # must REJECT (drift check impossible) unless the opt-out flag
        # is passed — a renamed catalog must not silently bypass check 5
        shrunk = dict(good2)
        shrunk["queries"] = dict(list(good2["queries"].items())[:10])
        shrunk["value"] = round(sum(shrunk["queries"].values()), 3)
        shrunk_p = os.path.join(td, "shrunk.json")
        with open(shrunk_p, "w") as f:
            json.dump(shrunk, f)
        rc, out = run(shrunk_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 1 or "drift check impossible" not in out:
            failures.append(f"shrunk catalog: expected REJECT on small "
                            f"overlap, got rc={rc}\n{out}")
        rc, out = run(shrunk_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED, "--allow-small-overlap")
        if rc != 0:
            failures.append(f"shrunk catalog with --allow-small-overlap: "
                            f"expected ACCEPT, got rc={rc}\n{out}")
        # a legacy record (no load_avg_15) must be rejected, not accepted
        legacy_p = os.path.join(td, "legacy.json")
        with open(legacy_p, "w") as f:
            json.dump(good, f)
        rc, out = run(legacy_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 1 or "lacks load_avg_15" not in out:
            failures.append(f"legacy record: expected REJECT on missing "
                            f"load_avg_15, got rc={rc}\n{out}")

    if failures:
        print("FAIL")
        for f in failures:
            print(" -", f)
        return 1
    print("PASS: bad r14 capture rejected (both checks fired), committed "
          "record accepted, legacy record rejected")
    return 0


if __name__ == "__main__":
    sys.exit(main())
