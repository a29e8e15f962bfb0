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
        # a pretty-printed multi-line single record must parse (it is
        # still one JSON object), not be rejected as zero JSON lines
        pretty_p = os.path.join(td, "pretty.json")
        with open(pretty_p, "w") as f:
            json.dump(good2, f, indent=2)
        rc, out = run(pretty_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 0:
            failures.append(f"pretty-printed record: expected ACCEPT via "
                            f"whole-file JSON fallback, got rc={rc}\n{out}")
        # an IDENTICAL duplicated full record (a double-paste — the r17
        # verdict nit) must collapse to one with a WARN and still
        # accept, not flip the one-record check into a REJECT
        dup_p = os.path.join(td, "dup.json")
        with open(dup_p, "w") as f:
            line = json.dumps(good2)
            f.write(line + "\n" + line + "\n")
        rc, out = run(dup_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 0 or "duplicated paste collapsed" not in out:
            failures.append(f"duplicated record: expected ACCEPT with a "
                            f"dedupe WARN, got rc={rc}\n{out}")
        # but two DIFFERENT full records in one file stay a REJECT
        two_p = os.path.join(td, "two.json")
        other = dict(good2)
        other["value"] = good2["value"] + 1.0
        with open(two_p, "w") as f:
            f.write(json.dumps(good2) + "\n" + json.dumps(other) + "\n")
        rc, out = run(two_p, os.path.join(td, "r15_default_idle.json"),
                      "--baseline", COMMITTED)
        if rc != 1 or "DISTINCT record" not in out:
            failures.append(f"two distinct records: expected REJECT, "
                            f"got rc={rc}\n{out}")

    # --- rolling cpu_wall band: replay the committed r13-r16 history ---
    # The gate must accept/reject the record history exactly as the
    # human adjudications did: every committed record accepts against
    # the band of its predecessors (including the r14 reps3 ratio DIP
    # 5.2 -> 4.6 from de-duplicated parallel work, and the r16 default
    # 6.23 after 5.00 that was hand-adjudicated as cold-parallelism
    # variance with the scalar recalibration declined), while a starved
    # co-tenant capture (uniform cpu_wall collapse, loadavg clean — the
    # r13 94 s -> 281 s incident's shape) rejects.
    records_dir = os.path.join(HERE, "bench_records")

    def load_committed(name):
        with open(os.path.join(records_dir, name)) as f:
            for ln in f.read().splitlines():
                try:
                    j = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if isinstance(j, dict) and "queries" in j:
                    return j
        raise AssertionError(f"no record with queries in {name}")

    def idle_patched(rec):
        r = dict(rec)
        r["load_avg"], r["load_avg_5"], r["load_avg_15"] = 0.2, 0.2, 0.2
        return r

    committed = sorted(os.listdir(records_dir))
    for mode in ("default_idle", "reps3_idle"):
        rounds = sorted(int(f.split("_")[0][1:]) for f in committed
                        if f.endswith(f"_{mode}.json"))
        for n in (14, 15, 16):
            if n not in rounds:
                continue
            with tempfile.TemporaryDirectory() as td:
                for m in rounds:
                    if m < n:
                        src_f = os.path.join(records_dir, f"r{m}_{mode}.json")
                        with open(src_f) as f:
                            body = f.read()
                        with open(os.path.join(td, f"r{m}_{mode}.json"),
                                  "w") as f:
                            f.write(body)
                cand = idle_patched(load_committed(f"r{n}_{mode}.json"))
                cand_p = os.path.join(td, "cand.json")
                with open(cand_p, "w") as f:
                    json.dump(cand, f)
                rc, out = run(cand_p, os.path.join(td, f"r{n}_{mode}.json"))
                if rc != 0:
                    failures.append(
                        f"history replay r{n} {mode}: expected ACCEPT "
                        f"(the committed record was accepted by "
                        f"adjudication), got rc={rc}\n{out}")

    # the r16 declined-recalibration case, made mechanical: a clean
    # 5.00-cpu_wall capture right after the 6.23 one (non-monotonic
    # swing inside the historical band) must accept with NO scalar
    # recalibration — a freshly-recalibrated-to-6.23 scalar ref would
    # have wrongly rejected it at ratio 0.80
    with tempfile.TemporaryDirectory() as td:
        for m in (13, 14, 15, 16):
            with open(os.path.join(records_dir,
                                   f"r{m}_default_idle.json")) as f:
                body = f.read()
            with open(os.path.join(td, f"r{m}_default_idle.json"),
                      "w") as f:
                f.write(body)
        r16 = load_committed("r16_default_idle.json")
        swing = idle_patched(r16)
        swing["cpu_wall_ratio"] = 4.996  # r15's clean value
        swing_p = os.path.join(td, "swing.json")
        with open(swing_p, "w") as f:
            json.dump(swing, f)
        rc, out = run(swing_p, os.path.join(td, "r17_default_idle.json"))
        if rc != 0:
            failures.append(f"non-monotonic swing inside the band: "
                            f"expected ACCEPT, got rc={rc}\n{out}")
        # and the starved-co-tenant shape must still reject: uniform
        # effective-core collapse (cpu_wall 0.70x the band min) at
        # clean loadavg
        starved = idle_patched(r16)
        starved["cpu_wall_ratio"] = round(0.70 * 4.996, 3)
        starved_p = os.path.join(td, "starved.json")
        with open(starved_p, "w") as f:
            json.dump(starved, f)
        rc, out = run(starved_p, os.path.join(td, "r17_default_idle.json"))
        if rc != 1 or "below the rolling band floor" not in out:
            failures.append(f"starved capture: expected REJECT on the "
                            f"band floor, got rc={rc}\n{out}")
        # the adjudication escape hatch: --min-cpu-wall lowers the floor
        # for a drop that was investigated and is real
        rc, out = run(starved_p, os.path.join(td, "r17_default_idle.json"),
                      "--min-cpu-wall", "3.0")
        if rc != 0 or "overridden" not in out:
            failures.append(f"--min-cpu-wall override: expected ACCEPT, "
                            f"got rc={rc}\n{out}")

    # --- the ratchet alarm (r17 ADVICE): three consecutive borderline
    # captures walk the rolling floor down with each one individually
    # inside the band — the gate must WARN when the band min has
    # declined > 25% from the all-time same-mode max (the implemented
    # threshold: accept_bench_record.py deliberately widened the
    # ADVICE's 15% to 25% to clear honest committed-history scatter),
    # so the creep gets adjudicated instead of silently re-centering
    # the band
    with tempfile.TemporaryDirectory() as td:
        r16 = load_committed("r16_default_idle.json")
        walked = [6.0, 5.1, 4.4]  # each >= 0.85 * previous min, yet -27%
        for m, cw in zip((13, 14, 15), walked):
            rec = idle_patched(r16)
            rec["cpu_wall_ratio"] = cw
            with open(os.path.join(td, f"r{m}_default_idle.json"),
                      "w") as f:
                json.dump(rec, f)
        creep = idle_patched(r16)
        creep["cpu_wall_ratio"] = 3.8  # >= 0.85 * 4.4 = 3.74: inside band
        creep_p = os.path.join(td, "creep.json")
        with open(creep_p, "w") as f:
            json.dump(creep, f)
        rc, out = run(creep_p, os.path.join(td, "r16_default_idle.json"),
                      "--baseline",
                      os.path.join(td, "r15_default_idle.json"))
        if rc != 0:
            failures.append(f"creeping capture inside the band: expected "
                            f"ACCEPT (the WARN is an alarm, not a "
                            f"reject), got rc={rc}\n{out}")
        if "declined" not in out or "all-time same-mode max" not in out:
            failures.append(f"creeping band: decline WARN did not fire\n{out}")
        # control: a stable history must NOT warn
        for m, cw in zip((13, 14, 15), (6.0, 5.8, 6.1)):
            rec = idle_patched(r16)
            rec["cpu_wall_ratio"] = cw
            with open(os.path.join(td, f"r{m}_default_idle.json"),
                      "w") as f:
                json.dump(rec, f)
        stable = idle_patched(r16)
        stable["cpu_wall_ratio"] = 5.9
        stable_p = os.path.join(td, "stable.json")
        with open(stable_p, "w") as f:
            json.dump(stable, f)
        rc, out = run(stable_p, os.path.join(td, "r16_default_idle.json"),
                      "--baseline",
                      os.path.join(td, "r15_default_idle.json"))
        if rc != 0 or "declined" in out:
            failures.append(f"stable band history: expected ACCEPT with "
                            f"no decline WARN, got rc={rc}\n{out}")

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
