#!/usr/bin/env python3
"""Mechanical acceptance gate for committing a bench record.

Usage:
  python3 tools/accept_bench_record.py /tmp/bench.json \
      tools/bench_records/r15_reps3_idle.json [--baseline PATH] \
      [--max-median-drift X] [--dry-run]

A record is copied into bench_records/ ONLY if ALL conditions hold
(conjunctive — each one exists because its absence passed a bad capture):

  1. load_avg < 1.0        Pre-run 1-min load: nothing else was running
                           at capture start. (r13's records passed a
                           ratio-only gate at load 2.5-2.8 and inflated
                           c13/c14 ~44%.)
  2. load_avg_15 <= 0.8    Pre-run 15-MIN load: the machine has been
                           idle for a while, not merely idle this
                           instant. (The r14 incident: 1-min 0.69 /
                           5-min 0.75 but 15-min 1.75 — the decaying
                           tail of a just-finished test-suite run —
                           inflated shared queries +19% while passing
                           check 1.) Records produced by a pre-r15
                           Bench lack the field and are rejected:
                           re-run with the current Bench.
  3. cpu_wall_ratio >= 0.85 * min(cpu_wall_ratio of the last <= 3
                           committed same-mode records) — the ROLLING
                           BAND that replaced the single bench_idle_ref
                           scalar in r17. Purpose unchanged: an external
                           co-tenant can halve effective cores while
                           this cgroup's loadavg reads ~0 (observed r13:
                           94 s -> 281 s same code at load 0.34 —
                           cpu_wall 0.70x, caught). Why a band: the
                           clean single-rep cpu_wall swings
                           NON-monotonically across rounds (r13-r16
                           default: 6.10, 5.38, 5.00, 6.23 — cold
                           parallelism variance), so any single scalar
                           either rejects honest captures or needs
                           hand recalibration every round (the r16
                           declined-recalibration adjudication, now
                           mechanical). 0.85 separates the evidence:
                           the worst HONEST cross-round transition is
                           r15's 4.996 after a 5.378 band min (0.93x),
                           the r13 starved incident read 0.70x — the
                           floor sits between them with ~8% margin on
                           each side. And a legitimate optimization
                           can LOWER the ratio (r14: memoizing shared
                           work dropped reps3 5.2 -> 4.6 — accepted by
                           hand then, accepted by the band now).
                           Fallback when no same-mode history carries
                           cpu_wall_ratio: ratio_vs_idle >= 0.95
                           against Bench's in-record scalar
                           calibration. Overridable with
                           --min-cpu-wall X for an adjudicated real
                           drop below the band (record why in
                           SCALE.md).
  4. failed == 0
  5. median shared-query drift <= 1.15 vs the prior committed record of
                           the SAME MODE (reps) — the baseline is the
                           existing dst if present (within-round
                           recapture), else the highest-numbered earlier
                           r{N}_*.json with the same mode suffix.
                           Diffuse inflation (the r14 bad capture:
                           ~+19% across untouched queries) moves the
                           MEDIAN per-query ratio; a genuine regression
                           concentrated in a few queries does not
                           (r14's real write-family drift kept the
                           median at 1.08 while five queries moved
                           +25-70%). Honest cross-round medians observed
                           so far: 1.08 (default), 1.13 (reps3, against
                           a hot-captured r13 baseline) — 1.15 clears
                           both with the bad capture at ~1.19+.
                           Overridable per-invocation with
                           --max-median-drift (echoed in output) when a
                           drift has been adjudicated as real. Fewer
                           than 20 shared queries vs the baseline is a
                           REJECT (a renamed/shrunk catalog would
                           otherwise bypass this condition entirely)
                           unless --allow-small-overlap is passed
                           explicitly.

Anything else: REJECT — re-run later at true idle rather than
hand-committing. `tools/test_accept_gate.py` replays the known-bad r14
capture (rejected) and the committed r14 record (accepted) against this
gate; run it after any change here.
"""
import json
import os
import re
import shutil
import statistics
import sys


def parse_records(text: str, ctx: str) -> list[dict]:
    """Every DISTINCT full record (JSON object carrying a 'queries' map)
    in `text` — line-delimited two-line grep captures (r11's shape) and
    plain single-object files both parse. IDENTICAL duplicate records
    (a double-paste) collapse to one with a WARN, so a duplicated line
    can neither skew a band computation nor flip the one-record check
    into a spurious REJECT (the r17 verdict nit)."""
    cands = []
    for ln in text.splitlines():
        try:
            j = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(j, dict):
            cands.append(j)
    if not cands:
        try:
            j = json.loads(text)
            if isinstance(j, dict):
                cands.append(j)
        except json.JSONDecodeError:
            pass
    full = [j for j in cands if "queries" in j]
    uniq = []
    for j in full:
        if j not in uniq:
            uniq.append(j)
    if len(uniq) < len(full):
        print(f"WARN: {ctx} holds {len(full)} full records of which only "
              f"{len(uniq)} are distinct — duplicated paste collapsed; "
              "clean the file up")
    return uniq


def load_record(path: str) -> dict | None:
    """The full bench record from a committed record file, or None if
    the file holds zero or several DISTINCT full records."""
    with open(path) as f:
        text = f.read()
    uniq = parse_records(text, path)
    return uniq[0] if len(uniq) == 1 else None


def find_band(dst: str) -> list[tuple[str, float]]:
    """(path, cpu_wall_ratio) of the last <= 3 committed same-mode
    records: every r{M}_<mode>.json with M < N (plus dst itself if it
    already exists — a within-round recapture bands against the round's
    own accepted record too), highest rounds first."""
    d, base = os.path.dirname(dst), os.path.basename(dst)
    m = re.match(r"r(\d+)_(.+)\.json$", base)
    if not m or not os.path.isdir(d):
        return []
    n, mode = int(m.group(1)), m.group(2)
    hist = []
    for f in os.listdir(d):
        m2 = re.match(r"r(\d+)_(.+)\.json$", f)
        if not m2 or m2.group(2) != mode:
            continue
        m_round = int(m2.group(1))
        if m_round < n or (m_round == n and os.path.join(d, f) == dst):
            rec = load_record(os.path.join(d, f))
            if rec is not None and rec.get("cpu_wall_ratio", -1) > 0:
                hist.append((m_round, f, rec["cpu_wall_ratio"]))
    hist.sort(reverse=True)
    band = [(f, cw) for _, f, cw in hist[:3]]
    # The rolling floor ratchets monotonically downward: three borderline
    # captures at 0.86x each walk it ~35% down with no alarm — a
    # slow-creeping co-tenant would pass where the old scalar caught it
    # (r17 ADVICE). Not a REJECT (an honest sustained shift is possible —
    # the r14 memoization legitimately lowered reps3 5.2 -> 4.6), but a
    # sustained decline must be ADJUDICATED, not silently re-centered.
    # Threshold 25%, not the ADVICE's ~15%: the committed HONEST default-
    # mode scatter already spans 4.996-6.231 (20% — the adjudicated
    # r13-r16 cold-parallelism variance), so a 15% alarm would fire on
    # every round and train itself into noise. 0.75x sits beyond every
    # honest committed record while the creep the ADVICE describes
    # (three 0.86x steps = 0.64x) still fires loudly.
    if hist:
        all_max = max(cw for _, _, cw in hist)
        band_min = min(cw for _, cw in band)
        if band_min < 0.75 * all_max:
            print(f"WARN: band min {band_min} has declined "
                  f"{(1 - band_min / all_max) * 100:.0f}% from the "
                  f"all-time same-mode max {all_max} — adjudicate the "
                  "drift (two-probe per CLAUDE.md) instead of letting "
                  "the band re-center")
    return band


def find_baseline(dst: str) -> str | None:
    """Prior committed record of the same mode: dst itself if it already
    exists (within-round recapture), else the highest-numbered earlier
    r{N} record with the same mode suffix."""
    if os.path.exists(dst):
        return dst
    d, base = os.path.dirname(dst), os.path.basename(dst)
    m = re.match(r"r(\d+)_(.+)\.json$", base)
    if not m or not os.path.isdir(d):
        return None
    n, mode = int(m.group(1)), m.group(2)
    best = None
    for f in os.listdir(d):
        m2 = re.match(r"r(\d+)_(.+)\.json$", f)
        if m2 and m2.group(2) == mode and int(m2.group(1)) < n:
            if best is None or int(m2.group(1)) > best[0]:
                best = (int(m2.group(1)), os.path.join(d, f))
    return best[1] if best else None


def main() -> int:
    args = sys.argv[1:]
    baseline_path = None
    max_median = 1.15
    min_cpu_wall = None
    dry_run = False
    allow_small_overlap = False
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--baseline":
            baseline_path = args[i + 1]; i += 2
        elif args[i] == "--max-median-drift":
            max_median = float(args[i + 1]); i += 2
        elif args[i] == "--min-cpu-wall":
            min_cpu_wall = float(args[i + 1]); i += 2
        elif args[i] == "--dry-run":
            dry_run = True; i += 1
        elif args[i] == "--allow-small-overlap":
            allow_small_overlap = True; i += 1
        else:
            pos.append(args[i]); i += 1
    if len(pos) != 2:
        print(__doc__)
        return 2
    src, dst = pos
    # Bench prints TWO "metric" lines (the full record and a short
    # trailing summary without per-query maps); a capture made with
    # `grep '"metric"'` carries both and strict json.load rejects the
    # concatenation. Accept line-delimited JSON and pick the record
    # that actually has the per-query map — never the summary. Identical
    # duplicate full records (a double-paste) collapse with a WARN.
    with open(src) as f:
        text = f.read()
    full = parse_records(text, src)
    if len(full) != 1:
        print(f"REJECT: {src} holds {len(full)} DISTINCT record(s) with "
              "a 'queries' map — need exactly 1. (Line-delimited and "
              "pretty-printed multi-line JSON are both accepted; a grep "
              "capture must include the line that carries the per-query "
              "map.)")
        return 1
    d = full[0]
    load = d.get("load_avg", -1)
    load15 = d.get("load_avg_15", None)
    ratio = d.get("ratio_vs_idle", -1)
    cpu_wall = d.get("cpu_wall_ratio", -1)
    failed = d.get("failed", 1)
    errs = []
    if not (0 <= load < 1.0):
        errs.append(f"load_avg {load} not in [0, 1.0)")
    if load15 is None:
        errs.append("record lacks load_avg_15 (produced by a pre-r15 "
                    "Bench) — re-run with the current Bench")
    elif not (0 <= load15 <= 0.8):
        errs.append(f"load_avg_15 {load15} not in [0, 0.8] — machine not "
                    "at sustained idle (the r14 +19% incident)")
    # condition 3: effective-core throughput vs the rolling same-mode band
    band = find_band(dst)
    if min_cpu_wall is not None:
        print(f"NOTE: cpu_wall floor overridden to {min_cpu_wall} "
              "(adjudicated drop — record the reason in SCALE.md)")
        if cpu_wall < min_cpu_wall:
            errs.append(f"cpu_wall_ratio {cpu_wall} < overridden floor "
                        f"{min_cpu_wall}")
    elif band:
        floor = 0.85 * min(cw for _, cw in band)
        print("cpu_wall band (last {} same-mode): {} -> floor {:.3f}, "
              "candidate {}".format(
                  len(band),
                  ", ".join(f"{f} {cw}" for f, cw in band), floor,
                  cpu_wall))
        if cpu_wall < floor:
            errs.append(
                f"cpu_wall_ratio {cpu_wall} below the rolling band floor "
                f"{floor:.3f} (0.85 * min of last {len(band)} committed "
                "same-mode records; the r13 starved incident read 0.70x, "
                "the worst honest transition 0.93x) — effective cores "
                "are likely being stolen "
                "by an external co-tenant this cgroup's loadavg cannot "
                "see; retry later, or pass --min-cpu-wall for an "
                "adjudicated real drop")
    elif ratio < 0.95:
        errs.append(f"ratio_vs_idle {ratio} < 0.95 (no committed "
                    "same-mode history with cpu_wall_ratio — scalar "
                    "calibration fallback)")
    if failed != 0:
        errs.append(f"failed={failed}")

    # shared-query diffuse-drift check vs the prior committed record
    if baseline_path is None:
        baseline_path = find_baseline(dst)
    if max_median != 1.15:
        print(f"NOTE: median-drift threshold overridden to {max_median} "
              "(adjudicated drift — record the reason in SCALE.md)")
    if baseline_path is None:
        print("WARN: no prior committed record of this mode found — "
              "shared-query drift check skipped (first record)")
    else:
        prior_rec = load_record(baseline_path)
        if prior_rec is None:
            print(f"REJECT: baseline {baseline_path} holds no parseable "
                  "record with a 'queries' map")
            return 1
        prior = prior_rec.get("queries", {})
        cand = d.get("queries", {})
        shared = [k for k in cand
                  if k in prior and prior[k] > 0 and cand[k] > 0]
        if len(shared) < 20:
            # A capture against a heavily renamed/shrunk catalog would
            # otherwise bypass gate condition 5 entirely; require an
            # explicit, visible opt-out instead of a silent downgrade.
            if allow_small_overlap:
                print(f"WARN: only {len(shared)} shared queries vs "
                      f"{baseline_path} — drift check skipped "
                      "(--allow-small-overlap)")
            else:
                errs.append(
                    f"only {len(shared)} shared queries vs {baseline_path} "
                    "(< 20): drift check impossible — pass "
                    "--allow-small-overlap if the catalog legitimately "
                    "changed this much")
        else:
            ratios = sorted(cand[k] / prior[k] for k in shared)
            med = statistics.median(ratios)
            tot = sum(cand[k] for k in shared) / sum(prior[k] for k in shared)
            print(f"shared-query diff vs {baseline_path}: n={len(shared)} "
                  f"median={med:.3f} total={tot:.3f}")
            if med > max_median:
                worst = sorted(shared, key=lambda k: cand[k] / prior[k],
                               reverse=True)[:8]
                detail = ", ".join(
                    f"{k} {prior[k]:.2f}->{cand[k]:.2f}" for k in worst)
                errs.append(
                    f"diffuse shared-query inflation: median ratio "
                    f"{med:.3f} > {max_median} (worst: {detail})")

    if errs:
        print("REJECT (do not commit; retry at true idle): "
              + "; ".join(errs))
        return 1
    if dry_run:
        print(f"ACCEPT (dry-run, not copied) (load_avg {load}, "
              f"load_avg_15 {load15}, ratio_vs_idle {ratio}, "
              f"total {d.get('value')}s, reps {d.get('reps')})")
        return 0
    shutil.copy(src, dst)
    print(f"ACCEPT -> {dst} (load_avg {load}, load_avg_15 {load15}, "
          f"ratio_vs_idle {ratio}, total {d.get('value')}s, "
          f"reps {d.get('reps')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
