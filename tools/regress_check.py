#!/usr/bin/env python3
"""Round-over-round per-query bench regression check.

Usage: regress_check.py CURRENT_REPORT.json [PREVIOUS_REPORT.json]
       regress_check.py --selftest

CURRENT_REPORT is the full bench report (the sidecar Bench.scala writes:
{"queries": {name: sec, ...}, ...}).  PREVIOUS defaults to the last
committed BENCH_DETAIL.json (via `git show HEAD:BENCH_DETAIL.json`), so
the comparison is always against the tree a judge can see, not a /tmp
file from a dead session.

Phase normalization: same-code batteries span +/-15% host phase
PER QUERY, so raw second-to-second comparison can mass-WARN on a hot
host or mask a real plan regression on a cool one.  Each current time
is divided by the battery's MEDIAN per-query ratio vs the previous
report before the thresholds apply — the median is the phase estimate
(robust up to 50% of queries genuinely regressing), and it is
self-contained: it does not depend on the DuckDB denominator, whose own
phase is drawn independently and whose query set changes whenever a
round adds gates.  The median itself is far steadier than per-query
phase (observed same-code medians: 0.941-1.054), so the normalizer
only trusts it inside [0.90, 1.15]: above the ceiling a uniform
slowdown is a FAIL in its own right (a real whole-battery regression
cannot normalize itself away — the scale is capped at the ceiling, so
per-query deltas survive too), and below the floor a broad real
improvement stops inflating non-movers into spurious FAILs (failing to
improve is not a regression).

Policy (thresholds unchanged from the unnormalized version):
  * FAIL  : any query slower (phase-normalized) by >25% AND >0.4s
            absolute (the same floor the per-round perf audit uses).
            Exit 1.  Pass-to-fail (time == -1) is always FAIL.
  * WARN  : slower by >25% AND >0.15s.  Printed, exit stays 0.
  * new / removed queries are reported informationally (new gates are
    normal round output, not regressions).
A missing previous report (first round with a committed detail file) is
a clean skip, not an error.

--selftest proves the phase invariance: verdicts on a synthetic report
must be IDENTICAL under global scaling anywhere inside the phase
window, a x1.2 uniform slowdown must FAIL, and a x0.70 broad
improvement must not flag a flat non-mover.
"""
import json
import subprocess
import sys

FAIL_PCT, FAIL_ABS = 0.25, 0.40
WARN_PCT, WARN_ABS = 0.25, 0.15
# The battery MEDIAN is far steadier than per-query phase (+/-15%
# per query, but observed same-code medians span only 0.941-1.054
# across the r17 real runs), so the phase window for the normalizer is
# tight.  Above it, a uniform slowdown is a regression, not phase —
# without this, a whole-battery real regression just inside the
# normalizer's range would normalize itself away and exit 0.  BELOW
# the window, the battery genuinely got faster (a broad win, not
# phase); clamping the scale at the window's floor keeps a query that
# merely FAILED TO IMPROVE from being inflated into a spurious FAIL
# (staying flat while everything else speeds up is not a regression).
SCALE_LO, GLOBAL_FAIL_MED = 0.90, 1.15


def load_queries(path):
    with open(path) as f:
        return json.load(f)["queries"]


def check(cur, prev):
    """Return (fails, warns, improved, median_raw_ratio, n_common, new, gone).

    fails/warns are lists of (query, prev_sec, cur_raw_sec, norm_pct)
    tuples; pass-to-fail rows carry cur_raw_sec == -1.
    """
    common = sorted(set(cur) & set(prev))
    ratios = sorted(cur[q] / prev[q] for q in common
                    if cur[q] > 0 and prev[q] > 0)
    med = ratios[len(ratios) // 2] if ratios else 1.0
    # Normalizer scale: the median, clamped to [SCALE_LO, GLOBAL_FAIL_MED]
    # — below the floor is a broad real improvement (don't punish
    # non-movers), above the ceiling the __global__ FAIL below fires
    # anyway (and per-query deltas are judged against the ceiling, so a
    # uniform 28% slowdown cannot normalize itself to zero).
    scale = min(max(med, SCALE_LO), GLOBAL_FAIL_MED)
    fails, warns, improved = [], [], 0
    for q in common:
        c, pv = cur[q], prev[q]
        if c < 0 <= pv:
            fails.append((q, pv, -1.0, 0.0))   # pass-to-fail: worst case
            continue
        if c < 0 or pv <= 0:
            continue
        cn = c / scale
        delta, pct = cn - pv, (cn - pv) / pv
        if pct > FAIL_PCT and delta > FAIL_ABS:
            fails.append((q, pv, c, pct))
        elif pct > WARN_PCT and delta > WARN_ABS:
            warns.append((q, pv, c, pct))
        if c < pv and (pv - c) / pv > WARN_PCT and pv - c > WARN_ABS:
            improved += 1          # counted RAW — matches the printed label
    if med > GLOBAL_FAIL_MED:
        fails.append(("__global__", 1.0, med, med - 1.0))
    new = sorted(set(cur) - set(prev))
    gone = sorted(set(prev) - set(cur))
    return fails, warns, improved, med, len(common), new, gone


def selftest():
    """Verdicts must be invariant under a global phase scale of the
    current report (anywhere inside the [SCALE_LO, GLOBAL_FAIL_MED]
    phase window), clean on unchanged data, and the two holes the
    plain-median version had must stay closed: a uniform real
    regression cannot normalize itself away, and a broad real
    improvement cannot inflate a non-mover into a FAIL."""
    prev = {f"q{i:02d}": 0.2 + 0.01 * i for i in range(50)}
    # one real regression (clears both pct and abs floors at any phase)
    cur_base = dict(prev)
    cur_base["q40"] = prev["q40"] * 2.5            # 0.60 -> 1.50 s
    cur_base["q41"] = prev["q41"] + 0.20           # warn-band: +33%, +0.20s
    verdicts = []
    for k in (0.92, 1.00, 1.08):
        cur = {q: t * k for q, t in cur_base.items()}
        fails, warns, _, med, n, _, _ = check(cur, prev)
        verdicts.append((sorted(f[0] for f in fails),
                         sorted(w[0] for w in warns)))
        assert n == 50, n
    assert verdicts[0] == verdicts[1] == verdicts[2], \
        f"verdicts not phase-invariant: {verdicts}"
    assert verdicts[0][0] == ["q40"], verdicts[0]
    assert verdicts[0][1] == ["q41"], verdicts[0]
    # unchanged data at any phase in the window: no fails, no warns
    for k in (0.92, 1.00, 1.08):
        fails, warns, _, _, _, _, _ = check(
            {q: t * k for q, t in prev.items()}, prev)
        assert not fails and not warns, (k, fails, warns)
    # pass-to-fail is FAIL regardless of phase
    cur = {q: t * 0.92 for q, t in prev.items()}
    cur["q07"] = -1.0
    fails, _, _, _, _, _, _ = check(cur, prev)
    assert [f[0] for f in fails] == ["q07"], fails
    # a uniform real slowdown CANNOT normalize itself away: anything
    # past the window's ceiling is a __global__ FAIL (x1.2 sits in the
    # dead zone a 1.30 ceiling used to leave open)
    for k in (1.2, 1.5):
        fails, _, _, _, _, _, _ = check(
            {q: t * k for q, t in prev.items()}, prev)
        assert ("__global__" in [f[0] for f in fails]), (k, fails)
    # a broad real improvement (x0.70) with one flat non-mover: the
    # scale clamps at SCALE_LO, so merely failing to improve is NOT a
    # FAIL (raw 1.50 -> 1.50 must not read as +43% against med 0.70)
    cur = {q: t * 0.70 for q, t in prev.items()}
    prev2 = dict(prev); prev2["qXX"] = 1.50; cur["qXX"] = 1.50
    fails, warns, improved, _, _, _, _ = check(cur, prev2)
    assert not fails and not warns, (fails, warns)
    # ... and 'improved' counts RAW movement (the label says raw): a 30%
    # win clears the 0.15s absolute floor only where 0.30*prev > 0.15s
    want = sum(1 for t in prev.values() if t - 0.70 * t > WARN_ABS)
    assert improved == want, (improved, want)
    print("regress-check selftest: OK (phase-invariant verdicts, "
          "global-slowdown guard closes the dead zone, broad-improvement "
          "clamp, raw improved counter, pass-to-fail)")
    return 0


def main():
    if len(sys.argv) < 2:
        # exit 2: distinguishable from a real regression FAIL (exit 1)
        print("usage: regress_check.py CURRENT_REPORT.json "
              "[PREVIOUS_REPORT.json] | --selftest")
        return 2
    if sys.argv[1] == "--selftest":
        return selftest()
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

    fails, warns, improved, med, n_common, new, gone = check(cur, prev)
    print(f"regress-check vs {prev_src}: {n_common} common queries, "
          f"median ratio {med:.3f} (phase-normalized thresholds), "
          f"{len(fails)} fail, {len(warns)} warn, "
          f"{improved} improved >25% raw"
          + (f", new: {','.join(new)}" if new else "")
          + (f", removed: {','.join(gone)}" if gone else ""))
    for q, pv, c, pct in fails:
        if q == "__global__":
            print(f"  FAIL global: median ratio {c:.3f} exceeds "
                  f"{GLOBAL_FAIL_MED} — whole-battery slowdown, not phase")
        elif c < 0:
            print(f"  FAIL {q}: {pv:.3f}s -> NOW FAILING (-1)")
        else:
            print(f"  FAIL {q}: {pv:.3f} -> {c:.3f}s raw "
                  f"(+{pct:.0%} phase-normalized)")
    for q, pv, c, pct in warns:
        print(f"  warn {q}: {pv:.3f} -> {c:.3f}s raw "
              f"(+{pct:.0%} phase-normalized)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
