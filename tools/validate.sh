#!/usr/bin/env bash
# Full round-validation battery, one command:
#   tools/validate.sh [sfSmall] [sfBench]
# Runs: sbt test -> Verify+selfcheck at sfSmall AND sfBench ->
# DuckDB denominator regen (median-of-3 totals; see STATUS.md §bench
# for why a single draw is not representative) -> full Bench, and
# prints the final ratio. Any stage failing aborts with nonzero rc.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_SMALL="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
OUT_SMALL=$(mktemp -d /tmp/graft_verify_small.XXXX)
OUT_BENCH=$(mktemp -d /tmp/graft_verify_bench.XXXX)

echo "== regress-check selftest (phase-invariance proof)"
python3 tools/regress_check.py --selftest

echo "== sbt test"
sbt -batch test 2>&1 | tail -3

echo "== Verify + selfcheck @ $SF_SMALL"
sbt -batch "runMain graft.Verify $SF_SMALL $OUT_SMALL" 2>&1 | tail -1
python3 tools/selfcheck.py "$SF_SMALL" "$OUT_SMALL" | tail -2

echo "== Verify + selfcheck @ $SF_BENCH"
sbt -batch "runMain graft.Verify $SF_BENCH $OUT_BENCH" 2>&1 | tail -1
python3 tools/selfcheck.py "$SF_BENCH" "$OUT_BENCH" | tail -2

echo "== DuckDB denominator (median of 3)"
for i in 1 2 3; do
  python3 tools/duck_bench.py "$SF_BENCH" "$OUT_BENCH/oracle_sql.json" \
    "/tmp/graft_duck_$i.json" | tail -1
done
python3 - <<'EOF'
import json, shutil
runs = sorted(range(1, 4),
              key=lambda i: json.load(open(f"/tmp/graft_duck_{i}.json"))["total_sec"])
median = runs[1]
shutil.copy(f"/tmp/graft_duck_{median}.json", "DUCK_BENCH.json")
print("median run:", json.load(open("DUCK_BENCH.json"))["total_sec"], "s")
EOF

echo "== Bench"
# stdout line is the SHORT summary (fits the driver's 2000-char tail);
# the FULL per-query report lands in the sidecar, which this script
# checks against the last committed detail and then copies into the
# repo as BENCH_DETAIL.json (committed at close) so every round's
# per-query timings are auditable from the tree, not from /tmp.
# r22: Bench prints TWO json lines (full per-query report first, short
# summary LAST — the PERF-contract fix); the summary is the one whose
# size the tail-window assert below guards.
SPARK_GRAFT_SF_DIR="$SF_BENCH" sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | tail -1 | sed 's/.*\({"metric".*\)/\1/' > /tmp/graft_bench.json
python3 - <<'EOF'
import json
b = json.load(open("/tmp/graft_bench_report.json"))
s = json.load(open("/tmp/graft_bench.json"))
d = json.load(open("DUCK_BENCH.json"))
ratio = b["value"] / d["total_sec"]
print(f'spark {b["value"]} s  duck {d["total_sec"]} s  ratio {ratio:.3f}  '
      f'errors {b["errors"]}')
assert not b["errors"], "bench reported per-query errors"
assert abs(s["value"] - b["value"]) < 1e-6, "summary/sidecar total mismatch"
assert len(json.dumps(s)) < 1500, "stdout summary line must fit the tail window"
EOF

echo "== Per-query regression check vs last committed BENCH_DETAIL.json"
python3 tools/regress_check.py /tmp/graft_bench_report.json

cp /tmp/graft_bench_report.json BENCH_DETAIL.json
echo "BENCH_DETAIL.json updated - commit it with the round close"
echo "== ALL STAGES GREEN"
