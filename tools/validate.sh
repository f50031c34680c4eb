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
SPARK_GRAFT_SF_DIR="$SF_BENCH" sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | sed 's/.*\({"metric".*\)/\1/' > /tmp/graft_bench.json
python3 - <<'EOF'
import json
b = json.load(open("/tmp/graft_bench.json"))
d = json.load(open("DUCK_BENCH.json"))
ratio = b["value"] / d["total_sec"]
print(f'spark {b["value"]} s  duck {d["total_sec"]} s  ratio {ratio:.3f}  '
      f'errors {b["errors"]}')
assert not b["errors"], "bench reported per-query errors"
EOF
echo "== ALL STAGES GREEN"
