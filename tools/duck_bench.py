#!/usr/bin/env python3
"""Local comparison denominator: run every oracle SQL in DuckDB against the
sf parquet tables and record wall times. Output (DUCK_BENCH.json) is picked
up by graft.Bench and embedded in its JSON line as `duckdb_total_sec`, so
the bench report carries its own single-node reference point.

Usage: duck_bench.py <sfDir> <oracle_sql.json> [out.json]

Rep policy matches graft.Bench: each query runs DUCK_BENCH_REPS times
(default 5, matching graft.Bench) and the MIN is recorded, so numerator
and denominator both measure steady state rather than one cold run.
Timing is time.perf_counter() — monotonic, like graft.Bench's
System.nanoTime; wall-clock time.time() under min-of-reps would let one
NTP step understate the denominator and silently flatter the round's
headline ratio.  Failure policy also matches graft.Bench: a query that
errors records -1 and lands in an `errors` map, excluded from the
total, and the report is still written — one broken oracle must not
cost the other 134 queries' denominator.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    if len(sys.argv) < 3:
        print("usage: duck_bench.py <sfDir> <oracle_sql.json> [out.json]",
              file=sys.stderr)
        return 2
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "DUCK_BENCH.json"
    try:
        reps = max(1, int(os.environ.get("DUCK_BENCH_REPS", "5")))
    except ValueError:
        reps = 5   # a bench must always emit its report (graft.Bench policy)
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet".replace("'", "''")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    times, total, errors = {}, 0.0, {}
    for name in sorted(oracle):
        best = None
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:
            errors[name] = str(e).split("\n")[0][:200]
            print(f"duck_bench FAIL {name}: {errors[name]}", file=sys.stderr)
            times[name] = -1
            continue
        times[name] = round(best, 4)
        total += best
    result = {"total_sec": round(total, 3), "sf": sf_dir, "reps": reps,
              "engine": f"duckdb-{duckdb.__version__}", "queries": times}
    if errors:
        result["errors"] = errors
    # single line: graft.Bench embeds the total verbatim in its summary
    with open(out_path, "w") as f:
        json.dump(result, f, separators=(",", ":"))
    print(json.dumps({"total_sec": result["total_sec"],
                      "errors": len(errors), "out": out_path}
                     if errors else
                     {"total_sec": result["total_sec"], "out": out_path}))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
