#!/usr/bin/env python3
"""Local comparison denominator: run every oracle SQL in DuckDB against the
sf parquet tables and record wall times. Output (DUCK_BENCH.json) is picked
up by graft.Bench and embedded in its JSON line as `duckdb_baseline`, so
the bench report carries its own single-node reference point.

Usage: duck_bench.py <sfDir> <oracle_sql.json> [out.json]

Rep policy matches graft.Bench: each query runs DUCK_BENCH_REPS times
(default 5, matching graft.Bench) and the MIN is recorded, so numerator and denominator both
measure steady state rather than one cold run.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "DUCK_BENCH.json"
    reps = max(1, int(os.environ.get("DUCK_BENCH_REPS", "5")))
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times, total = {}, 0.0
    for name in sorted(oracle):
        best = None
        for _ in range(reps):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        total += best
    result = {"total_sec": round(total, 3), "sf": sf_dir, "reps": reps,
              "engine": f"duckdb-{duckdb.__version__}", "queries": times}
    # single line: graft.Bench embeds this verbatim in its one-line report
    with open(out_path, "w") as f:
        json.dump(result, f, separators=(",", ":"))
    print(json.dumps({"total_sec": result["total_sec"], "out": out_path}))


if __name__ == "__main__":
    main()
