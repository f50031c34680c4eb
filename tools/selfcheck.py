#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Runs each SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views
named after the parquet tables in <sfDir>, and compares (sorted columns,
sorted rows, exact values) against <verifyOutDir>/<name>/ parquet written
by graft.Verify.

Per-query FAIL diagnostics go to STDERR (validate.sh pipes stdout
through `tail -2`, which would otherwise swallow WHICH query broke and
why); OK lines and the summary stay on stdout.  An empty oracle set is
itself a failure — "ALL OK (0 queries)" is the vacuous green this tool
exists to prevent, not a pass.
"""
import json
import math
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def side_cols(con, rel_sql, side):
    """One DESCRIBE per side: sorted column names + the gate-compat lint.

    The driver's comparator (pandas sort_values + row hashing) cannot
    hash array/map/struct cells — a query emitting one reads ERR in the
    gate even when the values are right (the r11 q89 lesson).  Nested
    top-level columns on either side must die here, in validate.sh, not
    in the round gate — and BEFORE paying the full sort+fetch of both
    sides.
    """
    desc = con.execute(f"DESCRIBE SELECT * FROM {rel_sql}").fetchall()
    nested = [f"{side}.{r[0]}: {r[1]}" for r in desc
              if "[]" in r[1] or r[1].startswith(("MAP", "STRUCT"))]
    return sorted(r[0] for r in desc), nested


def fetch_sorted(con, rel_sql, ordered):
    sel = ", ".join(f'"{c}"' for c in ordered)
    by = ", ".join(f'"{c}" NULLS FIRST' for c in ordered)
    return con.execute(
        f"SELECT {sel} FROM {rel_sql} ORDER BY {by}").fetchall()


def cells_equal(a, b):
    """Exact equality, except NaN == NaN (tuple != would flag two
    identical NaN-bearing rows forever — a correct query could never
    pass)."""
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return True
    return a == b


def rows_equal(a, b):
    return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    if not oracles:
        print("FAIL: oracle_sql.json names zero queries — a vacuous "
              "'ALL OK (0 queries)' is refused", file=sys.stderr)
        print("\n1 FAILURES (0 queries)")
        sys.exit(1)

    failures = 0

    def fail(msg):
        nonlocal failures
        failures += 1
        print(f"FAIL {msg}", file=sys.stderr)

    for name in sorted(oracles):
        sql = oracles[name]
        oracle_rel = f"({sql})"
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            fail(f"{name}: no spark output at {spark_glob}")
            continue
        spark_rel = f"read_parquet('{spark_glob}')"
        try:
            oc, onested = side_cols(con, oracle_rel, "oracle")
        except Exception as e:
            fail(f"{name}: oracle error: {e}")
            continue
        try:
            sc, snested = side_cols(con, spark_rel, "spark")
        except Exception as e:
            fail(f"{name}: spark-output error: {e}")
            continue
        if onested or snested:
            fail(f"{name}: gate-incompatible nested columns: "
                 f"{onested + snested}")
            continue
        if oc != sc:
            fail(f"{name}: columns differ\n  oracle: {oc}\n  spark:  {sc}")
            continue
        try:
            orows = fetch_sorted(con, oracle_rel, oc)
        except Exception as e:
            fail(f"{name}: oracle error: {e}")
            continue
        try:
            srows = fetch_sorted(con, spark_rel, sc)
        except Exception as e:
            fail(f"{name}: spark-output error: {e}")
            continue
        if len(orows) != len(srows):
            fail(f"{name}: row count oracle={len(orows)} spark={len(srows)}")
            continue
        bad = next(((i, a, b) for i, (a, b) in enumerate(zip(orows, srows))
                    if not rows_equal(a, b)), None)
        if bad:
            i, a, b = bad
            fail(f"{name}: first diff at sorted row {i}\n"
                 f"  oracle: {a}\n  spark:  {b}")
        else:
            print(f"OK   {name}: {len(orows)} rows, {len(oc)} cols")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
