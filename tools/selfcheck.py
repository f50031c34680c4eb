#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Runs each SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views
named after the parquet tables in <sfDir>, and compares (sorted columns,
sorted rows, exact values) against <verifyOutDir>/<name>/ parquet written
by graft.Verify.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(con, rel_sql, label):
    """Return (columns, rows) with columns sorted by name and rows sorted."""
    cols = [d[0] for d in con.execute(f"SELECT * FROM {rel_sql} LIMIT 0").description]
    ordered = sorted(cols)
    sel = ", ".join(f'"{c}"' for c in ordered)
    by = ", ".join(f'"{c}" NULLS FIRST' for c in ordered)
    rows = con.execute(f"SELECT {sel} FROM {rel_sql} ORDER BY {by}").fetchall()
    return ordered, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            failures += 1
            continue
        try:
            oc, orows = norm(con, f"({sql})", "oracle")
            sc, srows = norm(con, f"read_parquet('{spark_glob}')", "spark")
            # Gate-compat lint: the driver's comparator (pandas
            # sort_values + row hashing) cannot hash array/map/struct
            # cells — a query emitting one reads ERR in the gate even
            # when the values are right (the r11 q89 lesson). Reject
            # nested top-level columns on EITHER side here, so the
            # mismatch dies in validate.sh, not in the round gate.
            nested = []
            for side, rel in (("oracle", f"({sql})"),
                              ("spark", f"read_parquet('{spark_glob}')")):
                for row in con.execute(
                        f"DESCRIBE SELECT * FROM {rel}").fetchall():
                    cname, dtype = row[0], row[1]
                    if "[]" in dtype or dtype.startswith(("MAP", "STRUCT")):
                        nested.append(f"{side}.{cname}: {dtype}")
            if nested:
                print(f"FAIL {name}: gate-incompatible nested columns: "
                      f"{nested}")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if oc != sc:
            print(f"FAIL {name}: columns differ\n  oracle: {oc}\n  spark:  {sc}")
            failures += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(orows, srows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i}\n  oracle: {a}\n  spark:  {b}")
            failures += 1
        else:
            print(f"OK   {name}: {len(orows)} rows, {len(oc)} cols")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
