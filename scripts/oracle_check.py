#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against
the parquet fixtures in <sfDir>, reads the engine result from
<verifyOutDir>/<name>/ parquet, sorts columns by name, and compares values
exactly. Exit 0 iff every checked query matches.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "as_py"):
        v = v.as_py()
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            edf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}")
            failures += 1
            continue

        ocols, ecols = sorted(odf.column_names), sorted(edf.column_names)
        if ocols != ecols:
            print(f"FAIL {name}: columns differ oracle={ocols} engine={ecols}")
            failures += 1
            continue
        if odf.num_rows != edf.num_rows:
            print(f"FAIL {name}: rows differ oracle={odf.num_rows} engine={edf.num_rows}")
            failures += 1
            continue
        bad = None
        for c in ocols:
            ov = [norm(x) for x in odf.column(c).to_pylist()]
            ev = [norm(x) for x in edf.column(c).to_pylist()]
            for i, (a, b) in enumerate(zip(ov, ev)):
                if a != b and not (a is None and b is None):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} engine={b!r}")
            failures += 1
        else:
            print(f"OK   {name} ({odf.num_rows} rows)")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
