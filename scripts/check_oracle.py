#!/usr/bin/env python3
"""Local oracle cross-check: replays oracle_sql.json entries in DuckDB
against the sf parquet tables and compares with the Verify parquet dumps
(the driver's CORRECTNESS procedure: sort columns by name, sort rows,
compare values). Usage:
  python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        dump = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(dump, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK DUMP");  n_fail += 1;  continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}");  n_fail += 1;  continue
        spk = pd.concat([pd.read_parquet(f) for f in files])
        ok_schema = sorted(map(str.lower, ora.columns)) == \
            sorted(map(str.lower, spk.columns))
        ora.columns = [c.lower() for c in ora.columns]
        spk.columns = [c.lower() for c in spk.columns]
        cols = sorted(ora.columns)
        try:
            o = ora[cols].sort_values(cols).reset_index(drop=True)
            s = spk[cols].sort_values(cols).reset_index(drop=True)
            o = o.astype(str)
            s = s.astype(str)
            ok_rows = len(o) == len(s)
            ok_vals = ok_rows and o.equals(s)
        except Exception as e:
            print(f"{name}: COMPARE ERROR {e}");  n_fail += 1;  continue
        if ok_schema and ok_vals:
            print(f"{name}: PASS ({len(o)} rows)");  n_pass += 1
        else:
            print(f"{name}: FAIL schema={ok_schema} rows={len(s)} vs "
                  f"oracle {len(o)}")
            if not ok_vals and len(o) == len(s):
                diff = (o != s).any(axis=1)
                print(o[diff].head(3));  print(s[diff].head(3))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
