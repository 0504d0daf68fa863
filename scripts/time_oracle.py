#!/usr/bin/env python3
"""Times each oracle_sql.json entry in DuckDB against the sf parquet
tables (the expensive half of the driver's correctness compare) and
prints a sorted table. Usage:
  python3 scripts/time_oracle.py <sfDir> <verifyOutDir> [topN]
"""
import sys, os, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = []
    total = 0.0
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchdf()
            err = ""
        except Exception as e:
            err = f" ERROR {e}"
        dt = time.time() - t0
        total += dt
        times.append((dt, name, err))
    times.sort(reverse=True)
    for dt, name, err in times[:top_n]:
        print(f"{dt:8.2f}s  {name}{err}")
    print(f"TOTAL {total:.1f}s over {len(times)} oracles")


if __name__ == "__main__":
    main()
