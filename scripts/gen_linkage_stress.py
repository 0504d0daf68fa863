#!/usr/bin/env python3
"""Linkage-stress fixtures for q_record_linkage's SCALING rows (harness
tooling, not part of the library; needs driver-side duckdb).

q_record_linkage blocks on c_nationkey (25 nations), so the TPC-H symlink
convention silently exempted it from the sf1 stress: replicating customers
is the ONLY way to grow block sizes. Replica r > 0 gets

- c_custkey + r*100000 (stays below the query's +1,000,000 dirty offset),
- a 'rep<r> ' tag prefixed to c_name,
- c_acctbal shifted by r*20000 (floors land in disjoint ranges),

so CROSS-replica pairs inside a block disagree on name AND bal_floor
(score <= 6 + (-12) + (-7) < lower=10 -> filtered) while each replica
keeps the base slice's planted-match structure: true linked pairs grow
LINEARLY (xR) while the block-join candidate mass grows QUADRATICALLY
(R^2) — exactly the regime the per-side maxBlockSize cap exists for.

At x5 blocks are ~3000/side (< 5000 cap): the quadratic mass is REAL and
measured. At x10 blocks are ~6000/side (> cap): every block drops — the
cap binds, the join does no work, and the empty output is the documented
degenerate-key verdict, not a bug.

Usage: python3 scripts/gen_linkage_stress.py [R] [OUT]
       (defaults: R=5 OUT=/tmp/linkage5)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/linkage{r}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT c_custkey + r * 100000 AS c_custkey,
                 CASE WHEN r = 0 THEN c_name
                      ELSE 'rep' || r || ' ' || c_name END AS c_name,
                 c_nationkey,
                 c_acctbal + r * 20000 AS c_acctbal,
                 c_mktsegment
          FROM read_parquet('{SRC}/customer.parquet'),
               (SELECT unnest(range({r})) AS r)
        ) TO '{out}/customer.parquet' (FORMAT parquet)
    """)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/customer.parquet')"
    ).fetchone()[0]
    blk = con.execute(
        f"""SELECT max(c) FROM (SELECT count(*) AS c
            FROM read_parquet('{out}/customer.parquet')
            GROUP BY c_nationkey)"""
    ).fetchone()[0]
    for t in ("region", "nation", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        dst = f"{out}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"{out}: customer x{r} = {n} rows, max block/side = {blk}")


if __name__ == "__main__":
    main()
