#!/usr/bin/env python3
"""Regenerate the sf1 stress slice used by SCALING.md (harness tooling,
not part of the library; needs driver-side duckdb).

10x the three hot tables from /root/testdata/sf0.1 into OUT (default
/tmp/sf1), preserving the properties the stress relies on:

- documents x10: replica r > 0 gets a 'rep<r>_' tag spliced into every
  5th token, so cross-replica shingle similarity drops below near-dup
  thresholds while each replica keeps sf0.1's own intra-replica
  duplicate structure (dup-pair volume scales ~linearly, like a real
  10x corpus).
- embeddings x10: per-replica offset on one dimension (distinct
  vectors, cluster geometry preserved).
- events x10: each replica time-shifted by the full span (timeline
  grows 10x; per-hour volume and key skew constant); micros timestamps
  matching the driver's round-7+ physical layout.
- TPC-H tables symlinked from sf0.1 (queries over them are excluded
  from sf1 rows by convention).

Usage: python3 scripts/gen_sf1.py [SRC_DIR] [OUT_DIR]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_ONLY=q_x,q_y \
         sbt -batch "runMain graft.Bench"
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * 1000000000 AS doc_id,
    CASE WHEN r.r = 0 THEN d.text ELSE
      array_to_string(list_transform(str_split(d.text, ' '),
        (t, i) -> CASE WHEN i % 5 = 0 THEN 'rep' || r.r || '_' || t ELSE t END), ' ')
    END AS text,
    d.lang, d.source, d.n_chars
  FROM read_parquet('{src}/documents.parquet') d, range(0,10) r(r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 1000000000 AS vec_id,
    CASE WHEN r.r = 0 THEN e.embedding ELSE
      list_transform(e.embedding, (x, i) ->
        CASE WHEN i = 1 THEN CAST(x + r.r * 10.0 AS FLOAT) ELSE x END)
    END AS embedding,
    e.label
  FROM read_parquet('{src}/embeddings.parquet') e, range(0,10) r(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.event_id + r.r * 1000000000 AS event_id,
    e.ts + r.r * (SELECT max(ts) - min(ts) + INTERVAL 1 SECOND
                  FROM read_parquet('{src}/events.parquet')) AS ts,
    e.user_id, e.event_type, e.value, e.props
  FROM read_parquet('{src}/events.parquet') e, range(0,10) r(r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "partsupp"]:
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        link = f"{out}/{t}.parquet"
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(p, link)

print("sf1 slice written to", out)
