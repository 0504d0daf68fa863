#!/usr/bin/env python3
"""Generate the one-off sf100 DOCUMENTS slice used by SCALING.md's
fourth-decade checks (harness tooling, not part of the library; needs
driver-side duckdb).

1000x the documents table from /root/testdata/sf0.1 with the same
replica scheme as gen_sf1.py / gen_sf10.py (tag spliced into every 5th
token). Documents ONLY — the sf100 rows are the derived-df-cap audit and
the dedup-family spot runs, which read nothing else; embeddings/events
at this scale would be ~5 GB of parquet for no additional evidence.

Usage: python3 scripts/gen_sf100_docs.py [SRC_DIR] [OUT_DIR]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100docs"
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
  FROM read_parquet('{src}/documents.parquet') d, range(0,1000) r(r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

print("sf100 documents slice written to", out)
