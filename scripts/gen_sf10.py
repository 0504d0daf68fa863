#!/usr/bin/env python3
"""Generate the sf10 smoke slice used by SCALING.md's second-decade check
(harness tooling, not part of the library; needs driver-side duckdb).

100x the DOCUMENTS table from /root/testdata/sf0.1 with the same replica
scheme as gen_sf1.py (tag spliced into every 5th token), and 100x the
EMBEDDINGS table with gen_sf1.py's per-replica offset scheme (replica r
shifts dimension 1 by r*10 — distinct vectors, per-replica cluster
geometry preserved), so documents- and embeddings-family queries both
have a true second decade here. Events are 100x'd with gen_sf1.py's
time-shift scheme (replica r shifts by r full spans: the timeline grows
100x, per-hour volume and key skew stay constant) so the events-family
queries get a true second decade too. TPC-H tables symlink to sf0.1 —
numbers for those from this dir would be meaningless.

NOTE the title artifact this inherits from the generator (attributed in
SCALING.md): replica tags differ by 1-2 characters ("rep3_" vs "rep7_"),
so the 40-char title prefixes of one base document's replicas are
pairwise within edit distance 2 — q_edit_pairs' TRUE output grows
~quadratically in the replica count. That is output mass, not operator
cost; gen checks report it alongside wall-clock.

Usage: python3 scripts/gen_sf10.py [SRC_DIR] [OUT_DIR]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
sf1 = os.environ.get("SF1_DIR", "/tmp/sf1")
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
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
  FROM read_parquet('{src}/documents.parquet') d, range(0,100) r(r)
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
  FROM read_parquet('{src}/embeddings.parquet') e, range(0,100) r(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.event_id + r.r * 1000000000 AS event_id,
    e.ts + r.r * (SELECT max(ts) - min(ts) + INTERVAL 1 SECOND
                  FROM read_parquet('{src}/events.parquet')) AS ts,
    e.user_id, e.event_type, e.value, e.props
  FROM read_parquet('{src}/events.parquet') e, range(0,100) r(r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for t, d in [("region", src),
             ("nation", src), ("customer", src), ("supplier", src),
             ("part", src), ("orders", src), ("lineitem", src),
             ("partsupp", src)]:
    p = f"{d}/{t}.parquet"
    if os.path.exists(p):
        link = f"{out}/{t}.parquet"
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(p, link)

print("sf10 slice written to", out)
