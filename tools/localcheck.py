#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf dir,
and compare schema/rows/values (columns sorted by name, rows sorted)."""
import json, sys, math
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import os
oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# oracle_sql.json always records the FULL surface; a subset Verify run
# (SPARK_GRAFT_VERIFY_QUERIES) records WHICH queries it dumped in
# subset.json. Entries outside the subset are skipped loudly (stale dumps
# from earlier builds are never presented as coverage); a missing dump
# INSIDE the subset — or any missing dump on a full run — is a crashed
# query and fails the gate.
subset = None
if os.path.exists(f"{OUT}/subset.json"):
    subset = set(json.load(open(f"{OUT}/subset.json")))
fails = 0
skipped = []
for name, sql in sorted(oracle.items()):
    if subset is not None and name not in subset:
        skipped.append(name); continue
    if not os.path.isdir(f"{OUT}/{name}"):
        print(f"FAIL {name}: no spark result (dump missing)"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    x = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(x.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}"); fails += 1; continue
    if len(g) != len(x):
        print(f"FAIL {name}: rows {len(g)} vs {len(x)}"); fails += 1; continue
    g = g.sort_values(by=list(g.columns), ignore_index=True)
    x = x.sort_values(by=list(x.columns), ignore_index=True)
    bad = None
    for c in g.columns:
        a, b = g[c], x[c]
        for i in range(len(a)):
            va, vb = a.iloc[i], b.iloc[i]
            if va is None and vb is None: continue
            try:
                if isinstance(va, float) or isinstance(vb, float):
                    if (isinstance(va, float) and math.isnan(va)) and (isinstance(vb, float) and math.isnan(vb)): continue
                    if va != vb: bad = (c, i, va, vb); break
                elif str(va) != str(vb): bad = (c, i, va, vb); break
            except Exception:
                if str(va) != str(vb): bad = (c, i, va, vb); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
checked = len(oracle) - len(skipped)
if skipped:
    print(f"\nNOTE: {len(skipped)} oracle entries had no dump (subset run?) "
          f"and were NOT checked: {', '.join(skipped[:8])}"
          f"{'...' if len(skipped) > 8 else ''}")
print(f"\n{checked - fails}/{checked} dumped queries match "
      f"({len(oracle)} total on the gate surface)")
sys.exit(1 if fails else 0)
