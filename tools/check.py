#!/usr/bin/env python3
"""Local dev emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against the parquet tables in sfDir, and compares to the Spark
result parquet in outDir/<name>/. Exact compare after sorting columns by
name and rows by all columns.
"""
import json, math, sys, time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b

fails = 0
slow = []   # oracle COST is part of the gate (see COVERAGE.md budget):
            # a >10 s oracle at sf0.01 risks timing out the driver run
t_suite = time.time()
for name, sql in sorted(oracle.items()):
    try:
        t_q = time.time()
        want = con.execute(sql).df()
        dt = time.time() - t_q
        if dt > 10:
            slow.append((dt, name))
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        fails += 1
        continue
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
        fails += 1
        continue
    if len(w) != len(g):
        print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
        fails += 1
        continue
    bad = None
    wv, gv = w.values.tolist(), g.values.tolist()
    for i in range(len(wv)):
        for j in range(len(wv[0]) if wv else 0):
            if not cmp_cell(wv[i][j], gv[i][j]):
                bad = (i, w.columns[j], wv[i][j], gv[i][j])
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: first diff row={bad[0]} col={bad[1]} "
              f"want={bad[2]!r} got={bad[3]!r}")
        fails += 1
    else:
        dtw = {c: str(want[c].dtype) for c in want.columns}
        dtg = {c: str(got[c].dtype) for c in got.columns}
        dtflag = "" if dtw == dtg else f"  [dtype drift: {dtw} vs {dtg}]"
        print(f"ok   {name} ({len(w)} rows){dtflag}")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match "
      f"(oracle suite {time.time() - t_suite:.0f}s)")
for dt, name in sorted(slow, reverse=True):
    print(f"WARN over-budget oracle: {name} took {dt:.1f}s in DuckDB "
          f"(budget ~10s; materialize its round CTEs — see COVERAGE.md)")
sys.exit(1 if fails else 0)
