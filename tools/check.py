#!/usr/bin/env python3
"""Local dev emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against the parquet tables in sfDir, and compares to the Spark
result parquet in outDir/<name>/. Three stages per query, mirroring the
driver's CORRECTNESS gate: rows (count), schema (sorted column names),
and HASH — a canonical serialization (sorted columns, sorted rows, typed
cell rendering) digested with md5. The hash stage is deliberately
STRICTER than the value compare: a float64 column on one side vs DECIMAL
on the other hashes differently even when the values compare equal,
which is exactly the drift class the driver's hash catches (r11:
store_snapshot_diff was rows/schema-green, hash-red on two DECIMAL
columns and undiagnosable locally until this stage existed).

Exit code is non-zero on ANY of: a value/rows/schema/hash mismatch, an
oracle over the 10 s per-query budget, or a suite over the 180 s total
budget (COVERAGE.md budget contract — the driver's run must never time
out on oracle cost).
"""
import hashlib, json, math, sys, time

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

def canon_cell(v):
    """Canonical render of one cell — the hash stage's serialization.

    Typed on purpose: float via repr (shortest round-trip), Decimal via
    str (scale-preserving), bytes as hex, arrays/structs recursively.
    Two dataframes hash equal iff every cell RENDERS equal, so a dtype
    that survives the tolerant value-compare (int vs float, Decimal vs
    double) still reds the hash — as at the driver."""
    if v is None:
        return "\\N"
    if isinstance(v, float):          # covers numpy float64 (subclass)
        if math.isnan(v):
            return "\\N"
        return repr(float(v))
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if v != v:                        # pandas NaT and friends
        return "\\N"
    return str(v)

def canon_hash(df):
    """md5 over the canonical serialization of a norm()-ed frame."""
    h = hashlib.md5()
    h.update(("|".join(df.columns) + "\n").encode())
    for row in df.values.tolist():
        h.update(("\x1f".join(canon_cell(c) for c in row) + "\x1e")
                 .encode())
    return h.hexdigest()

fails = 0
slow = []   # oracle COST is part of the gate (see COVERAGE.md budget):
            # a >10 s oracle at sf0.01 risks timing out the driver run
report = {}  # CORRECTNESS_r{N}.json-shaped local artifact
def record(name, rows_match, schema_match, hash_match,
           spark_rows, oracle_rows, err=None, oracle_sec=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err,
                    "oracle_sec": oracle_sec}
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
        record(name, False, False, False, None, None, err=str(e))
        fails += 1
        continue
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
        record(name, len(w) == len(g), False, False, len(g), len(w),
               oracle_sec=round(dt, 2))
        fails += 1
        continue
    if len(w) != len(g):
        print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
        record(name, False, True, False, len(g), len(w),
               oracle_sec=round(dt, 2))
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
        record(name, True, True, False, len(g), len(w),
               oracle_sec=round(dt, 2))
        fails += 1
        continue
    # driver-hash emulation: values agreed cell-by-cell; the hash stage
    # additionally reds any RENDER disagreement (dtype drift)
    hw, hg = canon_hash(w), canon_hash(g)
    if hw != hg:
        dtw = {c: str(want[c].dtype) for c in want.columns}
        dtg = {c: str(got[c].dtype) for c in got.columns}
        wit = next(((i, w.columns[j])
                    for i, (rw, rg) in enumerate(
                        zip(w.values.tolist(), g.values.tolist()))
                    for j in range(len(w.columns))
                    if canon_cell(rw[j]) != canon_cell(rg[j])), None)
        print(f"FAIL {name}: hash mismatch {hw[:8]} vs {hg[:8]} "
              f"(values equal, render drift at {wit}; dtypes {dtw} vs "
              f"{dtg})")
        record(name, True, True, False, len(g), len(w),
               oracle_sec=round(dt, 2))
        fails += 1
    else:
        print(f"ok   {name} ({len(w)} rows, hash {hw[:8]})")
        record(name, True, True, True, len(g), len(w),
               oracle_sec=round(dt, 2))

# the driver-shaped local artifact (CORRECTNESS_r{N}.json layout plus
# oracle_sec) — diffable round-over-round without waiting for the driver
with open(f"{OUT}/correctness_local.json", "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)

suite_s = time.time() - t_suite
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match "
      f"(oracle suite {suite_s:.0f}s)")
budget_breach = 0
for dt, name in sorted(slow, reverse=True):
    print(f"FAIL over-budget oracle: {name} took {dt:.1f}s in DuckDB "
          f"(budget 10s; materialize its round CTEs — see COVERAGE.md)")
    budget_breach += 1
if suite_s > 180:
    print(f"FAIL over-budget suite: {suite_s:.0f}s > 180s total budget")
    budget_breach += 1
sys.exit(1 if fails or budget_breach else 0)
