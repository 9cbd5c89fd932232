#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [outDir] [sfDir] [key ...]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` was already run.
Trailing key arguments restrict the compare to those oracle keys (pass
the SAME keys to Verify); unknown keys fail loudly.

For each query parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (views registered per table name over the sfDir
parquet files), sorts columns by name, compares row counts, schemas
(loosely) and values (exact for non-floats, small-tolerance for floats).
"""
import json, math, os, sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# optional explicit key filter (match a key-filtered Verify run). With no
# filter, a missing output dir is a FAILURE — a query that crashed in
# Verify must not silently pass the gate.
ONLY = set(sys.argv[3:])
# a typo'd key must fail loudly, never produce a "0 ok, 0 failed" green
unknown = ONLY - set(oracle)
if unknown:
    print(f"FAIL: unknown key(s) {sorted(unknown)} — not in oracle_sql.json")
    sys.exit(1)
ok = bad = 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        # Result-type gate: DuckDB promotes SUM(BIGINT) to HUGEINT and
        # keeps literal decimals as DECIMAL — both serialize differently
        # from Spark's int64/double in the driver's hasher even when
        # values are identical (r4 x25/x33 post-mortem). No oracle may
        # emit them.
        bad_types = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}")
                     .fetchall() if any(b in r[1].upper() for b in
                                        ("HUGEINT", "DECIMAL"))]
        if bad_types:
            print(f"FAIL {name}: oracle result type(s) {bad_types} — "
                  f"CAST to BIGINT/DOUBLE in the SQL")
            bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetch_arrow_table()
        exp = con.execute(sql).fetch_arrow_table()
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); bad += 1; continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}"); bad += 1; continue
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        # row-order-insensitive compare (mimic a sorted hash)
        keyfn = lambda r: json.dumps(
            {k: (round(v, 9) if isinstance(v, float) else str(v))
             for k, v in r.items()}, sort_keys=True, default=str)
        mism = None
        for gr, er in zip(sorted(g, key=keyfn), sorted(e, key=keyfn)):
            for c in gcols:
                gv, ev = gr[c], er[c]
                if isinstance(gv, float) and isinstance(ev, float):
                    if not (math.isclose(gv, ev, rel_tol=1e-12, abs_tol=1e-12)
                            or (math.isnan(gv) and math.isnan(ev))):
                        mism = (c, gv, ev); break
                elif gv != ev:
                    mism = (c, gv, ev); break
            if mism: break
        if mism:
            print(f"FAIL {name}: value col={mism[0]} got={mism[1]!r} exp={mism[2]!r}")
            bad += 1
        else:
            ok += 1
            print(f"ok   {name} ({got.num_rows} rows)")
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        bad += 1
# rows-only check for keys without an oracle (driver's weaker check)
for name in sorted(os.listdir(OUT)):
    p = f"{OUT}/{name}"
    if name in oracle or not os.path.isdir(p):
        continue
    try:
        n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        if n > 0:
            ok += 1; print(f"ok   {name} (rows-only: {n} rows)")
        else:
            bad += 1; print(f"FAIL {name}: rows-only check, 0 rows")
    except Exception as ex:
        bad += 1; print(f"FAIL {name}: {type(ex).__name__}: {ex}")

print(f"\n{ok} ok, {bad} failed")
sys.exit(1 if bad else 0)
