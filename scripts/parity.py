#!/usr/bin/env python3
"""Cross-run result parity: hash-compare two Verify output dirs.

Usage: python3 scripts/parity.py <outDirA> <outDirB>

The round-13 executor-serialization parity check, as a repeatable
gate: run `graft.Verify` twice (e.g. once on local[32], once with
SPARK_GRAFT_MASTER=local-cluster[2,8,3072]) into two dirs, then
compare every query's parquet result column-name-sorted and
row-order-insensitively — the same shape as the driver's hash compare
(floats rounded to 9 decimals, everything else stringified). A key
present in one dir but not the other is a FAILURE: a query that
crashed on one master must not read as parity.

Exit 0 = every key identical.
"""
import json, os, sys

import duckdb

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(2)
A, B = sys.argv[1], sys.argv[2]

def keys(d):
    return {n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))}

ka, kb = keys(A), keys(B)
if not ka and not kb:
    # both dirs empty of result subdirs: a typo'd path or two crashed
    # runs must not read as "0 identical, 0 mismatched" parity (ADVICE
    # r13 — the docstring promises a missing key reads as FAILURE)
    print(f"FAIL: no result dirs found in either {A} or {B}")
    sys.exit(1)
if ka != kb:
    print(f"FAIL: key sets differ — only in {A}: {sorted(ka - kb)}; "
          f"only in {B}: {sorted(kb - ka)}")
    sys.exit(1)

con = duckdb.connect()

def canon(outdir, name):
    t = con.execute(
        f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_arrow_table()
    cols = sorted(t.column_names)
    rows = t.select(cols).to_pylist()
    keyfn = lambda r: json.dumps(
        {k: (round(v, 9) if isinstance(v, float) else str(v))
         for k, v in r.items()}, sort_keys=True, default=str)
    return cols, sorted(keyfn(r) for r in rows)

ok = bad = 0
for name in sorted(ka):
    ca, ra = canon(A, name)
    cb, rb = canon(B, name)
    if ca != cb:
        print(f"FAIL {name}: columns {ca} vs {cb}"); bad += 1; continue
    if ra != rb:
        n = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
        print(f"FAIL {name}: {len(ra)} vs {len(rb)} rows, {n} differ")
        bad += 1
        continue
    ok += 1

print(f"parity: {ok} identical, {bad} mismatched")
sys.exit(0 if bad == 0 else 1)
