#!/usr/bin/env python3
"""Driver-style oracle compare: run after `sbt "runMain graft.Verify <sf> <out>"`.

Usage: python3 tools/compare_oracle.py [sfDir] [verifyOutDir]
Registers the sf parquet tables as DuckDB views, runs every statement in
oracle_sql.json, and compares against the written parquet with
column-sorted rows (the driver's semantics).
"""
import duckdb, json, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        actual = con.sql(f"select * from '{out}/{name}/*.parquet'").df()
        expected = con.sql(sql).df()
    except Exception as e:
        print(name, 'ORACLE ERROR:', str(e)[:300]); fails += 1; continue
    cols = sorted(actual.columns)
    if cols != sorted(expected.columns):
        print(name, 'SCHEMA MISMATCH', cols, sorted(expected.columns)); fails += 1; continue
    a = actual[cols].sort_values(by=cols).reset_index(drop=True)
    e = expected[cols].sort_values(by=cols).reset_index(drop=True)
    if len(a) != len(e):
        print(name, f'ROWCOUNT {len(a)} vs {len(e)}'); fails += 1; continue
    # strict: dtype drift (e.g. DuckDB HUGEINT -> float64) is a failure,
    # exactly like the driver's value-hash compare
    if list(a.dtypes) != list(e.dtypes):
        print(name, 'DTYPE MISMATCH',
              {c: (str(a[c].dtype), str(e[c].dtype))
               for c in cols if a[c].dtype != e[c].dtype})
        fails += 1; continue
    same = a.equals(e)
    print(name, 'rows', len(a), 'MATCH' if same else 'MISMATCH')
    if not same:
        fails += 1
        diff = (a != e)
        for c in [c for c in cols if diff[c].any()][:2]:
            idx = diff[c].idxmax()
            print(f'  {c} row{idx}: act={a[c][idx]!r} exp={e[c][idx]!r}')
sys.exit(1 if fails else 0)
