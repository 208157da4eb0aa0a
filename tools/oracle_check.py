#!/usr/bin/env python3
"""Driver-style DuckDB oracle compare over a Verify dump.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
With no query names, checks every entry in oracle_sql.json.
"""
import sys, json
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
sqls = json.load(open(f'{out}/oracle_sql.json'))
targets = names or list(sqls)
bad = 0
for name in targets:
    try:
        s = pd.read_parquet(f'{out}/{name}')
        d = con.sql(sqls[name]).df()
        s = s[sorted(s.columns)].sort_values(sorted(s.columns)).reset_index(drop=True)
        d = d[sorted(d.columns)].sort_values(sorted(d.columns)).reset_index(drop=True)
        ok = s.shape == d.shape and all(
            (s[c].astype(float).round(9).equals(d[c].astype(float).round(9))
             if s[c].dtype.kind in 'fiu'
             else s[c].astype(str).equals(d[c].astype(str))) for c in s.columns)
        print(name, s.shape, 'MATCH' if ok else 'MISMATCH')
        if not ok: bad += 1
    except Exception as e:
        print(name, 'ERR', str(e)[:160]); bad += 1
print(f'{len(targets)-bad}/{len(targets)} match')
sys.exit(1 if bad else 0)
