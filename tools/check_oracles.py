#!/usr/bin/env python3
"""Dev-only self-check emulating the driver's correctness gate:
runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the
same sf tables and compares against the parquet dumped by graft.Verify.
Usage: check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, duckdb, glob, os

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"MISSING  {name}: no spark result dir"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    # driver-style: sort columns by name, compare value multisets
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}"); fail += 1; continue
    gs = got.astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values().reset_index(drop=True)
    es = exp.astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values().reset_index(drop=True)
    if len(gs) and not gs.equals(es):
        bad = (gs != es)
        i = bad[bad].index[0]
        print(f"VALUES   {name}: first diff at sorted row {i}:")
        print(f"  spark : {gs[i][:300]!r}")
        print(f"  oracle: {es[i][:300]!r}")
        fail += 1; continue
    print(f"OK       {name}  ({len(got)} rows)")
print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} oracle-checked queries")
sys.exit(1 if fail else 0)
