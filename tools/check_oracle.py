#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver: for each <name>/ parquet dump in verifyOutDir, runs
oracle_sql.json[name] in DuckDB (tables = parquet files in sfDir), sorts
columns by name, sorts rows, and compares values cell-by-cell.
"""
import json, sys, math
import duckdb
import pandas as pd
from pathlib import Path

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out = Path(out_dir)
con = duckdb.connect()
for p in Path(sf_dir).glob("*.parquet"):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

oracle = json.loads((out / "oracle_sql.json").read_text())
fails = 0
for name in sorted(d.name for d in out.iterdir() if d.is_dir()):
    if name not in oracle:
        print(f"{name:24s} ROWS-ONLY (no oracle)")
        continue
    got = pd.read_parquet(out / name)
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} SCHEMA MISMATCH spark={list(got.columns)} duck={list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(got)} duck={len(exp)}")
        fails += 1
        continue
    gs = got.sort_values(list(got.columns), na_position="first").reset_index(drop=True)
    es = exp.sort_values(list(exp.columns), na_position="first").reset_index(drop=True)
    bad = []
    for c in gs.columns:
        a, b = gs[c], es[c]
        try:
            a = a.astype("float64"); b = b.astype("float64")
            eq = (a == b) | (a.isna() & b.isna())
        except (ValueError, TypeError):
            eq = (a.astype(str) == b.astype(str))
        if not eq.all():
            i = int((~eq).idxmax())
            bad.append(f"{c}[row{i}]: spark={gs[c][i]!r} duck={es[c][i]!r}")
    if bad:
        print(f"{name:24s} VALUE MISMATCH: " + "; ".join(bad[:3]))
        fails += 1
    else:
        print(f"{name:24s} OK ({len(got)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
