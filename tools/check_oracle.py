#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: for each query
output parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same testdata tables, sort columns by name and rows by
value, and diff. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").df()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"EXEC ERROR: {e}"))
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((name, f"COLUMNS got={gcols} exp={ecols}"))
        continue
    got, exp = got[gcols], exp[ecols]
    if len(got) != len(exp):
        fails.append((name, f"ROWS got={len(got)} exp={len(exp)}"))
        continue
    gs = got.astype(str).sort_values(by=gcols, ignore_index=True)
    es = exp.astype(str).sort_values(by=ecols, ignore_index=True)
    dtypes_g = [str(t) for t in got.dtypes]
    dtypes_e = [str(t) for t in exp.dtypes]
    if gs.equals(es):
        note = "" if dtypes_g == dtypes_e else f" [dtype drift: got={dtypes_g} exp={dtypes_e}]"
        passes.append((name, f"{len(got)} rows{note}"))
    else:
        diff = (gs != es).any(axis=1)
        idx = diff[diff].index[:3]
        detail = "; ".join(
            f"row{i}: got={gs.loc[i].to_dict()} exp={es.loc[i].to_dict()}" for i in idx)
        fails.append((name, f"VALUE MISMATCH ({int(diff.sum())}/{len(gs)} rows): {detail[:500]}"))

for n, m in passes:
    print(f"PASS  {n}: {m}")
for n, m in fails:
    print(f"FAIL  {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
