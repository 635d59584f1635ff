#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare graft.Verify
parquet output against DuckDB oracle results (values sorted row- and
column-wise). Usage: check.py <verify_out_dir> <sf_dir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: everything to string via repr-stable conversion
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if str(col.dtype).startswith("datetime"):
            out[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            out[c] = col.astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            exp = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT {len(g)} vs {len(e)}"
        elif not g.equals(e):
            neq = (g != e).any(axis=1)
            idx = neq[neq].index[:3]
            diffs = [f"row {i}: spark={g.loc[i].tolist()} duck={e.loc[i].tolist()}" for i in idx]
            # dtype-level detail
            dt = {c: (str(g[c].dtype), str(e[c].dtype)) for c in g.columns if str(g[c].dtype) != str(e[c].dtype)}
            results[name] = "VALUE_MISMATCH " + "; ".join(diffs) + (f" dtypes={dt}" if dt else "")
        else:
            results[name] = "OK"
    # queries without oracle: rows-only
    for pdir in sorted(glob.glob(f"{outdir}/q*")):
        name = os.path.basename(pdir)
        if name not in results and os.path.isdir(pdir):
            files = glob.glob(f"{pdir}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[name] = f"ROWS_ONLY n={n}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    print(f"\n{ok}/{len([k for k in results if not results[k].startswith('ROWS_ONLY')])} oracle-checked queries pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
