#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <outDir>
  <outDir> is what `graft.Verify <sfDir> <outDir>` produced.

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares EXACTLY (row order, column set, stringified values) against the
Spark parquet dumps. Strictly stricter than any hash compare the driver does.
"""
import sys, json, glob
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails, npass = [], 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).df()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            if not files:
                fails.append((name, "no spark dump")); continue
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            if list(exp.columns) != list(got.columns):
                fails.append((name, f"cols got={list(got.columns)} want={list(exp.columns)}")); continue
            if len(exp) != len(got):
                fails.append((name, f"rows got={len(got)} want={len(exp)}")); continue
            diff = None
            for c in exp.columns:
                a = exp[c].astype(str).values
                b = got[c].astype(str).values
                neq = a != b
                if neq.any():
                    i = int(np.argmax(neq))
                    diff = f"col {c} row {i}: got {b[i]!r} want {a[i]!r} (dtype got={got[c].dtype} want={exp[c].dtype})"
                    break
            if diff:
                fails.append((name, diff))
            else:
                npass += 1
                print(f"PASS {name} ({len(got)} rows)")
        except Exception as e:
            fails.append((name, f"EXC {type(e).__name__}: {e}"))
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    total = npass + len(fails)
    print(f"{npass}/{total} passed")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
