#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
against the sfDir parquet tables, and compares rows / schema / values
(columns sorted by name, rows sorted by all columns, values hashed).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            status = "ROWS-ONLY " + ("PASS" if len(got) > 0 else "FAIL(empty)")
            print(f"  {name}: {status} rows={len(got)}")
            n_pass += len(got) > 0
            n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok_rows = len(g) == len(e)
        ok_cols = list(g.columns) == list(e.columns)
        ok_schema = ok_cols and all(
            str(a) == str(b) for a, b in zip(g.dtypes, e.dtypes))
        ok_vals = False
        if ok_rows and ok_cols:
            ok_vals = g.astype(str).equals(e.astype(str))
        ok = ok_rows and ok_schema and ok_vals
        n_pass += ok
        n_fail += not ok
        print(f"  {name}: {'PASS' if ok else 'FAIL'} rows={len(g)}/{len(e)}"
              f" cols_ok={ok_cols} schema_ok={ok_schema} vals_ok={ok_vals}")
        if not ok:
            if not ok_cols:
                print(f"    got cols: {list(g.columns)}")
                print(f"    exp cols: {list(e.columns)}")
            elif not ok_schema:
                print(f"    got dtypes: {dict(zip(g.columns, map(str, g.dtypes)))}")
                print(f"    exp dtypes: {dict(zip(e.columns, map(str, e.dtypes)))}")
            elif ok_rows:
                neq = (g.astype(str) != e.astype(str)).any(axis=1)
                print("    first diffs (got vs exp):")
                print(pd.concat([g[neq].head(3), e[neq].head(3)]).to_string())
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
