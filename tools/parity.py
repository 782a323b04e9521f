#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name> parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
test tables, and hash-compares values after sorting columns by name and
rows by all columns (the driver's comparison shape).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize ts to ns, floats stay exact
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM '{files[0]}'").df())
        if name not in oracles:
            status = "ROWS " if len(got) > 0 else "EMPTY"
            print(f"{status} {name}: rows={len(got)} (no oracle)"); n_rowsonly += 1
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(exp.columns) and \
            [str(t) for t in got.dtypes] == [str(t) for t in exp.dtypes]
        ok_rows = len(got) == len(exp)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                pd.testing.assert_frame_equal(got, exp, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
        if ok_schema and ok_rows and ok_vals:
            print(f"PASS  {name}: rows={len(got)}"); n_pass += 1
        else:
            print(f"FAIL  {name}: schema={ok_schema} rows={len(got)}/{len(exp)} vals={ok_vals}")
            if not ok_schema:
                print(f"      got: {[(c, str(t)) for c, t in zip(got.columns, got.dtypes)]}")
                print(f"      exp: {[(c, str(t)) for c, t in zip(exp.columns, exp.dtypes)]}")
            elif ok_rows:
                neq = ~(got.eq(exp) | (got.isna() & exp.isna()))
                bad = neq.any(axis=1)
                print(f"      first diffs:\n{got[bad].head(3)}\nvs\n{exp[bad].head(3)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
