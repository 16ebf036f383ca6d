#!/usr/bin/env python3
"""Diagnose driver-style (pandas-based) compare differences.

The driver's CORRECTNESS gate loads the oracle via duckdb .df() and the Spark
parquet via pandas, sorts columns by name, sort_values the rows, then hashes
values. This script mirrors that and prints dtype + first-value diffs for
each query so type-representation mismatches (Decimal vs float64, HUGEINT,
None vs NaN, ndarray cells) are visible locally.

Usage: python3 tools/diag_pandas.py <sfDir> <verifyOutDir> [key ...]
"""
import sys, os, json, glob
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load(sf_dir, out_dir, name, sql, con):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    s = pd.read_parquet(files) if len(files) != 1 else pd.read_parquet(files[0])
    o = con.execute(sql).df()
    return o, s


def sort_df(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        return df.sort_values(cols).reset_index(drop=True), None
    except Exception as e:
        return df.reset_index(drop=True), f"sort_values failed: {e}"


def main(sf_dir, out_dir, keys):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in (keys or sorted(oracle)):
        sql = oracle.get(name)
        if sql is None:
            print(f"== {name}: no oracle"); continue
        try:
            o, s = load(sf_dir, out_dir, name, sql, con)
        except Exception as e:
            print(f"== {name}: LOAD ERR {e}"); continue
        o, oerr = sort_df(o)
        s, serr = sort_df(s)
        status = []
        if oerr: status.append(f"oracle {oerr}")
        if serr: status.append(f"spark {serr}")
        dt_diff = []
        for c in sorted(o.columns):
            if c not in s.columns:
                dt_diff.append(f"{c}: missing in spark"); continue
            od, sd = str(o[c].dtype), str(s[c].dtype)
            if od != sd:
                dt_diff.append(f"{c}: oracle={od} spark={sd}")
        val_diff = None
        n = min(len(o), len(s))
        for i in range(n):
            orow = tuple(str(v) for v in o.iloc[i])
            srow = tuple(str(v) for v in s.iloc[i])
            if orow != srow:
                val_diff = (i, orow, srow)
                break
        flag = "OK" if not (dt_diff or val_diff or status) else "DIFF"
        print(f"== {name}: {flag}")
        for m in status: print(f"   {m}")
        for m in dt_diff: print(f"   dtype {m}")
        if val_diff:
            i, orow, srow = val_diff
            print(f"   row {i} oracle={orow}")
            print(f"   row {i} spark ={srow}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
