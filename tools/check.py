#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB (tables = parquet files in sfDir),
reads the Spark result parquet from <verifyOutDir>/<name>/, sorts columns by
name, and compares schema/rowcount/values. Mirrors what CORRECTNESS_r{N}.json
checks so oracles are validated before committing.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output dir"); n_fail += 1; continue
        files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no parquet files"); n_fail += 1; continue
        try:
            o = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        o_cols, s_cols = sorted(o.column_names), sorted(s.column_names)
        if o_cols != s_cols:
            print(f"[SCHEMA] {name}: oracle={o_cols} spark={s_cols}"); n_fail += 1; continue
        o = o.select(o_cols); s = s.select(s_cols)
        if o.num_rows != s.num_rows:
            print(f"[ROWS] {name}: oracle={o.num_rows} spark={s.num_rows}"); n_fail += 1; continue
        orows = [tuple(norm(v) for v in row) for row in zip(*(c.to_pylist() for c in o.columns))] if o.num_rows else []
        srows = [tuple(norm(v) for v in row) for row in zip(*(c.to_pylist() for c in s.columns))] if s.num_rows else []
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            print(f"[HASH] {name}: first diff at row {bad}:\n  oracle={orows[bad]}\n  spark ={srows[bad]}")
            n_fail += 1
            continue
        print(f"[OK] {name}: {o.num_rows} rows")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
