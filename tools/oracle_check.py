#!/usr/bin/env python
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Usage: python tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, mounts the sf parquet tables as DuckDB views,
runs each oracle SQL, and hash-compares against <out>/<name>/ parquet
(columns sorted by name, rows sorted by all columns, values stringified).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return ""
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return ""
        if isinstance(v, float):
            return repr(v)
        # DATE columns: Spark parquet yields datetime.date, DuckDB yields
        # midnight datetime64 — normalize both to the date ISO string.
        if isinstance(v, pd.Timestamp) and v == v.normalize():
            return v.date().isoformat()
        if isinstance(v, datetime.datetime) and v.time() == datetime.time():
            return v.date().isoformat()
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})" + ("" if len(spark_df) else " EMPTY!")
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if len(spark_df) != len(oracle_df):
            results[name] = f"ROWCOUNT {len(spark_df)} vs {len(oracle_df)}"
        elif sorted(spark_df.columns) != sorted(oracle_df.columns):
            results[name] = f"SCHEMA {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
        elif canon(spark_df) != canon(oracle_df):
            results[name] = "HASH_MISMATCH"
        else:
            results[name] = "OK"
    bad = {k: v for k, v in results.items() if v != "OK" and not v.startswith("ROWS_ONLY(") or "EMPTY" in v}
    for k, v in sorted(results.items()):
        print(f"{'PASS' if k not in bad else 'FAIL':4} {k:28} {v}")
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
