#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, registers each testdata parquet as a DuckDB view,
runs every oracle, and compares against the Spark parquet dump:
columns sorted by name, rows sorted by all columns, values normalized
(timestamps -> isoformat, floats -> repr) then hashed.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda x: repr(round(x, 9)) if pd.notna(x) else "NaN")
        else:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def digest(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(df.columns)).encode())
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(map(str, row)) + "\x1e").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(glob.glob(f"{out_dir}/q*")):
        qname = name.split("/")[-1]
        files = glob.glob(f"{name}/*.parquet")
        if not files:
            print(f"EMPTY-OUTPUT {qname}")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if qname not in oracles:
            print(f"ROWS-ONLY    {qname}: {len(spark_df)} rows")
            n_rows_only += 1
            continue
        try:
            oracle_df = con.sql(oracles[qname]).df()
        except Exception as e:
            print(f"ORACLE-ERR   {qname}: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df.copy()), normalize(oracle_df)
        if digest(a) == digest(b):
            print(f"PASS         {qname} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL         {qname}: spark {len(a)}x{len(a.columns)} vs oracle {len(b)}x{len(b.columns)}")
            if list(a.columns) != list(b.columns):
                print(f"  cols spark={list(a.columns)} oracle={list(b.columns)}")
            else:
                neq = a.compare(b) if len(a) == len(b) else None
                if neq is not None and not neq.empty:
                    print("  first diffs:\n" + neq.head(5).to_string())
                elif len(a) != len(b):
                    print(f"  row counts differ: {len(a)} vs {len(b)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
