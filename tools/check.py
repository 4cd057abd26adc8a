#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads the parquet dumps that graft.Verify wrote to <verify_out_dir>,
runs each oracle from oracle_sql.json in DuckDB against the parquet
tables in <sf_dir>, and compares: column names (sorted), row count, and
a hash over the sorted rows. This is dev tooling only — the engine
itself is pure Scala/Spark.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    # stringify with repr so 1 (int) != 1.0 (float) and NaN is stable
    body = "\n".join(
        "|".join(repr(v) for v in row) for row in df.itertuples(index=False, name=None))
    import hashlib
    return hashlib.md5(body.encode()).hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    # union of dumped dirs and oracle keys — a query that failed in
    # Spark (no dump dir) must show as a FAIL, not vanish
    names = sorted(set(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))) | set(oracles))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = f"COLS_MISMATCH spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT spark={len(got)} oracle={len(exp)}"
        elif table_hash(got) != table_hash(exp):
            # find first differing cell for debugging
            diff = ""
            for i in range(len(got)):
                for c in got.columns:
                    a, b = got.iloc[i][c], exp.iloc[i][c]
                    if repr(a) != repr(b):
                        diff = f" first_diff row={i} col={c} spark={a!r} oracle={b!r}"
                        break
                if diff:
                    break
            results[name] = "HASH_MISMATCH" + diff
        else:
            results[name] = f"OK rows={len(got)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else ('info' if results[k].startswith('ROWS_ONLY') else 'FAIL'):5s} {k}: {results[k]}")
    print(f"\n{n_ok}/{len([v for v in results.values() if not v.startswith('ROWS_ONLY')])} oracle-checked queries pass")

if __name__ == "__main__":
    main()
