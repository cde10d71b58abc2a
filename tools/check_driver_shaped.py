#!/usr/bin/env python3
"""Driver-shaped correctness check: unlike check_oracle.py (exact fetchall
compare), this replicates the DRIVER's pandas-based canonicalization —
`.df()` materialization (DuckDB HUGEINT -> float64 coercion!) and
`sort_values` over all columns (raises TypeError on ndarray/dict cells) —
so failures the driver would report reproduce locally.

Usage: python3 tools/check_driver_shaped.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            s_df = canonical(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            d_df = canonical(con.execute(sql).df())
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(s_df.columns) != list(d_df.columns):
            print(f"FAIL {name}: columns spark={list(s_df.columns)} duck={list(d_df.columns)}")
            n_fail += 1
            continue
        if len(s_df) != len(d_df):
            print(f"FAIL {name}: rows spark={len(s_df)} duck={len(d_df)}")
            n_fail += 1
            continue
        # hash compare on stringified canonical frames (driver hashes values)
        s_h = pd.util.hash_pandas_object(s_df.astype(str), index=False).sum()
        d_h = pd.util.hash_pandas_object(d_df.astype(str), index=False).sum()
        if s_h != d_h:
            neq = (s_df.astype(str) != d_df.astype(str))
            bad = neq.any(axis=1)
            i = bad[bad].index[0]
            print(f"FAIL {name}: hash mismatch; first differing row {i}:")
            print(f"  spark: {s_df.iloc[i].to_dict()}")
            print(f"  duck : {d_df.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
