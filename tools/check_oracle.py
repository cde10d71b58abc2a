#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same fixture tables,
compare schema (column names sorted), row count, and values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

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
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = spark_rel.description
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.execute(sql)
            d_cols = duck_rel.description
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_names = sorted(c[0] for c in s_cols)
        d_names = sorted(c[0] for c in d_cols)
        if s_names != d_names:
            print(f"FAIL {name}: columns differ spark={s_names} duck={d_names}")
            n_fail += 1
            continue
        s_idx = [[c[0] for c in s_cols].index(n) for n in s_names]
        d_idx = [[c[0] for c in d_cols].index(n) for n in d_names]
        s_vals = [tuple(canon(r[i]) for i in s_idx) for r in s_rows]
        d_vals = [tuple(canon(r[i]) for i in d_idx) for r in d_rows]
        if len(s_vals) != len(d_vals):
            print(f"FAIL {name}: rows spark={len(s_vals)} duck={len(d_vals)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
        # The DRIVER fetches oracle results through pandas/arrow, which
        # coerces HUGEINT (and renders DECIMAL differently) to float64 —
        # values then hash as "123.0" vs Spark's "123". fetchall() here
        # sees python ints and misses it, so type-audit every oracle:
        # any HUGEINT/DECIMAL output column is a FAIL even if values match.
        # (Root cause of r2 dedup_simhash and all three r4 mismatches.)
        # A DESCRIBE failure must FAIL loudly, not silently disable the
        # audit this block exists to enforce.
        try:
            haz = [(c, ty) for c, ty, *_ in con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
                if "HUGEINT" in ty or "DECIMAL" in ty]
        except Exception as e:
            print(f"FAIL {name}: type audit could not DESCRIBE oracle: {e}")
            n_fail += 1
            continue
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_vals)} rows differ; first at {i}:")
            print(f"  spark: {s_vals[i]}")
            print(f"  duck : {d_vals[i]}")
            n_fail += 1
        elif haz:
            print(f"FAIL {name}: oracle emits driver-coercion-hazard types: {haz}"
                  " — cast to BIGINT/DOUBLE in the oracle SQL")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_vals)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
