#!/usr/bin/env python3
"""Time the DuckDB oracle suite over the sf fixtures — a single-node
engine anchor for BENCH_FULL.json (the reference publishes no numbers;
BASELINE.md's 2x gate needs SOMETHING concrete to stand next to).

Caveat recorded with the numbers: the oracle SQL is written for
cross-engine EXACTNESS (unrolled iteration CTEs, integer rationals,
full ORDER BY), not for DuckDB's best plans — treat as an anchor, not
a race.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [reps]
(verifyOutDir only needs oracle_sql.json)
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    # bounded: one runaway oracle must fail its own entry, not take the
    # whole host (an unlimited run reached 108 GB RSS in round 7)
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        try:
            for _ in range(reps):
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
            print(f"OK {name}: {times[name]}", file=sys.stderr)
        except Exception as e:
            times[name] = None
            print(f"ERR {name}: {str(e)[:100]}", file=sys.stderr)
    ok = {k: v for k, v in times.items() if v is not None}
    total = sum(ok.values())
    print(json.dumps({"engine": "duckdb", "sf": sf_dir, "n": len(ok),
                      "total_sec": round(total, 1), "queries": ok}))


if __name__ == "__main__":
    main()
