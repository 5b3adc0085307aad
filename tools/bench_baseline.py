#!/usr/bin/env python3
"""Measure the single-node DuckDB baseline for every oracle SQL.

Usage: python3 tools/bench_baseline.py [sfDir] [oracleJson] [threads]

Times each oracle query (result fully materialized) with one warm-up
run and best-of-2 timed runs, mirroring graft.Bench methodology, and
prints a markdown table for BASELINE.md.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf01/oracle_sql.json"
    threads = sys.argv[3] if len(sys.argv) > 3 else "8"
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark writes a table as a DIRECTORY of part files (the
        # BenchScale output layout); glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(oracle))
    rows = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()  # warm-up
            print(f"[baseline] {name} warm {time.perf_counter() - t0:.2f}s",
                  file=sys.stderr, flush=True)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            rows.append((name, min(times)))
            print(f"[baseline] {name} best {min(times):.3f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            rows.append((name, None))
            print(f"ERR {name}: {e}", file=sys.stderr, flush=True)
    total = sum(t for _, t in rows if t is not None)
    if "--json" in sys.argv:
        print(json.dumps({name: t for name, t in rows}))
        return
    print(f"| query | duckdb_sec |")
    print(f"|---|---|")
    for name, t in rows:
        print(f"| {name} | {'%.3f' % t if t is not None else 'err'} |")
    print(f"| **total** | **{total:.3f}** |")

if __name__ == "__main__":
    main()
