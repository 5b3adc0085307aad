#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already
produced <outDir>/<query>/ parquet dirs + oracle_sql.json. Runs each
oracle SQL in DuckDB over views named after the parquet tables, then
compares against the Spark parquet output: column names (sorted),
row count, and exact cell values (sorted rows), dtypes reported.
"""
import json, math, os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = spark_rel.fetchall()
        col_idx = [spark_rel.columns.index(c) for c in spark_cols]
        spark_vals = sorted(tuple(norm(r[i]) for i in col_idx) for r in spark_rows)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows "
                  f"{'OK' if len(spark_rows) > 0 else 'EMPTY!'}")
            continue
        try:
            ora_rel = con.sql(oracles[name])
            ora_cols_orig = ora_rel.columns
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ora_cols = sorted(ora_cols_orig)
        oci = [ora_cols_orig.index(c) for c in ora_cols]
        ora_vals = sorted(tuple(norm(r[i]) for i in oci) for r in ora_rows)
        problems = []
        if spark_cols != ora_cols:
            problems.append(f"cols spark={spark_cols} oracle={ora_cols}")
        if len(spark_rows) != len(ora_rows):
            problems.append(f"rowcount spark={len(spark_rows)} oracle={len(ora_rows)}")
        if not problems and spark_vals != ora_vals:
            diffs = [(a, b) for a, b in zip(spark_vals, ora_vals) if a != b]
            problems.append(f"{len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
        if problems:
            print(f"[FAIL] {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(spark_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
