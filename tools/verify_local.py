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

# DuckDB output types the driver's pandas-based hasher materializes stably.
# HUGEINT/UHUGEINT (int128) become object/float in pandas and hash-mismatch
# against Spark's BIGINT even when every cell is equal (round-6 lesson:
# q_cusum / q_attribution / q_forecast_acc / q_skew_audit). Uncast DECIMAL
# is equally unstable. Any oracle emitting one of these must CAST.
STABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
                "VARCHAR", "DATE", "BOOLEAN", "TIMESTAMP"}

def lint_oracle_types(con, oracles):
    """DESCRIBE every oracle; return {name: [(col, type), ...]} of unstable columns."""
    bad = {}
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad[name] = [("<describe failed>", str(e)[:120])]
            continue
        unstable = [(c, t) for c, t, *_ in rows
                    if t not in STABLE_TYPES and not t.endswith("[]")]
        if unstable:
            bad[name] = unstable
    return bad

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
    lint = lint_oracle_types(con, oracles)
    for name, cols in sorted(lint.items()):
        print(f"[TYPE-LINT FAIL] {name}: unstable oracle output columns "
              + ", ".join(f"{c}:{t}" for c, t in cols)
              + " — add CAST(... AS BIGINT/DOUBLE)")
        n_fail += 1
    if "--lint-only" in sys.argv:
        print(f"\nlint: {len(lint)} oracle(s) with unstable output types")
        sys.exit(1 if lint else 0)
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
