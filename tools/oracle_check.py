#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

For each query dumped by `graft.Verify` into <verify_out_dir>/<name>/,
runs the matching oracle SQL (from oracle_sql.json) in DuckDB with views
over <sf_dir>/*.parquet, and compares schema + row values (column-name
sorted, row sorted). Driver-side tooling only — never a library dep.
"""
import json
import math
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    # Decimal -> normalized string keeps scale differences visible
    return v


def compare(name, spark_rows, spark_cols, oracle_rows, oracle_cols):
    issues = []
    if [c.lower() for c in sorted(spark_cols)] != [c.lower() for c in sorted(oracle_cols)]:
        issues.append(f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return issues
    if len(spark_rows) != len(oracle_rows):
        issues.append(f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    # sort columns by name; sort rows by stringified tuple for stability
    s_idx = [i for i, _ in sorted(enumerate(spark_cols), key=lambda t: t[1].lower())]
    o_idx = [i for i, _ in sorted(enumerate(oracle_cols), key=lambda t: t[1].lower())]
    s_sorted = sorted([tuple(str(normalize(r[i])) for i in s_idx) for r in spark_rows])
    o_sorted = sorted([tuple(str(normalize(r[i])) for i in o_idx) for r in oracle_rows])
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                issues.append(f"row {i}: spark={a} oracle={b}")
    if n_bad:
        issues.append(f"total mismatched rows: {n_bad}")
    return issues


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle_sql = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # STREAMING output: each row prints (and flushes) the moment it is
    # computed, so a timeout/kill preserves every completed comparison
    # instead of zeroing the whole gate (round-13 failure mode: the
    # buffered version timed out and the driver recorded `{}`).
    results = {}
    t_start = time.time()

    def emit(name, res, secs):
        results[name] = res
        flag = "OK " if res.startswith(("MATCH", "ROWS_ONLY")) else "BAD"
        print(f"[{flag}] {name}: {res} ({secs:.1f}s)", flush=True)

    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        t0 = time.time()
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        spark_cols, spark_rows = spark_rel.columns, spark_rel.fetchall()
        if name not in oracle_sql:
            emit(name, f"ROWS_ONLY rows={len(spark_rows)}", time.time() - t0)
            continue
        try:
            orel = con.sql(oracle_sql[name])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:  # noqa: BLE001
            emit(name, f"ORACLE_SQL_ERROR {e}", time.time() - t0)
            continue
        issues = compare(name, spark_rows, spark_cols, orows, ocols)
        emit(name, "MATCH rows=%d" % len(spark_rows) if not issues
             else "MISMATCH " + " | ".join(issues), time.time() - t0)

    for name in sorted(oracle_sql):
        if name not in results:
            emit(name, "MISSING_SPARK_OUTPUT", 0.0)

    n_bad = sum(1 for r in results.values()
                if not r.startswith(("MATCH", "ROWS_ONLY")))
    print(f"\n{len(results) - n_bad}/{len(results)} passing "
          f"({time.time() - t_start:.1f}s oracle wall)", flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
