#!/usr/bin/env python3
"""Dev-only harness that mirrors the driver's t2 correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark). This script
exists so oracle SQL in SparkEntry.oracleSql can be validated locally before
the driver runs it: it loads each Verify output parquet and the corresponding
DuckDB oracle result, sorts columns by name, and compares values.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import decimal
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v, int_col=False):
    # int_col: the PAIRED Spark column is integer-typed, so an oracle-side
    # integral DECIMAL/float must normalize as an exact int, not through the
    # sig-digit float class — a DuckDB DECIMAL 1234567 against a Spark
    # BIGINT 1234567 used to land as '1.23457e+06' vs '1234567' and falsely
    # FAIL (ADVICE r10); exactness above 2^53 is also preserved this way.
    # Floats compare at 12 significant digits (was 6): at the 1e8-1e9
    # magnitude of round(sum(price),2) outputs, 6 digits cannot see cent
    # drift — both r15 driver failures (a real Spark-vs-DuckDB round()
    # halfway divergence summing to +0.04, and a HUGEINT-typed oracle sum)
    # were green under 6g locally and red at the driver. 12g resolves
    # cents at 1e9 (1e-11 relative) while staying above the ~1e-12
    # relative noise of order-dependent double summation over ~1e4 rows.
    if int_col and type(v) in (float, decimal.Decimal) and v == int(v):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        # route decimals through the SAME 12-sig-digit normalization as
        # floats: Spark results read back from parquet are DOUBLE, so a
        # DuckDB decimal-typed cell of the same logical value must land in
        # the float tolerance class, not compare at full precision
        return f"{float(v):.12g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def int_col_flags(rows, cols):
    """Per-column: every non-null Spark-side cell is a python int (bool is
    an int subclass — excluded). These columns drive exact-int
    normalization on BOTH sides of the compare."""
    flags = {}
    for i, c in enumerate(cols):
        vals = [r[i] for r in rows if r[i] is not None]
        flags[c] = bool(vals) and all(type(x) is int for x in vals)
    return flags


def table_key(rows, cols, flags):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm(r[i], flags.get(cols[i], False)) for i in order)
        for r in rows)



def sweep_stale(out_dir, name):
    """r19 stale-dump trap, mechanical: a FULL graft.Verify sweep writes
    _sweep_started before dumping its first key, so a key dir whose mtime
    predates the stamp is a LEFTOVER from an earlier run (the
    /tmp/verify_sf10 persistence trap), not part of this sweep."""
    stamp = os.path.join(out_dir, "_sweep_started")
    if not os.path.exists(stamp):
        return False  # pre-stamp dump; warned at startup
    d = os.path.join(out_dir, name)
    return os.path.exists(d) and os.path.getmtime(d) < os.path.getmtime(stamp)


def warn_if_unstamped(out_dir):
    if not os.path.exists(os.path.join(out_dir, "_sweep_started")):
        print("WARNING: no _sweep_started stamp in dump dir -- dump "
              "freshness CANNOT be verified (pre-r20 dump?); stale key "
              "dirs from earlier runs would pass silently", flush=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    warn_if_unstamped(out_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if sweep_stale(out_dir, name):
            print(f"FAIL {name}: STALE dump dir (predates _sweep_started)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        flags = int_col_flags(got_rows, got_cols)
        g = table_key(got_rows, got_cols, flags)
        e = table_key(exp_rows, exp_cols, flags)
        if g != e:
            bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {g[bad]}")
            print(f"  oracle: {e[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
