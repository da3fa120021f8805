#!/usr/bin/env python3
"""Dev-only FAST variant of oracle_check.py for huge-row results.

Same inputs, but the compare runs INSIDE DuckDB: per key it computes
(row_count, order-independent sum of per-row 64-bit hashes over a
normalized projection) for both the Spark dump and the oracle query and
compares the signatures — no python-side row materialization, so a
15M-row result costs seconds instead of minutes. Normalization mirrors
oracle_check.py: columns ordered by name; float/decimal -> %.12g of the
DOUBLE value; integer-family (per the SPARK dump's schema) -> BIGINT
text; everything else -> VARCHAR cast; NULL -> marker. Any FAIL here
should be re-checked with the exact row-wise oracle_check.py before
acting on it (hash-sum collisions are negligible but the normalization
corners differ slightly, e.g. list rendering).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def fresh_con(sf_dir):
    con = duckdb.connect()
    # a per-key connection: one oracle query OOMing must not poison the
    # rest of the sweep; spill to disk instead of dying where possible
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # list-heavy vector oracles (knn/pq families) OOM'd DuckDB's 100 GiB
    # budget at sf10 under the default 32 threads (per-thread buffers on
    # list-native plans amplify peak memory); 8 threads + relaxed ordering
    # complete the same queries comfortably (r20 probe)
    con.execute("SET threads=8")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con



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


def main(sf_dir, out_dir, only=None):
    warn_if_unstamped(out_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if sweep_stale(out_dir, name):
            print(f"FAIL {name}: STALE dump dir (predates _sweep_started)")
            n_fail += 1
            continue
        try:
            con = fresh_con(sf_dir)
            dump = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            cols = con.execute(f"DESCRIBE {dump}").fetchall()
            parts = []
            for c, typ in sorted((r[0], r[1]) for r in cols):
                q = f'"{c}"'
                tu = typ.upper()
                if any(k in tu for k in ("DOUBLE", "FLOAT", "DECIMAL", "REAL")):
                    e = f"printf('%.12g', CAST({q} AS DOUBLE))"
                elif tu in INT_TYPES:
                    e = f"CAST(CAST({q} AS BIGINT) AS VARCHAR)"
                else:
                    e = f"CAST({q} AS VARCHAR)"
                parts.append(f"coalesce({e}, chr(1))")
            proj = ", ".join(parts)

            def sig(src):
                return con.execute(
                    "SELECT count(*), coalesce(sum(CAST(hash(concat_ws('|', "
                    f"{proj})) AS HUGEINT)), 0) FROM ({src})").fetchone()
            g, e = sig(dump), sig(sql)
        except Exception as exc:
            print(f"FAIL {name}: error {exc}")
            n_fail += 1
            continue
        finally:
            try:
                con.close()
            except Exception:
                pass
        if g != e:
            print(f"FAIL {name}: signature spark={g} oracle={e}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({g[0]} rows)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
