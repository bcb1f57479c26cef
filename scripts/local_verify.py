#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only — the
shipped library has no Python dependency).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 scripts/local_verify.py /root/testdata/sf0.01 /tmp/graft_verify

Mirrors the documented driver behavior: for each query, read the engine's
parquet output and run the oracle SQL in DuckDB over the same tables, sort
columns by name, canonically sort rows, and compare values.
"""
import json
import math
import os
import re
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.10g}"
        return str(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, x if x is not None else "") for x in t))
    return [c for _, c in sorted(zip(range(len(cols)), cols), key=lambda p: cols[p[0]])], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # filtered Verify run (3rd arg): queries outside the filter
            # have no dump — a dev-loop SKIP, not a correctness FAIL
            n_skip += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            my_cols = list(mine.columns)
            my_types = [str(t) for t in mine.types]
            my_rows = mine.fetchall()
            m = re.match(r"^(\s*(?:SET\s+[^;']*(?:'[^']*'[^;']*)*;\s*)*)", sql)
            if m.group(1).strip():
                con.execute(m.group(1))  # SET memory/threads/spill posture
            oracle = con.sql(sql[m.end(1):])
            or_cols = list(oracle.columns)
            or_types = [str(t) for t in oracle.types]
            or_rows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        # Type-kind guard: the driver's gate may fetch via pandas, where
        # DuckDB HUGEINT/DECIMAL render as float64 ("727.0") while the
        # engine's BIGINT renders "727" — rows+schema match but the hash
        # doesn't (the r6/r7 q197+q254 flake). fetchall() hides this
        # (HUGEINT -> Python int), so check declared types explicitly:
        # any sum()/product-derived oracle column must be CAST to BIGINT
        # or DOUBLE in OracleSql.scala.
        def kind(t):
            t = str(t).upper()
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
                return "HUGE"
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t
        my_kinds = {c: kind(t) for c, t in zip(my_cols, my_types)}
        or_kinds = {c: kind(t) for c, t in zip(or_cols, or_types)}
        huge = [c for c, k in or_kinds.items() if k == "HUGE"]
        kind_diff = [c for c in my_kinds
                     if c in or_kinds and my_kinds[c] != or_kinds[c]]
        if huge or kind_diff:
            print(f"FAIL {name}: TYPE HAZARD — oracle HUGEINT/DECIMAL cols "
                  f"{huge}, kind mismatches {kind_diff} "
                  f"(pandas-fetch drivers render these as floats)")
            n_fail += 1
            continue
        mc, mr = canon(my_rows, my_cols)
        oc, orr = canon(or_rows, or_cols)
        if mc != oc:
            print(f"FAIL {name}: columns {mc} vs oracle {oc}")
            n_fail += 1
        elif len(mr) != len(orr):
            print(f"FAIL {name}: {len(mr)} rows vs oracle {len(orr)}")
            n_fail += 1
        elif mr != orr:
            bad = next(i for i in range(len(mr)) if mr[i] != orr[i])
            print(f"FAIL {name}: first diff at sorted row {bad}:\n  mine   {mr[bad]}\n  oracle {orr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mr)} rows")
            n_pass += 1
    skip = f", {n_skip} skipped (no dump)" if n_skip else ""
    # Canonicalization drift across DuckDB releases is unattributable
    # without this (VERDICT r9/r10 driver ask, applied to our own gate).
    print(f"== {n_pass} pass, {n_fail} fail{skip} == "
          f"(duckdb {duckdb.__version__})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
