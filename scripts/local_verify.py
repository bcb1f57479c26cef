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
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            mine = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            my_cols = [d[0] for d in mine.description]
            my_rows = mine.fetchall()
            oracle = con.execute(sql)
            or_cols = [d[0] for d in oracle.description]
            or_rows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
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
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
