#!/usr/bin/env python3
"""Cross-check graft.Verify's canonical-hash sidecars (dev tool).

Recomputes each query's canonical md5 IN PYTHON from the parquet dump
— same recipe as scripts/local_verify.py's canon() plus the serialization
documented in tools/Canon.scala — and compares it to the .hash sidecar
the Scala side wrote. All-match proves the two implementations agree
bit-for-bit on real data (float %.10g rendering, timestamps, bools,
nulls, row/column ordering), so a driver-side mismatch can be pinned to
input rows rather than recipe drift.

Usage: python3 scripts/check_sidecars.py /tmp/graft_verify
"""
import glob
import hashlib
import math
import os
import sys

import duckdb


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def esc(s):
    return (s.replace("\\", "\\\\").replace("\n", "\\n")
             .replace("\x1f", "\\u001f").replace("\x00", "\\0"))


def canon_md5(path):
    rel = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort(key=lambda t: tuple((x is None, x if x is not None else "")
                                  for x in t))
    md = hashlib.md5()
    md.update("\x1f".join(cols[i] for i in order).encode() + b"\n")
    for r in rows:
        md.update("\x1f".join("\x00" if c is None else esc(c)
                              for c in r).encode() + b"\n")
    return md.hexdigest(), len(rows)


def main(out_dir):
    n_ok = n_bad = 0
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        sidecar = f"{d}.hash"
        if not os.path.exists(sidecar):
            print(f"MISS {name}: no sidecar")
            n_bad += 1
            continue
        want = dict(line.split("=", 1) for line in
                    open(sidecar).read().splitlines() if "=" in line)
        if "md5" not in want or "rows" not in want:
            # truncated/malformed sidecar: report, don't crash the sweep
            print(f"DIFF {name}: malformed sidecar (missing md5/rows key)")
            n_bad += 1
            continue
        got_md5, got_rows = canon_md5(d)
        if got_md5 == want["md5"] and str(got_rows) == want["rows"]:
            n_ok += 1
        else:
            print(f"DIFF {name}: python {got_md5}/{got_rows} "
                  f"vs sidecar {want['md5']}/{want['rows']}")
            n_bad += 1
    print(f"== {n_ok} sidecars match, {n_bad} differ ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("usage: check_sidecars.py <verify-out-dir>", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
