#!/usr/bin/env python3
"""Compare two graft.Bench JSON dumps (baseline sf vs a scale-probe sf)
and print a per-query scaling table, worst ratio first (dev tool only).

Usage: python3 scripts/scale_ratio_table.py base.json probe.json \
           [--md] [--decades N]

Ratios are probe_median / base_median. With --decades N (data grew
10^N x), a per-decade ratio column ratio^(1/N) is added — the number
to hold at-or-under ~10 for "linear in the data". Queries with
sub-0.15 s base medians are grouped in a coda (JVM/fixed-overhead
floor dominates — a 10x "ratio" of a 40 ms query measures noise, not
scaling).
"""
import json
import sys


def main(base_path, probe_path, md=False, decades=1):
    base = json.load(open(base_path))
    probe = json.load(open(probe_path))
    bq, pq = base["queries"], probe["queries"]
    missing = sorted(set(bq) - set(pq))
    extra = sorted(set(pq) - set(bq))
    # A failed query is encoded as median -1.0 in bench.json; it is NOT
    # data — a -1 base would clamp to 1e-9 and print an absurd ratio,
    # and negative values skew the sums. Report them separately.
    failed_rows = sorted(n for n in set(bq) & set(pq)
                         if bq[n] < 0 or pq[n] < 0)
    rows = []
    for name in sorted(set(bq) & set(pq)):
        b, p = bq[name], pq[name]
        if b < 0 or p < 0:
            continue
        rows.append((p / max(b, 1e-9), b, p, name))
    rows.sort(reverse=True)

    sig = [r for r in rows if r[1] >= 0.15]
    tiny = [r for r in rows if r[1] < 0.15]

    def pd(r):
        return r ** (1.0 / decades)

    if md:
        dcol = " per-decade |" if decades > 1 else ""
        print(f"| Query | base s | probe s | ratio |{dcol}")
        print("|---|---|---|---|" + ("---|" if decades > 1 else ""))
        for r, b, p, n in sig:
            dtxt = f" {pd(r):.1f}x |" if decades > 1 else ""
            print(f"| {n} | {b:.2f} | {p:.2f} | {r:.1f}x |{dtxt}")
    else:
        dhdr = f"{'per-dec':>9}" if decades > 1 else ""
        print(f"{'query':<38}{'base':>8}{'probe':>9}{'ratio':>8}{dhdr}")
        for r, b, p, n in sig:
            flag = "  <-- SUPERLINEAR?" if pd(r) > 12 else ""
            dtxt = f"{pd(r):>8.1f}x" if decades > 1 else ""
            print(f"{n:<38}{b:>8.2f}{p:>9.2f}{r:>7.1f}x{dtxt}{flag}")
    bsum = sum(r[1] for r in rows)
    psum = sum(r[2] for r in rows)
    print(f"\n{len(rows)} queries compared; sums {bsum:.1f}s -> {psum:.1f}s "
          f"({psum / bsum:.1f}x overall)")
    if tiny:
        tworst = max(tiny)
        print(f"{len(tiny)} sub-0.15s-base queries (fixed-cost floor): "
              f"base sum {sum(r[1] for r in tiny):.1f}s -> probe sum "
              f"{sum(r[2] for r in tiny):.1f}s; worst probe-side "
              f"{tworst[3]} {tworst[2]:.2f}s")
        slow_tiny = [r for r in tiny if r[2] > 2.0]
        for r, b, p, n in sorted(slow_tiny, reverse=True, key=lambda x: x[2]):
            print(f"  tiny-base but slow at probe: {n} {b:.2f}s -> {p:.2f}s")
    if missing:
        print(f"MISSING from probe ({len(missing)}): {missing}")
    if extra:
        print(f"EXTRA in probe ({len(extra)}): {extra}")
    if failed_rows:
        print(f"FAILED on one side, excluded from ratios "
              f"({len(failed_rows)}): {failed_rows}")
    if base.get("failed"):
        print(f"BASE FAILURES: {base['failed']}")
    if probe.get("failed"):
        print(f"PROBE FAILURES: {probe['failed']}")


USAGE = ("usage: scale_ratio_table.py BASE.json PROBE.json"
         " [--md] [--decades N]")

if __name__ == "__main__":
    argv = sys.argv[1:]
    decades = 1
    if "--decades" in argv:
        i = argv.index("--decades")
        try:
            decades = int(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit(f"{USAGE}\n--decades needs an integer value")
        del argv[i:i + 2]
    args = [a for a in argv if a != "--md"]
    if len(args) < 2:
        sys.exit(USAGE)
    main(args[0], args[1], md="--md" in argv, decades=decades)
