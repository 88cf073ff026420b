"""Tabulate the full 36-size -t sweep against the reference's artifacts.

Reads our chrono CSVs (data/measures/benchmark_V_C.txt, written by
`python -m simplex_tpu.cli -t --timer`) and the reference's vendored
per-iteration CSVs (data/reference_measures/benchmark_V_C.txt, one
`solve` row PER PIVOT — reference main.cu:59-73 artifacts), and prints a
markdown table: per size, our phase pivots + solve seconds vs the
reference GPU's, and the end-to-end speedup.

Phases are distinguished by the CSV's `vars` column (n+2m+1 rows =
phase 1, n+m+1 = phase 2, matching the reference's shrinking tableau).

Usage: python tools/sweep_table.py [--ours data/measures]
       [--ref data/reference_measures] [--label "f64 exact"]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys


def read_ours(path: pathlib.Path):
    """{(p1_pivots, p2_pivots, solve_s, total_s)} from an aggregate CSV."""
    per_phase = {}      # vars -> dict op -> value
    total = 0.0
    with path.open() as f:
        for row in csv.DictReader(f):
            v = int(row["vars"])
            op = row["operation"]
            el = float(row["elapsed_time"])
            per_phase.setdefault(v, {}).setdefault(op, 0.0)
            per_phase[v][op] += el
            if op != "solveIterations":     # a count, not a time
                total += el
    phases = sorted(per_phase, reverse=True)     # phase1 has more rows
    if not phases:
        return None                              # in-progress / empty file
    p1 = per_phase[phases[0]]
    p2 = per_phase[phases[1]] if len(phases) > 1 else {}
    return (int(p1.get("solveIterations", 0)),
            int(p2.get("solveIterations", 0)),
            (p1.get("solve", 0.0) + p2.get("solve", 0.0)) / 1e6,
            total / 1e6)


def read_reference(path: pathlib.Path):
    """(p1_pivots, p2_pivots, solve_s, total_s) from a per-pivot CSV."""
    counts = {}
    solve_us = 0.0
    total_us = 0.0
    with path.open() as f:
        for row in csv.DictReader(f):
            v = int(row["vars"])
            el = float(row["elapsed_time"])
            total_us += el
            if row["operation"] == "solve":
                counts[v] = counts.get(v, 0) + 1
                solve_us += el
    phases = sorted(counts, reverse=True)
    p1 = counts[phases[0]] if phases else 0
    p2 = counts[phases[1]] if len(phases) > 1 else 0
    return p1, p2, solve_us / 1e6, total_us / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="data/measures")
    ap.add_argument("--ref", default="data/reference_measures")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    ours_dir = pathlib.Path(args.ours)
    ref_dir = pathlib.Path(args.ref)

    rows = []
    for ours in sorted(ours_dir.glob("benchmark_*.txt"),
                       key=lambda p: tuple(map(int, p.stem.split("_")[1:]))):
        v, c = map(int, ours.stem.split("_")[1:])
        ref = ref_dir / ours.name
        o = read_ours(ours)
        if o is None:
            continue
        r = read_reference(ref) if ref.exists() else None
        rows.append((v, c, o, r))

    label = f" ({args.label})" if args.label else ""
    print(f"| n × m | pivots{label} p1+p2 | ref pivots p1+p2 "
          f"| solve s{label} | ref solve s | speedup |")
    print("|---|---|---|---|---|---|")
    for v, c, o, r in rows:
        op1, op2, osolve, _ = o
        if r:
            rp1, rp2, rsolve, _ = r
            sp = f"{rsolve / osolve:.1f}×" if osolve > 0 else "—"
            print(f"| {v}×{c} | {op1}+{op2} | {rp1}+{rp2} "
                  f"| {osolve:.2f} | {rsolve:.2f} | {sp} |")
        else:
            print(f"| {v}×{c} | {op1}+{op2} | — | {osolve:.2f} | — | — |")
    print(f"\n{len(rows)} sizes", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
