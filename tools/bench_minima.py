#!/usr/bin/env python3
"""Arbitrate two or more graft.Bench JSON captures (dev tool).

The recorded discipline (BASELINE.md): never compare single bench
totals across days on this host — single runs inflate 1.5-3x under
load. The band is the PER-QUERY MINIMA across 2+ runs. This tool takes
the bench JSON lines (the `{"metric":"total",...,"queries":{...}}`
one) and prints:
  - per-run totals and the minima total (the band number)
  - the slowest-10 from the minima
  - a drift report: queries whose max/min ratio across runs exceeds
    2x (load ghosts — the theil_sen/setsim_join markers read here)

Usage: python3 tools/bench_minima.py run1.json run2.json [run3.json...]
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{') and '"queries"' in line:
                return json.loads(line)['queries']
    raise SystemExit(f"{path}: no bench JSON line with a queries map")


def main(paths):
    runs = [load(p) for p in paths]
    keys = set(runs[0])
    for i, r in enumerate(runs[1:], 2):
        if set(r) != keys:
            print(f"WARN: run {i} has a different query set "
                  f"(+{len(set(r) - keys)}/-{len(keys - set(r))}); "
                  "comparing the intersection")
            keys &= set(r)
    # Bench records a failed query as -1.0; a failure is NOT a fast run,
    # so drop non-positive samples before taking the min — otherwise one
    # transient failure silently deflates the band total and corrupts
    # the slowest-10 ranking.
    mins = {}
    for k in keys:
        ok = [r[k] for r in runs if r[k] > 0]
        if not ok:
            print(f"WARN: {k} failed in every run (excluded from the band)")
            continue
        mins[k] = min(ok)
    for p, r in zip(paths, runs):
        print(f"run total {sum(r[k] for k in keys):8.1f} s  {p}")
    print(f"MINIMA total {sum(mins.values()):6.1f} s over {len(mins)} queries"
          " (the band number)")
    print("slowest-10 (minima):")
    for k, v in sorted(mins.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {v:6.2f}  {k}")
    drifted = []
    for k in keys:
        vals = [r[k] for r in runs]
        if min(vals) > 0.2 and max(vals) / min(vals) > 2.0:
            drifted.append((max(vals) / min(vals), k, min(vals), max(vals)))
    if drifted:
        print("drift > 2x between runs (load ghosts — trust the minima):")
        for ratio, k, lo, hi in sorted(drifted, reverse=True)[:15]:
            print(f"  {ratio:4.1f}x  {k}  {lo:.2f} -> {hi:.2f}")
    else:
        print("no query drifted > 2x between runs (both runs quiet)")


if __name__ == '__main__':
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
