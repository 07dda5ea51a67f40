#!/usr/bin/env python3
"""Compare two full-catalog bench JSONs (e.g. sf0.1 vs sf10) and emit
the ratio table SCALING.md records: per-query ratio, worst N, median,
flagged super-linear outliers.

Usage: python3 scripts/scale_compare.py <base.json> <scaled.json> [factor]
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {}
    for k, v in d["queries"].items():
        if isinstance(v, list):
            vals = [x for x in v if x >= 0]
            if vals:
                qs[k] = min(vals)
        elif v >= 0:
            qs[k] = v
    return d, qs


def main():
    base_path, scaled_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    bmeta, base = load(base_path)
    smeta, scaled = load(scaled_path)
    shared = sorted(set(base) & set(scaled))
    only_scaled = sorted(set(scaled) - set(base))
    ratios = {q: scaled[q] / max(base[q], 1e-4) for q in shared}
    med = statistics.median(ratios.values())
    print(f"base: {bmeta['sf']}  scaled: {smeta['sf']}  factor: {factor:.0f}x")
    print(f"shared queries: {len(shared)}  new-only: {len(only_scaled)}")
    print(f"scaled totals: {sum(scaled.values()):.1f}s  "
          f"contaminated={smeta.get('contaminated')}  "
          f"noisy={smeta.get('noisy_queries')}  "
          f"shared_cache={smeta.get('shared_cache_sec')}s")
    print(f"median ratio: {med:.2f}x   over-factor (super-linear): "
          f"{sum(1 for r in ratios.values() if r > factor)}")
    print("\nworst 15 by ratio:")
    for q in sorted(shared, key=lambda q: -ratios[q])[:15]:
        print(f"  {q:35s} {base[q]:8.3f} -> {scaled[q]:9.3f}  {ratios[q]:7.1f}x")
    print("\nslowest 10 at scale:")
    for q in sorted(shared, key=lambda q: -scaled[q])[:10]:
        print(f"  {q:35s} {scaled[q]:9.3f}s  ({ratios[q]:.1f}x)")
    if only_scaled:
        print("\nqueries only in scaled run:")
        for q in only_scaled:
            print(f"  {q:35s} {scaled[q]:9.3f}s")


if __name__ == "__main__":
    main()
