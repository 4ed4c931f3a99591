"""Aggregate seed-replicated advantage-demo runs into mean +- spread
tables (VERDICT r4 weak #4: every bolded win must exceed its spread).

Usage: python aggregate_advantage.py 'round5_logs/adv_x16_300_s*.json' ...
Each glob group is one (config, budget) row set; seeds come from the
files. Prints a markdown table and a machine-readable JSON line per
group: arm -> {mean, min, max, n, vals}; plus pairwise margins vs brecq
with the noise floor (sum of half-ranges).
"""
import glob
import json
import sys

import numpy as np


def load_group(pattern):
    arms = {}
    for path in sorted(glob.glob(pattern)):
        d = json.load(open(path))
        for r in d.get("runs", []):
            if not r.get("final"):
                continue
            arms.setdefault(r["tag"], []).append(
                (path, float(r["final"]["top1"])))
    return arms


def main():
    for pattern in sys.argv[1:]:
        arms = load_group(pattern)
        if not arms:
            print(f"## {pattern}: no runs")
            continue
        print(f"\n## {pattern} ({max(len(v) for v in arms.values())} seeds)")
        print("| arm | top-1 mean | min | max | spread (half-range) |")
        print("|---|---|---|---|---|")
        stats = {}
        for tag, vals in sorted(arms.items()):
            a = np.asarray([v for _, v in vals])
            stats[tag] = {"mean": float(a.mean()), "min": float(a.min()),
                          "max": float(a.max()), "n": int(a.size),
                          "vals": [round(float(v), 2) for v in a]}
            print(f"| {tag} | {a.mean():.2f} | {a.min():.2f} | "
                  f"{a.max():.2f} | {(a.max() - a.min()) / 2:.2f} |")
        if "brecq" in stats:
            base = stats["brecq"]
            for tag, st in stats.items():
                if tag == "brecq":
                    continue
                margin = st["mean"] - base["mean"]
                floor = (st["max"] - st["min"]) / 2 \
                    + (base["max"] - base["min"]) / 2
                clears = abs(margin) > floor
                print(f"- {tag} vs brecq: {margin:+.2f} "
                      f"(noise floor {floor:.2f}) -> "
                      f"{'CLEARS' if clears else 'within'} noise")
        print(json.dumps({"pattern": pattern, "stats": stats}))


if __name__ == "__main__":
    main()
