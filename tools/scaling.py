#!/usr/bin/env python3
"""Build the BENCH_SCALING table from graft.Bench sweep JSONs.

Usage: python3 tools/scaling.py out.md label1=sweepA.json[,sweepB.json] label2=...

Each label is a scale-factor column (e.g. sf0.001); multiple
comma-separated sweeps per label are reduced elementwise by min (the
round-6 noise protocol). Ratios rN are printed between consecutive
columns. Queries missing from a sweep (or failed, -1) show as "-".
"""
import json
import sys


def load(paths):
    merged = {}
    for p in paths.split(","):
        d = json.load(open(p))
        for q, v in d["queries"].items():
            if v is None or v < 0:
                continue
            merged[q] = min(merged.get(q, float("inf")), v)
    return merged


def main(out, cols):
    labels, data = [], []
    for spec in cols:
        label, paths = spec.split("=", 1)
        labels.append(label)
        data.append(load(paths))
    queries = sorted(set().union(*[d.keys() for d in data]))
    ratio_names = [f"r{i+1}{i}" for i in range(1, len(labels))]

    def row(q):
        vals = [d.get(q) for d in data]
        cells = [f"{v:.3f}" if v is not None else "-" for v in vals]
        for i in range(1, len(vals)):
            if vals[i] is not None and vals[i - 1]:
                cells.append(f"{vals[i] / vals[i - 1]:.2f}")
            else:
                cells.append("-")
        return vals, cells

    # sort by the LAST ratio (the least overhead-dominated step), desc
    def sort_key(q):
        vals, _ = row(q)
        if vals[-1] is not None and vals[-2]:
            return -(vals[-1] / vals[-2])
        return 0.0

    lines = []
    header = ["query"] + [f"{l} s" for l in labels] + ratio_names
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + " --- |" * len(header))
    for q in sorted(queries, key=sort_key):
        _, cells = row(q)
        lines.append("| " + " | ".join([q] + cells) + " |")
    totals = ["totals (ran)"] + [
        f"{sum(d.values()):.1f} ({len(d)})" for d in data] + [""] * len(ratio_names)
    lines.append("| " + " | ".join(totals) + " |")
    body = "\n".join(lines) + "\n"
    if out == "-":
        print(body)
    else:
        open(out, "w").write(body)
        print(f"wrote {out}: {len(queries)} queries x {len(labels)} columns")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
