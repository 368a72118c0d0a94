"""Render the scaling tables for SCALE.md from .scale/report.json.

Prints markdown to stdout; SCALE.md wraps these tables with analysis.
Usage: python tools/render_scale_md.py [.scale/report.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else ".scale/report.json"
    r = json.load(open(path))
    sfs = sorted(r["sfs"], key=float)
    base = sfs[0]
    t0 = r["sfs"][base]["timings"]

    print(f"### Per-query wall time (sec, min of {r['n_runs']} runs, local[{r['cpus']}])\n")
    header = "| query | " + " | ".join(f"sf{s}" for s in sfs)
    header += " | " + " | ".join(f"x({sfs[i]}→{sfs[i+1]})" for i in range(len(sfs) - 1)) + " |"
    print(header)
    print("|" + "---|" * (header.count("|") - 1))
    rows = []
    for q in t0:
        vals = [r["sfs"][s]["timings"].get(q) for s in sfs]
        ratios = [
            (vals[i + 1] / vals[i]) if (vals[i] and vals[i + 1]) else None
            for i in range(len(sfs) - 1)
        ]
        rows.append((q, vals, ratios))
    rows.sort(key=lambda x: -(x[1][-1] or x[1][-2] or 0))
    for q, vals, ratios in rows:
        cells = [f"{v:.2f}" if v is not None else "—" for v in vals]
        cells += [f"{x:.1f}" if x is not None else "—" for x in ratios]
        print(f"| {q} | " + " | ".join(cells) + " |")
    totals = []
    for s in sfs:
        t = r["sfs"][s]["timings"]
        shared = [q for q in t if q in t0]
        totals.append(sum(t[q] for q in shared))
    print(
        "\nTotals (shared queries): "
        + ", ".join(f"sf{s}: {tt:.1f}s" for s, tt in zip(sfs, totals))
    )

    print("\n### Candidate-count telemetry\n")
    keys = [k for k in r["sfs"][base]["telemetry"]]
    header = "| metric | " + " | ".join(f"sf{s}" for s in sfs) + " | growth |"
    print(header)
    print("|" + "---|" * (header.count("|") - 1))
    for k in keys:
        vals = [r["sfs"][s]["telemetry"].get(k) for s in sfs]
        cells = [f"{v:,}" if v is not None else "—" for v in vals]
        nums = [v for v in vals if v]
        growth = f"{nums[-1] / nums[0]:.1f}x" if len(nums) > 1 and nums[0] else "—"
        print(f"| {k} | " + " | ".join(cells) + f" | {growth} |")


if __name__ == "__main__":
    main()
