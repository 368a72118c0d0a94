"""Refresh BASELINE_LOCAL.json = per-query min across bench runs.

The regression gate in bench.py compares against this floor; keeping
it at the all-time best (judge round-3 directive: "refresh to
min(r1..rN)") makes the floor honest — a floor that only ever ratchets
down can't hide a real regression behind a slow round.

Only accepts runs at the floor's scale factor. New queries enter the
floor at their first measured time.

Usage: python tools/refresh_baseline.py BENCH_rXX.json [more.json ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASE = ROOT / "BASELINE_LOCAL.json"


def main() -> None:
    base = json.loads(BASE.read_text())
    merged = dict(base["queries"])
    sources = [base.get("source", "prior")]
    for arg in sys.argv[1:]:
        run = json.loads(Path(arg).read_text())
        if run.get("sf") != base.get("sf"):
            print(f"skip {arg}: sf {run.get('sf')} != baseline sf {base.get('sf')}")
            continue
        updated = 0
        for q, t in run.get("queries", {}).items():
            if q not in merged or t < merged[q]:
                merged[q] = t
                updated += 1
        sources.append(Path(arg).stem)
        print(f"{arg}: {updated} floors lowered/added")
    base["queries"] = dict(sorted(merged.items()))
    base["source"] = "min(" + ", ".join(sources) + ")"
    BASE.write_text(json.dumps(base, indent=1) + "\n")
    print(f"BASELINE_LOCAL.json: {len(merged)} queries")


if __name__ == "__main__":
    main()
