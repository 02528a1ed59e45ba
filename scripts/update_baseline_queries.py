#!/usr/bin/env python3
"""Regenerate BASELINE_QUERIES.json — the per-query quiet-machine record map
that drives Bench's contended-outlier retry pass.

Usage: python3 scripts/update_baseline_queries.py bench_full_A.json [bench_full_B.json ...]

Each input is a bench_full.json written by `graft.Bench`. The output maps
query name -> the MINIMUM successful wall (seconds) observed across all
inputs — records, not averages, because the retry pass asks "is this wall
>3x anything this machine has ever done quietly", and a contended input
run only ever raises walls. Failed queries (wall -1) are skipped. Existing
entries in BASELINE_QUERIES.json are kept and min-merged, so records only
ratchet downward; delete the file to re-base (e.g. after a fixture or
hardware change that legitimately slows queries).
"""
import json
import sys
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "BASELINE_QUERIES.json")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    best: dict[str, float] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            best = json.load(f)
    for path in sys.argv[1:]:
        with open(path) as f:
            run = json.load(f)
        for name, wall in run["queries"].items():
            if wall is None or wall < 0:
                continue
            if name not in best or wall < best[name]:
                best[name] = round(wall, 3)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(best.items())), f, indent=1)
        f.write("\n")
    print(f"{OUT}: {len(best)} query records")


if __name__ == "__main__":
    main()
