#!/usr/bin/env python3
"""Regenerate BASELINE_QUERIES.json — the per-query quiet-machine record map
that drives Bench's outlier retry pass and scripts/compare_bench.py.

Usage: python3 scripts/update_baseline_queries.py bench_full_A.json [bench_full_B.json ...]

Each input is a bench_full.json written by `graft.Bench`. Since r10 every
record is an object

    {"wall": sec, "tasks": n, "shuf_w": bytes, "input": bytes,
     "cpu_sec": sec, "gc_sec": sec, ["metrics_wall": sec]}

so driver-vs-local outlier triage is arithmetic (VERDICT r9 "Next round"
#2): same bytes + bigger wall → machine; more bytes/cpu → regression.
Rules:

 - WALL is min-merged: records only ratchet downward (the retry pass asks
   "is this wall >3x anything this machine has ever done quietly", and a
   contended input run only ever raises walls). Failed queries (wall -1)
   are skipped. Delete the file to re-base after a fixture change.
 - METRICS travel with the run that set the record wall. If an existing
   record's wall is lower than every new run's (e.g. entries migrated
   from the legacy flat {"name": wall} schema, whose metrics are gone),
   the fastest metrics-bearing run's metrics are attached anyway with
   `metrics_wall` disclosing the wall of the run they came from — byte
   counts are deterministic, and a slightly-slower quiet run's cpu_sec
   is a usable reference when the alternative is none.
"""
import json
import math
import sys
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "BASELINE_QUERIES.json")

# metric fields copied from bench_full.json's per-query "metrics" objects
FIELDS = ("tasks", "shuf_w", "input", "cpu_sec", "gc_sec")


def as_record(v):
    """Normalize a legacy flat wall or an r10 record object to a dict."""
    if isinstance(v, dict):
        return dict(v)
    return {"wall": v}


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    best: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            best = {k: as_record(v) for k, v in json.load(f).items()}
    for path in sys.argv[1:]:
        with open(path) as f:
            run = json.load(f)
        metrics = dict(run.get("metrics", {}))
        walls = dict(run["queries"])
        # a retry wall is a valid quiet observation too (the retry pass
        # reruns isolated, bracketed by its own probes) — min-merge it
        for name, rec in run.get("retries", {}).items():
            rw = rec.get("retry_wall", -1)
            if rw is not None and rw > 0 and rw < walls.get(name, math.inf):
                walls[name] = rw
                if "retry_metrics" in rec:
                    metrics[name] = rec["retry_metrics"]
        for name, wall in walls.items():
            if wall is None or wall < 0:
                continue
            wall = round(wall, 3)
            met = {k: metrics.get(name, {}).get(k) for k in FIELDS}
            met = {k: v for k, v in met.items() if v is not None}
            cur = best.get(name)
            if cur is None or wall < cur["wall"]:
                if not met and cur is not None and "cpu_sec" in cur:
                    # a METRICS-LESS run (legacy bench_full.json) set a new
                    # record: keep the old metrics rather than discarding
                    # them, with metrics_wall disclosing their provenance
                    old_met = {k: cur[k] for k in FIELDS if k in cur}
                    best[name] = {"wall": wall, **old_met,
                                  "metrics_wall": cur.get("metrics_wall",
                                                          cur["wall"])}
                else:
                    # new record: wall and metrics from the same run
                    best[name] = {"wall": wall, **met}
            elif met and wall < cur.get(
                    "metrics_wall",
                    cur["wall"] if "cpu_sec" in cur else math.inf):
                # record wall stands, but this run's metrics are from a
                # faster run than the current metrics' provenance (or the
                # record has none at all, post-migration)
                best[name] = {"wall": cur["wall"], **met, "metrics_wall": wall}
    with open(OUT, "w") as f:
        json.dump(dict(sorted(best.items())), f, indent=1)
        f.write("\n")
    n_met = sum(1 for v in best.values() if "cpu_sec" in v)
    print(f"{OUT}: {len(best)} query records, {n_met} with metrics")


if __name__ == "__main__":
    main()
