#!/usr/bin/env python3
"""Classify bench outliers against the quiet-machine metrics records.

Usage: python3 scripts/compare_bench.py bench_full.json \
           [--baseline BASELINE_QUERIES.json] [--threshold 2.0] [--json out.json]

For every query whose wall exceeds `threshold` x its BASELINE_QUERIES.json
record, diff the run's executor metrics against the record's and emit a
verdict (VERDICT r9 "Next round" #2 — turn "driver wall >> local, probes
nominal" from a dispute into arithmetic):

  more-bytes   shuffle/input bytes or task count grew vs the record →
               a real plan/fixture regression; go read the plan.
  more-cpu-gc  same bytes but cpu_sec grew >=1.5x AND gc_sec explains
               >=25% of executor occupancy → allocation/heap pressure
               (r9's leading hypothesis for q60/q121/q88).
  more-cpu     same bytes, cpu grew, gc does not explain it → slower
               per-byte execution or cpu-accounting difference (SMT
               density — cpu_sec inflates ~2x under full 32-thread load).
  same-work    same bytes, same cpu → the machine's I/O/scheduling path
               was slower; contention, not regression.
  no-record    the baseline entry predates metrics records; re-run
               scripts/update_baseline_queries.py on a quiet bench.

Byte counts are deterministic per (query, SF); cpu_sec varies with load,
so the bytes verdict is the trustworthy one and the cpu verdicts carry
their evidence (ratios, gc share) for a human read.
"""
import argparse
import json
import math
import os

DEF_BASELINE = os.path.join(os.path.dirname(__file__), "..", "BASELINE_QUERIES.json")


def ratio(run, base):
    """run/base with 0/0 -> 1 and x/0 -> inf (x>0)."""
    if not base:
        return 1.0 if not run else math.inf
    return run / base


def classify(name, wall, record, met):
    base_wall = record["wall"]
    wall_ratio = wall / base_wall
    if "cpu_sec" not in record or not met:
        return {"query": name, "wall": wall, "record_wall": base_wall,
                "wall_ratio": round(wall_ratio, 2), "verdict": "no-record"}
    bytes_ratio = max(ratio(met.get("shuf_w", 0), record.get("shuf_w", 0)),
                      ratio(met.get("input", 0), record.get("input", 0)))
    tasks_ratio = ratio(met.get("tasks", 0), record.get("tasks", 0))
    cpu_ratio = ratio(met.get("cpu_sec", 0.0), record.get("cpu_sec", 0.0))
    run_sec = met.get("run_sec", 0.0)
    gc_share = met.get("gc_sec", 0.0) / run_sec if run_sec else 0.0
    if bytes_ratio > 1.3 or tasks_ratio > 1.5:
        verdict = "more-bytes"
    elif cpu_ratio > 1.5:
        verdict = "more-cpu-gc" if gc_share >= 0.25 else "more-cpu"
    else:
        verdict = "same-work"
    return {"query": name, "wall": wall, "record_wall": base_wall,
            "wall_ratio": round(wall_ratio, 2),
            "bytes_ratio": round(bytes_ratio, 2),
            "tasks_ratio": round(tasks_ratio, 2),
            "cpu_sec": met.get("cpu_sec"), "record_cpu_sec": record.get("cpu_sec"),
            "cpu_ratio": round(cpu_ratio, 2), "gc_share": round(gc_share, 3),
            "metrics_wall": record.get("metrics_wall"),
            "verdict": verdict}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--baseline", default=DEF_BASELINE)
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--json", dest="out")
    args = ap.parse_args()

    with open(args.bench) as f:
        run = json.load(f)
    with open(args.baseline) as f:
        base = {k: (v if isinstance(v, dict) else {"wall": v})
                for k, v in json.load(f).items()}

    retries = run.get("retries", {})
    rows = []
    for name, wall in sorted(run["queries"].items()):
        if wall is None or wall < 0 or name not in base:
            continue
        # adjudicate on the HEALED wall: a retry that matched the record
        # already proves transience, no classification needed
        retry_wall = retries.get(name, {}).get("retry_wall")
        eff_wall = min(wall, retry_wall) if retry_wall and retry_wall > 0 else wall
        if eff_wall <= args.threshold * base[name]["wall"]:
            continue
        met = run.get("metrics", {}).get(name, {})
        if retry_wall and retry_wall > 0 and retry_wall < wall:
            met = retries.get(name, {}).get("retry_metrics", met)
        row = classify(name, eff_wall, base[name], met)
        if retry_wall is not None:
            row["first_wall"] = wall
            row["retry_wall"] = retry_wall
        rows.append(row)

    covered = [n for n, w in run["queries"].items()
               if w is not None and w >= 0 and n in base]
    total = sum(w for n, w in run["queries"].items() if n in covered)
    rec_total = sum(base[n]["wall"] for n in covered)
    print(f"{len(covered)} queries vs records: total {total:.1f}s, "
          f"record-sum {rec_total:.1f}s, ratio {total / rec_total:.2f}x, "
          f"outliers(>{args.threshold}x): {len(rows)}")
    for r in sorted(rows, key=lambda r: -r["wall_ratio"]):
        extra = ""
        if r["verdict"] != "no-record":
            extra = (f" bytes x{r['bytes_ratio']} tasks x{r['tasks_ratio']}"
                     f" cpu x{r['cpu_ratio']} gc {r['gc_share']:.0%}")
        print(f"  {r['query']}: {r['wall']:.2f}s = x{r['wall_ratio']}"
              f" record {r['record_wall']}s -> {r['verdict']}{extra}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"outliers": rows, "total": total,
                       "record_total": rec_total}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
