#!/usr/bin/env python3
"""Derive per-query forced-execution floors from N Bench dumps.

The r15/r17 re-baseline procedure (BASELINE.md "Forced-execution
per-query floors"): run graft.Bench with SPARK_GRAFT_BENCH_OUT three
times back-to-back on an idle box (each run = 2 passes, per-query
min-of-2), then floor(q) = min across the runs. Writes the floors file
consumed by tools/check_bench.py.

Usage: python3 tools/derive_floors.py <out.json> <dump1.json> [dump2 ...]
"""
import json
import sys


def main(out_path, dump_paths):
    runs = [json.load(open(p)) for p in dump_paths]
    names = set()
    for r in runs:
        if r.get("errs"):
            print(f"refusing: a dump has errs {r['errs']}")
            return 1
        names.update(r["queries"])
    floors = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        if len(vals) < len(runs):
            print(f"note: {n} present in only {len(vals)}/{len(runs)} runs")
        floors[n] = min(vals)
    doc = {
        "derived": (f"r17 re-baseline: per-query floor = min across "
                    f"{len(runs)} forced-execution Bench runs (2 passes "
                    "each, min-of-2 per run; queryExecution.toRdd.count() "
                    "— full plan, no count() join elimination), sf0.1, "
                    "local[32]"),
        "run_totals_min_of_2": [round(r["total"], 3) for r in runs],
        "run_pass_totals": [r["pass_totals"] for r in runs],
        "floor_total": round(sum(floors.values()), 3),
        "n_queries": len(floors),
        "floors": floors,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}: {len(floors)} floors, "
          f"floor_total={doc['floor_total']}s, "
          f"run totals {doc['run_totals_min_of_2']}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
