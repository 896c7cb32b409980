#!/usr/bin/env python3
"""Standing sf1 correctness gate (VERDICT r11 #4): each round, run a
rotating ~30-query cross-family subset STRICT against DuckDB on the
true-10x corpus (/tmp/graft_sf1, materialized by `runMain
graft.MakeScaledSf`). The r11 sf1 run caught a quadratic LSH cliff that
three rounds of sf0.1 benches never saw; this keeps that insurance
cheap and automatic.

Usage: python3 tools/sf1_gate.py <round> [--run]

Rotation: the full battery name list (sorted), minus the two
quadratic-ORACLE exclusions (q_dedup_embed / q_simhash_pairs — their
oracles are deliberate all-pairs N^2 joins; the engine sides have
bucketed scale paths verified at sf0.01/0.1), sliced into consecutive
30-query windows keyed by round number, wrapping. Prints the subset;
with --run, executes Verify + check_strict and exits nonzero on any
failure.
"""
import json, subprocess, sys

EXCLUDE = {"q_dedup_embed", "q_simhash_pairs"}
SF1 = "/tmp/graft_sf1"
WINDOW = 30


def battery():
    # the authoritative name list is whatever Verify dumps; the latest
    # committed CORRECTNESS file tracks it one round behind. Verify
    # writes oracle_sql.json for SUBSET runs too (including this
    # gate's own output), so newest-by-mtime would self-poison the
    # rotation down to the last subset: take the LIST with the MOST
    # keys (the full battery only grows), newest mtime as tiebreak —
    # and rank the committed CORRECTNESS list inside the SAME max, so
    # after a /tmp wipe (when only this gate's 30-key subset dumps
    # survive) the full battery still wins and the rotation never
    # collapses to a fixed 30-query window (ADVICE r12).
    import glob, os
    candidates = glob.glob("/tmp/verify*/oracle_sql.json")
    committed = sorted(glob.glob("CORRECTNESS_r*.json"))
    if committed:
        candidates.append(committed[-1])
    best = None
    for src in candidates:
        try:
            with open(src) as f:
                keys = sorted(json.load(f).keys())
            rank = (len(keys), os.path.getmtime(src))
            if best is None or rank > best[0]:
                best = (rank, keys)
        except (OSError, ValueError):
            pass
    if best is None:
        sys.exit("no oracle_sql.json dump and no CORRECTNESS_r*.json — "
                 "run graft.Verify once to seed the battery list")
    return best[1]


def subset(rnd):
    names = [n for n in battery() if n not in EXCLUDE]
    start = (rnd * WINDOW) % len(names)
    rot = names[start:] + names[:start]
    return rot[:WINDOW]


def main():
    rnd = int(sys.argv[1])
    names = subset(rnd)
    print(f"sf1 gate round {rnd}: {len(names)} queries")
    print(",".join(names))
    if "--run" not in sys.argv:
        return
    import os
    if not os.path.exists(f"{SF1}/lineitem.parquet"):
        print(f"{SF1} missing — materializing the true-10x corpus first")
        rc = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.MakeScaledSf 10 {SF1}"]).returncode
        if rc != 0:
            sys.exit(rc)
    out = f"/tmp/verify_sf1_r{rnd}"
    rc = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {SF1} {out} {','.join(names)}"]).returncode
    if rc != 0:
        sys.exit(rc)
    rc = subprocess.run(
        [sys.executable, "tools/check_strict.py", SF1, out]).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
