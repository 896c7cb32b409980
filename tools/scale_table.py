#!/usr/bin/env python3
"""Per-family scale table from two Bench full dumps (SPARK_GRAFT_BENCH_OUT).

Usage: scale_table.py small.json big.json [mult]

Groups the per-query minima into operator families, prints a markdown
table of family totals at both SFs with the wall-clock ratio, and lists
the individual queries whose ratio exceeds the multiplier (the
super-linear suspects worth attributing).
"""
import json
import re
import sys


FAMILIES = [
    ("streaming", r"^q_stream_"),
    ("multimodal", r"^q_multimodal_|^q_embed_meanpool"),
    ("dedup/cluster", r"^q_dedup_|^q_cluster_|^q_dup_spans|^q_split_by_cluster|^q_minhash"),
    ("ann/similarity", r"^q_ann_|^q_pq_encode|^q_triplet"),
    ("text/lm", r"^q_lang|^q_quality|^q_tokens|^q_fingerprint|^q_lm_|^q_bpe_|^q_bm25|^q_collocations|^q_temperature|^q_eval_overlap|^q_doc_stats"),
    ("pipeline", r"^q_pipeline_|^q_audit"),
    ("temporal", r"^q_asof|^q_range_join|^q_rolling|^q_sessionize"),
    ("olap", r".*"),  # catch-all: the OLAP/MDX core
]


def family(name):
    for fam, pat in FAMILIES:
        if re.match(pat, name):
            return fam
    return "olap"


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    mult = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    names = sorted(set(qs) & set(qb))
    missing = sorted(set(qs) ^ set(qb))
    if missing:
        print(f"WARNING: only in one dump: {missing}", file=sys.stderr)

    fams = {}
    for n in names:
        fams.setdefault(family(n), []).append(n)

    print(f"| family | n | sf0.1 s | sf1 s | ratio (x{mult:g} data) |")
    print("|---|---|---|---|---|")
    tot_s = tot_b = 0.0
    for fam, _ in FAMILIES:
        if fam not in fams:
            continue
        s = sum(qs[n] for n in fams[fam])
        b = sum(qb[n] for n in fams[fam])
        tot_s += s
        tot_b += b
        print(f"| {fam} | {len(fams[fam])} | {s:.1f} | {b:.1f} |"
              f" {b / max(s, 1e-9):.2f} |")
    print(f"| **total** | {len(names)} | {tot_s:.1f} | {tot_b:.1f} |"
          f" {tot_b / max(tot_s, 1e-9):.2f} |")

    print("\nSuper-linear queries (ratio > mult, and > 0.5s at sf1):")
    rows = [(n, qs[n], qb[n], qb[n] / max(qs[n], 1e-9)) for n in names]
    for n, s, b, r in sorted(rows, key=lambda t: -t[3]):
        if r > mult and b > 0.5:
            print(f"  {n}: {s:.2f} -> {b:.2f}  ({r:.1f}x)")
    print("\nHeaviest at sf1:")
    for n, s, b, r in sorted(rows, key=lambda t: -t[2])[:12]:
        print(f"  {n}: {s:.2f} -> {b:.2f}  ({r:.1f}x)")


if __name__ == "__main__":
    main()
