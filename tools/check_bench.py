#!/usr/bin/env python3
"""In-band check for a forced-execution Bench reading (BASELINE.md
"Forced-execution per-query floors" contract, r15):

  * total within 0.51-0.69 s/query (100-135 s at the 195-query size),
  * no query over max(2x its floor, floor + 0.5 s) — the absolute
    slack keeps sub-0.2 s queries' scheduler jitter from reading as
    regressions,
  * errs must be empty.

Usage: python3 tools/check_bench.py <bench.json> [floors.json]
  <bench.json>  any of:
                 - the SPARK_GRAFT_BENCH_OUT dump (full per-query map),
                 - the one-line stdout JSON (heaviest-queries subset —
                   the per-query check then covers only those),
                 - the driver's BENCH_rN.json wrapper (the payload is
                   unwrapped from its "parsed" key automatically).
Exits nonzero when out of band. Queries with no recorded floor (new
battery entries) are reported informationally, never failed — record
their floor in the floors file once measured on an idle box.
"""
import json
import sys


def fail(msg):
    print(f"FAIL {msg}")
    return 1


def main(bench_path, floors_path):
    try:
        bench = json.load(open(bench_path))
    except (OSError, ValueError) as e:
        return fail(f"cannot read bench json {bench_path}: {e}")
    # the driver's BENCH_rN.json wraps the Bench stdout line in "parsed"
    if isinstance(bench, dict) and "parsed" in bench \
            and isinstance(bench["parsed"], dict):
        bench = bench["parsed"]
    try:
        floors_doc = json.load(open(floors_path))
        floors = floors_doc["floors"]
    except (OSError, ValueError, KeyError, TypeError) as e:
        return fail(f"malformed floors file {floors_path}: {e}")
    # per-query absolute bound overrides: queries whose SAME-CODE
    # cross-session spread is documented wider than the generic
    # max(2x floor, floor+0.5) rule (BASELINE.md r16 A/B attribution)
    overrides = floors_doc.get("bound_overrides", {})
    queries = bench.get("queries")
    if not isinstance(queries, dict) or not queries:
        return fail(f"bench dump has no per-query map "
                    f"(keys: {sorted(bench)[:8]})")
    total = bench.get("total", bench.get("value"))
    n = bench.get("n_queries", len(queries))
    errs = bench.get("errs", {})
    if not isinstance(total, (int, float)) or not n:
        return fail(f"bench dump malformed: total={total!r} n={n!r}")
    ok = True
    if errs:
        print(f"FAIL errs nonempty: {errs}")
        ok = False
    # Session-health calibration (r20): Bench times a fixed synthetic
    # shuffle+agg (code- and sf-independent) and emits it as calib_sec.
    # A probe reading far over its idle-box floor means the SESSION is
    # degraded — per-query regressions in that run indict the machine,
    # not the tree (the r19 official session read a 688 s first pass).
    calib = bench.get("calib_sec")
    calib_floor = floors_doc.get("calib_floor_sec")
    if calib is not None and calib_floor:
        ratio = calib / calib_floor
        if ratio > 1.5:
            print(f"DEGRADED SESSION: calib probe {calib}s is "
                  f"{ratio:.2f}x its idle floor {calib_floor}s — "
                  "per-query numbers from this run are not "
                  "code-attribution evidence")
            ok = False
        else:
            print(f"calib probe {calib}s vs floor {calib_floor}s "
                  f"({ratio:.2f}x) — session healthy")
    elif calib is not None:
        print(f"note: calib probe {calib}s (no calib_floor_sec in "
              "floors file — record one from an idle box)")
    per = total / n
    if not (0.51 <= per <= 0.69):
        print(f"FAIL total {total}s / {n} queries = {per:.3f} s/query "
              "outside [0.51, 0.69]")
        ok = False
    new = []
    for name, sec in sorted(queries.items()):
        f = floors.get(name)
        if f is None:
            new.append((name, sec))
            continue
        bound = max(2 * f, f + 0.5, overrides.get(name, 0.0))
        if sec > bound:
            print(f"FAIL {name}: {sec}s over bound {bound:.2f}s "
                  f"(floor {f}s)")
            ok = False
    for name, sec in new:
        print(f"note: no floor recorded for {name} ({sec}s) — add it "
              "to the floors file from an idle-box run")
    print(("== in-band: " if ok else "== OUT OF BAND: ")
          + f"{total}s / {n} queries ({per:.3f} s/query), "
          + f"{len(queries)} checked, {len(new)} without floors ==")
    return 0 if ok else 1


def selftest():
    """Prove the checker fails and passes where it must, incl. the
    bound_overrides path (r17)."""
    import tempfile, os
    def run(bench, floors):
        bp = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        fp = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(bench, bp); json.dump(floors, fp)
        bp.close(); fp.close()
        try:
            return main(bp.name, fp.name)
        finally:
            os.unlink(bp.name); os.unlink(fp.name)
    base = {"total": 60.0, "n_queries": 100, "errs": {},
            "queries": {"q_a": 3.9}}
    floors = {"floors": {"q_a": 1.9}}
    assert run(base, floors) == 1, "3.9s over max(2x1.9, 2.4) must FAIL"
    withov = {"floors": {"q_a": 1.9}, "bound_overrides": {"q_a": 4.5}}
    assert run(base, withov) == 0, "the 4.5s override must admit 3.9s"
    over_ov = dict(base, queries={"q_a": 4.6})
    assert run(over_ov, withov) == 1, "4.6s must fail even the override"
    errs = dict(base, errs={"q_a": "Boom"}, queries={"q_a": 0.1})
    assert run(errs, withov) == 1, "nonempty errs must FAIL"
    slow = dict(base, total=80.0, queries={"q_a": 1.9})
    assert run(slow, floors) == 1, "0.80 s/query total must FAIL"
    calfloors = {"floors": {"q_a": 1.9}, "bound_overrides": {"q_a": 4.5},
                 "calib_floor_sec": 0.5}
    degraded = dict(base, calib_sec=1.2)
    assert run(degraded, calfloors) == 1, \
        "calib 2.4x floor must flag a degraded session"
    healthy = dict(base, calib_sec=0.6)
    assert run(healthy, calfloors) == 0, "calib 1.2x floor must pass"
    nofloor = dict(base, calib_sec=9.9)
    assert run(nofloor, withov) == 0, \
        "calib without a recorded floor is informational only"
    print("selftest OK: generic bound, override admit/deny, errs, "
          "total band, calib degraded/healthy/no-floor")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    bench = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.json"
    floors = (sys.argv[2] if len(sys.argv) > 2
              else "tools/bench_floors_r17.json")
    sys.exit(main(bench, floors))
