#!/usr/bin/env python3
"""Strict stand-in for the driver's hash compare: sort columns by name,
sort rows, compare str(value) EXACTLY (no float tolerance). Shows the
first differing cell with python repr + type so scale/format mismatches
are visible.

Usage: python3 tools/check_strict.py <sfDir> <verifyOutDir> [query...]
"""
import json, os, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    if only:
        names = [n for n in names if n in only]
    npass = nfail = nexposed = 0
    for name in names:
        if name not in oracle:
            continue
        srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = srel.columns, srel.fetchall()
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
        # HUGEINT guard: DuckDB types every bare integer sum() as HUGEINT,
        # which is not arrow/parquet-native — pandas/arrow readers coerce
        # it to float64 ('5' -> '5.0'), so the driver's stringify-hash
        # diverges even when every value is identical through DuckDB
        # (the r8/r9 q_eval_overlap failure class). fetchall() returns
        # Python ints and hides this, so fail on the TYPE, loudly.
        huge = [(c, str(t)) for c, t in zip(ocols, orel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"{name}: HUGEINT-FAIL oracle columns {huge} — "
                  f"CAST the aggregate AS BIGINT in the oracle SQL")
            nfail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc or len(sr) != len(orr):
            print(f"{name}: SCHEMA/ROWS spark={sc}/{len(sr)} oracle={oc}/{len(orr)}")
            nfail += 1
            continue
        def norm(v):
            # Driver model: floats are normalized (~12 sig digits) before
            # hashing (observed: 1e-15-relative diffs hash-matched in r2);
            # every other type is stringified raw.
            if isinstance(v, float):
                return "%.12g" % v
            return str(v)
        bad = None
        for i, (x, y) in enumerate(zip(sr, orr)):
            for j, (a, b) in enumerate(zip(x, y)):
                if norm(a) != norm(b):
                    bad = (i, sc[j], a, b)
                    break
            if bad:
                break
        # repr-level exposure guard: a query whose values agree only
        # AFTER float normalization is one driver-hash-convention change
        # away from a red cell (the r8 q_eval_overlap failure class).
        # Flag it even when the normalized compare passes.
        exposed = None
        if not bad:
            for i, (x, y) in enumerate(zip(sr, orr)):
                for j, (a, b) in enumerate(zip(x, y)):
                    if repr(a) != repr(b) and norm(a) == norm(b):
                        exposed = (i, sc[j], a, b)
                        break
                if exposed:
                    break
        if bad:
            i, col, a, b = bad
            print(f"{name}: STRICT-FAIL row {i} col {col}: "
                  f"spark={a!r} ({type(a).__name__}) oracle={b!r} ({type(b).__name__})")
            nfail += 1
        elif exposed:
            i, col, a, b = exposed
            print(f"{name}: PASS but EXPOSED row {i} col {col}: "
                  f"spark={a!r} != oracle={b!r} at repr level "
                  f"(only the float normalization saves it)")
            nexposed += 1
            npass += 1
        else:
            npass += 1
    print(f"== strict: {npass} pass, {nfail} fail, "
          f"{nexposed} exposed (repr-level) ==")

def selftest():
    """Plant a bare-integer-sum oracle (DuckDB types it HUGEINT) and
    assert the guard rejects it — executable evidence that the
    q_eval_overlap failure class cannot silently recur."""
    import tempfile, shutil, io, contextlib
    d = tempfile.mkdtemp(prefix="strict_selftest_")
    try:
        os.makedirs(f"{d}/out/q_planted")
        con = duckdb.connect()
        con.sql("COPY (SELECT 1 AS a, CAST(5 AS BIGINT) AS s) TO "
                f"'{d}/out/q_planted/part.parquet' (FORMAT PARQUET)")
        with open(f"{d}/out/oracle_sql.json", "w") as f:
            json.dump({"q_planted": "SELECT 1 AS a, sum(1) AS s"}, f)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            # any real sf dir works — the planted oracle reads no table
            main(sys.argv[2] if len(sys.argv) > 2
                 else "/root/testdata/sf0.001", f"{d}/out", set())
        out = buf.getvalue()
        assert "HUGEINT-FAIL" in out, f"guard did not fire:\n{out}"
        print("selftest OK: planted sum(1) oracle rejected as HUGEINT")
    finally:
        shutil.rmtree(d, ignore_errors=True)

if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
    else:
        main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
