#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL (from oracle_sql.json) in DuckDB with each testdata
table registered as a view, sort columns by name + rows by all columns,
and compare with a small float tolerance. Prints PASS/FAIL per query.
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        if name not in oracle:
            print(f"{name}: NO-ORACLE rows={len(srows)}")
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            nfail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"{name}: SCHEMA-MISMATCH spark={sc} oracle={oc}")
            nfail += 1
            continue
        if len(sr) != len(orr):
            print(f"{name}: ROWCOUNT-MISMATCH spark={len(sr)} "
                  f"oracle={len(orr)}")
            nfail += 1
            continue
        bad = None
        for i, (x, y) in enumerate(zip(sr, orr)):
            if not all(eq(a, b) for a, b in zip(x, y)):
                bad = (i, x, y)
                break
        if bad:
            print(f"{name}: VALUE-MISMATCH row {bad[0]}:\n  spark={bad[1]}"
                  f"\n  duck ={bad[2]}")
            nfail += 1
        else:
            print(f"{name}: PASS ({len(sr)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
