#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify, then run
each oracle SQL in DuckDB over the same parquet tables and compare.

Usage: python3 scripts/check.py [sfDir] [outDir] [--skip-verify] [names...]
"""
import json, math, subprocess, sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Full-precision repr: the local gate must be at least as strict as the
    # driver's hash gate it mirrors (round-2 ADVICE: 6-sig-digit formatting
    # hid >=1e6 drift). Queries are designed for bit-identical doubles
    # (integer ratios, DECIMAL-exact sums, matching sequential folds).
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
            capture_output=True, text=True, cwd="/root/repo",
            env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8"})
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)
    con = duckdb.connect()
    # Views are RAW parquet (events.ts stays TIMESTAMP_NS) to mirror the
    # driver's oracle exactly; oracle SQL must therefore be ns-safe — never
    # output a raw ts (date_trunc/CAST first). See Tables.scala nanos note.
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query names: {sorted(unknown)}")
        sys.exit(1)
    n_ok = n_bad = 0
    for name, osql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = pq.read_table(f"{out}/{name}")
            s_cols = spark_tbl.column_names
            s_rows = [tuple(d[c] for c in s_cols) for d in spark_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            res = con.sql(osql)
            o_cols = res.columns
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_bad += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        oc, orows = canon(o_cols, o_rows)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_bad += 1
        elif sr != orows:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orows)) if a != b]
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orows)}, "
                  f"first diffs {diffs[:3]}")
            for i in diffs[:2]:
                print(f"  spark : {sr[i]}")
                print(f"  oracle: {orows[i]}")
            if len(sr) != len(orows):
                print(f"  spark[0]={sr[0] if sr else None}")
                print(f"  oracle[0]={orows[0] if orows else None}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(sr)} rows")
            n_ok += 1
            if len(sr) == 0:
                print(f"WARN {name}: empty result set (weak check)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
