#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/compare_local.py <sfDir> <verifyOutDir>

Mimics the driver: registers each testdata parquet as a DuckDB view,
runs every oracle SQL from oracle_sql.json, and compares against the
parquet Verify wrote — columns aligned by sorted name, values compared
EXACTLY (floats bit-for-bit) and in row order.
"""
import sys, json, math, time, datetime

import duckdb

# Oracle-runtime budget: the driver's correctness stage has a finite
# time budget — round 9 shipped an EMPTY CORRECTNESS artifact because
# three oracles cost ~630 s of DuckDB time. Any single oracle past
# PER_QUERY_BUDGET_S or a suite past TOTAL_BUDGET_S fails this
# pre-flight LOUDLY so the regression is caught before the driver runs.
PER_QUERY_BUDGET_S = 15.0
TOTAL_BUDGET_S = 120.0

# Only the 8 tables TESTDATA.md names — documents/embeddings deliberately
# NOT registered, simulating the strictest driver behavior (their oracle
# SQL must be self-contained via read_parquet CTEs).
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]


def norm(v):
    if isinstance(v, float):
        return v  # exact compare on purpose
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    oracle_secs = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            t0 = time.time()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            oracle_secs[name] = time.time() - t0
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            ok = False
        elif len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rowcount oracle={len(exp_rows)} spark={len(got_rows)}")
            ok = False
        else:
            eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            for i, (er, gr) in enumerate(zip(exp_rows, got_rows)):
                ev = tuple(norm(er[j]) for j in eidx)
                gv = tuple(norm(gr[j]) for j in gidx)
                if ev != gv:
                    print(f"FAIL {name}: row {i} oracle={ev} spark={gv}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(exp_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    total_s = sum(oracle_secs.values())
    slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:10]
    print(f"== oracle runtime: {total_s:.1f}s total "
          f"(budget {TOTAL_BUDGET_S:.0f}s); slowest: "
          + ", ".join(f"{n} {s:.1f}s" for n, s in slow))
    budget_fail = False
    for n, s in oracle_secs.items():
        if s > PER_QUERY_BUDGET_S:
            print(f"BUDGET FAIL {n}: oracle took {s:.1f}s "
                  f"(> {PER_QUERY_BUDGET_S:.0f}s per-query budget)")
            budget_fail = True
    if total_s > TOTAL_BUDGET_S:
        print(f"BUDGET FAIL: oracle suite took {total_s:.1f}s "
              f"(> {TOTAL_BUDGET_S:.0f}s total budget) — the driver's "
              f"correctness gate WILL time out; fix before round end")
        budget_fail = True
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if (n_fail or budget_fail) else 0)


if __name__ == "__main__":
    main()
