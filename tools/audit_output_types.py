#!/usr/bin/env python3
"""Portability audit over a Verify output directory.

Usage: python3 tools/audit_output_types.py <verifyOutDir>

Lists every graded output column whose type is NOT in the
engine-version-portable set (integers, VARCHAR, BOOLEAN, TIMESTAMP,
DOUBLE). DECIMAL and FLOAT32 columns are flagged as ERRORS: a bare
DECIMAL output column (HLL s_sum, removed round 7) hash-failed three
driver rounds on rendering drift across DuckDB releases, and float32
re-rounds under engine-dependent promotion. DOUBLE columns are listed
for review — they are acceptable ONLY when produced by
correctly-rounded IEEE ops over identical integer/parquet-double
inputs on both engines (ARCHITECTURE.md "Oracle-exactness
discipline").
"""
import glob
import os
import sys
from collections import Counter

import duckdb


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    con = duckdb.connect()
    errors, doubles = [], []
    dirs = sorted(glob.glob(f"{outdir}/q*"))
    if not dirs:
        sys.exit(f"no query outputs under {outdir}")
    for d in dirs:
        name = os.path.basename(d)
        sch = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        for colname, typ, *_ in sch:
            t = typ.upper()
            if "DECIMAL" in t or t == "FLOAT":
                errors.append((name, colname, t))
            elif t == "DOUBLE":
                doubles.append((name, colname))
    print(f"{len(dirs)} query outputs audited")
    print(f"{len(doubles)} DOUBLE columns (review class): "
          f"{Counter(q for q, _ in doubles).most_common(5)} ...")
    if errors:
        print(f"ERROR: {len(errors)} version-sensitive columns:")
        for e in errors:
            print("  ", e)
        sys.exit(1)
    print("0 DECIMAL/FLOAT32 columns — graded surface is rendering-portable")


if __name__ == "__main__":
    main()
