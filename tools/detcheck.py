#!/usr/bin/env python3
"""Determinism gate: two independent graft.Verify output dirs must be
value-identical for every query (same rows, same values, after a canonical
all-column sort — file bytes may differ by partition count/order).

Usage: python3 tools/detcheck.py <outDirA> <outDirB>
"""
import glob, json, os, sys
import duckdb


def main(a, b):
    con = duckdb.connect()
    # union of both runs' query sets: a name present in only one run is a
    # coverage asymmetry and must FAIL, not silently skip
    names_a = set(json.load(open(f"{a}/oracle_sql.json")))
    names_b = set(json.load(open(f"{b}/oracle_sql.json")))
    names = sorted(names_a | names_b)
    n_ok = n_bad = 0
    for name in names:
        if name not in names_a or name not in names_b:
            missing = "A" if name not in names_a else "B"
            print(f"FAIL {name}: only present in one run (missing from {missing})")
            n_bad += 1
            continue
        ga, gb = f"{a}/{name}/*.parquet", f"{b}/{name}/*.parquet"
        if not glob.glob(ga) or not glob.glob(gb):
            print(f"FAIL {name}: missing result dir"); n_bad += 1; continue
        da = con.sql(f"SELECT * FROM '{ga}'").df()
        db = con.sql(f"SELECT * FROM '{gb}'").df()
        cols = sorted(da.columns)
        if cols != sorted(db.columns) or len(da) != len(db):
            print(f"FAIL {name}: shape {da.shape} vs {db.shape}"); n_bad += 1; continue
        sa = da[cols].sort_values(cols).reset_index(drop=True)
        sb = db[cols].sort_values(cols).reset_index(drop=True)
        if sa.equals(sb):
            n_ok += 1
        else:
            print(f"FAIL {name}: value drift between runs"); n_bad += 1
    print(f"\ndeterminism: {n_ok} identical, {n_bad} drifted")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
