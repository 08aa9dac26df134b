#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes outDir/<name>.parquet + oracle_sql.json), then compare each result
against the DuckDB oracle on the same sf tables.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        res_glob = f"{out_dir}/{name}/*.parquet"
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no result parquet"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_glob}'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
        diff_cols = []
        for c in gc:
            a, b = g[c], w[c]
            try:
                same = (a.fillna("__null__") == b.fillna("__null__")).all() \
                    if a.dtype == object else ((a == b) | (a.isna() & b.isna())).all()
            except Exception:
                same = list(a) == list(b)
            if not same:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = g[c] != w[c]
                print("  got :", g[c][neq].head(3).tolist())
                print("  want:", w[c][neq].head(3).tolist())
            n_bad += 1
        else:
            # dtype note (informational — driver may compare schemas)
            dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in gc
                  if str(g[c].dtype) != str(w[c].dtype)]
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"OK   {name} ({len(g)} rows){note}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
