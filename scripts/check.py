#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load the Spark parquet result, run the oracle SQL in
DuckDB over the testdata parquet, sort columns by name, sort rows,
compare values exactly; for float columns report max abs diff too.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                same = a.equals(b) or (a.astype(str) == b.astype(str)).all()
            except Exception:
                same = False
            if not same:
                try:
                    import numpy as np
                    d = (pd.to_numeric(a) - pd.to_numeric(b)).abs().max()
                    print(f"FAIL {name}: col {c} differs, max abs diff={d}")
                except Exception:
                    diff_idx = (a.astype(str) != b.astype(str))
                    i = diff_idx[diff_idx].index[0]
                    print(f"FAIL {name}: col {c} differs, e.g. row {i}: {a[i]!r} vs {b[i]!r}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
    # rows-only queries (no oracle): just check output exists and >0 rows
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                status = "PASS" if n > 0 else "FAIL"
                print(f"{status} {d} (rows-only, {n} rows)")
                if n > 0: n_pass += 1
                else: n_fail += 1
            except Exception as ex:
                print(f"FAIL {d} (rows-only): {ex}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
