#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out`.

Mirrors the DRIVER's compare, which hash-matches STRING renderings:
the Spark parquet is read back raw (a decimal column renders
scale-padded, e.g. Decimal('284019.50')), while the oracle's DuckDB
values come back as float64 (e.g. 284019.5). So:
  - spark side: values exactly as read from parquet (no normalization);
  - oracle side: decimal.Decimal -> float (the driver's pandas path);
  - sort columns by name, rows by rendered tuple, compare str() cells.
A decimal column surviving on the spark side is reported as REPR-RISK
even when the values happen to match at this scale (trailing zeros are
data-dependent — such a query passes by luck and flakes at other SFs).
"""
import sys, os, json, glob, decimal
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def render(v):
    return str(v)


def fetch(con, sql, oracle_side):
    # The driver materializes the oracle through pandas, where DuckDB's
    # HUGEINT (the result type of sum(INTEGER/BIGINT)) lands as float64
    # and renders '1.0' while Spark's BIGINT renders '1'. Mirror that:
    # flag HUGEINT columns so an un-cast integer sum fails locally too.
    hugeint_cols = [str(t) == "HUGEINT" for t in con.sql(sql).types] \
        if oracle_side else []
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    decimal_cols = set()
    out = []
    for r in rows:
        vals = []
        for i, (c, v) in enumerate(zip(cols, r)):
            if isinstance(v, decimal.Decimal):
                decimal_cols.add(c)
                if oracle_side:
                    v = float(v)
            elif oracle_side and v is not None and hugeint_cols and hugeint_cols[i]:
                v = float(v)
            vals.append(v)
        out.append(vals)
    # driver sorts columns by name before hashing
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    rendered = [[render(r[i]) for i in order] for r in out]
    rendered.sort()
    return cols_sorted, rendered, decimal_cols


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    risky = []
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(res_dir, "*.parquet")):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            gc, gr, gdec = fetch(
                con, f"SELECT * FROM '{res_dir}/*.parquet'", oracle_side=False)
            ec, er, _ = fetch(con, oracle[name], oracle_side=True)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if gdec:
            risky.append((name, sorted(gdec)))
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                bad = (i, a, b); break
        if bad is None:
            print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
        else:
            i, a, b = bad
            diffs = [(c, x, y) for c, x, y in zip(gc, a, b) if x != y]
            print(f"FAIL {name}: row {i} differs: {diffs[:3]}")
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
    for name, cols in risky:
        print(f"REPR-RISK {name}: spark output still decimal: {cols}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(risky)} repr-risk")
    return 1 if (n_fail or risky) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
