#!/usr/bin/env python3
"""Local pre-validation mimicking the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir parquet tables, and compares
row counts + sorted values (columns sorted by name, rows sorted).
"""
import sys, json, glob, os
import duckdb
import math
import datetime
import decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, decimal.Decimal):
        return decimal.Decimal(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = [tuple(norm(v) for v in r) for r in
                    con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()]
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.columns)
        exp_rows = [tuple(norm(v) for v in r) for r in
                    con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()]
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        # Declared-type check: the driver's hash is representation-
        # sensitive (e.g. DECIMAL(22,2) vs DECIMAL(38,2) hash-mismatch
        # even with equal values), so compare DuckDB-inferred types too.
        got_types = dict(zip(got.columns, [str(t) for t in got.types]))
        exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_types
                 if c in exp_types and got_types[c] != exp_types[c]}
        if tdiff:
            print(f"FAIL {name}: type drift {tdiff}")
            n_fail += 1
            continue
        if sorted(got_rows, key=key) != sorted(exp_rows, key=key):
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}")
            g, e = sorted(got_rows, key=key), sorted(exp_rows, key=key)
            for i in range(min(len(g), len(e))):
                if g[i] != e[i]:
                    print(f"  first diff at {i}:\n   got {g[i]}\n   exp {e[i]}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
