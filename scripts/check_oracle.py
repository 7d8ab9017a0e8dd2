#!/usr/bin/env python3
"""Local pre-validation mimicking the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir parquet tables, and compares
row counts + sorted values (columns sorted by name, rows sorted).

REPRESENTATION SENSITIVITY (round-3 lesson): the driver's hash sees the
values as each engine natively surfaces them — the Spark side through a
parquet reader (DECIMAL -> decimal.Decimal, '275005.00') and the oracle
side through a DuckDB->dataframe conversion (DECIMAL -> float64,
'275005.0') — so a DECIMAL output column hash-mismatches on trailing
zeros even when every value is equal (CORRECTNESS_r02: 13 such
failures; q06 passed only because its one value had no trailing zero).
This checker therefore:
  * reads the Spark result with pyarrow (native surfaced types), and
    the oracle with DuckDB fetchall (native Decimal/float objects);
  * compares values by EXACT string form (no tolerance, no rounding);
  * hard-FAILS any query whose output schema contains a DECIMAL column
    on either side — the repo policy is exact-decimal accumulation
    internally, DOUBLE (or int/string/date) on the way out.
"""
import sys, json, glob, os
import datetime
import decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Canonical string for a value, preserving type-sensitive formatting
    (float 275005.0 vs Decimal 275005.00 must NOT collapse)."""
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if v is None:
        return "null"
    return f"{type(v).__name__}:{v}"


def rows_of(cols, fetched):
    return sorted("|".join(norm(v) for v in r) for r in fetched)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        for f in files[1:]:
            import pyarrow as pa
            tbl = pa.concat_tables([tbl, pq.read_table(f)])
        bad_dec = [f.name for f in tbl.schema if "decimal" in str(f.type)]
        if bad_dec:
            print(f"FAIL {name}: DECIMAL output columns {bad_dec} "
                  "(policy: cast final aggregates to DOUBLE)")
            n_fail += 1
            continue
        got_cols = sorted(tbl.schema.names)
        pydict = tbl.to_pydict()
        got_rows = rows_of(got_cols, zip(*[pydict[c] for c in got_cols])) \
            if tbl.num_rows else []
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        bad_dec = [c for c, t in zip(exp.columns, exp.types)
                   if "DECIMAL" in str(t)]
        if bad_dec:
            print(f"FAIL {name}: oracle DECIMAL output columns {bad_dec} "
                  "(cast to DOUBLE in the oracle SQL)")
            n_fail += 1
            continue
        exp_rows = rows_of(
            exp_cols,
            con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall())
        if got_rows != exp_rows:
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}")
            for i in range(min(len(got_rows), len(exp_rows))):
                if got_rows[i] != exp_rows[i]:
                    print(f"  first diff at {i}:\n   got {got_rows[i]}\n"
                          f"   exp {exp_rows[i]}")
                    break
            else:
                if len(got_rows) != len(exp_rows):
                    print("  (one side has extra rows)")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
