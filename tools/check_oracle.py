#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate (dev-time only).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every parquet table in sfDir as a DuckDB view named by file stem, runs
each oracle_sql.json entry, and compares to the Verify-written parquet for the
same query name: column names (sorted), row count, and a hash over the
row-sorted, column-sorted stringified values.
"""
import sys, json, glob, os
import duckdb
import hashlib


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    canon_rows = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        got_dir = os.path.join(out_dir, name)
        try:
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_rows = exp.fetchall()
            got = con.sql(f"SELECT * FROM '{got_dir}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
            if sorted(exp_cols) != sorted(got_cols):
                print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
                n_bad += 1
            elif len(exp_rows) != len(got_rows):
                print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
                n_bad += 1
            elif canon(exp_rows, exp_cols) != canon(got_rows, got_cols):
                print(f"FAIL {name}: value hash mismatch ({len(exp_rows)} rows)")
                # show first differing row for debugging
                eset = set(map(str, sorted(exp_rows)))
                gset = set(map(str, sorted(got_rows)))
                for d in sorted(eset - gset)[:3]:
                    print(f"   oracle-only: {d[:200]}")
                for d in sorted(gset - eset)[:3]:
                    print(f"   spark-only : {d[:200]}")
                n_bad += 1
            else:
                print(f"OK   {name} ({len(exp_rows)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"ROWS {name}: {n}")
            except Exception as e:
                print(f"ERR  {name}: {str(e)[:200]}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
