#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the testdata parquet and compare with the Spark
results dumped by graft.Verify. Order-insensitive value compare with
exact equality (the queries are engineered so floats are bit-identical
across engines)."""
import json, sys, glob
import duckdb

from decimal import Decimal
import datetime

def canon(v):
    """Sortable, engine-neutral value form (exact float compare)."""
    if v is None:
        return (0, "")
    if isinstance(v, float) and v != v:
        return (1, "NaN")
    if isinstance(v, bool):
        return (2, float(v))
    if isinstance(v, (int, float)):
        return (2, float(v))
    if isinstance(v, Decimal):
        return (2, float(v))
    return (3, str(v))

def rows_of(cur):
    return sorted([tuple(canon(x) for x in r) for r in cur.fetchall()])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp_cur = con.execute(sql)
            exp_cols = sorted(d[0] for d in exp_cur.description)
            col_order = [d[0] for d in con.execute(sql).description]
            perm = sorted(range(len(col_order)), key=lambda i: col_order[i])
            exp = sorted([tuple(canon(r[i]) for i in perm)
                          for r in con.execute(sql).fetchall()])
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            got = sorted([tuple(canon(r[i]) for i in gperm)
                          for r in con.execute(
                              f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()])
        except Exception as e:
            results[name] = f"SPARK-MISSING {e}"
            continue
        if sorted(got_cols) != exp_cols:
            results[name] = f"SCHEMA-MISMATCH spark={sorted(got_cols)} oracle={exp_cols}"
        elif got == exp:
            results[name] = "OK"
        else:
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            results[name] = (f"VALUE-MISMATCH rows spark={len(got)} oracle={len(exp)} "
                             f"first_diffs={diff}")
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  " + v))
    print(f"\n{n_ok}/{len(results)} oracle-checked queries pass")
    no_oracle = set(json.load(open(f"{out_dir}/oracle_sql.json")))
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
