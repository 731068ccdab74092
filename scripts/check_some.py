#!/usr/bin/env python3
"""Targeted variant of check_local.py: compares ONLY the queries whose
parquet dirs exist under <verifyOutDir> (i.e. what a SPARK_GRAFT_ONLY
Verify run dumped), instead of replaying every oracle in
oracle_sql.json. Same compare semantics — it imports check_local.

Usage: python3 scripts/check_some.py <sfDir> <verifyOutDir>
"""
import sys, os, json
import duckdb
import pandas as pd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_local as cl


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in cl.TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in dumped:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            if name not in oracles:
                print(f"INFO {name}: no oracle, {len(cl.frame_rows(got))} rows (sortable)")
                continue
            exp = con.execute(oracles[name]).df()
            if sorted(exp.columns) != sorted(got.columns):
                print(f"FAIL {name}: schema exp={sorted(exp.columns)} got={sorted(got.columns)}")
                n_fail += 1
                continue
            er, gr = cl.frame_rows(exp), cl.frame_rows(got)
            if len(er) != len(gr):
                print(f"FAIL {name}: rows exp={len(er)} got={len(gr)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(er, gr) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(er)} rows differ; "
                      f"first: exp={bad[0][0]} got={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(er)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
