#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views
named after the testdata tables, and compares row counts, schemas
(column names), and sorted values. Exact equality required (the engine's
decimal-exact aggregation makes doubles bit-identical)."""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            exp_cols, got_cols = sorted(exp.column_names), sorted(got.column_names)
            if exp_cols != got_cols:
                print(f"FAIL {name}: schema exp={exp_cols} got={got_cols}")
                n_fail += 1
                continue
            key = lambda row: tuple((v is None, str(v)) for v in row)
            er = sorted([tuple(canon(x) for x in row) for row in
                         zip(*[exp.column(c).to_pylist() for c in exp_cols])], key=key) if exp.num_rows else []
            gr = sorted([tuple(canon(x) for x in row) for row in
                         zip(*[got.column(c).to_pylist() for c in got_cols])], key=key) if got.num_rows else []
            if len(er) != len(gr):
                print(f"FAIL {name}: rows exp={len(er)} got={len(gr)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(er, gr) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(er)} rows differ; first: exp={bad[0][0]} got={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(er)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # queries without oracle: rows-only
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracles:
            n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"INFO {d}: no oracle, {n} rows")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
