#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views
named after the testdata tables, and compares row counts, schemas
(column names), and values.

The compare is deliberately STRING-BASED on pandas dtypes, like the
driver's hash compare: both sides load into pandas (oracle via duckdb
.df(), spark output via pandas.read_parquet), columns sorted by name,
rows sorted by all columns, then each cell stringified. This catches
type drift that value-equality misses — e.g. DuckDB SUM(BIGINT)
returns HUGEINT which lands in pandas as float64 ('123.0' vs Spark's
int64 '123'), and Decimal vs float ('1.50' vs '1.5'). Round 1 lost 5
queries to exactly that.

It also FAILS any spark output containing list/array cells — the
driver's pandas sort_values crashes on ndarray cells (unhashable), so
arrays must be serialized to strings in the final projection.
"""
import sys, os, json, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Driver-like canonical string for a cell.

    Midnight timestamps are trimmed to dates: duckdb's .df() widens DATE
    to datetime64 ('2000-12-18 00:00:00') while parquet round-trips
    datetime.date ('2000-12-18'); the real driver treats these as equal
    (r01 evidence: all date-keyed queries hash-matched).
    """
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<NULL>"
    s = str(v)
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype == object and df[c].map(
                lambda x: isinstance(x, (list, np.ndarray))).any():
            raise TypeError(f"column '{c}' holds array cells — the driver's "
                            "pandas sort crashes on these; serialize to string")
    if len(df):
        df = df.sort_values(by=cols, key=lambda s: s.map(cell))
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


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
            exp = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            if sorted(exp.columns) != sorted(got.columns):
                print(f"FAIL {name}: schema exp={sorted(exp.columns)} got={sorted(got.columns)}")
                n_fail += 1
                continue
            er, gr = frame_rows(exp), frame_rows(got)
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
    # queries without oracle: rows-only, but still must sort cleanly
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracles:
            try:
                got = pd.read_parquet(f"{out_dir}/{d}")
                n = len(frame_rows(got))
                print(f"INFO {d}: no oracle, {n} rows (sortable)")
            except Exception as e:
                print(f"FAIL {d}: rows-only sort check: {type(e).__name__}: {e}")
                n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
