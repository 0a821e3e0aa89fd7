#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with views over the sfDir parquet tables, load the Spark result parquet,
sort columns by name, compare row-by-row (exact for non-floats, exact for
floats too — our aggregates are decimal-exact by construction).
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                n_fail += 1; continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1; continue
            ok = True
            for c in exp.columns:
                e, g = exp[c], got[c]
                for i in range(len(e)):
                    ev, gv = e.iloc[i], g.iloc[i]
                    enull = ev is None or (isinstance(ev, float) and math.isnan(ev)) or pd.isna(ev)
                    gnull = gv is None or (isinstance(gv, float) and math.isnan(gv)) or pd.isna(gv)
                    if enull and gnull:
                        continue
                    if enull != gnull or str(ev) != str(gv):
                        print(f"FAIL {name}: col {c} row {i}: got {gv!r} want {ev!r}")
                        ok = False; break
                if not ok: break
            if ok:
                print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
            else:
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
