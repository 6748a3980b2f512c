#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
same sf parquet tables, and compares (columns sorted by name, rows sorted)
against the Spark result parquet written by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(exp.columns)}")
                n_fail += 1
                continue
            er = sorted([tuple(norm(v) for v in r)
                         for r in exp.itertuples(index=False)])
            gr = sorted([tuple(norm(v) for v in r)
                         for r in got.itertuples(index=False)])
            if er == gr:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: {len(gr)} rows vs {len(er)} expected")
                diff = [(a, b) for a, b in zip(er, gr) if a != b][:3]
                for a, b in diff:
                    print(f"  oracle: {a}\n  spark : {b}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
