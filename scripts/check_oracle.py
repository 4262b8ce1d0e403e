#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare (t2).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: registers each parquet table as a DuckDB view, runs every
entry of oracle_sql.json, and compares against the engine's parquet dump —
columns sorted by name, rows sorted by all columns, exact value equality.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def fresh_con(sf_dir: str):
    # a FRESH connection per query: 140 megabyte-scale oracle texts through
    # one connection accumulate allocator state until a chain query hits a
    # spurious malloc failure that then poisons every later query
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir: str, out_dir: str) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        con = None
        try:
            con = fresh_con(sf_dir)
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        finally:
            # close on the failure path too — a leaked connection keeps the
            # very allocator state this per-query isolation exists to shed
            if con is not None:
                con.close()
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        ga, ea = got.to_numpy(), exp.to_numpy()
        for i in range(len(got)):
            for j in range(len(got.columns)):
                if not eq(ga[i][j], ea[i][j]):
                    bad = (i, got.columns[j], ga[i][j], ea[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: engine={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} oracle queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
