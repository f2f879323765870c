#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same parquet tables, loads the Spark-written parquet result, sorts columns
by name and rows by all columns, and compares values. Dev-only tool (the
real gate is driver-side); not part of the library.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) < 1e-9 * max(1.0, abs(a), abs(b))
    if a is None and b is None:
        return True
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures += 1
            continue
        if list(got.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(oracle.columns)}")
            failures += 1
            continue
        if len(got) != len(oracle):
            print(f"FAIL {name}: rows {len(got)} != {len(oracle)}")
            failures += 1
            continue
        bad = None
        for col in got.columns:
            for i, (a, b) in enumerate(zip(got[col], oracle[col])):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
