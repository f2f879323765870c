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


# Each oracle runs in its OWN pandas-free subprocess that writes the
# result to parquet (DuckDB COPY); the parent only reads parquet. Why so
# defensive (all measured on the q184 10x kernel chain at sf0.1):
#  - a heavy recursive oracle's buffer-pool peak plus pandas/numpy's
#    baseline mappings cross the kernel's vm.max_map_count (65530) —
#    allocations of 2 KB then fail "Out of Memory" with 118 GB free, and
#    the exhaustion poisons the PROCESS (fresh connections included), so
#    every oracle sorted after the heavy one fails too;
#  - the same query in a pandas-free process completes in ~50 s under a
#    24 GB limit;
#  - the explicit memory limit matters as well: DuckDB sizes its default
#    from memory AVAILABLE at connect time, and this tool habitually
#    runs seconds after a large Spark JVM exits;
#  - in-memory connections have NO temp directory — without one a
#    peak-over-limit query OOMs instead of spilling.
_CHILD = r"""
import json, os, sys
import duckdb
sf_dir, sql_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
# Limit sized to the HOST, not hardcoded: 0.8x MemAvailable capped at
# 60GB (the measured-sufficient ceiling for the heaviest oracle) — a
# fixed 60GB on a smaller box overcommits and gets OOM-killed instead
# of spilling to the temp directory. GRAFT_ORACLE_MEM overrides.
def _limit_gb():
    if os.environ.get("GRAFT_ORACLE_MEM"):
        return os.environ["GRAFT_ORACLE_MEM"]
    try:
        with open("/proc/meminfo") as f:
            kb = {l.split(":")[0]: int(l.split()[1]) for l in f}
        avail_gb = kb.get("MemAvailable", kb.get("MemFree", 0)) / (1024 * 1024)
        return "%%dGB" %% max(1, min(60, int(avail_gb * 0.8)))
    except Exception:
        return "60GB"
con.execute("SET memory_limit='%%s'" %% _limit_gb())
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
for t in %r:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
with open(sql_path) as f:
    sql = f.read()
con.execute(f"COPY ({sql}) TO '{out_path}' (FORMAT PARQUET)")
""" % (TABLES,)


def run_oracle(sf_dir: str, name: str, sql: str) -> pd.DataFrame:
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory(prefix="oracle_") as td:
        sql_path = f"{td}/q.sql"
        out_path = f"{td}/out.parquet"
        with open(sql_path, "w") as f:
            f.write(sql)
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, sf_dir, sql_path, out_path],
            capture_output=True, text=True)
        if r.returncode != 0:
            tail = (r.stderr or "").strip().splitlines()
            raise RuntimeError(tail[-1] if tail else f"exit {r.returncode}")
        df = pd.read_parquet(out_path)
        # fetchdf used to widen DECIMAL to float64; the COPY->parquet path
        # preserves it and pandas yields Decimal objects whose str() form
        # (trailing zeros) breaks the fallback comparison — re-widen
        import decimal
        for c in df.columns:
            if df[c].dtype == object:
                nn = df[c].dropna()
                if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
                    df[c] = df[c].astype(float)
        return df


def main(sf_dir: str, out_dir: str) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = canon(run_oracle(sf_dir, name, sql))
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
