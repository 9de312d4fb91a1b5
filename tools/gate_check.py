"""Local replica of the driver correctness gate.

Runs every queries() entry at a given sf dir on Spark AND its
oracle_sql() twin on DuckDB, compares row count, column names, and an
order-insensitive value hash (values normalized: floats rounded via
repr of round(12), NaN/None unified). Exit 1 on any mismatch.

Usage: python tools/gate_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "∅"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(norm_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)
    )
    import hashlib

    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir  # ANN model literals track the data
    import __spark_entry__ as entrymod
    from fdblucene_spark.session import get_spark

    spark = get_spark("gate-check", cores=8, extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and not __import__("re").search(name_filter, name):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"ok?  {name}: rows={len(got)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        try:
            exp = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        if not problems and frame_hash(got) != frame_hash(exp):
            problems.append("value-hash mismatch")
            merged = _diff(got, exp)
            problems.append(merged)
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


def _diff(got: pd.DataFrame, exp: pd.DataFrame) -> str:
    cols = sorted(got.columns)
    g = {
        "|".join(norm_cell(v) for v in rec)
        for rec in got[cols].itertuples(index=False, name=None)
    }
    e = {
        "|".join(norm_cell(v) for v in rec)
        for rec in exp[cols].itertuples(index=False, name=None)
    }
    only_g = list(g - e)[:3]
    only_e = list(e - g)[:3]
    return f"spark-only={only_g} oracle-only={only_e}"


if __name__ == "__main__":
    main()
