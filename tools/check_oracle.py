"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir and compares against its
``oracle_sql()`` twin via DuckDB: row count, column names/types (loose), and
an order-insensitive value hash (columns sorted by name, rows sorted,
values normalized). Usage::

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v) -> str:
    if v is None or v != v:  # NaN/None
        return "∅"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.session import (
        get_spark,
    )

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(sdf)} rows ({dt:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif frame_hash(sdf) != frame_hash(odf):
            problems.append("value hash mismatch")
            merged = sdf[sorted(sdf.columns)].round(6) if len(sdf) else sdf
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {', '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"PASS  {name}: {len(sdf)} rows ({dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
