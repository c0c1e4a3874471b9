"""Local re-implementation of the driver's oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, column names, and an
order-insensitive value multiset — so oracle breakage is caught in
pytest before the driver's per-round verify.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import duckdb

from env_data_pipeline_spark.catalog import TABLES

ROUND = 6


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ROUND)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    # timestamps/dates compare via isoformat text
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(row[i]) for i in order) for row in rows)


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark, name: str, spark_fn, oracle: str, sf_dir: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_duckdb(oracle, sf_dir)
    assert sorted(s_cols) == sorted(
        [c for c in d_cols]
    ), f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
    ms_s = _multiset(s_rows, s_cols)
    ms_d = _multiset(d_rows, d_cols)
    if ms_s != ms_d:
        only_s = list((ms_s - ms_d).items())[:5]
        only_d = list((ms_d - ms_s).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only in spark: {only_s}\n only in duckdb: {only_d}"
        )
