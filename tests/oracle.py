"""Local re-implementation of the driver's oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares them two ways:

1. semantic multiset — order-insensitive values with floats rounded
   and Decimals coerced (catches real wrong answers);
2. driver-faithful canonicalization — both results go through pandas
   exactly like the round driver's hasher (Spark rows via
   pd.DataFrame inference, DuckDB via .df() so HUGEINT becomes
   float64), columns sorted by name, rows sorted by all columns, then
   every cell rendered type-sensitively (int 2 != float 2.0,
   -0.0 != 0.0, lists are unsortable errors). This surfaces
   oracle-output *typing* drift in pytest before the driver's
   per-round verify (round-1 lesson: 8 red driver rows were all
   type-level, none semantic).
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import duckdb
import pandas as pd

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


# ---------------------------------------------------------------------------
# driver-faithful canonicalization
# ---------------------------------------------------------------------------

_NULL = "∅"  # rendered null marker


def _render_value(v):
    """Type-sensitive scalar rendering: int vs float vs bool are
    distinct; -0.0 renders '-0.0'; datetimes/dates via isoformat."""
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return _NULL
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    return f"s:{v}"


def _render_series(s: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.map(lambda v: _NULL if pd.isna(v) else f"t:{pd.Timestamp(v).isoformat()}")
    if pd.api.types.is_bool_dtype(s):
        return s.map(lambda v: _NULL if pd.isna(v) else f"b:{bool(v)}")
    if pd.api.types.is_float_dtype(s):
        return s.map(lambda v: _NULL if pd.isna(v) else f"f:{float(v)!r}")
    if pd.api.types.is_integer_dtype(s):
        return s.map(lambda v: _NULL if pd.isna(v) else f"i:{int(v)}")
    return s.map(_render_value)


def _driver_canon(pdf: pd.DataFrame, engine: str, name: str) -> list[tuple]:
    """Mirror the driver's _canon: sorted columns, sort_values over all
    columns (raises on unhashable cells, e.g. list columns), then a
    type-sensitive rendering of every cell."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    try:
        pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    except TypeError as ex:
        raise AssertionError(
            f"{name}: {engine} result is not driver-canonicalizable "
            f"(unsortable column — serialize arrays/maps to strings): {ex}"
        ) from ex
    rendered = {c: _render_series(pdf[c]) for c in cols}
    return list(zip(*(rendered[c].tolist() for c in cols))) if cols else []


def run_duckdb(sql: str, sf_dir: str):
    cols, rows, _ = run_duckdb_full(sql, sf_dir)
    return cols, rows


def run_duckdb_full(sql: str, sf_dir: str):
    """Run an oracle, preferring in-process DuckDB; on an allocation
    failure retry ONCE in a spawned subprocess with its own address
    space. Root cause of the in-process failures: the compare harness
    hosts a JVM + Arrow + DuckDB in one process, and DuckDB's jemalloc
    maps its 256 KB blocks individually — a multi-GB oracle
    (landfire_viz_arrays at sf0.1) exhausts the kernel's 65530-entry
    per-process map table long before RAM runs out ('Failed to
    allocate block of 262144 bytes (bad allocation)' with 120 GB
    free). In-process DuckDB is therefore bounded (threads=8,
    memory_limit=10GB, spill dir); the rare oracle that genuinely needs
    more gets a fresh process whose whole map table is DuckDB's."""
    try:
        return _run_duckdb(sql, sf_dir, "10GB")
    except Exception as ex:  # retry isolated only for allocation errors
        if "alloc" not in str(ex).lower():
            raise
        import multiprocessing as mp

        ctx = mp.get_context("spawn")  # never fork a JVM-bearing process
        try:
            with ctx.Pool(1) as pool:
                return pool.apply(_run_duckdb, (sql, sf_dir, "12GB"))
        except Exception as retry_ex:
            # the spawn retry can itself fail for unrelated reasons
            # (e.g. the child can't re-import this module under a
            # nonstandard path) — never let that mask the allocation
            # error being retried
            raise RuntimeError(
                f"duckdb oracle: in-process run failed ({ex}) and the "
                f"spawned-subprocess retry also failed"
            ) from retry_ex


def _run_duckdb(sql: str, sf_dir: str, mem: str):
    import shutil
    import tempfile

    con = duckdb.connect()
    # in-memory DuckDB has NO spill location by default — give it one
    # so the cap degrades to disk offload instead of an allocation
    # error on the biggest oracles. PER-CONNECTION dir: concurrent
    # harness processes (pytest + a verify sweep) would collide on
    # DuckDB's instance-local temp block filenames in a shared dir.
    spill = tempfile.mkdtemp(prefix="duckdb_oracle_spill_")
    try:
        con.execute("SET threads = 8")
        con.execute(f"SET memory_limit = '{mem}'")
        con.execute(f"SET temp_directory = '{spill}'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        types = [str(d[1]) for d in cur.description]
        rows = cur.fetchall()
        # .df() mirrors the driver's DuckDB materialization (HUGEINT ->
        # float64, nullable BIGINT -> float64), re-run cheaply off the
        # same connection for the driver-faithful pass
        pdf = con.execute(sql).df()
        # .df() widens DATE to datetime64 midnight; the driver's hasher
        # matched DATE oracle outputs against Spark date objects in r01
        # (modis_date_codes green), so restore date-ness for declared
        # DATE columns to avoid a false drift alarm
        for c, t in zip(cols, types):
            if t.upper() == "DATE" and pd.api.types.is_datetime64_any_dtype(pdf[c]):
                pdf[c] = pdf[c].dt.date
        return cols, rows, pdf
    finally:
        # close even on failure: a dying connection left open pins its
        # buffer pool and poisons every later oracle in the sweep
        con.close()
        shutil.rmtree(spill, ignore_errors=True)


def compare(spark, name: str, spark_fn, oracle: str, sf_dir: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    # STREAM the result instead of collect(): toLocalIterator holds at
    # most one partition in the driver JVM at a time, so wide results
    # (landfire_viz_arrays at sf0.1: 225k JSON-array rows) compare fine
    # on the default 1g heap — the 8g carve-out this harness used to
    # need was a collect() artifact, not an engine cost. Rows still
    # accumulate Python-side for the multiset/canon passes, which is
    # process RAM, not JVM heap.
    s_rows = [tuple(r) for r in sdf.toLocalIterator(prefetchPartitions=True)]
    d_cols, d_rows, d_pdf = run_duckdb_full(oracle, sf_dir)
    assert sorted(s_cols) == sorted(
        [c for c in d_cols]
    ), f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}"

    # 1) semantic comparison (tolerant of types, strict on values)
    ms_s = _multiset(s_rows, s_cols)
    ms_d = _multiset(d_rows, d_cols)
    if ms_s != ms_d:
        only_s = list((ms_s - ms_d).items())[:5]
        only_d = list((ms_d - ms_s).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only in spark: {only_s}\n only in duckdb: {only_d}"
        )

    # 2) driver-faithful comparison (strict on types/rendering)
    s_pdf = pd.DataFrame(s_rows, columns=s_cols)
    s_canon = _driver_canon(s_pdf, "spark", name)
    d_canon = _driver_canon(d_pdf, "duckdb", name)
    if s_canon != d_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: DRIVER-HASH drift (semantics equal, output types/"
            f"rendering differ — fix oracle/query output types)\n"
            f" first diffs (row, spark, duckdb): {diffs}"
        )
