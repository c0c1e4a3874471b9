"""Every fixture derivation must produce identical row multisets on
Spark and DuckDB — the foundation the domain-operator oracles stand on.
"""

from __future__ import annotations

import pytest

from env_data_pipeline_spark.sources import fixtures
from tests.oracle import _multiset, run_duckdb


@pytest.mark.parametrize("name", sorted(fixtures.FIXTURES))
def test_fixture_parity(spark, sf_dir, name):
    fixtures.ensure_fixtures(spark, sf_dir, (name,))
    sdf = spark.table(name)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_duckdb(
        f"{fixtures.duck_with(name)} SELECT * FROM {name}", sf_dir
    )
    assert sorted(s_cols) == sorted(d_cols), f"{name}: cols {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    ms, md = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        raise AssertionError(f"{name}:\n spark-only {only_s}\n duck-only {only_d}")


def test_fixture_memo_reregisters_on_sf_switch(spark):
    """The registration memo must not serve a stale view when the
    scale factor changes mid-session."""
    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    fixtures.ensure_fixtures(spark, sf_a, ("weather_current",))
    n_a = spark.table("weather_current").count()
    fixtures.ensure_fixtures(spark, sf_b, ("weather_current",))
    n_b = spark.table("weather_current").count()
    assert n_b == 10 * n_a
    fixtures.ensure_fixtures(spark, sf_a, ("weather_current",))
    assert spark.table("weather_current").count() == n_a
