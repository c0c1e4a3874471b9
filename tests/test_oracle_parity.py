"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive values) so regressions surface in pytest first.
"""

from __future__ import annotations

import pytest

from env_data_pipeline_spark.plans import registry
from tests.oracle import compare

registry.load_all()

ORACLE_CASES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0
