"""Measured scale proof for the bucketed approximate-NN paths
(VERDICT r3 item 4): time must grow SLOWER than data.

These are the queries whose whole design is "equi-join on a bucket,
never all-pairs"; if someone reintroduces a cross-join stage, the
time ratio blows past the data ratio long before the plan-audit
sees a CartesianProduct (a broadcast nested loop would pass that).
Bounds are deliberately generous (2x the data ratio) so scheduler
noise on a loaded machine cannot flake the suite — a genuinely
quadratic stage overshoots 10-100x.
"""

from __future__ import annotations

import time

import pytest

from env_data_pipeline_spark.plans import registry

registry.load_all()

# sf0.001 and sf0.01 ship IDENTICAL documents/embeddings tables (500
# rows each), so that pair has data_ratio == 1.0 and the assertion
# degenerates to a noise-vs-noise timing compare. sf0.01 -> sf0.1 is
# the only pair with real growth (documents 10x, embeddings 4x).
LO = "/root/testdata/sf0.01"
HI = "/root/testdata/sf0.1"

SCALE_QUERIES = ["similarity_topk_lsh", "similarity_topk_ivf", "dedup_minhash_lsh"]


def _best_of_two(spark, name: str, sf_dir: str) -> float:
    registry.QUERIES[name](spark, sf_dir).count()  # warm-up
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_bucketed_paths_scale_sublinearly(spark, name):
    from env_data_pipeline_spark.catalog import table

    src = "embeddings" if name.startswith("similarity") else "documents"
    data_ratio = table(spark, HI, src).count() / table(spark, LO, src).count()
    assert data_ratio > 1.5, (
        f"tier pair carries no data growth ({data_ratio:.2f}x) — "
        "the sublinearity assertion would be noise-vs-noise"
    )
    t_lo = _best_of_two(spark, name, LO)
    t_hi = _best_of_two(spark, name, HI)
    ratio = t_hi / t_lo
    assert ratio <= 2 * data_ratio, (
        f"{name}: time ratio {ratio:.2f} vs data ratio {data_ratio:.2f} — "
        "a bucketed path should scale well under the data growth"
    )


MONEY_SUM_QUERIES = [
    "flagship_pricing_summary",
    "revenue_by_region",
    "revenue_rollup_region_nation",
]


@pytest.mark.parametrize("name", MONEY_SUM_QUERIES)
def test_money_sums_oracle_parity_at_high_tier(spark, name):
    """Regression for the sf0.1-only money-sum cliff: these queries'
    group totals reach ~1e10, where a raw ROUND(SUM(double)) flips
    between engines on summation order (the default sf0.001 parity
    suite cannot see this — sums are too small). Exact 1e-4-unit
    integer accounting must keep them hash-equal at the big tier."""
    from tests.oracle import compare

    compare(spark, name, registry.QUERIES[name], registry.ORACLES[name], HI)
