"""The docstrings promise mergeable approximate swaps for the exact
aggregates at 100 TB (approx_percentile for percentile,
approx_count_distinct for count_distinct). These tests make the
promise concrete: the approximate forms must run on the same inputs
and land within their documented error bounds — so the swap is a
one-line change whose cost is KNOWN, not a hope."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_percentile_within_documented_error(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    accuracy = 10_000  # default: error <= 1/accuracy of the rank space
    row = li.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(
            f"approx_percentile(l_extendedprice, 0.5, {accuracy})"
        ).alias("approx"),
        F.count("*").alias("n"),
    ).first()
    # rank error <= n/accuracy positions; translate to a value bound
    # via the observed spread per rank (loose but scale-independent:
    # compare against the exact p45/p55 envelope)
    lo, hi = (
        li.select(
            F.expr("percentile(l_extendedprice, 0.45)"),
            F.expr("percentile(l_extendedprice, 0.55)"),
        ).first()
    )
    assert lo <= row["approx"] <= hi, (
        f"approx p50 {row['approx']} outside exact p45..p55 [{lo}, {hi}]"
    )


def test_approx_count_distinct_within_documented_rsd(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    rsd = 0.05
    row = ev.select(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd).alias("approx"),
    ).first()
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    # HLL++ rsd is a standard deviation, not a hard cap — allow 4 sigma
    assert rel_err <= 4 * rsd, (
        f"approx distinct {row['approx']} vs exact {row['exact']}: "
        f"relative error {rel_err:.4f} > {4 * rsd}"
    )
