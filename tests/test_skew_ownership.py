"""Which mechanism owns skew at scale (VERDICT r3 item 5).

Two skew cases exist in the engine and they have DIFFERENT owners:

- Skewed JOIN partitions: AQE's OptimizeSkewedJoin splits them at
  runtime — no salting needed, and the engine relies on it (AQE is on
  in the session defaults).
- Skewed AGGREGATION keys: AQE has no rule for this — a hot group key
  still funnels through one reduce task. Spark's map-side partial
  aggregation absorbs it for algebraic aggregates with FEW partials,
  but holistic aggregates (collect_list, exact distinct) ship every
  row to the reducer. That case is owned by the explicit two-phase
  salted decomposition (operators/skew.py::salted_aggregate).

This suite proves both halves empirically on a planted 95%-hot-key
dataset, so a Spark upgrade that adds agg-skew handling (or drops the
join rule) fails a NAMED assert here instead of silently changing the
engine's scale posture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # tiny thresholds so the planted skew triggers at test scale
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_session(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_fact(spark):
    """200k rows, 95% on key 0, padded so the hot partition crosses
    the (lowered) skew thresholds."""
    return spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_owns_join_skew(skew_session):
    """A 95%-hot-key shuffle join must come back from AQE with the hot
    partition SPLIT: the executed plan carries SortMergeJoin(skew=true)
    over an 'AQEShuffleRead skewed' — the engine's joins need no manual
    salting at any scale while this holds."""
    spark = skew_session
    fact = _skewed_fact(spark)
    dim = spark.range(97).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("d")
    )
    j = fact.join(dim, "k").select("k")
    # collect() (not count()) so THIS DataFrame's QueryExecution is the
    # one AQE finalizes — count() plans a separate aggregate tree
    assert len(j.collect()) == 200_000
    plan = _executed_plan(j)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_aqe_does_not_split_agg_skew(skew_session):
    """The SAME hot key through a holistic aggregation (collect_list:
    partials cannot shrink below one element per row) gets NO skew
    handling from AQE — pinning that agg skew is salting's job, not
    something the runtime quietly fixed."""
    spark = skew_session
    fact = _skewed_fact(spark)
    agg = (
        fact.groupBy("k")
        .agg(F.collect_list("pad").alias("l"))
        .select("k", F.size("l").alias("n"))
    )
    agg.collect()
    plan = _executed_plan(agg)
    assert "isFinalPlan=true" in plan
    assert "skew" not in plan.lower().replace("skewedpartition", ""), plan


def test_salted_aggregate_spreads_hot_key(spark, sf_dir):
    """The salted decomposition's PARTIAL stage must shuffle on
    (key, _salt) — the hot key fans over n_salt reduce tasks — and the
    final stage combines on the bare key. Both exchanges visible in
    the plan; results proven exact by the events_salted_type_stats
    oracle row."""
    from env_data_pipeline_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["events_salted_type_stats"](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    import re

    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_salt" in k and "event_type" in k for k in keys), keys
    assert any("_salt" not in k and "event_type" in k for k in keys), keys
