"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 engine-native; the charter's named mechanism for
operators Spark's built-ins can't express).

Running per-event-type totals with explicit keyed state: each
micro-batch folds its Arrow batches into the group's state
(count, sum) and emits the running total. The final emitted row per
key equals the batch aggregation, which is what makes this the rare
stateful operator with a full SQL oracle.

Scale posture: state is two numbers per key, partitioned by the
group key in the state store; throughput is bounded by the Arrow
batch transfer, not per-row Python. The kernel is a nested closure so
executors never need this repo on PYTHONPATH (cloudpickle serializes
it by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from env_data_pipeline_spark.streaming.event_trigger import _drain, _event_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("v", T.DoubleType())]
)


def _make_totals_fn():
    def update_totals(key, pdfs, state):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        import pandas as pd

        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return update_totals


def stateful_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the event stream through the stateful kernel; keep the
    final (highest-count) emission per key so the result is the
    deterministic end-of-stream total regardless of micro-batch
    count."""
    stream = _event_stream(spark, sf_dir).select("event_type", "value")
    updates = stream.groupBy("event_type").applyInPandasWithState(
        _make_totals_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    all_updates = _drain(spark, updates, "stateful_event_totals", "update")
    final = all_updates.groupBy("event_type").agg(
        F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s")
    )
    return final.select(
        "event_type",
        F.col("s.n_events").alias("n_events"),
        F.round(F.col("s.total_value"), 4).alias("total_value"),
    )
