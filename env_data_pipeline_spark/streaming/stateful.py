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


SESSION_GAP_MS = 30 * 60 * 1000
SESSION_GAP_US = SESSION_GAP_MS * 1000

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("v_u", T.LongType()),
    ]
)


def _make_session_expiry_fn():
    """Kernel for idle-session expiry with EVENT-TIME TIMEOUT state
    eviction (VERDICT r5 item 6 — the streaming/stateful matrix
    previously ran NoTimeout only). Nested closure: cloudpickle
    serializes by value, executors never import this repo.

    Per user key, per batch WITH data: merge the (possibly existing)
    open session with the batch's events sorted by event time, split
    on >= 30 min gaps (the same extends-iff-strictly-before-prev+gap
    rule as Spark session windows), emit every session CLOSED by gap
    evidence immediately, keep the trailing open session in state and
    arm an event-time timeout at last_event + 30 min. When the
    watermark passes that timestamp the key fires the TIMED-OUT path
    (no data): the open session emits as final and the state is
    REMOVED — idle keys cannot accrete state forever. The emission
    set is batching-invariant: a session emits exactly once, either
    on the gap that closes it or on its timeout.

    Money discipline: values fold as round-half-up 1e-4 integer units
    so the emitted total is summation-order-proof against the SQL
    oracle."""

    def expire_sessions(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            start_us, last_us, n, v_u = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us + SESSION_GAP_US],
                    "n_events": [n],
                    "total_value": [v_u / 10000.0],
                }
            )
            return
        frames = [p[["ts", "value"]] for p in pdfs if len(p)]
        if not frames:
            return
        import numpy as np

        batch = pd.concat(frames)
        # Arrow hands ts as datetime64[ns]; event time in micros
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()
        # round-half-up 1e-4 units, the same floor(x*1e4 + 0.5) the
        # oracle replays (values are non-negative in this stream)
        v_us = np.floor(batch["value"].to_numpy() * 10000.0 + 0.5).astype("int64")
        order = ts_us.argsort(kind="stable")
        ts_us, v_us = ts_us[order], v_us[order]

        if state.exists:
            cur_start, cur_last, cur_n, cur_v = state.get
        else:
            cur_start, cur_last, cur_n, cur_v = int(ts_us[0]), int(ts_us[0]), 0, 0
        closed = []
        for t, v in zip(ts_us.tolist(), v_us.tolist()):
            if cur_n and t - cur_last >= SESSION_GAP_US:
                closed.append((cur_start, cur_last, cur_n, cur_v))
                cur_start, cur_last, cur_n, cur_v = t, t, 0, 0
            cur_n += 1
            cur_v += v
            # a late-but-admitted event can precede the open session's
            # span (cross-batch); extend the span, never shrink it
            if t < cur_start:
                cur_start = t
            if t > cur_last:
                cur_last = t
        state.update((cur_start, cur_last, cur_n, cur_v))
        # timeout at ms resolution (the GroupState clock): floor of the
        # last event's micros
        state.setTimeoutTimestamp(cur_last // 1000 + SESSION_GAP_MS)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] + SESSION_GAP_US for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] / 10000.0 for c in closed],
                }
            )

    return expire_sessions


def stateful_session_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the event stream through the timeout-evicting session
    kernel. availableNow's trailing no-data batch is where the
    event-time timeouts fire: every user idle >= 30 min as of the
    final watermark emits its last session and drops its state; only
    sessions still inside the idle horizon stay unemitted (state
    bound: one open session per active key)."""
    stream = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .select("user_id", "ts", "value")
    )
    updates = stream.groupBy("user_id").applyInPandasWithState(
        _make_session_expiry_fn(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )
    out = _drain(spark, updates, "stateful_session_expiry", "update")
    return out.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )


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
