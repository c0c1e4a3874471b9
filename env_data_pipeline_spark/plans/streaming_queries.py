"""Registry entries for the streaming slice (SURVEY.md §2.9).

Both run REAL streaming queries (micro-batch engine, state store,
watermark) drained synchronously; the windowed aggregation is
SQL-expressible so it gets a full oracle — date_trunc('hour') is
exactly the tumbling-window start for 1-hour windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from env_data_pipeline_spark.plans.registry import query
from env_data_pipeline_spark.sources.fixtures import duck_with
from env_data_pipeline_spark.streaming import event_trigger as ET


@query(
    "streaming_windowed_event_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    -- Spark's WatermarkTracker holds the watermark in MILLISECONDS
    -- (max event time floored to ms, minus the delay); truncate the
    -- oracle's cutoff the same way so a max(ts) with sub-ms micros
    -- cannot admit a window Spark hasn't finalized. Exact-boundary
    -- ties (max(ts) hour-aligned at ms precision) are excluded by
    -- tests/test_testdata_contract.py::test_events_max_ts_not_hour_aligned.
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <=
          (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR FROM events)
    GROUP BY 1, 2
    """,
)
def streaming_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming agg, APPEND mode (bounded state: a
    window's state is evicted when the watermark finalizes it) —
    oracle-checked against the batch date_trunc equivalent restricted
    to finalized windows (window end <= max(ts) - 1h watermark)."""
    return ET.windowed_event_counts(spark, sf_dir)


@query(
    "streaming_sliding_window_counts",
    oracle="""
    WITH w AS (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts)
                       - INTERVAL 30 MINUTE]) AS ws
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM w
    -- same ms-truncated watermark finalization cutoff as the tumbling
    -- oracle: only windows whose END the watermark has passed emit
    WHERE ws + INTERVAL 1 HOUR <=
          (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR
           FROM events)
    GROUP BY 1, 2
    """,
)
def streaming_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming agg (1 h length, 30 min slide): every
    event lands in exactly two overlapping windows; both engines align
    buckets to 30-minute epoch multiples, so the oracle fans each row
    to its two window starts relationally and applies the identical
    finalization cutoff. Completes the window-class coverage:
    tumbling, session, sliding."""
    return ET.sliding_window_counts(spark, sf_dir)


@query(
    "streaming_priority_routing",
    oracle="""
    WITH typed AS (
      SELECT event_id,
             CASE WHEN event_id % 17 = 15 THEN 'deleted'
                  WHEN event_id % 17 = 16 THEN CAST(NULL AS STRING)
                  WHEN event_id % 3 = 0 THEN 'created'
                  WHEN event_id % 3 = 1 THEN 'updated'
                  ELSE 'location_changed' END AS event_type,
             CASE WHEN event_id % 19 = 18 THEN 'urgent'
                  WHEN event_id % 4 = 0 THEN 'low'
                  WHEN event_id % 4 = 1 THEN 'normal'
                  WHEN event_id % 4 = 2 THEN 'high'
                  ELSE 'emergency' END AS priority
      FROM events
    )
    SELECT event_id, event_type, priority,
           CASE WHEN priority = 'emergency' THEN 'landfire,modis,weather,topography'
                WHEN event_type = 'created' THEN 'landfire,modis,weather,topography'
                ELSE 'weather' END AS sources_scheduled,
           CASE WHEN priority = 'emergency' THEN 60
                WHEN event_type = 'created' THEN 120
                ELSE 30 END AS estimated_completion_seconds
    FROM typed
    WHERE event_type IN ('created', 'updated', 'location_changed')
      AND priority IN ('low', 'normal', 'high', 'emergency')
    """,
)
def streaming_priority_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5/O6: the event-trigger path as a streaming query — routing
    per event, emitted in append mode."""
    return ET.priority_routed_events(spark, sf_dir)


@query(
    "streaming_cache_dedup",
    oracle="""
    SELECT DISTINCT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
    FROM events
    """,
)
def streaming_cache_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8/X1 streaming analog: dropDuplicatesWithinWatermark on the
    (user, hour) cache key — bounded dedup state; the emitted key set
    over a full replay equals batch DISTINCT, so it gets a full
    oracle."""
    return ET.cache_dedup_keys(spark, sf_dir)


@query(
    "streaming_enriched_events",
    oracle=f"""
    {duck_with("requests")},
    dim AS (
      SELECT CAST(substring(request_id, 5) AS BIGINT) AS event_id,
             request_id, priority, event_type AS request_event_type
      FROM requests
    )
    SELECT e.event_id, d.request_id, e.event_type, d.request_event_type, d.priority
    FROM events e JOIN dim d ON d.event_id = e.event_id
    """,
)
def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: live events x static requests
    dimension (1:1 on the event key), broadcast per micro-batch —
    equals the batch join over a full replay, so full oracle."""
    return ET.enriched_events(spark, sf_dir)


@query(
    "streaming_stateful_event_totals",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY event_type
    """,
)
def streaming_stateful_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-event-type totals with explicit keyed state (streaming/
    stateful.py). The end-of-stream emission equals the batch
    aggregate, so this stateful path gets a full SQL oracle."""
    from env_data_pipeline_spark.streaming.stateful import stateful_event_totals

    return stateful_event_totals(spark, sf_dir)


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_event_id,
           b.event_id AS purchase_event_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us,
           ROUND(b.value, 4) AS purchase_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: live views x live purchases on
    user_id within a 2-hour attribution window, both sides
    watermarked so buffered state evicts at the horizon
    (streaming/event_trigger.py::stream_stream_attribution). Inner
    matches emit on arrival, so the full replay equals the batch
    interval join — full oracle."""
    return ET.stream_stream_attribution(spark, sf_dir)


@query(
    "streaming_stream_stream_left_join",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    -- the engine's global watermark is the MIN of both sides'
    -- (multipleWatermarkPolicy=min), each = ms-truncated side max - 1h
    wm AS (
      SELECT least(
               (SELECT date_trunc('millisecond', max(ts)) FROM v),
               (SELECT date_trunc('millisecond', max(ts)) FROM p)
             ) - INTERVAL 1 HOUR AS w
    )
    SELECT v.user_id,
           v.event_id AS view_event_id,
           p.event_id AS purchase_event_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
           ROUND(p.value, 4) AS purchase_value
    FROM v
    LEFT JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
    -- matched pairs emit on arrival (inner semantics); an unmatched
    -- view emits its NULL row only once the watermark proves no
    -- future purchase can match (view evicted from join state)
    WHERE p.event_id IS NOT NULL
       OR v.ts + INTERVAL 2 HOUR < (SELECT w FROM wm)
    """,
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join with watermark null
    emission (streaming/event_trigger.py::stream_stream_attribution_left):
    unmatched views surface as (view, NULL) when the global watermark
    passes view_ts + 2h. Oracle = batch left join restricted to
    matched rows plus finalized-unmatched rows under the identical
    min-of-sides ms-truncated watermark."""
    return ET.stream_stream_attribution_left(spark, sf_dir)


@query(
    "streaming_stream_stream_semi_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_event_id,
           epoch_us(v.ts) AS view_ts_us
    FROM events v
    WHERE v.event_type = 'view'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = v.user_id
          AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
      )
    """,
)
def streaming_stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-SEMI stream-stream interval join
    (streaming/event_trigger.py::stream_stream_attribution_semi): each
    converted view emits exactly once on its first match; unconverted
    views never emit (their state evicts silently), so the oracle is a
    plain EXISTS with no watermark clause — semi-join emission needs
    only match evidence, never finalization."""
    return ET.stream_stream_attribution_semi(spark, sf_dir)


@query(
    "streaming_stream_stream_full_outer_join",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id, ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT least(
               (SELECT date_trunc('millisecond', max(ts)) FROM v),
               (SELECT date_trunc('millisecond', max(ts)) FROM p)
             ) - INTERVAL 1 HOUR AS w
    )
    SELECT COALESCE(v.user_id, p.user_id) AS user_id,
           v.event_id AS view_event_id,
           p.event_id AS purchase_event_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
           ROUND(p.value, 4) AS purchase_value
    FROM v
    FULL JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
    -- matched pairs emit on arrival; an unmatched VIEW finalizes when
    -- the watermark passes its 2 h match horizon; an unmatched
    -- PURCHASE finalizes when the watermark passes its own event time
    -- (any later view lies outside the interval by construction)
    WHERE (v.event_id IS NOT NULL AND p.event_id IS NOT NULL)
       OR (p.event_id IS NULL
           AND v.ts + INTERVAL 2 HOUR < (SELECT w FROM wm))
       OR (v.event_id IS NULL AND p.ts < (SELECT w FROM wm))
    """,
)
def streaming_stream_stream_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL-OUTER stream-stream interval join
    (streaming/event_trigger.py::stream_stream_attribution_full):
    both unmatched sides surface under watermark finalization —
    views at view_ts + 2h, purchases at purchase_ts. Oracle = batch
    full join restricted to matched rows plus each side's finalized
    unmatched rows under the identical min-of-sides ms-truncated
    watermark."""
    return ET.stream_stream_attribution_full(spark, sf_dir)


@query(
    "streaming_stateful_session_expiry",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
      FROM events
    ),
    m AS (
      SELECT user_id, ts, value,
             SUM(CASE WHEN pts IS NULL
                        OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM o
    ),
    s AS (
      SELECT user_id, sid,
             MIN(epoch_us(ts)) AS session_start_us,
             MAX(epoch_us(ts)) + 1800000000 AS session_end_us,
             MAX(ts) AS last_ts,
             COUNT(*) AS n_events,
             ROUND(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                   / 10000.0, 4) AS total_value
      FROM m GROUP BY user_id, sid
    ),
    wm AS (
      SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR AS w
      FROM events
    )
    SELECT user_id, session_start_us, session_end_us,
           n_events, total_value
    FROM s
    -- watermark-gated finality, the built-in session-window rule: a
    -- session emits exactly once, when the ms-floored last event
    -- + 30 min falls strictly below the watermark (the GroupState
    -- clock is milliseconds) — gap evidence alone does NOT emit,
    -- because a late-but-admitted event could still merge into any
    -- session whose horizon the watermark has not passed
    WHERE date_trunc('millisecond', last_ts) + INTERVAL 30 MINUTE
          < (SELECT w FROM wm)
    """,
)
def streaming_stateful_session_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator with EVENT-TIME TIMEOUT eviction
    (streaming/stateful.py::stateful_session_expiry): per-user
    sessions emit when the watermark passes last_event + gap, and
    finalized events DROP out of state. Oracle = gaps-and-islands
    sessionization over globally sorted event time under the same
    ms-clock watermark cutoff — the kernel re-splits its raw pending
    suffix every batch, so the two agree for ANY batching/ordering of
    admitted events (ADVICE r6)."""
    from env_data_pipeline_spark.streaming.stateful import stateful_session_expiry

    return stateful_session_expiry(spark, sf_dir)


@query(
    "streaming_session_windows",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
      FROM events
    ),
    m AS (
      SELECT user_id, ts, value,
             SUM(CASE WHEN pts IS NULL
                        -- Spark session semantics: an event EXTENDS the
                        -- session iff it lands strictly before prev+gap,
                        -- so a new session opens at diff >= gap (the
                        -- batch query's island rule uses > — different
                        -- operator family, pinned separately)
                        OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM o
    ),
    s AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 4) AS total_value
      FROM m GROUP BY user_id, sid
    )
    SELECT strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
           user_id, n_events, total_value
    FROM s
    WHERE session_end <=
          (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 1 HOUR
           FROM events)
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (session_window + watermark,
    append mode): per-user 30-min-gap sessions emitted exactly once
    when finalized. The oracle rebuilds the same sessions relationally
    (gaps-and-islands with Spark's >=-gap split rule) under the same
    ms-truncated watermark finalization cutoff as the tumbling-window
    oracle."""
    return ET.session_window_stats(spark, sf_dir)
