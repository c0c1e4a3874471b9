"""Independent reference for requests_user_trajectory: pure-Python
haversine over the same fixture derivation."""

from __future__ import annotations

import math

from env_data_pipeline_spark.plans.envpipe import requests_user_trajectory
from env_data_pipeline_spark.sources.fixtures import REQUESTS_SQL


def _hav_m(lat1, lon1, lat2, lon2):
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return math.floor(2.0 * 6371.0088 * math.asin(math.sqrt(a)) * 1000 + 0.5)


def test_trajectory_matches_python_reference(spark, sf_dir):
    """Replay the full pipeline in Python from the fixture SQL's own
    Spark rendering (so the reference shares the coordinate derivation
    but NOT the window/agg machinery) and compare every user row."""
    from env_data_pipeline_spark.catalog import table

    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    raw = spark.sql(REQUESTS_SQL).selectExpr(
        "CAST(substr(request_id, 5) AS BIGINT) AS eid",
        "ts",
        "latitude AS lat",
        "longitude AS lon",
    )
    ev = {
        r.event_id: r.user_id
        for r in table(spark, sf_dir, "events").select("event_id", "user_id").collect()
    }
    pts = {}
    for r in raw.collect():
        if not (-90 <= r.lat <= 90 and -180 <= r.lon <= 180):
            continue
        if r.lat == 0 and r.lon == 0:
            continue
        pts.setdefault(ev[r.eid], []).append((r.ts, r.eid, r.lat, r.lon))

    expect = {}
    for uid, rows in pts.items():
        rows.sort()
        legs = [
            _hav_m(a[2], a[3], b[2], b[3]) for a, b in zip(rows, rows[1:])
        ]
        expect[uid] = (
            len(rows),
            len(legs),
            round(sum(legs) / 1000.0, 3) if legs else None,
            round(max(legs) / 1000.0, 3) if legs else None,
        )

    got = {
        r.user_id: (r.n_points, r.n_legs, r.total_km, r.max_leg_km)
        for r in requests_user_trajectory(spark, sf_dir).collect()
    }
    assert got == expect
    # the fixture plants multi-point users, so legs must exist
    assert any(v[1] > 0 for v in got.values())


def test_haversine_known_distance(spark, sf_dir):
    """Sanity pin: the formula used by the engine reproduces a
    textbook great-circle distance (Paris-London ~343.5 km)."""
    d = _hav_m(48.8566, 2.3522, 51.5074, -0.1278) / 1000.0
    assert 340.0 < d < 347.0
