"""Property tests (hypothesis) for the F1-F6 validation family —
the rules are pure logic, so we check them against a direct Python
re-implementation of the reference semantics
(orchestrator.py:89-212) on generated inputs."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from env_data_pipeline_spark.operators import validation as V


def ref_reject_reason(lat, lon, buffer_m, event_id, sources_csv):
    """Direct Python port of the reference's validation semantics."""
    if not (-90 <= lat <= 90):
        return "latitude_out_of_range"
    if not (-180 <= lon <= 180):
        return "longitude_out_of_range"
    if lat == 0 and lon == 0:
        return "null_island"
    continental = 24.5 <= lat <= 49.5 and -125 <= lon <= -67
    alaska = 54 <= lat <= 71.5 and (-180 <= lon <= -130 or 170 <= lon <= 180)
    hawaii = 18 <= lat <= 29 and -178 <= lon <= -154
    if not (continental or alaska or hawaii):
        return "outside_us_regions"
    buf = buffer_m if buffer_m is not None else V.DEFAULT_BUFFER_M
    if buf < 100:
        return "buffer_too_small"
    if buf > 50000:
        return "buffer_too_large"
    if event_id is not None:
        if len(event_id) > 100:
            return "event_id_too_long"
        if len(event_id) < 3:
            return "event_id_too_short"
        if not re.match(r"^[a-zA-Z0-9_-]+$", event_id):
            return "event_id_invalid_chars"
        low = event_id.lower()
        if any(s in low for s in V.BANNED_SUBSTRINGS):
            return "event_id_prohibited_content"
    if sources_csv is not None:
        srcs = sources_csv.split(",")
        if any(s not in V.VALID_SOURCES for s in srcs):
            return "invalid_source"
        if len(srcs) != len(set(srcs)):
            return "duplicate_sources"
    for v in (lat, lon):
        s = f"{v:.10f}".rstrip("0").rstrip(".")
        prec = len(s.split(".")[-1]) if "." in s else 0
        if prec > 8:
            return "precision_too_high"
    for v in (lat, lon):
        s = f"{v:.10f}".rstrip("0").rstrip(".")
        digits = re.sub(r"[^0-9]", "", s)
        if any(d * 5 in digits for d in "0123456789"):
            return "suspicious_coordinates"
    return None


lat_st = st.one_of(
    st.floats(min_value=-95, max_value=95, allow_nan=False, width=64),
    st.sampled_from([0.0, 34.0522, 44.44444, 33.123456789, 61.2, 21.3]),
)
lon_st = st.one_of(
    st.floats(min_value=-200, max_value=200, allow_nan=False, width=64),
    st.sampled_from([0.0, -118.2437, -111.11111, -117.123456789, 172.5, -157.8]),
)
buf_st = st.one_of(st.none(), st.integers(min_value=0, max_value=100000))
eid_st = st.one_of(
    st.none(),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789_-<>'\"; ",
        min_size=0,
        max_size=20,
    ),
    st.sampled_from(["evt_ok_123", "evt_select_1", "ab", "evt bad 9", "x" * 101]),
)
src_st = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "weather",
            "landfire,modis",
            "landfire,landfire",
            "weather,satellite",
            "landfire,modis,weather,topography",
        ]
    ),
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lat=lat_st, lon=lon_st, buf=buf_st, eid=eid_st, srcs=src_st)
def test_reject_reason_matches_reference_port(spark, lat, lon, buf, eid, srcs):
    got = (
        spark.createDataFrame(
            [(lat, lon, buf, eid, srcs)],
            "latitude double, longitude double, buffer_meters int, "
            "event_id string, sources_csv string",
        )
        .select(
            V.reject_reason(
                F.col("latitude"),
                F.col("longitude"),
                F.col("buffer_meters"),
                F.col("event_id"),
                F.col("sources_csv"),
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    assert got == ref_reject_reason(lat, lon, buf, eid, srcs)
