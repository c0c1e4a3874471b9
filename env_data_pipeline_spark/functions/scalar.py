"""Scalar projection expressions P1-P14 (SURVEY.md §2.2, §2.8).

All pure Column builders — arithmetic / string / date functions the
reference computes imperatively, expressed so Catalyst can constant-
fold and push them down.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METERS_PER_DEGREE = 111000.0
NDVI_SCALE = 0.0001
LST_SCALE = 0.02
KELVIN_OFFSET = 273.15


def epoch_to_timestamp(epoch_seconds: Column) -> Column:
    """P3: epoch seconds -> timestamp (weather_container.py:149,173)."""
    return F.timestamp_seconds(epoch_seconds)


def ndvi_scaled(raw: Column) -> Column:
    """P4: MODIS raw NDVI int -> [-1, 1] float (modis_container.py:255)."""
    return raw * F.lit(NDVI_SCALE)


def lst_celsius(raw: Column) -> Column:
    """P5: MODIS raw LST -> Celsius (modis_container.py:296-298)."""
    return raw * F.lit(LST_SCALE) - F.lit(KELVIN_OFFSET)


def buffer_degrees(buffer_meters: Column) -> Column:
    """P6: meters -> degrees (landfire_container.py:221)."""
    return buffer_meters / F.lit(METERS_PER_DEGREE)


def precipitation_mm(rain_3h: Column, snow_3h: Column) -> Column:
    """P2: precip = rain.3h + snow.3h, each defaulted to 0
    (weather_container.py:181)."""
    return F.coalesce(rain_3h, F.lit(0.0)) + F.coalesce(snow_3h, F.lit(0.0))


def modis_date_code(d: Column) -> Column:
    """P9: date -> 'AYYYYDDD' MODIS code (modis_container.py:96-98)."""
    return F.concat(F.lit("A"), F.year(d).cast("string"), F.lpad(F.dayofyear(d).cast("string"), 3, "0"))


def modis_window_start(ts: Column, days_back: Column) -> Column:
    """P10: start = ts - max(days_back, 90) days (modis_container.py:88-94)."""
    return F.date_sub(ts.cast("date"), F.greatest(days_back, F.lit(90)))


def center_element(arr: Column) -> Column:
    """P11: center of the pixel list — raw_values[len//2]
    (modis_container.py:253-255). element_at is 1-based, so the
    0-based len//2 index becomes floor(size/2)+1."""
    return F.element_at(arr, (F.floor(F.size(arr) / 2) + 1).cast("int"))


def quality_score(errors: Column) -> Column:
    """P12: 1.0 if no errors else 0.8 (landfire_container.py:390 et al.)."""
    return F.when(F.size(errors) == 0, F.lit(1.0)).otherwise(F.lit(0.8))


def request_id_col() -> Column:
    """P13: 'req_' + 12 hex chars (orchestrator.py:73-75)."""
    return F.concat(F.lit("req_"), F.substring(F.regexp_replace(F.uuid(), "-", ""), 1, 12))


def processing_time_ms(start_ts: Column, end_ts: Column) -> Column:
    """P14: elapsed milliseconds (orchestrator.py:742 et al.)."""
    return (end_ts.cast("double") * 1000 - start_ts.cast("double") * 1000).cast("long")


def bbox_struct(lat: Column, lon: Column, buffer_m: Column) -> Column:
    """P8: bbox = (lon-d, lat-d, lon+d, lat+d)
    (landfire_container.py:259)."""
    d = buffer_degrees(buffer_m)
    return F.struct(
        (lon - d).alias("min_lon"),
        (lat - d).alias("min_lat"),
        (lon + d).alias("max_lon"),
        (lat + d).alias("max_lat"),
    )
