"""Unit tests with hand-computed goldens for the classifier /scalar
expression library (FIXTURES.md §B9: full threshold truth table for
fire risk, center-index semantics, quality score)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from env_data_pipeline_spark.functions import classifiers as C
from env_data_pipeline_spark.functions import scalar as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# fire-weather risk truth table: every threshold cell + the exact
# boundary totals at scores 3/5/7 (weather_container.py:199-233)
RISK_CASES = [
    # temp, humidity, wind -> (score, label)
    (15.0, 80, 0.0, "LOW"),        # 0+0+0 = 0
    (21.0, 80, 0.0, "LOW"),        # 1
    (21.0, 50, 0.0, "LOW"),        # 1+1 = 2
    (21.0, 50, 6.0, "MODERATE"),   # 1+1+1 = 3 boundary
    (26.0, 50, 6.0, "MODERATE"),   # 2+1+1 = 4
    (26.0, 30, 6.0, "HIGH"),       # 2+2+1 = 5 boundary
    (31.0, 30, 6.0, "HIGH"),       # 3+2+1 = 6
    (31.0, 30, 11.0, "EXTREME"),   # 3+2+2 = 7 boundary
    (31.0, 10, 16.0, "EXTREME"),   # 3+3+3 = 9
    (30.0, 20, 5.0, "MODERATE"),   # strict boundaries: 2+2+0 = 4
]


@pytest.mark.parametrize("temp,hum,wind,expected", RISK_CASES)
def test_fire_weather_risk(spark, temp, hum, wind, expected):
    label = _one(
        spark, C.fire_weather_risk(F.lit(temp), F.lit(hum), F.lit(wind))
    )
    # recompute expected from the reference rules to keep the table honest
    score = (
        (3 if temp > 30 else 2 if temp > 25 else 1 if temp > 20 else 0)
        + (3 if hum < 20 else 2 if hum < 40 else 1 if hum < 60 else 0)
        + (3 if wind > 15 else 2 if wind > 10 else 1 if wind > 5 else 0)
    )
    ref = (
        "EXTREME" if score >= 7 else "HIGH" if score >= 5
        else "MODERATE" if score >= 3 else "LOW"
    )
    assert label == ref
    assert expected == ref, "truth-table row disagrees with the rules"


def test_fire_weather_risk_null_wind(spark):
    # null wind defaults to 0 (weather_container.py:153)
    label = _one(
        spark,
        C.fire_weather_risk(F.lit(31.0), F.lit(10), F.lit(None).cast("double")),
    )
    assert label == "HIGH"  # 3 + 3 + 0 = 6


@pytest.mark.parametrize(
    "ndvi,health,risk",
    [
        (0.7, "HEALTHY", "LOW"),
        (0.61, "HEALTHY", "LOW"),
        (0.6, "MODERATE", "MODERATE"),   # strict >
        (0.31, "MODERATE", "MODERATE"),
        (0.3, "STRESSED", "HIGH"),
        (0.11, "STRESSED", "HIGH"),
        (0.1, "SEVERELY_STRESSED", "EXTREME"),
        (-0.5, "SEVERELY_STRESSED", "EXTREME"),
        (None, "UNKNOWN", "UNKNOWN"),
    ],
)
def test_vegetation_health(spark, ndvi, health, risk):
    col = F.lit(ndvi).cast("double")
    assert _one(spark, C.vegetation_health(col)) == health
    assert _one(spark, C.fire_risk_vegetation(col)) == risk


@pytest.mark.parametrize(
    "rng,expected", [(150.0, "HIGH"), (100.0, "MODERATE"), (51.0, "MODERATE"), (50.0, "LOW"), (0.0, "LOW")]
)
def test_terrain_class(spark, rng, expected):
    assert _one(spark, C.terrain_class(F.lit(rng))) == expected


def test_center_element_matches_python_len_floor_div(spark):
    # P11: raw_values[len(raw_values) // 2] (modis_container.py:253)
    for arr in ([1, 2, 3], [10, 20, 30, 40, 50], [7], [1, 2, 3, 4]):
        got = _one(spark, S.center_element(F.lit(arr)))
        assert got == arr[len(arr) // 2], arr


def test_scaling_constants(spark):
    assert _one(spark, S.ndvi_scaled(F.lit(6500))) == pytest.approx(0.65)
    assert _one(spark, S.lst_celsius(F.lit(15000))) == pytest.approx(26.85)
    assert _one(spark, S.buffer_degrees(F.lit(11100))) == pytest.approx(0.1)


def test_quality_score(spark):
    # P12: 1.0 if no errors else 0.8
    assert _one(spark, S.quality_score(F.lit([]).cast("array<string>"))) == 1.0
    assert _one(spark, S.quality_score(F.lit(["boom"]))) == 0.8


def test_landfire_classifiers(spark):
    assert _one(spark, C.vegetation_type_class(F.lit(7500))) == "Urban/Developed"
    assert _one(spark, C.vegetation_type_class(F.lit(1999))) == "Unknown Vegetation Type"
    assert _one(spark, C.fuel_model_class(F.lit(105))) == "Grass"
    assert _one(spark, C.fuel_model_class(F.lit(135))) == "Unknown Fuel Model"
    assert (
        _one(spark, C.landfire_combined_risk(F.lit("Urban/Developed"), F.lit("Timber")))
        == "LOW"
    )
    assert (
        _one(spark, C.landfire_combined_risk(F.lit("Forest"), F.lit("Timber")))
        == "MODERATE_TO_HIGH"
    )
    assert (
        _one(spark, C.landfire_combined_risk(F.lit("Forest"), F.lit("Non-burnable")))
        == "MODERATE"
    )
