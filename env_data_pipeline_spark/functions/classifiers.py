"""Domain classifiers as pure Column expressions (SURVEY.md §2.10).

Each mirrors a reference Python function; all are nested CASE WHEN
chains — no UDFs, fully codegen'd, pushdown-transparent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fire_weather_risk(temp_c: Column, humidity_pct: Column, wind_mps: Column) -> Column:
    """Additive fire-weather risk score -> LOW/MODERATE/HIGH/EXTREME.

    Semantics of `_calculate_fire_weather_risk`
    (reference containers/weather/weather_container.py:187-233):
    temp >30:+3 >25:+2 >20:+1; humidity <20:+3 <40:+2 <60:+1;
    wind >15:+3 >10:+2 >5:+1; total >=7 EXTREME, >=5 HIGH,
    >=3 MODERATE, else LOW. Null wind defaults to 0
    (weather_container.py:153).
    """
    score = fire_weather_score(temp_c, humidity_pct, wind_mps)
    return (
        F.when(score >= 7, "EXTREME")
        .when(score >= 5, "HIGH")
        .when(score >= 3, "MODERATE")
        .otherwise("LOW")
    )


def fire_weather_score(temp_c: Column, humidity_pct: Column, wind_mps: Column) -> Column:
    """The raw additive score behind :func:`fire_weather_risk`."""
    wind = F.coalesce(wind_mps, F.lit(0.0))
    temp_pts = F.when(temp_c > 30, 3).when(temp_c > 25, 2).when(temp_c > 20, 1).otherwise(0)
    hum_pts = (
        F.when(humidity_pct < 20, 3)
        .when(humidity_pct < 40, 2)
        .when(humidity_pct < 60, 1)
        .otherwise(0)
    )
    wind_pts = F.when(wind > 15, 3).when(wind > 10, 2).when(wind > 5, 1).otherwise(0)
    return temp_pts + hum_pts + wind_pts


def vegetation_health(ndvi: Column) -> Column:
    """NDVI -> vegetation health class.

    Semantics of modis_container.py:264-276: >0.6 HEALTHY, >0.3
    MODERATE, >0.1 STRESSED, else SEVERELY_STRESSED; null NDVI (no
    valid observation) -> UNKNOWN (modis_container.py:261).
    """
    return (
        F.when(ndvi.isNull(), "UNKNOWN")
        .when(ndvi > 0.6, "HEALTHY")
        .when(ndvi > 0.3, "MODERATE")
        .when(ndvi > 0.1, "STRESSED")
        .otherwise("SEVERELY_STRESSED")
    )


def fire_risk_vegetation(ndvi: Column) -> Column:
    """NDVI -> vegetation-driven fire risk (modis_container.py:264-276)."""
    return (
        F.when(ndvi.isNull(), "UNKNOWN")
        .when(ndvi > 0.6, "LOW")
        .when(ndvi > 0.3, "MODERATE")
        .when(ndvi > 0.1, "HIGH")
        .otherwise("EXTREME")
    )


def terrain_class(elevation_range_m: Column) -> Column:
    """Elevation range -> terrain roughness / fire-risk-terrain class.

    Semantics of topography_container.py:265-274: >100 HIGH,
    >50 MODERATE, else LOW (same label for both derived fields).
    """
    return (
        F.when(elevation_range_m > 100, "HIGH")
        .when(elevation_range_m > 50, "MODERATE")
        .otherwise("LOW")
    )


def vegetation_type_class(pixel_value: Column) -> Column:
    """LANDFIRE vegetation pixel value -> class name (range fallback).

    Semantics of `_fallback_values['vegetation_type']`
    (landfire_container.py:68-77): 7000-7999 Urban/Developed,
    6000-6999 Agriculture/Cropland, 3000-3999 Forest, 2000-2999
    Grassland, 4000-4999 Shrubland, else 'Unknown Vegetation Type'.
    Also available as a broadcast range join — see operators/joins.py.
    """
    return (
        F.when((pixel_value >= 7000) & (pixel_value < 8000), "Urban/Developed")
        .when((pixel_value >= 6000) & (pixel_value < 7000), "Agriculture/Cropland")
        .when((pixel_value >= 3000) & (pixel_value < 4000), "Forest")
        .when((pixel_value >= 2000) & (pixel_value < 3000), "Grassland")
        .when((pixel_value >= 4000) & (pixel_value < 5000), "Shrubland")
        .otherwise("Unknown Vegetation Type")
    )


def fuel_model_class(pixel_value: Column) -> Column:
    """LANDFIRE fuel-model pixel value -> class name.

    Semantics of `_fallback_values['fuel_model']`
    (landfire_container.py:78-84): 90-99 Non-burnable, 100-109 Grass,
    110-129 Timber, 140-149 Shrub, else 'Unknown Fuel Model'.
    """
    return (
        F.when((pixel_value >= 90) & (pixel_value < 100), "Non-burnable")
        .when((pixel_value >= 100) & (pixel_value < 110), "Grass")
        .when((pixel_value >= 110) & (pixel_value < 130), "Timber")
        .when((pixel_value >= 140) & (pixel_value < 150), "Shrub")
        .otherwise("Unknown Fuel Model")
    )


def landfire_combined_risk(vegetation_class: Column, fuel_class: Column) -> Column:
    """Fire risk from the (vegetation_class, fuel_model_class) pair.

    Semantics of landfire_container.py:451-461 (J4 in SURVEY.md §2.5):
    developed/urban/water vegetation -> LOW; chaparral/timber/grass
    fuel -> MODERATE_TO_HIGH; else MODERATE.
    """
    veg = F.lower(F.coalesce(vegetation_class, F.lit("")))
    fuel = F.lower(F.coalesce(fuel_class, F.lit("")))
    veg_low = veg.contains("developed") | veg.contains("urban") | veg.contains("water")
    fuel_high = fuel.contains("chaparral") | fuel.contains("timber") | fuel.contains("grass")
    return (
        F.when(veg_low, "LOW")
        .when(fuel_high, "MODERATE_TO_HIGH")
        .otherwise("MODERATE")
    )


def data_quality_bucket(total_observations: Column) -> Column:
    """Observation count -> GOOD/LIMITED (modis_container.py:315, A8)."""
    return F.when(total_observations > 10, "GOOD").otherwise("LIMITED")
