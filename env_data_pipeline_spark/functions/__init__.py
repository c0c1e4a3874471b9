"""Scalar expression library (SURVEY.md §2.2, §2.8, §2.10).

Every reference "function" that operates row-at-a-time is exposed as a
pure ``pyspark.sql.Column`` builder — JVM-side, whole-stage-codegen
eligible, zero Python UDFs in the hot path.
"""

from env_data_pipeline_spark.functions.classifiers import (
    data_quality_bucket,
    fire_weather_risk,
    fuel_model_class,
    landfire_combined_risk,
    terrain_class,
    vegetation_health,
    vegetation_type_class,
)
from env_data_pipeline_spark.functions.scalar import (
    buffer_degrees,
    center_element,
    epoch_to_timestamp,
    lst_celsius,
    modis_date_code,
    ndvi_scaled,
    precipitation_mm,
    processing_time_ms,
    quality_score,
    request_id_col,
)

__all__ = [
    "buffer_degrees",
    "center_element",
    "data_quality_bucket",
    "epoch_to_timestamp",
    "fire_weather_risk",
    "fuel_model_class",
    "landfire_combined_risk",
    "lst_celsius",
    "modis_date_code",
    "ndvi_scaled",
    "precipitation_mm",
    "processing_time_ms",
    "quality_score",
    "request_id_col",
    "terrain_class",
    "vegetation_health",
    "vegetation_type_class",
]
