"""Join/lookup operators J1-J4 (SURVEY.md §2.5).

The pixel-classification lookup of the reference
(`_interpret_single_value`, landfire_container.py:118-132) checks an
exact-value map first, then range containment, then a per-product
default. Engine form: two broadcast joins against the attribute
dimension — an equi-join for the exact rows (J2, the S3 CSV table) and
a range join for the fallback rows (J1) — with COALESCE precedence
exact > range > default.

Scale: the attribute table is ~1k rows — always broadcast, so the
range join is a broadcast-nested-loop over a tiny build side (fine),
and the exact join a broadcast hash join. If the dimension ever grows
large, bucket pixel values (floor(pv/1000)) to turn the range join
into an equi-join (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# landfire_container.py:68-84: per-product defaults; products with no
# fallback map fall through to 'Unknown (<value>)'
PRODUCT_DEFAULTS = {
    "vegetation_type": "Unknown Vegetation Type",
    "fuel_model": "Unknown Fuel Model",
}


def default_label(product: Column, pixel_value: Column) -> Column:
    expr = None
    for prod, label in PRODUCT_DEFAULTS.items():
        expr = (F.when(product == prod, label) if expr is None
                else expr.when(product == prod, label))
    return expr.otherwise(
        F.concat(F.lit("Unknown ("), pixel_value.cast("string"), F.lit(")"))
    )


def classify_pixels(pixels: DataFrame, attributes: DataFrame) -> DataFrame:
    """J1+J2: annotate a pixel relation (must carry `product`,
    `pixel_value`) with `interpreted` class, exact-before-range
    precedence (landfire_container.py:122-130)."""
    exact = attributes.filter(F.col("exact_value").isNotNull()).select(
        F.col("product").alias("a_product"),
        F.col("exact_value"),
        F.col("class_name").alias("exact_class"),
    )
    ranges = attributes.filter(F.col("is_fallback")).select(
        F.col("product").alias("r_product"),
        F.col("lo"),
        F.col("hi"),
        F.col("class_name").alias("range_class"),
    )
    out = (
        pixels.join(
            F.broadcast(exact),
            (pixels.product == exact.a_product)
            & (pixels.pixel_value == exact.exact_value),
            "left",
        )
        .join(
            F.broadcast(ranges),
            (pixels.product == ranges.r_product)
            & (pixels.pixel_value >= ranges.lo)
            & (pixels.pixel_value < ranges.hi),
            "left",
        )
    )
    return out.withColumn(
        "interpreted",
        F.coalesce(
            F.col("exact_class"),
            F.col("range_class"),
            default_label(F.col("product"), F.col("pixel_value")),
        ),
    ).drop("a_product", "exact_value", "exact_class", "r_product", "lo", "hi", "range_class")
