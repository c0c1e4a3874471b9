"""Skew-handling operators (SURVEY.md §4; charter: salting for skew).

AQE's skew-join splitting handles skewed JOIN partitions at runtime,
but a low-cardinality AGGREGATION (five event types across a 100 TB
corpus -> five reduce keys on a 1000-executor cluster) still funnels
every row of a hot key through one task at the final step unless the
aggregate is split. ``salted_aggregate`` is the standard two-phase
decomposition: aggregate on (key, salt) first — spreading each hot
key over ``n_salt`` tasks — then combine the partials on the key.
Only valid for algebraic aggregates whose partials compose (sum,
count, min, max — the caller supplies both phases explicitly so the
composition is visible and testable).

The salt is deterministic (hash of a high-cardinality column mod
n_salt), so results are reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    salt_source: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) with ``partial_aggs``,
    then groupBy(key) with ``final_aggs`` over the partial columns."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salt)))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
