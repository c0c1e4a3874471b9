"""AS-OF join (SURVEY.md §2.5, engine-native surface).

The reference's "latest observation at request time" (W1 is the
degenerate per-request form) generalized to a real as-of join. Spark
has no native ASOF; the scalable composition is the MERGE pattern:

  union both sides tagged with a side marker
  -> one shuffle on the join key
  -> sort within partition by (ts, side, tiebreak)
  -> last(right_payload, ignorenulls) over rows(-inf, -1)
  -> keep left rows

One shuffle, no range cross-join, state per key = one row — the same
shape a sort-merge as-of join executes on any engine, so it holds at
100 TB (skewed keys are split by AQE like any other shuffle). The
strict flag controls whether an equal-timestamp right row matches
(strict=True: it does not), enforced purely by the sort order of the
side marker; ties among right rows at the same timestamp are broken
by the caller's tiebreak column so results are deterministic
(SURVEY.md §7.3.1: never rely on implicit order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with the same ``on`` key and right_ts < left_ts (<= if strict is
    False); left rows with no prior right row keep a null payload."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    # side sorts AFTER left rows at equal ts when strict (excluded by
    # the rows(-inf,-1) frame), BEFORE when inclusive
    left_side, right_side = (0, 1) if strict else (1, 0)

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tie"),
        payload.alias("_r"),
    )
    l_tagged = l_tagged.withColumn("_r", F.lit(None).cast(r_tagged.schema["_r"].dataType))
    r_tagged = r_tagged.withColumn("_l", F.lit(None).cast(l_tagged.schema["_l"].dataType))

    u = l_tagged.select("_k", "_ts", "_side", "_tie", "_l", "_r").unionByName(
        r_tagged.select("_k", "_ts", "_side", "_tie", "_l", "_r")
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    return matched.filter(F.col("_side") == left_side).select("_l.*", "_match")
