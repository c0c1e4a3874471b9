"""Incremental maintenance operators: key-based upsert merge and
mergeable partial-aggregate refresh.

The reference pipeline recollects from scratch per request
(`containers/orchestrator/orchestrator.py:569-618`, no incremental
path); at 100 TB a corpus is maintained, not rebuilt — nightly deltas
merge into the base by key, and standing aggregates refresh from
partial states instead of rescanning history.

Scale posture:
- merge_upsert is ONE shuffle join on the merge key; with both sides
  written bucketed by that key (operators/bucketing.py) the exchange
  disappears entirely — the standard physical design for a
  repeatedly-merged table.
- refresh_partial_aggs never touches base ROWS: it combines
  base-side partial states (count/sum/min/max, the mergeable algebra)
  with the delta's partials — the same re-aggregation Spark itself
  performs between map-side and final aggregation, lifted to
  pipeline granularity. The refresh cost is O(|delta| + |groups|),
  independent of |base|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """SQL MERGE semantics without a table format: full-outer join on
    ``key``; update rows win over base rows, unmatched updates insert,
    unmatched base rows carry through. Adds ``op_col`` recording what
    happened per row ('insert' / 'update' / 'unchanged').

    Columns are taken pairwise-coalesced (update side first), so both
    inputs must share a schema."""
    cols = [c for c in base.columns if c != key]
    if set(cols) != {c for c in updates.columns if c != key}:
        raise ValueError(
            f"merge_upsert: schema mismatch {base.columns} vs {updates.columns}"
        )
    b = base.alias("b")
    u = updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    has_b = F.col(f"b.{key}").isNotNull()
    has_u = F.col(f"u.{key}").isNotNull()
    merged: list[Column] = [
        F.coalesce(F.col(f"u.{key}"), F.col(f"b.{key}")).alias(key)
    ]
    merged += [
        F.when(has_u, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in cols
    ]
    op = (
        F.when(~has_b, "insert")
        .when(~has_u, "unchanged")
        .otherwise("update")
    )
    return joined.select(*merged, op.alias(op_col))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    base_date: str,
    batch_date: str,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history maintenance: apply one
    update batch (effective ``batch_date``) to a current-only dimension
    snapshot whose rows are all valid since ``base_date``.

    For a key with a changed attribute the old row is CLOSED
    (valid_to = batch_date, is_current = false) and a new CURRENT row
    opens at batch_date; keys without an update — or whose update
    changes nothing — keep their single open row. The reference
    pipeline has no dimension history at all (attribute CSVs are
    overwritten in place, `containers/landfire/landfire_container.py:54-84`);
    at 100 TB scale attribute changes must be auditable, so history is
    the maintained artifact.

    Plan shape: ONE left shuffle join on ``key`` (bucket-elidable like
    merge_upsert), then a map-side per-row fan-out via an inline array
    — a changed key emits its two history rows from the same joined
    row, so there is no second scan of either input and no union of
    re-joined branches."""
    u_attrs = [F.col(f"u.{c}").alias(f"u_{c}") for c in attrs]
    joined = dim.alias("b").join(
        updates.alias("u").select(F.col(key), *u_attrs), key, "left"
    )
    changed = F.col(f"u_{attrs[0]}").isNotNull() & (
        ~F.struct(*[F.col(f"b.{c}") for c in attrs]).eqNullSafe(
            F.struct(*[F.col(f"u_{c}").alias(c) for c in attrs])
        )
    )

    def _row(cols: list[Column], valid_from: str, valid_to: str | None, current: bool) -> Column:
        return F.struct(
            *[c.alias(a) for c, a in zip(cols, attrs)],
            F.to_date(F.lit(valid_from)).alias("valid_from"),
            (
                F.to_date(F.lit(valid_to)) if valid_to else F.lit(None).cast("date")
            ).alias("valid_to"),
            F.lit(current).alias("is_current"),
        )

    old_cols = [F.col(f"b.{c}") for c in attrs]
    new_cols = [F.col(f"u_{c}") for c in attrs]
    fanout = F.when(
        changed,
        F.array(
            _row(old_cols, base_date, batch_date, False),
            _row(new_cols, batch_date, None, True),
        ),
    ).otherwise(F.array(_row(old_cols, base_date, None, True)))
    return joined.select(F.col(key), F.explode(fanout).alias("r")).select(
        key, "r.*"
    )


#: the mergeable partial-aggregate state this module maintains
PARTIAL_AGGS = ("n_rows", "sum_value", "min_value", "max_value")


def partial_aggs(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Per-group mergeable state: count/sum/min/max over ``value``.
    Everything derivable from these (avg = sum/count) is computed at
    read time, never stored — stored derived values cannot merge."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(value).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def refresh_partial_aggs(base_state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two partial states into the refreshed state — the
    count/sum/min/max merge algebra. Associative and commutative, so
    any delta batching (hourly, daily, replayed) yields the same
    state."""
    return (
        base_state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
