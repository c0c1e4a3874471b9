"""Count-Min sketch primitives shared by the batch query
(plans/relational_ext.py::events_cms_user_counts), the streaming
refresh (streaming/incremental_refresh.py) and the merge-equivalence
test — ONE definition of the hash rows and the cell build, so the
batch, streaming and test variants cannot drift.

CMS is the engine's mergeable FREQUENCY structure (KMV covers
distinct counts, Bloom covers membership): d x w integer cells,
per-partition sketches combine by cell-wise ADDITION, estimates are
min over rows and can only overcount. Hashes follow the engine-wide
md5-prefix convention (extensions/text.py::md5_prefix_hash) so every
DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import text as TX

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row


def cms_bucket(j: int, key: Column) -> Column:
    """Row-j bucket of a key: md5-prefix of 'j:key' mod CMS_W."""
    return (
        TX.md5_prefix_hash(F.concat_ws(":", F.lit(str(j)), key.cast("string")))
        % CMS_W
    )


def _row_structs(key: Column) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("bigint").alias("j"),
                cms_bucket(j, key).alias("b"),
            )
            for j in range(CMS_D)
        ]
    )


def cms_cells(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Build the (j, b, n) cell table — ONE map-side-combinable
    aggregate; the sketch is the CMS_D*CMS_W-cell state regardless of
    input size."""
    return (
        df.select(F.explode(_row_structs(F.col(key))).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition — the mergeability that lets every
    partition/micro-batch sketch independently."""
    return (
        a.unionByName(b).groupBy("j", "b").agg(F.sum("n").alias("n"))
    )


def cms_probe_sample(events: DataFrame, key: str = "user_id") -> DataFrame:
    """The deterministic audit sample shared by the batch query and
    the streaming refresh: every 97th key with its EXACT count (the
    exact side exists only for this audit, only for the sample)."""
    return (
        events.filter(F.col(key) % 97 == 0)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("true_count"))
    )


def cms_probe(cells: DataFrame, probes: DataFrame, key: str = "user_id") -> DataFrame:
    """Estimate = min over rows of the probed cells; emitted next to
    the exact count carried on ``probes`` (columns: key, true_count)
    with the CMS overestimate >= 0 guarantee in the output."""
    p = probes.select(
        key,
        "true_count",
        F.explode(_row_structs(F.col(key))).alias("p"),
    )
    return (
        p.join(
            F.broadcast(cells),
            (F.col("p.j") == F.col("j")) & (F.col("p.b") == F.col("b")),
        )
        .groupBy(key, "true_count")
        .agg(F.min("n").cast("bigint").alias("cms_estimate"))
        .select(
            key,
            F.col("true_count").cast("bigint").alias("true_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(key)
    )


def cms_oracle_sql() -> str:
    """The DuckDB replay of build+probe — shared verbatim by the
    batch query and the streaming refresh (whose final state must
    equal the one-shot sketch, so the oracle is identical)."""
    return f"""
    WITH cells AS (
        SELECT r.j,
               ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':'
                                   || CAST(user_id AS VARCHAR)), 1, 12))
                   ::BIGINT % {CMS_W} AS b,
               COUNT(*) AS n
        FROM events CROSS JOIN range({CMS_D}) r(j)
        GROUP BY 1, 2
    ),
    pu AS (
        SELECT user_id, COUNT(*) AS true_count
        FROM events WHERE user_id % 97 = 0 GROUP BY 1
    ),
    probe AS (
        SELECT pu.user_id, pu.true_count, MIN(c.n) AS cms_estimate
        FROM pu CROSS JOIN range({CMS_D}) r(j)
        JOIN cells c
          ON c.j = r.j
         AND c.b = ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':'
                                       || CAST(pu.user_id AS VARCHAR)), 1, 12))
                       ::BIGINT % {CMS_W}
        GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - true_count AS BIGINT) AS overestimate
    FROM probe
    ORDER BY user_id
    """
