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


# --------------------------------------------------------------------------
# HyperLogLog: the engine's mergeable DISTINCT-COUNT structure with a
# MAX merge algebra — completing the sketch family's three algebras
# (CMS merges by ADD, KMV by min-k truncation, Bloom by OR, HLL by
# register-wise MAX). All arithmetic is integer-exact on both engines:
# the register rank comes from length(bin(w)) (identical semantics in
# Spark and DuckDB, including bin(0) = '0'), the harmonic sum is a
# BIGINT of 2^(31-rank) terms, and the estimate is a single integer
# division with the alpha_64 constant carried as the exact rational
# 709/1000 — so the DuckDB oracle replays the estimate bit for bit.
# The standard small-range correction (linear counting when the raw
# estimate <= 5m/2 and zero registers exist) is applied WITHOUT any
# runtime transcendental: LC(V) = floor(m * ln(m / V)) has only m - 1
# possible values, precomputed here once with Python's math.log and
# baked into both engines' expressions as the same integer constants
# — the float-parity discipline for a function SQL ln() would
# otherwise evaluate in engine-specific low bits.
# --------------------------------------------------------------------------

HLL_M = 64  # registers (6 index bits)
HLL_WBITS = 30  # rank bits per register -> rank in 1..31
# alpha_64 = 0.7213/(1 + 1.079/64) ~= 0.70934, carried as 709/1000;
# numerator of the estimate: alpha_num * m^2 * 2^WBITS+1 (~6.2e15,
# far inside BIGINT; denominator <= alpha_den * m * 2^31 ~= 1.4e14)
HLL_ALPHA_NUM = 709
HLL_ALPHA_DEN = 1000
HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << (HLL_WBITS + 1))
# linear-counting lookup, 1-indexed by V = number of ZERO registers
HLL_LC = [
    int(HLL_M * __import__("math").log(HLL_M / v)) for v in range(1, HLL_M)
]
HLL_LC_THRESHOLD = (5 * HLL_M) // 2  # raw estimate <= 5m/2 -> correct


def hll_registers(df: DataFrame, key: str, group: str) -> DataFrame:
    """Per-``group`` HLL register table (group, idx, m): idx is the
    low 6 bits of the engine-wide 48-bit md5 prefix, the rank is
    1 + leading-zeros of the next 30 bits, m the per-register MAX.
    One map-side-combinable aggregate; the sketch is <= |groups| * 64
    rows regardless of input size."""
    h = TX.md5_prefix_hash(F.col(key).cast("string"))
    w = F.shiftright(h, 6).bitwiseAND(F.lit((1 << HLL_WBITS) - 1))
    rank = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group).alias("g"), (h % HLL_M).alias("idx"), rank.alias("r"))
        .groupBy("g", "idx")
        .agg(F.max("r").alias("m"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise MAX — the merge that lets every partition,
    micro-batch, or per-group sketch combine associatively."""
    return a.unionByName(b).groupBy("g", "idx").agg(F.max("m").alias("m"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Raw-HLL estimate per group from a register table: harmonic sum
    as BIGINT (absent registers contribute 2^30+1... i.e. 2^WBITS+1-0),
    one integer division. Columns: g, n_registers_hit, hll_estimate."""
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_hit"),
        # shiftleft's python wrapper wants a literal bit count; the
        # SQL form accepts the column expression
        F.expr(
            f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_WBITS + 1} - m))"
        ).alias("s_hit"),
    )
    lc_arr = ", ".join(str(x) for x in HLL_LC)
    raw = (
        f"{HLL_EST_NUM} div ({HLL_ALPHA_DEN} * "
        f"(s_hit + ({HLL_M} - n_hit) * {1 << (HLL_WBITS + 1)}))"
    )
    return agg.select(
        "g",
        F.col("n_hit").cast("bigint").alias("n_registers_hit"),
        F.expr(
            f"CAST(CASE WHEN ({raw}) <= {HLL_LC_THRESHOLD} "
            f"AND n_hit < {HLL_M} "
            f"THEN element_at(array({lc_arr}), "
            f"CAST({HLL_M} - n_hit AS INT)) "
            f"ELSE ({raw}) END AS BIGINT)"
        ).alias("hll_estimate"),
    )


HLL_ALL = "ALL"  # merged-row label in the by-type report


def hll_report(spark, events: DataFrame, key: str = "user_id",
               group: str = "event_type") -> DataFrame:
    """The shared batch/streaming OUTPUT: per-group rows plus an ALL
    row whose registers are the MAX-MERGE of the per-group sketches
    (mergeability in data: building on the union directly would give
    the identical registers), each with the exact distinct count as
    audit column. Thin wrapper: build registers, then finalize — the
    streaming refresh finalizes its PERSISTED register state through
    the same hll_report_from_registers, so the two cannot drift."""
    return hll_report_from_registers(
        spark, hll_registers(events, key, group), events, key, group
    )


def hll_report_from_registers(spark, regs: DataFrame, events: DataFrame,
                              key: str = "user_id",
                              group: str = "event_type") -> DataFrame:
    """Finalize a per-group register table (one-shot batch build or
    the streaming refresh's persisted state) into the report rows."""
    merged = regs.groupBy("idx").agg(F.max("m").alias("m")).select(
        F.lit(HLL_ALL).alias("g"), "idx", "m"
    )
    est = hll_estimate(regs.unionByName(merged))
    exact = (
        events.groupBy(F.col(group).alias("g"))
        .agg(F.countDistinct(key).alias("true_distinct"))
        .unionByName(
            events.agg(
                F.lit(HLL_ALL).alias("g"),
                F.countDistinct(key).alias("true_distinct"),
            )
        )
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias(group),
            "n_registers_hit",
            "hll_estimate",
            F.col("true_distinct").cast("bigint").alias("true_distinct"),
        )
        .orderBy(group)
    )


def hll_oracle_sql() -> str:
    """DuckDB replay of the full by-type report (registers, ALL
    max-merge, integer estimate, exact audit) — shared verbatim by the
    batch query and the streaming refresh."""
    shift = 1 << (HLL_WBITS + 1)
    return f"""
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                   AS hv
        FROM events
    ),
    r AS (
        SELECT event_type AS g, hv % {HLL_M} AS idx,
               MAX(CASE WHEN (hv >> 6) & {(1 << HLL_WBITS) - 1} = 0
                        THEN {HLL_WBITS + 1}
                        ELSE {HLL_WBITS + 1}
                             - length(bin((hv >> 6) & {(1 << HLL_WBITS) - 1}))
                   END) AS m
        FROM h GROUP BY 1, 2
    ),
    allr AS (
        SELECT * FROM r
        UNION ALL
        SELECT '{HLL_ALL}' AS g, idx, MAX(m) AS m FROM r GROUP BY 2
    ),
    s AS (
        SELECT g, COUNT(*) AS n_hit,
               SUM((1::BIGINT << ({HLL_WBITS + 1} - m))) AS s_hit
        FROM allr GROUP BY 1
    ),
    est AS (
        SELECT g, n_hit,
               CASE WHEN raw <= {HLL_LC_THRESHOLD} AND n_hit < {HLL_M}
                    THEN ([{", ".join(str(x) for x in HLL_LC)}])
                         [{HLL_M} - n_hit]
                    ELSE raw END AS hll_estimate
        FROM (
          SELECT g, n_hit,
                 {HLL_EST_NUM} // ({HLL_ALPHA_DEN}
                     * (s_hit + ({HLL_M} - n_hit) * {shift})) AS raw
          FROM s
        )
    ),
    ex AS (
        SELECT event_type AS g, COUNT(DISTINCT user_id) AS true_distinct
        FROM events GROUP BY 1
        UNION ALL
        SELECT '{HLL_ALL}' AS g, COUNT(DISTINCT user_id) FROM events
    )
    SELECT est.g AS event_type,
           CAST(est.n_hit AS BIGINT) AS n_registers_hit,
           CAST(est.hll_estimate AS BIGINT) AS hll_estimate,
           CAST(ex.true_distinct AS BIGINT) AS true_distinct
    FROM est JOIN ex ON ex.g = est.g
    ORDER BY event_type
    """
