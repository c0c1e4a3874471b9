"""Warehouse data-quality audits: referential integrity and digit-law
profiling.

The ops a 100 TB ingest gate runs BEFORE analytics trusts the data:

- ``referential_integrity_audit``: every foreign-key edge of the star
  schema checked for orphans and NULL keys in one pass — the pre-join
  contract a pipeline validates before fanning out joins whose
  anti-rows would otherwise vanish silently.
- ``orders_benford_digit_profile``: leading-digit distribution of
  order totals vs Benford's law in exact integer permille units — the
  classic synthetic/fraudulent-data smell test.

No reference counterpart (the reference validates request payloads,
not relational integrity — ``shared_schema.py`` only type-checks);
both are engine-native additions in the SURVEY §2.12 spirit.

Cross-engine float discipline: neither query lets a float near a
comparison — counts are BIGINT, proportions are integer permille via
floor division (`div` == DuckDB `//` for non-negative operands), and
the Benford reference mass is a literal integer table, not log10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from env_data_pipeline_spark.catalog import table
from env_data_pipeline_spark.extensions.text import md5_prefix_hash
from env_data_pipeline_spark.plans.registry import query

# (edge label, child table, child key, parent table, parent key,
#  parent is dim-sized -> broadcast)
_FK_EDGES: tuple[tuple[str, str, str, str, str, bool], ...] = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
)


def _ri_oracle() -> str:
    """One SELECT per FK edge, generated from the same edge list the
    engine iterates, so the two sides cannot drift. NOT EXISTS (never
    NOT IN) so a hypothetical NULL parent key cannot poison the
    predicate."""
    parts = []
    for label, child, key, parent, pkey, _ in _FK_EDGES:
        parts.append(f"""
        SELECT '{label}' AS fk_edge,
               (SELECT COUNT(*) FROM {child}) AS n_child_rows,
               (SELECT COUNT(*) FROM {child} WHERE {key} IS NULL)
                   AS n_null_keys,
               (SELECT COUNT(*) FROM {child} c
                WHERE c.{key} IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pkey} = c.{key}))
                   AS n_orphan_rows,
               (SELECT COUNT(DISTINCT c.{key}) FROM {child} c
                WHERE c.{key} IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pkey} = c.{key}))
                   AS n_orphan_keys
        """)
    return " UNION ALL ".join(parts)


@query("referential_integrity_audit", oracle=_ri_oracle())
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan/NULL audit of all seven FK edges of the star schema: one
    row per edge with child cardinality, NULL-key rows, orphan rows,
    and distinct orphan keys. A clean warehouse reports zeros — the
    query's value is the contract, and it must be cheap enough to run
    per ingest batch.

    Scale: per edge the child is first collapsed to (key, count) with
    a map-side-combined groupBy — the ONLY shuffle that carries child
    volume, and it carries one row per distinct key, not per child
    row. Orphan detection is then a LEFT ANTI join of that key-sized
    table against the parent's key projection: broadcast for the five
    dim-sized parents, shuffle equi-join for lineitem->orders (both
    sides already key-partitioned by the groupBy). Nothing fact-sized
    is ever joined wholesale, and the 7 edges are independent unioned
    one-row aggregates, so the whole audit is embarrassingly parallel.
    """
    out: DataFrame | None = None
    for label, child, key, parent, pkey, dim in _FK_EDGES:
        keyed = (
            table(spark, sf_dir, child)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pkeys = table(spark, sf_dir, parent).select(F.col(pkey).alias("k")).distinct()
        if dim:
            pkeys = F.broadcast(pkeys)
        nonnull = keyed.filter(F.col("k").isNotNull())
        if not dim:
            # fact-sized parent (orders): pin sort-merge so AQE can't
            # broadcast a data-sized key set at test SF (memory: AQE
            # data-sized-broadcast hazard) — at 100 TB that side OOMs
            nonnull = nonnull.hint("merge")
        orphans = nonnull.join(pkeys, "k", "left_anti")
        row = (
            keyed.agg(
                # coalesce: an EMPTY child table (the ingest-gate case)
                # must report 0 like the oracle's COUNT(*), not NULL
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_null_keys"),
            )
            .crossJoin(
                orphans.agg(
                    F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_orphan_rows"),
                    F.count(F.lit(1)).alias("n_orphan_keys"),
                )
            )
            .select(
                F.lit(label).alias("fk_edge"),
                "n_child_rows",
                "n_null_keys",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


# Benford's law first-digit mass in permille: floor(log10(1 + 1/d) * 1000)
# precomputed as literals so no transcendental enters either engine.
_BENFORD_PERMILLE = {1: 301, 2: 176, 3: 124, 4: 96, 5: 79, 6: 66, 7: 57, 8: 51, 9: 45}


def _benford_oracle() -> str:
    ref_rows = " UNION ALL ".join(
        f"SELECT {d} AS digit, {p} AS benford_permille"
        for d, p in _BENFORD_PERMILLE.items()
    )
    return f"""
    WITH ref AS ({ref_rows}),
    digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1.0
    ),
    obs AS (SELECT digit, COUNT(*) AS n_orders FROM digits GROUP BY 1),
    -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT and // would carry
    -- it into the output type; the engine side is plain BIGINT
    tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM obs)
    SELECT r.digit,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.n_orders, 0) * 1000 // (SELECT total FROM tot)
               AS observed_permille,
           r.benford_permille,
           CAST(ABS(COALESCE(o.n_orders, 0) * 1000 // (SELECT total FROM tot)
               - r.benford_permille) AS BIGINT) AS abs_dev_permille
    FROM ref r LEFT JOIN obs o USING (digit)
    """


@query("orders_benford_digit_profile", oracle=_benford_oracle())
def orders_benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of ``o_totalprice`` against Benford's
    law, in integer permille: 9 rows of (digit, count, observed mass,
    Benford mass, absolute deviation). Large deviations on naturally
    occurring amounts flag synthetic or manipulated data — the audit a
    pipeline runs when a new upstream starts delivering.

    Exactness: the leading digit comes from the decimal string of the
    floored BIGINT amount (identical on both engines — no log10), the
    Benford reference is a literal permille table, and both masses are
    integer floor divisions, so every output cell is exact BIGINT.

    Scale: one map-side-combined groupBy on a 9-value key, then a
    broadcast join against the 9-row literal reference — the profile
    costs one scan regardless of order volume.
    """
    orders = table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1.0).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    ref = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PERMILLE.items()],
        "digit int, benford_permille int",
    )
    joined = F.broadcast(ref).join(obs, "digit", "left").crossJoin(
        obs.agg(F.sum("n_orders").alias("total"))
    )
    n = F.coalesce(F.col("n_orders"), F.lit(0))
    # integer floor division via `div` (non-negative operands, == DuckDB //)
    obs_permille = F.expr("(coalesce(n_orders, 0) * 1000) div total")
    return joined.select(
        "digit",
        n.cast("bigint").alias("n_orders"),
        obs_permille.cast("bigint").alias("observed_permille"),
        F.col("benford_permille").cast("int"),
        F.abs(obs_permille - F.col("benford_permille"))
        .cast("bigint")
        .alias("abs_dev_permille"),
    )


# --------------------------------------------------------------------------
# Partition fingerprints: cheap replica/copy reconciliation
# --------------------------------------------------------------------------

_FP_BUCKETS = 64


@query(
    "lineitem_partition_fingerprints",
    oracle=f"""
    WITH sigs AS (
        SELECT l_orderkey % {_FP_BUCKETS} AS bucket,
               ('0x' || substr(md5(
                    CAST(l_orderkey AS VARCHAR) || '|' ||
                    CAST(l_linenumber AS VARCHAR) || '|' ||
                    CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         AS VARCHAR) || '|' ||
                    CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                         AS VARCHAR)
               ), 1, 12))::BIGINT AS sig
        FROM lineitem
    )
    SELECT bucket, COUNT(*) AS n_rows,
           CAST(bit_xor(sig) AS BIGINT) AS xor_sig,
           CAST(SUM(sig % 1000000007) AS BIGINT) AS modsum_sig
    FROM sigs GROUP BY bucket
    """,
)
def lineitem_partition_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy digest of the lineitem table: 64 key-residue buckets,
    each summarized by row count + order-insensitive XOR and mod-sum
    of a per-row content signature (md5-prefix of the business key and
    half-up-integerized measures — the engine-wide hash convention,
    extensions/text.py::md5_prefix_hash). Two copies of the table
    (replica, migration target, yesterday's snapshot) compare 64 tiny
    rows instead of 100 TB; a mismatched bucket pinpoints WHERE to
    re-sync. XOR alone is blind to duplicated-row pairs (x XOR x = 0),
    which is exactly what n_rows + the mod-sum catch — the three
    together are the standard reconciliation triple.

    Scale: one scan, map-side-combined 64-group aggregate, zero joins;
    signature math is pure Column expressions. Buckets here are key
    RESIDUE classes (orderkey % 64) — cheap and uniform, but a dirty
    bucket is scattered across the key domain; on range-partitioned
    storage swap the bucket expression to a key-range quotient
    (orderkey div range_width) to make re-sync range-addressable —
    a one-line change, the triple is bucketing-agnostic.
    """
    li = table(spark, sf_dir, "lineitem")
    sig = md5_prefix_hash(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
        )
    )
    return (
        li.select(
            (F.col("l_orderkey") % _FP_BUCKETS).alias("bucket"),
            sig.alias("sig"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(sig)").cast("bigint").alias("xor_sig"),
            F.sum(F.col("sig") % 1000000007).cast("bigint").alias("modsum_sig"),
        )
    )


# --------------------------------------------------------------------------
# user_deletion_impact_audit: GDPR-style erasure cascade accounting
# --------------------------------------------------------------------------

_DEL_MOD = 97  # deterministic deletion-request cohort: key % 97 == 0


@query(
    "user_deletion_impact_audit",
    oracle=f"""
    WITH aff_orders AS (
      SELECT o_orderkey FROM orders WHERE o_custkey % {_DEL_MOD} = 0
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM customer) AS n_rows_total,
           (SELECT COUNT(*) FROM customer
             WHERE c_custkey % {_DEL_MOD} = 0) AS n_rows_affected
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events WHERE user_id % {_DEL_MOD} = 0)
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders WHERE o_custkey % {_DEL_MOD} = 0)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
             WHERE EXISTS (SELECT 1 FROM aff_orders a
                           WHERE a.o_orderkey = l.l_orderkey))
    ORDER BY table_name
    """,
)
def user_deletion_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-request blast radius — the audit a data-governance
    pipeline runs BEFORE executing a right-to-be-forgotten batch: for
    a deterministic requester cohort (key % 97 == 0, the engine's
    probe-sample convention), how many rows in each table are
    affected, including the transitive cascade customer -> orders ->
    lineitem that has no direct user key. Four rows: table, total,
    affected.

    Scale: the direct legs are metadata-cheap filtered counts (the
    predicate pushes to the scan); the cascade leg is ONE pass — a
    LEFT OUTER join against the broadcast affected-order keys with
    COUNT(o_orderkey) counting the matches, which equals the semi-join
    count because o_orderkey is the orders primary key (uniqueness
    audited by referential_integrity_audit; a duplicate key would
    inflate the outer-join counts where a true semi-join could not).
    A deletion job locating rows would run the left-semi form; the
    audit trades that for counting total and affected in one scan.
    Nothing collects; each leg is one aggregate."""
    affected = {
        "customer": table(spark, sf_dir, "customer").select(
            (F.col("c_custkey") % _DEL_MOD == 0).alias("hit")
        ),
        "events": table(spark, sf_dir, "events").select(
            (F.col("user_id") % _DEL_MOD == 0).alias("hit")
        ),
        "orders": table(spark, sf_dir, "orders").select(
            (F.col("o_custkey") % _DEL_MOD == 0).alias("hit")
        ),
    }
    legs = [
        df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows_total"),
            F.sum(F.col("hit").cast("bigint")).alias("n_rows_affected"),
        )
        for name, df in affected.items()
    ]
    aff_orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % _DEL_MOD == 0)
        .select("o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    li_hit = li.join(
        F.broadcast(aff_orders),
        li["l_orderkey"] == aff_orders["o_orderkey"],
        "left",
    ).agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows_total"),
        F.count("o_orderkey").alias("n_rows_affected"),
    )
    out = legs[0]
    for leg in legs[1:] + [li_hit]:
        out = out.unionByName(leg)
    return out.orderBy("table_name")
