"""Entity resolution: fuzzy-key matching via deletion-neighborhood
blocking.

The scalable edit-distance-1 join: instead of the quadratic all-pairs
levenshtein, every string emits itself plus its single-character-
deletion variants as blocking keys; two strings within one edit
(insert, delete, OR substitute) provably share at least one key
(substitution at position p -> both delete p to the same string;
insert/delete -> the shorter string IS a deletion variant of the
longer), so an equi-join on the key finds every true pair and the
cheap levenshtein==1 check only runs on blocked candidates. This is
the standard FastSS construction — public algorithmics, no reference
counterpart (the reference has no fuzzy matching).

Cross-engine discipline: blocking keys are pure substring algebra
(identical on both engines) and the verifier is unit-cost levenshtein,
which Spark and DuckDB both implement with the textbook DP — integer
equality, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from env_data_pipeline_spark.catalog import table
from env_data_pipeline_spark.plans.registry import query


def deletion_keys(col: str) -> F.Column:
    """The string itself + every single-deletion variant, distinct."""
    return F.array_distinct(
        F.concat(
            F.array(F.col(col)),
            F.expr(
                f"transform(sequence(1, length({col})), "
                f"i -> concat(substr({col}, 1, i - 1), "
                f"substr({col}, i + 1, length({col}))))"
            ),
        )
    )


@query(
    "customer_name_edit1_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT c_name AS name FROM customer),
    keys AS (
        SELECT DISTINCT name, bkey FROM (
            SELECT name, name AS bkey FROM names
            UNION ALL
            SELECT name,
                   substr(name, 1, i - 1) || substr(name, i + 1, length(name))
                       AS bkey
            FROM names, unnest(range(1, length(name) + 1)) AS t(i)
        )
    ),
    cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.name < b.name
    )
    SELECT name_a, name_b FROM cand
    WHERE levenshtein(name_a, name_b) = 1
    """,
)
def customer_name_edit1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All distinct customer-name pairs within ONE edit of each other —
    the entity-resolution candidate set a dedup/merge pipeline feeds
    into clustering. On the synthetic names (sequential IDs) the true
    pairs are exactly the IDs differing in one decimal digit, so the
    result is dense enough to prove both the blocking recall and the
    verifier precision.

    Scale: keys-per-string = length+1, so the blocking relation is
    O(data * avg_len) rows of (name, key) — ONE shuffle on the key.
    The candidate equi-join is merge-hinted (both sides are data-sized;
    AQE must not broadcast one — memory: AQE hazard), and the exact
    levenshtein runs only on candidates sharing a key, never all
    pairs. At 100 TB you'd add a length-bucket prefix to the key to
    cap per-key fan-out; the construction is otherwise unchanged.
    """
    names = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name")
    ).distinct()
    keys = names.select(
        "name", F.explode(deletion_keys("name")).alias("bkey")
    )
    left = keys.select(F.col("name").alias("name_a"), "bkey")
    right = keys.select(F.col("name").alias("name_b"), "bkey")
    cand = (
        left.hint("merge")
        .join(right, "bkey")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("name_a", "name_b") == 1)
