"""Independent reference for the deletion-neighborhood edit-1 join:
brute-force DP levenshtein over a crafted vocabulary exercising all
three edit kinds plus decoys one edit apart from NOTHING."""

from __future__ import annotations

import itertools

from env_data_pipeline_spark.plans import registry

registry.load_all()

from env_data_pipeline_spark.plans.entityres import (  # noqa: E402
    customer_name_edit1_pairs,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


NAMES = [
    "spark",   # substitution: "spork"; deletion: "park", "spak"
    "spork",
    "park",
    "spak",
    "sparks",  # insertion on "spark"
    "query",   # decoy: nothing within 1 edit
    "a",       # 1-char edge case: "b" is a substitution, "ab" an insertion
    "b",
    "ab",
]


def test_edit1_pairs_match_bruteforce(spark, tmp_path):
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "c_custkey long, c_name string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    expected = {
        tuple(sorted(p))
        for p in itertools.combinations(NAMES, 2)
        if _lev(*p) == 1
    }
    # sanity on the fixture itself: all three edit kinds represented
    assert ("spark", "spork") in expected      # substitution
    assert ("park", "spark") in expected       # deletion
    assert ("spark", "sparks") in expected     # insertion
    assert not any("query" in p for p in expected)

    got = {
        (r["name_a"], r["name_b"])
        for r in customer_name_edit1_pairs(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_edit1_duplicate_names_collapse(spark, tmp_path):
    """Duplicate c_name rows must not produce self-pairs or dupes."""
    spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "ab")], "c_custkey long, c_name string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = [
        (r["name_a"], r["name_b"])
        for r in customer_name_edit1_pairs(spark, str(tmp_path)).collect()
    ]
    assert got == [("aa", "ab")]
