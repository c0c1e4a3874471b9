"""Independent references for the integrity audits: hand-built star
fixtures with KNOWN orphans/NULLs (the sf tables are clean, so parity
alone can't prove the detectors fire) and a Counter-based Benford
reference."""

from __future__ import annotations

from collections import Counter

from env_data_pipeline_spark.plans import registry

# canonicalize registration order before importing a plan module
# directly, so a partial pytest run can't reorder the rotation window
registry.load_all()

from env_data_pipeline_spark.plans.integrity import (  # noqa: E402
    _BENFORD_PERMILLE,
    lineitem_partition_fingerprints,
    orders_benford_digit_profile,
    referential_integrity_audit,
)


def _write(spark, tmp_path, name: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


def _write_star(spark, tmp_path) -> None:
    """2 regions; nation 3 points at regionkey 9 (orphan); customer 12
    points at nation 99 (orphan) and 13 has NULL nationkey; order 1002
    points at customer 77 (orphan); lineitems: two rows point at order
    9999 (one orphan key, two orphan rows), one row has NULL partkey,
    one row points at part 500 (orphan) and supplier 60 (orphan)."""
    _write(spark, tmp_path, "region", [(0, "r0"), (1, "r1")], "r_regionkey long, r_name string")
    _write(
        spark, tmp_path, "nation",
        [(1, "n1", 0), (2, "n2", 1), (3, "n3", 9)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    _write(
        spark, tmp_path, "customer",
        [(10, 1), (11, 2), (12, 99), (13, None)],
        "c_custkey long, c_nationkey long",
    )
    _write(
        spark, tmp_path, "supplier",
        [(50, 1), (51, 2)],
        "s_suppkey long, s_nationkey long",
    )
    _write(
        spark, tmp_path, "part",
        [(400, "p400"), (401, "p401")],
        "p_partkey long, p_name string",
    )
    _write(
        spark, tmp_path, "orders",
        [(1000, 10), (1001, 11), (1002, 77)],
        "o_orderkey long, o_custkey long",
    )
    _write(
        spark, tmp_path, "lineitem",
        [
            (1000, 400, 50),
            (1000, None, 51),
            (1001, 500, 60),
            (9999, 400, 50),
            (9999, 401, 51),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long",
    )


EXPECTED = {
    # edge -> (n_child_rows, n_null_keys, n_orphan_rows, n_orphan_keys)
    "lineitem.l_orderkey->orders": (5, 0, 2, 1),
    "lineitem.l_partkey->part": (5, 1, 1, 1),
    "lineitem.l_suppkey->supplier": (5, 0, 1, 1),
    "orders.o_custkey->customer": (3, 0, 1, 1),
    "customer.c_nationkey->nation": (4, 1, 1, 1),
    "supplier.s_nationkey->nation": (2, 0, 0, 0),
    "nation.n_regionkey->region": (3, 0, 1, 1),
}


def test_referential_integrity_detects_orphans_and_nulls(spark, tmp_path):
    _write_star(spark, tmp_path)
    got = {
        r["fk_edge"]: (
            r["n_child_rows"],
            r["n_null_keys"],
            r["n_orphan_rows"],
            r["n_orphan_keys"],
        )
        for r in referential_integrity_audit(spark, str(tmp_path)).collect()
    }
    assert got == EXPECTED


def test_referential_integrity_clean_star_is_all_zero(spark, sf_dir):
    rows = referential_integrity_audit(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["n_null_keys"] == 0, r
        assert r["n_orphan_rows"] == 0, r
        assert r["n_orphan_keys"] == 0, r
        assert r["n_child_rows"] > 0, r


def test_benford_profile_matches_counter_reference(spark, tmp_path):
    prices = [1.5, 19.0, 123.45, 190.0, 2.0, 250.0, 321.0, 0.5, 9000.0, 88.0]
    _write(
        spark, tmp_path, "orders",
        [(i, p) for i, p in enumerate(prices)],
        "o_orderkey long, o_totalprice double",
    )
    counted = Counter(str(int(p))[0] for p in prices if p >= 1.0)
    total = sum(counted.values())
    got = {
        r["digit"]: (r["n_orders"], r["observed_permille"], r["abs_dev_permille"])
        for r in orders_benford_digit_profile(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        n = counted.get(str(d), 0)
        permille = n * 1000 // total
        assert got[d] == (n, permille, abs(permille - _BENFORD_PERMILLE[d])), d


def test_benford_reference_masses_sum_to_unity_grid():
    # floor-rounded permille loses at most 9 units; the table must be
    # the canonical floor(log10(1+1/d)*1000) values
    assert sum(_BENFORD_PERMILLE.values()) in range(991, 1001)
    assert _BENFORD_PERMILLE[1] == 301 and _BENFORD_PERMILLE[9] == 45


def test_audit_plan_broadcasts_dims_not_facts(spark, sf_dir):
    """The six dim-sized parents broadcast; the lineitem->orders edge
    must NOT broadcast the fact-sized orders key set (merge-hinted so
    AQE can't data-size-broadcast it at test SF)."""
    df = referential_integrity_audit(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin LeftAnti" in plan


def test_fingerprints_pinpoint_a_corrupted_bucket(spark, tmp_path):
    """Flip one measure in one row of a copy: the count stays equal,
    and EXACTLY the owning bucket's xor/modsum signatures move."""
    rows = [(o, 1, 100.0 + o, 2.0) for o in range(200)]
    schema = (
        "l_orderkey long, l_linenumber int, l_extendedprice double, "
        "l_quantity double"
    )
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(a_dir / "lineitem.parquet")
    )
    corrupted = [(o, n, p + (0.01 if o == 77 else 0.0), q) for o, n, p, q in rows]
    spark.createDataFrame(corrupted, schema).coalesce(1).write.parquet(
        str(b_dir / "lineitem.parquet")
    )
    fp = lambda d: {  # noqa: E731
        r["bucket"]: (r["n_rows"], r["xor_sig"], r["modsum_sig"])
        for r in lineitem_partition_fingerprints(spark, str(d)).collect()
    }
    fa, fb = fp(a_dir), fp(b_dir)
    assert set(fa) == set(fb)
    diff = {b for b in fa if fa[b] != fb[b]}
    assert diff == {77 % 64}
    bad = 77 % 64
    assert fa[bad][0] == fb[bad][0]          # same row count
    assert fa[bad][1] != fb[bad][1]          # xor moved
    assert fa[bad][2] != fb[bad][2]          # modsum moved


def test_fingerprints_xor_blindspot_covered_by_count_and_modsum(spark, tmp_path):
    """A row duplicated twice XORs to a no-op — n_rows and modsum must
    still flag the bucket."""
    base = [(1, 1, 10.0, 1.0), (65, 1, 20.0, 1.0)]
    schema = (
        "l_orderkey long, l_linenumber int, l_extendedprice double, "
        "l_quantity double"
    )
    a_dir, b_dir = tmp_path / "xa", tmp_path / "xb"
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(
        str(a_dir / "lineitem.parquet")
    )
    spark.createDataFrame(base + [(65, 1, 20.0, 1.0), (65, 1, 20.0, 1.0)],
                          schema).coalesce(1).write.parquet(
        str(b_dir / "lineitem.parquet")
    )
    fp = lambda d: {  # noqa: E731
        r["bucket"]: (r["n_rows"], r["xor_sig"], r["modsum_sig"])
        for r in lineitem_partition_fingerprints(spark, str(d)).collect()
    }
    fa, fb = fp(a_dir), fp(b_dir)
    assert fa[1][1] == fb[1][1]              # xor identical: blind spot
    assert fa[1][0] != fb[1][0]              # count catches it
    assert fa[1][2] != fb[1][2]              # modsum catches it


def test_deletion_impact_cascade_reference(spark, tmp_path):
    """Tiny fixture with known cascade: the lineitem leg must count
    rows whose ORDER belongs to a deletion-cohort customer (custkey %
    97 == 0), not rows with any direct key match."""
    import datetime as dt

    from env_data_pipeline_spark.plans.registry import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(0, "Customer#0", 0, 1.0, "BUILDING"), (5, "Customer#5", 1, 2.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 0, "O", 5.0, t0, "1-URGENT"), (11, 5, "O", 6.0, t0, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        # 3 lines on the affected order 10, 1 on unaffected order 11
        [(10, 1, 1.0), (10, 2, 1.0), (10, 3, 1.0), (11, 1, 1.0)],
        "l_orderkey long, l_partkey long, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, t0, 0, "view", 1.0, "{}"), (2, t0, 3, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["table_name"]: (r["n_rows_total"], r["n_rows_affected"])
        for r in QUERIES["user_deletion_impact_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "customer": (2, 1),
        "events": (2, 1),
        "orders": (2, 1),
        "lineitem": (4, 3),
    }, got
