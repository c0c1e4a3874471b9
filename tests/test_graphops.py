"""Independent (non-oracle) references for the graphops kernels: a
pure-Python power iteration and Counter-based skew stats on tiny
fixtures — third-party to BOTH the Spark plan and the DuckDB replay,
so a shared design bug in the two cannot hide."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from env_data_pipeline_spark.plans.graphops import (
    _PR_ITERS,
    _PR_MASS,
    _TRI_SAMPLE_MILLIS,
    _TRI_SAMPLE_SCALE,
    _copurchase_edges,
    _oriented_triangle_stream,
    join_key_skew_profile,
    part_pagerank_copurchase,
    part_triangle_count_sampled,
)

BASKETS = [
    (100, (1, 2, 3)),
    (200, (1, 2)),
    (300, (2, 4)),
    (400, (3, 4, 5)),
    (500, (2, 3)),
]


def _write_lineitem(spark, tmp_path):
    rows = [(o, p) for o, parts in BASKETS for p in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def _ref_pagerank():
    edges = set()
    for _, parts in BASKETS:
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg = Counter(s for s, _ in edges)
    n = len(deg)
    base_unit = _PR_MASS // n
    base = (15 * base_unit) // 100
    rank = {v: base_unit for v in deg}
    for _ in range(_PR_ITERS):
        contrib = {v: rank[v] // deg[v] for v in deg}
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += contrib[s]
        rank = {v: base + (85 * inc[v]) // 100 for v in deg}
    return deg, rank


def test_pagerank_matches_python_power_iteration(spark, tmp_path):
    _write_lineitem(spark, tmp_path)
    got = {
        r["partkey"]: (r["n_neighbors"], r["rank_units"])
        for r in part_pagerank_copurchase(spark, str(tmp_path)).collect()
    }
    deg, rank = _ref_pagerank()
    assert got == {v: (deg[v], rank[v]) for v in deg}


def test_pagerank_hub_outranks_leaf(spark, tmp_path):
    """Part 2 (4 neighbors, in 3 baskets) must outrank part 5 (2
    neighbors, 1 basket) — the signal PageRank exists to extract."""
    _write_lineitem(spark, tmp_path)
    rows = part_pagerank_copurchase(spark, str(tmp_path)).collect()
    rank = {r["partkey"]: r["rank_units"] for r in rows}
    assert rank[2] > rank[5]
    # output is rank-descending with partkey tie-break
    units = [(-r["rank_units"], r["partkey"]) for r in rows]
    assert units == sorted(units)


def test_skew_profile_matches_counter(spark, tmp_path):
    _write_lineitem(spark, tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    ev = [(i, t0, uid) for i, uid in enumerate([7, 7, 7, 8, 9])]
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    od = [(i, ck) for i, ck in enumerate([1, 1, 2, 3])]
    spark.createDataFrame(od, "o_orderkey long, o_custkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    rows = {
        r["table_name"]: r
        for r in join_key_skew_profile(spark, str(tmp_path)).collect()
    }
    r = rows["events"]
    assert (r["n_rows"], r["n_keys"], r["max_cnt"], r["hot_key"]) == (
        5, 3, 3, 7,
    )
    assert r["hot_to_mean"] == (3 * 3 * 1000 // 5) / 1000.0
    # lineitem: part 2 appears in 4 baskets, part 3 in 3
    li_counts = Counter(p for _, parts in BASKETS for p in parts)
    r = rows["lineitem"]
    assert r["max_cnt"] == max(li_counts.values())
    assert r["hot_key"] == min(
        k for k, v in li_counts.items() if v == r["max_cnt"]
    )
    r = rows["orders"]
    assert (r["n_rows"], r["n_keys"], r["max_cnt"], r["hot_key"]) == (
        4, 3, 2, 1,
    )


def _keep_part(p: int) -> bool:
    """Pure-Python replica of the engine's deterministic node-sampling
    rule (48-bit md5 prefix mod 1000 < _TRI_SAMPLE_MILLIS) — a third
    implementation, independent of both Spark and the DuckDB oracle."""
    import hashlib

    h = hashlib.md5(str(p).encode()).hexdigest()[:12]
    return int(h, 16) % 1000 < _TRI_SAMPLE_MILLIS


def _ref_sampled_triangle_stats():
    from itertools import combinations

    kept = {p for _, parts in BASKETS for p in parts if _keep_part(p)}
    edges = set()
    for _, parts in BASKETS:
        for a, b in combinations(sorted(set(parts) & kept), 2):
            edges.add((a, b))
    nodes = {v for e in edges for v in e}
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    return len(nodes), len(edges), tris


def test_triangle_sampled_matches_python_reference(spark, tmp_path):
    """On the tiny basket fixture, every column of the sampled
    estimator must equal a brute-force pure-Python computation of the
    same deterministic subsample."""
    _write_lineitem(spark, tmp_path)
    (row,) = part_triangle_count_sampled(spark, str(tmp_path)).collect()
    n_nodes, n_edges, tris = _ref_sampled_triangle_stats()
    assert (
        row["n_nodes_sampled"],
        row["n_edges_sampled"],
        row["n_triangles_sampled"],
        row["est_total_triangles"],
    ) == (n_nodes, n_edges, tris, tris * _TRI_SAMPLE_SCALE)


def test_triangle_sample_estimator_error_bound(spark, sf_dir):
    """MEASURED estimator error vs the exact oriented count on the
    full sf0.001 graph (the ground truth the exact tier computes):
    node sampling at q = 1/2 lands within +9.2% here and +11.1% at
    sf0.01 — pin a ±20% bound so a broken sampler (wrong hash grain,
    filter after the join, scale slip) fails loudly while honest
    sampling noise passes."""
    _deg, _o, tri = _oriented_triangle_stream(_copurchase_edges(spark, sf_dir))
    exact = tri.count()
    assert exact > 0
    (row,) = part_triangle_count_sampled(spark, sf_dir).collect()
    est = row["est_total_triangles"]
    rel_err = abs(est - exact) / exact
    assert rel_err <= 0.20, (
        f"sampled estimate {est} vs exact {exact}: rel_err {rel_err:.3f}"
    )


def test_triangle_sample_q4_error_bound(spark, sf_dir):
    """The q = 1/4 rung's error pin (VERDICT r11 item 6): measured
    +21.0% at sf0.001 and +7.1% at sf0.01 vs the exact count — ~the
    sqrt(1/q^3) variance growth over q = 1/2's +9.2%/+11.1%. Pin
    +/-45% (the q2 bound scaled by sqrt(8), rounded up) so a broken
    sampler fails loudly while the cheaper tier's honest extra
    variance passes."""
    from env_data_pipeline_spark.plans.graphops import (
        part_triangle_count_sampled_q4,
    )

    _deg, _o, tri = _oriented_triangle_stream(_copurchase_edges(spark, sf_dir))
    exact = tri.count()
    assert exact > 0
    (row,) = part_triangle_count_sampled_q4(spark, sf_dir).collect()
    est = row["est_total_triangles"]
    rel_err = abs(est - exact) / exact
    assert rel_err <= 0.45, (
        f"q4 estimate {est} vs exact {exact}: rel_err {rel_err:.3f}"
    )


def test_skew_profile_rejects_out_of_range_keys(spark, tmp_path):
    """The hot_key arithmetic arg-max decode is only monotone for
    keys in [0, 10^12); the engine must FAIL LOUDLY on a violating
    leg, never report a decoded-garbage hottest key."""
    import pytest as _pytest

    _write_lineitem(spark, tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(0, t0, -5), (1, t0, 7)], "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        [(0, 1)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    with _pytest.raises(Exception, match="precondition"):
        join_key_skew_profile(spark, str(tmp_path)).collect()


# ---------------------------------------------------------------------------
# k-core + bounded BFS (round 9)
# ---------------------------------------------------------------------------


def _support_edges_py(min_support):
    """Pure-Python support-thresholded symmetric co-purchase edges."""
    pair_orders = defaultdict(set)
    for o, parts in BASKETS:
        for a in parts:
            for b in parts:
                if a != b:
                    pair_orders[(a, b)].add(o)
    return {e for e, orders in pair_orders.items() if len(orders) >= min_support}


def _peel(edges, k):
    """Reference peel-to-fixpoint; returns (core set, rounds used)."""
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    nodes, rounds = set(adj), 0
    while True:
        drop = {n for n in nodes if len(adj[n] & nodes) < k}
        if not drop:
            return nodes, rounds
        nodes -= drop
        rounds += 1


def test_kcore_matches_python_peel(spark, tmp_path):
    """Engine 3-core on the tiny basket fixture == reference peel.
    With support>=2 only the (1,2)/(2,3) edges survive (pairs 1-2 in
    orders 100+200, 2-3 in 100+500), so NO node reaches degree 3 and
    the 3-core is empty — the peel must fully drain, which exercises
    the bounded loop past its first round."""
    from env_data_pipeline_spark.plans.graphops import (
        _KCORE_K,
        part_kcore_membership,
    )

    _write_lineitem(spark, tmp_path)
    got = {
        (r.partkey, r.core_degree)
        for r in part_kcore_membership(spark, str(tmp_path)).collect()
    }
    core, _ = _peel(_support_edges_py(2), _KCORE_K)
    assert {p for p, _ in got} == core == set()


def test_kcore_bounded_rounds_reach_fixpoint_on_testdata(spark, sf_dir):
    """The shipped iteration budget must cover the real data's
    fixpoint: one MORE peel round on the engine's own edge set must
    not change membership, so the bounded answer IS the true 3-core."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.plans.graphops import (
        _KCORE_K,
        _support_edges,
        part_kcore_membership,
    )

    core = part_kcore_membership(spark, sf_dir)
    members = core.select(F.col("partkey").alias("node"))
    edges = _support_edges(spark, sf_dir)
    again = (
        edges.join(members.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(members.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .groupBy("src")
        .count()
        .filter(F.col("count") >= _KCORE_K)
    )
    assert again.count() == core.count()
    # and every member's in-core degree satisfies the core property
    assert core.filter(F.col("core_degree") < _KCORE_K).count() == 0


def test_reach_3hop_matches_python_bfs(spark, tmp_path):
    """Hop labels on the tiny fixture == reference BFS (seed rule
    partkey % 101 == 7 hits nothing in the fixture, so plant part 7
    via an extra basket to get a non-empty frontier)."""
    from env_data_pipeline_spark.plans.graphops import (
        _REACH_MOD,
        _REACH_RES,
        part_copurchase_reach_3hop,
    )

    baskets = BASKETS + [(600, (7, 1)), (700, (7, 1))]
    rows = [(o, p) for o, parts in baskets for p in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    pair_orders = defaultdict(set)
    for o, parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    pair_orders[(a, b)].add(o)
    edges = {e for e, o in pair_orders.items() if len(o) >= 2}
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    seeds = {n for n in adj if n % _REACH_MOD == _REACH_RES}
    expect, frontier = {n: 0 for n in seeds}, set(seeds)
    for hop in (1, 2, 3):
        frontier = {d for s in frontier for d in adj[s]}
        for n in frontier:
            expect.setdefault(n, hop)
    got = {
        (r.partkey, r.hops)
        for r in part_copurchase_reach_3hop(spark, str(tmp_path)).collect()
    }
    assert got == set(expect.items())
    assert seeds, "fixture must produce a non-empty seed set"


def test_ppr_matches_python_reference(spark, tmp_path):
    """Seed-teleport power iteration replayed in pure Python on the
    basket fixture (seed planted at part 7 = 7 % 101)."""
    from env_data_pipeline_spark.plans.graphops import (
        _PPR_ITERS,
        part_ppr_recommendations,
    )

    baskets = BASKETS + [(600, (7, 1)), (700, (7, 3))]
    rows = [(o, p) for o, parts in baskets for p in parts]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    edges = set()
    for _, parts in baskets:
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg = Counter(s for s, _ in edges)
    seeds = [n for n in deg if n % 101 == 7]
    assert seeds == [7]
    r0 = _PR_MASS // len(seeds)
    base = {n: ((15 * r0) // 100 if n in seeds else 0) for n in deg}
    rank = {n: (r0 if n in seeds else 0) for n in deg}
    for _ in range(_PPR_ITERS):
        inc = Counter()
        for s, d in edges:
            inc[d] += rank[s] // deg[s]
        rank = {n: base[n] + (85 * inc[n]) // 100 for n in deg}
    expect = sorted(
        ((n, rank[n]) for n in deg if n not in seeds and rank[n] > 0),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r.partkey, r.rank_units)
        for r in part_ppr_recommendations(spark, str(tmp_path)).collect()
    ]
    assert got == expect[: len(got)]
    assert got, "seed must propagate mass to neighbors"
