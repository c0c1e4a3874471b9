"""Pure-Python references for the round-7 analytics kernels on
seeded random fixtures — independent of BOTH the Spark plan and the
DuckDB oracle replay, so a shared design bug between the two engines
cannot hide. Each reference reimplements the QUERY SEMANTICS from the
docstring, not the code."""

from __future__ import annotations

import datetime as dt
import itertools
import random
from collections import Counter, defaultdict

from env_data_pipeline_spark.plans import registry

registry.load_all()

_SEED = 7


def _mk_events(n_users=40, n_events=600, n_days=20, seed=_SEED):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for eid in range(n_events):
        ts = t0 + dt.timedelta(
            days=rng.randrange(n_days), seconds=rng.randrange(86400)
        )
        rows.append(
            (
                eid,
                ts,
                rng.randrange(n_users),
                rng.choice(["view", "click", "purchase", "error"]),
                round(rng.uniform(0, 100), 3),
                "{}",
            )
        )
    return rows


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))


def test_rolling_7d_active_users_reference(spark, tmp_path):
    rows = _mk_events()
    _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: r["active_users_7d"]
        for r in registry.QUERIES["events_rolling_7d_active_users"](
            spark, str(tmp_path)
        ).collect()
    }
    active = {(r[1].date(), r[2]) for r in rows}
    days = sorted({d for d, _ in active})
    ref = {}
    for d in days:
        lo = d - dt.timedelta(days=6)
        ref[d.strftime("%Y-%m-%d")] = len(
            {u for (ad, u) in active if lo <= ad <= d}
        )
    assert got == ref


def test_transition_matrix_reference(spark, tmp_path):
    rows = _mk_events()
    _write_events(spark, tmp_path, rows)
    out = registry.QUERIES["events_transition_matrix"](
        spark, str(tmp_path)
    ).collect()
    per_user = defaultdict(list)
    for eid, ts, uid, et, _v, _p in rows:
        per_user[uid].append((ts, eid, et))
    trans = Counter()
    for uid, evs in per_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    totals = Counter()
    for (a, _b), c in trans.items():
        totals[a] += c
    got = {(r["from_type"], r["to_type"]): (r["transitions"], r["share"]) for r in out}
    ref = {
        k: (c, (c * 1000000 // totals[k[0]]) / 1000000.0)
        for k, c in trans.items()
    }
    assert got == ref


def test_mad_outliers_reference(spark, tmp_path):
    rng = random.Random(_SEED)
    t0 = dt.datetime(2024, 1, 1)
    orders = []
    for okey in range(400):
        pri = f"{rng.randrange(1, 4)}-P"
        # heavy tail so outliers exist
        price = rng.choice([rng.uniform(10, 100), rng.uniform(5000, 9000)])
        orders.append((okey, okey % 50, "O", round(price, 4), t0, pri))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    import math

    def units(x):
        return math.floor(x * 10000 + 0.5)

    by_pri = defaultdict(list)
    for okey, _c, _s, price, _d, pri in orders:
        by_pri[pri].append((okey, units(price)))

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    ref_rows = []
    for pri, items in by_pri.items():
        med = lower_median([u for _, u in items])
        mad = lower_median([abs(u - med) for _, u in items])
        for okey, u in items:
            ad = abs(u - med)
            if ad > 5 * mad:
                ref_rows.append((ad, okey, pri, u, med, mad))
    ref_rows.sort(key=lambda r: (-r[0], r[1]))
    ref = [
        (
            pri,
            okey,
            u / 10000.0,
            med / 10000.0,
            mad / 10000.0,
            ad / 10000.0,
        )
        for ad, okey, pri, u, med, mad in ref_rows[:20]
    ]
    got = [
        (
            r["priority"],
            r["orderkey"],
            r["totalprice"],
            r["median_price"],
            r["mad_price"],
            r["abs_dev"],
        )
        for r in registry.QUERIES["orders_mad_outliers"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == ref


def test_market_basket_reference(spark, tmp_path):
    rng = random.Random(_SEED)
    li = []
    for okey in range(300):
        parts = rng.sample(range(30), rng.randrange(1, 6))
        for p in parts:
            li.append((okey, p))
    # duplicated lines must not double-count pairs (distinct basket)
    li += li[:25]
    spark.createDataFrame(li, "l_orderkey long, l_partkey long").coalesce(
        2
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    baskets = defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    pairs = Counter()
    for parts in baskets.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            pairs[(a, b)] += 1
    ref = sorted(
        ((c, a, b) for (a, b), c in pairs.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [
        (r["pair_count"], r["part_a"], r["part_b"])
        for r in registry.QUERIES["market_basket_part_pairs"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == ref


def test_ewma_reference(spark, tmp_path):
    rows = _mk_events(n_events=300, n_days=12)
    _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["day"]): (r["daily_value"], r["ewma_value"])
        for r in registry.QUERIES["events_ewma_daily"](
            spark, str(tmp_path)
        ).collect()
    }
    import math

    daily = defaultdict(int)
    for _eid, ts, _u, et, v, _p in rows:
        daily[(et, ts.date())] += math.floor(v * 10000 + 0.5)
    ref = {}
    series = defaultdict(list)
    for (et, d), su in sorted(daily.items()):
        series[et].append((d, su))
    wt = [128, 64, 32, 16, 8, 4, 2, 1]
    for et, pts in series.items():
        for i, (d, su) in enumerate(pts):
            window = pts[max(0, i - 7): i + 1][::-1]  # newest first
            score = sum(s * wt[k] for k, (_, s) in enumerate(window))
            norm = sum(wt[k] for k in range(len(window)))
            # TRUNCATING division (toward zero), matching Spark's div
            # and DuckDB's // — Python's // floors, which diverges for
            # a negative weighted score
            q = -((-score) // norm) if score < 0 else score // norm
            ref[(et, d.strftime("%Y-%m-%d"))] = (
                su / 10000.0,
                q / 10000.0,
            )
    assert got == ref


def test_cms_merge_equivalence(spark, tmp_path):
    """The docstring's mergeability claim, pinned: a CMS built on each
    half of the stream and merged by CELL-WISE ADDITION must equal the
    sketch built on the whole stream — the property that lets 1000
    executors sketch independently."""
    from pyspark.sql import functions as F
    from env_data_pipeline_spark.extensions import sketches as SK

    rows = _mk_events(n_events=400)
    ev = spark.createDataFrame(rows, _EV_SCHEMA).select("event_id", "user_id")

    # THE shared build (extensions/sketches.py) — duplicating it here
    # would let the test keep validating a stale definition
    full = {(r["j"], r["b"]): r["n"] for r in SK.cms_cells(ev).collect()}
    h1 = SK.cms_cells(ev.filter(F.col("event_id") % 2 == 0)).collect()
    h2 = SK.cms_cells(ev.filter(F.col("event_id") % 2 == 1)).collect()
    merged = Counter()
    for r in itertools.chain(h1, h2):
        merged[(r["j"], r["b"])] += r["n"]
    assert dict(merged) == full


# --------------------------------------------------------------------------
# Triangle participation (graphops)
# --------------------------------------------------------------------------


def test_triangle_participation_reference(spark, tmp_path):
    """Random baskets -> brute-force triangle enumeration over the
    co-purchase adjacency, per-node counts and milli clustering."""
    rng = random.Random(_SEED)
    rows = []
    for o in range(60):
        basket = rng.sample(range(25), rng.randrange(2, 6))
        rows.extend((o, p) for p in basket)
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    adj = defaultdict(set)
    baskets = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    for basket in baskets.values():
        for a, b in itertools.combinations(sorted(basket), 2):
            adj[a].add(b)
            adj[b].add(a)
    tri = Counter()
    nodes = sorted(adj)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    expected = {}
    for v, t in tri.items():
        d = len(adj[v])
        expected[v] = (t, d, 2000 * t // (d * (d - 1)))
    top = sorted(expected.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]

    got = [
        (r["partkey"], (r["n_triangles"], r["n_neighbors"], r["clustering_milli"]))
        for r in registry.QUERIES["part_triangle_participation"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == top


# --------------------------------------------------------------------------
# Corpus source divergence (textstats)
# --------------------------------------------------------------------------


def test_corpus_source_divergence_reference(spark, tmp_path):
    rng = random.Random(_SEED)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for d in range(80):
        src = f"s{rng.randrange(4)}"
        # source s3 skews hard toward one word: real drift to detect
        weights = [8, 1, 1, 1, 1, 1] if src == "s3" else [1] * 6
        text = " ".join(rng.choices(vocab, weights=weights, k=rng.randrange(3, 9)))
        rows.append((d, text, "en", src, len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    cnt = defaultdict(Counter)
    for _, text, _, src, _ in rows:
        cnt[src].update(text.split(" "))
    total = Counter()
    for c in cnt.values():
        total.update(c)
    t_all = sum(total.values())
    expected = {}
    for src, c in cnt.items():
        t_s = sum(c.values())
        t_r = t_all - t_s
        num = sum(
            abs(c.get(w, 0) * t_r - (total[w] - c.get(w, 0)) * t_s) for w in total
        )
        expected[src] = (t_s, 500 * num // (t_s * t_r))

    got = {
        r["source"]: (r["n_tokens"], r["tv_permille_vs_rest"])
        for r in registry.QUERIES["corpus_source_divergence"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected
    # the skewed source must read as the most divergent
    assert max(expected, key=lambda s: expected[s][1]) == "s3"
