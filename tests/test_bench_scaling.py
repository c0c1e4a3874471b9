"""Measured scale proof for the bucketed approximate-NN paths
(VERDICT r3 item 4): time must grow SLOWER than data.

These are the queries whose whole design is "equi-join on a bucket,
never all-pairs"; if someone reintroduces a cross-join stage, the
time ratio blows past the data ratio long before the plan-audit
sees a CartesianProduct (a broadcast nested loop would pass that).
Bounds are deliberately generous (2x the data ratio) so scheduler
noise on a loaded machine cannot flake the suite — a genuinely
quadratic stage overshoots 10-100x.
"""

from __future__ import annotations

import time

import pytest

from env_data_pipeline_spark.plans import registry

registry.load_all()

# sf0.001 and sf0.01 ship IDENTICAL documents/embeddings tables (500
# rows each), so that pair has data_ratio == 1.0 and the assertion
# degenerates to a noise-vs-noise timing compare. sf0.01 -> sf0.1 is
# the only pair with real growth (documents 10x, embeddings 4x).
LO = "/root/testdata/sf0.01"
HI = "/root/testdata/sf0.1"

SCALE_QUERIES = ["similarity_topk_lsh", "similarity_topk_ivf", "dedup_minhash_lsh"]


def _best_of_two(spark, name: str, sf_dir: str) -> float:
    registry.QUERIES[name](spark, sf_dir).count()  # warm-up
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_bucketed_paths_scale_sublinearly(spark, name):
    from env_data_pipeline_spark.catalog import table

    src = "embeddings" if name.startswith("similarity") else "documents"
    data_ratio = table(spark, HI, src).count() / table(spark, LO, src).count()
    assert data_ratio > 1.5, (
        f"tier pair carries no data growth ({data_ratio:.2f}x) — "
        "the sublinearity assertion would be noise-vs-noise"
    )
    t_lo = _best_of_two(spark, name, LO)
    t_hi = _best_of_two(spark, name, HI)
    ratio = t_hi / t_lo
    assert ratio <= 2 * data_ratio, (
        f"{name}: time ratio {ratio:.2f} vs data ratio {data_ratio:.2f} — "
        "a bucketed path should scale well under the data growth"
    )


MONEY_SUM_QUERIES = [
    "flagship_pricing_summary",
    "revenue_by_region",
    "revenue_rollup_region_nation",
]


@pytest.mark.parametrize("name", MONEY_SUM_QUERIES)
def test_money_sums_oracle_parity_at_high_tier(spark, name):
    """Regression for the sf0.1-only money-sum cliff: these queries'
    group totals reach ~1e10, where a raw ROUND(SUM(double)) flips
    between engines on summation order (the default sf0.001 parity
    suite cannot see this — sums are too small). Exact 1e-4-unit
    integer accounting must keep them hash-equal at the big tier."""
    from tests.oracle import compare

    compare(spark, name, registry.QUERIES[name], registry.ORACLES[name], HI)


def test_scale_probe_tier_is_honest(spark):
    """The builder-generated probe tier (bench.py's third scaling
    point) must scale the WORK linearly, not the answer shape
    quadratically: replica 0 is byte-identical to the base tier, and
    the MinHash pair count grows exactly with the replica factor —
    word-tagging keeps every replica's planted-duplicate topology
    identical while sharing no shingles across replicas (a naive copy
    would emit O(replicas^2) pairs and time an artifact)."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark import benchscale

    base = LO  # sf0.01: fast to replicate in CI; bench derives from sf0.1
    out = benchscale.ensure_scale_tier(spark, base)

    docs_base = spark.read.parquet(f"{base}/documents.parquet")
    docs_probe = spark.read.parquet(f"{out}/documents.parquet")
    assert docs_probe.count() == benchscale.DOC_MULT * docs_base.count()
    emb_base = spark.read.parquet(f"{base}/embeddings.parquet")
    emb_probe = spark.read.parquet(f"{out}/embeddings.parquet")
    assert emb_probe.count() == benchscale.EMB_MULT * emb_base.count()

    # replica 0 strictly contains the original tier
    rep0 = docs_probe.filter(F.col("doc_id") < benchscale._DOC_STRIDE)
    assert rep0.count() == docs_base.count()
    diff = rep0.join(docs_base, "doc_id").filter(
        rep0["text"] != docs_base["text"]
    )
    assert diff.count() == 0, "replica 0 must be the untouched original"

    base_pairs = registry.QUERIES["dedup_minhash_lsh"](spark, base).count()
    probe_rows = registry.QUERIES["dedup_minhash_lsh"](spark, out).collect()
    # (a) the honesty property itself: NO pair spans two replicas —
    # cross-replica leakage is what would make growth quadratic
    stride = benchscale._DOC_STRIDE
    leaks = [
        (r["doc_a"], r["doc_b"])
        for r in probe_rows
        if r["doc_a"] // stride != r["doc_b"] // stride
    ]
    assert not leaks, f"cross-replica near-dup leakage: {leaks[:5]}"
    # (b) growth is linear in the replica factor. Exact equality would
    # be a latent flake: word-tagging re-rolls the shingle hashes per
    # replica, so MinHash BAND agreement for near-copies (J < 1) is an
    # independent draw each replica — a planted near pair can lose all
    # bands in one replica (p ~ 1e-4) or an unrelated pair can newly
    # collide. Exact copies always collide, so the total stays within
    # a tight band of DOC_MULT x base.
    lo = 0.9 * benchscale.DOC_MULT * base_pairs
    hi = 1.1 * benchscale.DOC_MULT * base_pairs
    assert lo <= len(probe_rows) <= hi, (
        f"pair growth {len(probe_rows)} vs base {base_pairs} is outside "
        f"[{lo:.0f}, {hi:.0f}] — not linear in the replica factor"
    )


def test_recorded_probe_slopes_stay_subquadratic():
    """Bound the COMMITTED scale-probe slopes (BENCH_FULL.json): every
    probed family must stay at-or-under linear growth in data (slope
    <= 1.15 with measurement slack) — a reintroduced all-pairs stage
    reads ~2 on the log-log fit long before a plan audit sees it.
    The document/embedding families must carry the 3-decade fit
    (4 points, x100 tier); the lineitem/events families the
    sf1-equivalent 3-point fit."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json")
    probe = json.load(open(path)).get("scale_probe") or {}
    deep = {
        "dedup_minhash_lsh",
        "similarity_topk_ivfpq_served",
        # r12 (VERDICT r11 item 2): the scaled-K serving path carries
        # the 2-decade fit, proving the sqrt(n) contract beyond the
        # single x10 point the r11 fix was measured at
        "similarity_topk_ivf_served",
        "decontaminate_eval_overlap",
        "dedup_substring_spans",
        # r12: the CCNet perplexity tier rides the documents family
        "corpus_perplexity_buckets",
    }
    wide = {"part_triangle_count_sampled", "events_rapid_repeat_pairs"}
    assert deep | wide <= set(probe), sorted(probe)
    for name, rec in probe.items():
        want_pts = 4 if name in deep else 3
        assert len(rec["rows"]) == want_pts and len(rec["sec"]) == want_pts, (
            name,
            rec,
        )
        assert rec["rows"] == sorted(rec["rows"]), name
        assert rec["loglog_slope"] <= 1.15, (name, rec)


def test_lineitem_events_probe_tier_is_honest(spark):
    """The r9 lineitem/events probe tables must be N disjoint graph
    copies, not N-fold densifications: row counts scale exactly,
    replica 0 is the untouched original, and no co-purchase edge can
    cross replicas because part keys are offset per replica (stride
    alignment is what keeps every triangle-pipeline stage linear)."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark import benchscale

    base = LO
    out = benchscale.ensure_scale_tier(
        spark, base, tables=("lineitem", "events")
    )
    li_base = spark.read.parquet(f"{base}/lineitem.parquet")
    li_probe = spark.read.parquet(f"{out}/lineitem.parquet")
    assert li_probe.count() == benchscale.DOC_MULT * li_base.count()
    # replica r's part keys live entirely inside r's stride window,
    # so two parts from different replicas can never share an order:
    # the replica index derived from orderkey and partkey must agree
    # on every line
    mismatch = li_probe.filter(
        F.floor(F.col("l_orderkey") / benchscale._ORD_STRIDE)
        != F.floor(F.col("l_partkey") / benchscale._PART_STRIDE)
    ).count()
    assert mismatch == 0
    rep0 = li_probe.filter(
        F.col("l_orderkey") < benchscale._ORD_STRIDE
    )
    assert rep0.count() == li_base.count()

    ev_base = spark.read.parquet(f"{base}/events.parquet")
    ev_probe = spark.read.parquet(f"{out}/events.parquet")
    assert ev_probe.count() == benchscale.DOC_MULT * ev_base.count()
    umis = ev_probe.filter(
        F.floor(F.col("event_id") / benchscale._EVT_STRIDE)
        != F.floor(F.col("user_id") / benchscale._USER_STRIDE)
    ).count()
    assert umis == 0


def test_sf1_tier_slopes_within_linear_bound():
    """The committed BENCH_FULL.json must carry the sf1-equivalent
    (x10) tier for the slowest eligible headliners (VERDICT r9 item
    6), and every per-decade slope log10(t_x10/t_sf0.1) must stay
    under 1.3 — linear-in-data plus harness noise; a quadratic stage
    reads ~2.0. Skips (with a loud reason) when the artifact on disk
    came from a probe-disabled quick run — the round-end clean bench
    regenerates the full block."""
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    full = json.load(open(os.path.join(root, "BENCH_FULL.json")))
    tiers = full.get("tiers") or {}
    if "1.0" not in tiers:
        pytest.skip(
            "BENCH_FULL.json lacks the sf1 tier (probe-disabled quick "
            "run on disk) — rerun the FULL bench before committing"
        )
    slopes = full.get("sf1_slope") or {}
    assert slopes, "sf1 tier present but sf1_slope block missing"
    bad = {n: s for n, s in slopes.items() if s > 1.3}
    assert not bad, f"x10-tier slopes past linear+noise: {bad}"
    # the skip ledger must exist (no silent caps): every slower-ranked
    # headliner not timed at x10 carries a recorded reason
    assert isinstance(full.get("sf1_skipped"), dict)
