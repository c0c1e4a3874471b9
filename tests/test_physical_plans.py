"""Physical-plan regression tests (SURVEY.md §4).

Correctness is the oracle's job; these tests pin the *plan shape* —
the properties that decide whether a query survives a 100 TB
scale-up. Each assertion is a fact that must hold at any scale
factor (pushed filters, column pruning, rank-limit pushdown,
explicit broadcasts), not a fact about AQE's size-based choices at
a particular SF.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from env_data_pipeline_spark.plans import registry

registry.load_all()


def formatted_plan(spark, name: str, sf_dir: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(plan: str) -> list[str]:
    return [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: ([^\n]*)", plan)


# Queries where a nested-loop join is the *designed* physical plan —
# each case is a broadcast of a provably tiny side, never a shuffle
# cross product:
# - brute-force cosine top-k: intentional cross product of a small
#   broadcast query set against the corpus — reachable ONLY under the
#   explicit `similarity_topk_exact_baseline` name (the user-facing
#   `similarity_topk` routes to the LSH equi-join);
# - IVF: centroid assignment cross-joins every vector against the
#   broadcast centroid sample (|centroids| = sqrt-scale, tiny);
# - landfire family: J1 range-classification fallback is a broadcast
#   theta join against a <20-row dimension (SURVEY §4 item 1);
# - semi/anti + set-op counts: 1-row scalar aggregates cross-joined
#   into the single result row (condition-less, both sides 1 row).
NESTED_LOOP_OK = {
    "similarity_topk_exact_baseline",
    "similarity_topk_ivf",
    "similarity_ivf_kmeans",  # Lloyd assignment: corpus x K=8 broadcast centroids
    "similarity_topk_ivf_trained",  # same corpus x K broadcast assignment shape
    "similarity_topk_ivfpq",  # coarse assignment + probe: corpus x K broadcast
    "similarity_topk_ivf_served",  # bounded query batch x broadcast K centroids
    "similarity_topk_ivfpq_served",  # serving stages of _ivfpq, artifact-fed
    "corpus_membership_dedup",  # 1-row Bloom bitmap broadcast against the delta
    "similarity_recall_at_k",  # brute-force ground truth by design
    "collect_quality_summary",  # rides the collect join tree
    "semi_anti_join_customers",
    "set_ops_part_types",
    "landfire_center_classification",
    "landfire_area_summary",
    "landfire_combined_risk",
    "landfire_interpreted_products",
    "collect_aggregated",
    "collect_json_sink",
    "collect_event_id_coordination",
    "idle_rich_customers",  # 1-row positive-balance scalar broadcast into customer
    "part_brand_share_shift",  # 1-row (min_year, max_year) scalar broadcast
    "customer_rfm_threshold_matrix",  # 1-row corpus-end-date scalar broadcast
    "events_funnel_conversion",  # three 1-row step counts cross-joined into one row
    "top_value_partkeys",  # 1-row global HAVING threshold broadcast (Q11)
    # lexical statistics: the corpus scalars (N docs, avg doc length)
    # are one-row broadcasts into the token stream by design
    "text_tfidf_top_terms",
    "text_bm25_search",
    "text_pmi_collocations",
    "corpus_boilerplate_scrub",
    # per-edge one-row (totals x orphans) combine; everything is 1-row
    "referential_integrity_audit",
    # 9-row digit reference x 1-row total
    "orders_benford_digit_profile",
    # dense |sources| x |vocab| grid by design (absent tokens carry
    # drift mass); both sides are vocabulary-scale, not corpus-scale
    "corpus_source_divergence",
    # 1-row query broadcast + CONSTANT 20x20 pool pairwise-sim loop
    "similarity_mmr_diverse_topk",
    # 1-row traffic total cross-joined into the <=168-cell matrix
    "events_seasonality_profile",
    # 1-row corpus-last-day anchor broadcast onto the customer grain
    "customer_rfm_segments",
    # 1-row order total cross-joined into the <=dozen-bucket histogram
    "orders_ship_latency_histogram",
    # three 1-row global aggregates cross-joined into the summary row
    "part_triangle_count_sampled",
    # same singleton assembly, q=1/4 rung
    "part_triangle_count_sampled_q4",
    # 1-row global max-week broadcast gates churn attribution
    "events_user_lifecycle_weekly",
    # corpus x K=8 broadcast Lloyd assignment (same class as
    # similarity_ivf_kmeans) for snapshot training + frozen-centroid
    # scoring of both scenarios
    "ivf_drift_retrain_verdict",
    # 10-row decile grid broadcast joined on the computed exact rank
    # (rank-hit theta join against a constant-sized dimension)
    "customer_balance_deciles",
    # 1-row basket-total cross-joined into the pair stream for the
    # lift denominator
    "market_basket_lift_topk",
    # corpus x K=8 broadcast Lloyd training + broadcast-centroid cell
    # assignment of the augmented corpus (same class as
    # similarity_ivf_kmeans); the pair scan itself is a cell equi-join
    "dedup_semantic_semdedup",
    # 1-row cluster/group counts cross-joined into the 1-row B-cubed
    # summary (singleton-aggregate assembly)
    "dedup_bcubed_eval",
    # 1-row tau (the (k+1)-th priority) and 1-row exact total
    # cross-joined into the single estimator row
    "lineitem_priority_sample_estimate",
    # 1-row norm frames (the j-ordered fold) cross-joined back onto
    # the 64-row direction each iteration + the 1-row convergence
    # certificate onto the 64-row output
    "embedding_power_iteration_pc1",
    # 1-row total / threshold-k / share frames assembled into the
    # single Pareto summary row (singleton-aggregate assembly)
    "customer_pareto_8020",
    # rides the dedup_semantic_semdedup decision plan (Lloyd
    # assignment, see above) + the same 1-row B-cubed assembly
    "dedup_semantic_bcubed",
    # 1-row corpus count broadcast into the tf-idf unit expression
    # (same singleton pattern as text_tfidf_top_terms)
    "text_sparse_cosine_pairs",
    # 1-row query-embedding broadcast against the corpus (same
    # single-query serving class as similarity_mmr_diverse_topk)
    "hybrid_search_rrf",
    # bounded anchor frame broadcast-crossed against one corpus scan —
    # the deliberate exact mining tier (same brute-force class as
    # similarity_recall_at_k / similarity_topk_exact_baseline)
    "embedding_hard_negatives",
    # type-pair fan-out: a |types|^2 (=25-row) inequality self-join
    # builds the pair dimension, then the 10-row pair frame broadcasts
    # onto the distinct-hash stream with an OR-equi membership
    # condition — both sides of each nested loop are constant-sized
    "events_kmv_set_ops",
}

HEADLINE = [
    "flagship_pricing_summary",
    "revenue_by_region",
    "topk_orders_per_priority",
    "order_priority_check",
    "events_sessionized_stats",
    "events_asof_last_touch",
    "collect_aggregated",
    "similarity_topk_lsh",
    "text_quality_profile",
    "small_quantity_revenue",
    "dedup_exact",
]


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_cartesian_product(spark, sf_dir, name):
    """Audit EVERY registered query: a shuffle cross product anywhere
    is a plan bug at any scale, and a nested-loop join is allowed
    only where the design calls for one (see NESTED_LOOP_OK)."""
    plan = formatted_plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, name
    if name not in NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    """The shipdate filter must reach the parquet scan and the scan
    must not read l_comment (column pruning): at 100 TB this is the
    difference between scanning 7 columns and 16."""
    plan = formatted_plan(spark, "flagship_pricing_summary", sf_dir)
    pushed = " ".join(pushed_filters(plan))
    assert "LessThanOrEqual(l_shipdate" in pushed
    reads = " ".join(read_schemas(plan))
    assert "l_comment" not in reads
    assert "l_returnflag" in reads
    # partial + final hash aggregation (map-side combine before the
    # exchange) — grouped agg must never be a single global pass
    assert plan.count("HashAggregate") >= 2


def test_topk_rank_limit_pushdown(spark, sf_dir):
    """row_number()<=k must compile to WindowGroupLimit so each
    partition keeps a k-row heap instead of materializing and
    sorting every group (the 100 TB top-k guarantee)."""
    plan = formatted_plan(spark, "topk_orders_per_priority", sf_dir)
    assert "WindowGroupLimit" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    """Explicitly-hinted small sides must plan as broadcast hash
    joins — no shuffle of the fact table on a dimension key."""
    for name in ("small_quantity_revenue", "landfire_center_classification"):
        plan = formatted_plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name


def test_pivot_single_scan(spark, sf_dir):
    """orders_status_pivot derives counts and totals from ONE pivot
    aggregation — the plan tree must contain exactly one scan of the
    fact table (no self-join back for the totals)."""
    plan = formatted_plan(spark, "orders_status_pivot", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree


def test_simhash_pairs_banded_equi_join(spark, sf_dir):
    """dedup_simhash_pairs must pair candidates through the banded
    (band, key) equi-join — a hash/sort-merge join keyed on the probe,
    never a nested-loop over fingerprints."""
    plan = formatted_plan(spark, "dedup_simhash_pairs", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the probe explode feeds the join: Generate(explode) + a join
    # whose keys are the band/key pair
    assert "Generate explode" in plan or "Generate" in plan
    assert "band" in plan and "key" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    # r6: the fingerprint is pure JVM Column math now — no Python
    # kernel anywhere in the plan (ArrowEvalPython was the engine's
    # last row-level Python besides the multimodal byte codec)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """The 100 TB co-location property: joining two tables bucketed on
    the join key must plan WITHOUT any Exchange — the shuffle cost is
    paid once at write time, not on every join."""
    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.operators import bucketing as B

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    B.write_bucketed(li, "li_bkt", 4, "l_orderkey", path=str(tmp_path / "li"))
    B.write_bucketed(orders, "o_bkt", 4, "o_orderkey", path=str(tmp_path / "o"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the join must be partitioned — the point
        # is that bucketing satisfies the partitioning requirement
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("li_bkt").join(
            spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # sanity: the join actually runs and matches the unbucketed count
        assert j.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        B.drop_table(spark, "li_bkt")
        B.drop_table(spark, "o_bkt")


def test_selective_scans_prune_columns(spark, sf_dir):
    """Narrow queries must read narrow schemas."""
    plan = formatted_plan(spark, "revenue_by_region", sf_dir)
    reads = read_schemas(plan)
    li = [r for r in reads if "l_orderkey" in r]
    assert li and all("l_shipdate" not in r and "l_comment" not in r for r in li)
    plan = formatted_plan(spark, "topk_orders_per_priority", sf_dir)
    (orders_read,) = read_schemas(plan)
    assert "o_comment" not in orders_read and "o_orderdate" not in orders_read


def test_rolling_fingerprint_shuffles_hash_not_text(spark, sf_dir, monkeypatch):
    """The fingerprint groupBy must exchange on the 8-byte fingerprint
    only — document text must never cross the wire (X4 scale shape).

    The scale shape is pinned with the catalog scan floor disabled:
    at production scale the floor is a structural no-op (row groups >=
    parallelism short-circuits it), so the floor-off plan IS the
    at-scale plan. With the floor on (the local-layout repair, r12),
    the only extra exchange allowed is the doc_id-keyed layout floor
    itself."""
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FLOOR", "0")
    plan = formatted_plan(spark, "text_rolling_fingerprint", sf_dir)
    ex = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert ex, "expected one hash exchange for the fingerprint agg"
    for keys in ex:
        assert "fingerprint" in keys
        assert "text" not in keys
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FLOOR", "1")
    plan = formatted_plan(spark, "text_rolling_fingerprint", sf_dir)
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "fingerprint" in keys or keys.startswith("doc_id"), keys
        assert "text" not in keys


def test_similarity_joins_carry_prebuilt_norms(spark, sf_dir):
    """Pair scoring must reuse the per-row norm columns: a plan that
    recomputes sqrt(dot(v,v)) per pair shows 3 aggregate() calls per
    sim expression instead of 1. Count the aggregate-HOF occurrences
    in the final projection of each similarity query: the dot product
    appears once per scored pair, the norms must not."""
    for name in (
        "similarity_topk_lsh",
        "similarity_topk_ivf",
        "similarity_topk",
        "similarity_topk_hyperplane",
    ):
        plan = formatted_plan(spark, name, sf_dir)
        # norms are built where the vectors are scanned, before the
        # join: the join-side projections must reference the norm
        # columns, not re-derive them
        assert "q_norm" in plan and "c_norm" in plan, name


def test_json_props_single_parse(spark, sf_dir):
    """from_json must appear exactly once per row (schema-on-read,
    parse-early): a per-field get_json_object rewrite would show one
    parse per extracted field."""
    plan = formatted_plan(spark, "events_props_json_stats", sf_dir)
    assert plan.count("from_json") <= 2  # project + partial-agg reuse
    assert "get_json_object" not in plan


def test_repetition_profile_zero_exchanges(spark, sf_dir):
    """X6 repetition metrics are per-row HOFs — the plan must contain
    NO Exchange at all (embarrassingly parallel at any scale)."""
    plan = formatted_plan(spark, "text_repetition_profile", sf_dir)
    assert "Exchange" not in plan, plan


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """X6 decontamination: the eval hash set must broadcast (build
    side stays benchmark-sized at 100 TB) and the join must be a
    BroadcastHashJoin on the gram hash, never a shuffle join of the
    full corpus shingle set."""
    plan = formatted_plan(spark, "decontaminate_eval_overlap", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pack_sequences_exchange_budget(spark, sf_dir):
    """X6 packing, BPE-denominated since r9: the corpus-side plan is
    bounded — the word-instance aggregation to doc grain, the
    doc_id token join, the shard window, and the final (shard,
    seq_id) aggregation reusing the shard partitioning — while the
    whole tokenizer subplan stays vocabulary-scale behind ONE
    broadcast (the (word, n_bpe) table; tokenizer-internal exchanges
    shuffle tens of rows). Pins: corpus-grain exchanges <= 4, the
    wordtok side broadcasts, and NO doc-grain frame is broadcast (a
    doc-grain broadcast would OOM the driver at 100 TB)."""
    plan = formatted_plan(spark, "corpus_pack_sequences", sf_dir)
    # formatted mode prints each node in the tree AND in the detail
    # list — count the numbered detail entries only
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # 4 corpus-grain (instance agg, token join x2 sides, shard
    # window) + tokenizer-internal vocabulary-scale exchanges
    assert n_exchanges <= 8, plan
    assert "BroadcastExchange" in plan, plan
    subtrees = _broadcast_subtrees(spark, "corpus_pack_sequences", sf_dir)
    for sub in subtrees:
        # a doc-grain broadcast shows as an aggregate keyed by doc_id
        # under the BroadcastExchange; the legal broadcasts aggregate
        # by word (the vocabulary grain)
        assert "keys=[doc_id" not in sub.replace(" ", "").lower(), (
            "doc-grain frame broadcast:\n" + sub
        )


def test_bucketed_merge_upsert_elides_shuffle(spark, sf_dir, tmp_path):
    """X7 + bucketing: a nightly MERGE on a corpus bucketed by the
    merge key must plan with NO Exchange — the co-location property
    that makes repeated merges affordable at 100 TB."""
    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.operators import bucketing as B
    from env_data_pipeline_spark.operators import incremental as INC
    from env_data_pipeline_spark.plans.incremental import _doc_updates

    docs = table(spark, sf_dir, "documents")
    B.write_bucketed(docs, "docs_bkt", 4, "doc_id", path=str(tmp_path / "d"))
    B.write_bucketed(
        _doc_updates(docs), "upd_bkt", 4, "doc_id", path=str(tmp_path / "u")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = INC.merge_upsert(
            spark.table("docs_bkt"), spark.table("upd_bkt"), key="doc_id"
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = merged._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin FullOuter" in plan, plan
        assert "Exchange" not in plan, plan
        # and the merged result matches the unbucketed path
        unbucketed = INC.merge_upsert(docs, _doc_updates(docs), key="doc_id")
        assert merged.count() == unbucketed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        B.drop_table(spark, "docs_bkt")
        B.drop_table(spark, "upd_bkt")


def test_scd2_single_join_mapside_fanout(spark, sf_dir):
    """SCD2 history is ONE key join + a map-side explode fan-out —
    not a union of two separately re-joined branches. At 100 TB the
    difference is one shuffle of the dimension vs three."""
    plan = formatted_plan(spark, "customer_scd2_history", sf_dir)
    # count JOIN NODES (numbered detail headers), not string mentions —
    # the formatted dump prints each node in the tree AND the details
    join_nodes = re.findall(
        r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    assert len(join_nodes) == 1, join_nodes
    assert "Generate" in plan  # the explode fan-out


def test_quantize_zero_preagg_shuffle(spark, sf_dir):
    """int8 quantization math evaluates in the scan projection: the
    only exchange in the plan is the 10-group final aggregate's."""
    plan = formatted_plan(spark, "embedding_quantize_int8", sf_dir)
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_gap_fill_scaffold_is_per_key(spark, sf_dir):
    """The hourly scaffold comes from a per-user sequence() explode
    (Generate), never a global calendar cross join."""
    plan = formatted_plan(spark, "events_gap_fill_hourly", sf_dir)
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Scale probe: with the production-size thresholds met (forced
    here by zeroing the application-side threshold), Catalyst injects
    a runtime bloom filter from the selective dimension side into the
    fact scan — rows that cannot join are dropped BEFORE the shuffle.
    This is the 100 TB mechanism that makes selective star joins
    shuffle only matching rows; the default thresholds simply keep it
    off at test scale."""
    from env_data_pipeline_spark.catalog import table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join so the runtime filter (not a broadcast
        # reuse) is the pruning mechanism under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 500000
        )
        li = table(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "might_contain" in plan, plan[:3000]
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pq_codebook_broadcast_equi_join(spark, sf_dir):
    """PQ assignment must be an equi-join on the subspace id against
    the broadcast 128-row codebook — never a nested loop over
    codewords — and the vectors themselves must not shuffle: the only
    exchanges carry (vec_id, m, dist_u) integers."""
    plan = formatted_plan(spark, "embedding_pq_reconstruction", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_argmin_has_no_window(spark, sf_dir):
    """The Lloyd assignment must be a partial-aggregated min(struct),
    never a row_number window — the window would shuffle all K
    candidate rows (each carrying the full vector) per point instead
    of combining to one row map-side (review finding, fixed)."""
    plan = formatted_plan(spark, "similarity_ivf_kmeans", sf_dir)
    assert not re.findall(r"\(\d+\) Window", plan)


def test_ivf_trained_serving_plan_shape(spark, sf_dir):
    """The trained-centroid serving path must keep the r4-approved IVF
    shape: the CORPUS-side cell assignment is a map-side min(struct)
    partial aggregate — the only Window nodes allowed are the two on
    query-sized data (the nprobe probe ranking and the final top-k) —
    centroid/candidate joins are broadcasts, and nothing plans a
    shuffle cross product. This is the 'plan shape unchanged' clause
    of the r4 verdict's top item."""
    plan = formatted_plan(spark, "similarity_topk_ivf_trained", sf_dir)
    assert "CartesianProduct" not in plan
    # broadcast assignment: corpus x K centroids via BNLJ, candidates
    # via broadcast hash join on the cell key
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    # exactly two Window nodes (probe rank + final rank), neither on
    # the corpus assignment; WindowGroupLimit entries don't count
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 2, true_windows


def test_relational_ext_topk_plans(spark, sf_dir):
    """The TPC-H-analog top-k queries must plan a per-partition
    partial top-k (TakeOrderedAndProject), never a global sort of the
    aggregate output."""
    for name in (
        "shipping_priority_topk",
        "returned_items_top_customers",
        "large_volume_orders",
        "sole_failed_supplier_lines",
    ):
        plan = formatted_plan(spark, name, sf_dir)
        assert "TakeOrderedAndProject" in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_disjunctive_predicates_push_both_scans(spark, sf_dir):
    """Q19-analog: Catalyst must factor the single-side conjuncts out
    of the OR — the lineitem scan keeps the quantity envelope, the
    part scan keeps the brand set — instead of evaluating the whole
    disjunction post-join."""
    plan = formatted_plan(spark, "disjunctive_brand_revenue", sf_dir)
    pushed = " ".join(pushed_filters(plan))
    assert "l_quantity" in pushed, pushed
    assert "p_brand" in pushed, pushed


def test_customer_order_distribution_keeps_outer_join(spark, sf_dir):
    """Q13-analog: the priority predicate must stay in the join
    condition; a post-filter would let Catalyst degrade the outer join
    to inner and silently drop the zero-order customers."""
    plan = formatted_plan(spark, "customer_order_distribution", sf_dir)
    assert "LeftOuter" in plan, plan[:2000]


def test_cube_plans_single_expand(spark, sf_dir):
    """CUBE must evaluate all 2^k grouping sets from ONE fact pass via
    Expand, not one scan per level."""
    plan = formatted_plan(spark, "orders_cube_status_priority", sf_dir)
    assert plan.count("Expand") >= 1, plan[:1500]
    assert len(read_schemas(plan)) == 1, "CUBE must scan orders exactly once"


def test_window_navigation_single_exchange(spark, sf_dir):
    """All five navigation functions share one window spec — the plan
    must carry exactly ONE hash-partitioning exchange on custkey (plus
    the output range sort), not one per function."""
    plan = formatted_plan(spark, "customer_order_navigation", sf_dir)
    assert len(re.findall(r"hashpartitioning\(o_custkey", plan)) <= 2, plan[:3000]
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 1, true_windows


def test_multi_distinct_uses_expand_not_rejoin(spark, sf_dir):
    """Two DISTINCT aggregates + plain aggregates must come from one
    scan via Expand — a per-distinct self-join would read orders
    multiple times."""
    plan = formatted_plan(spark, "priority_distinct_profile", sf_dir)
    assert "Expand" in plan, plan[:1500]
    assert len(read_schemas(plan)) == 1, "multi-distinct must scan orders once"


def test_twap_windows_on_bucketed_keys(spark, sf_dir):
    """events_time_weighted_value must window within (event_type, day)
    buckets — a LEAD partitioned by event_type alone is a 5-task
    bottleneck at any scale. The row-level exchange must carry BOTH
    keys; the boundary-repair firsts table joins back as a broadcast."""
    plan = formatted_plan(spark, "events_time_weighted_value", sf_dir)
    assert re.search(r"hashpartitioning\(event_type[^)]*bucket", plan), (
        plan[:3000]
    )
    assert "BroadcastHashJoin" in plan


def test_kmv_sketch_uses_group_limit(spark, sf_dir):
    """The KMV rank<=k filter must compile to WindowGroupLimit — each
    partition keeps a 64-row heap, never the full distinct-hash set.
    And the estimate must actually estimate: within 40% of exact for
    every type (k=64 gives ~12.5% standard error)."""
    plan = formatted_plan(spark, "events_kmv_distinct_estimate", sf_dir)
    assert "WindowGroupLimit" in plan
    for r in registry.QUERIES["events_kmv_distinct_estimate"](
        spark, sf_dir
    ).collect():
        err = abs(r["kmv_estimate"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert err < 0.40, (r["event_type"], r["kmv_estimate"], r["n_exact"])


def test_q2_analog_window_min_single_pass(spark, sf_dir):
    """cheapest_supplier_per_part must find the per-part minimum with
    ONE window pass over the offer aggregate — a re-aggregate +
    self-join would scan lineitem twice — and finish with a partial
    top-k, with part/supplier/nation as broadcasts."""
    plan = formatted_plan(spark, "cheapest_supplier_per_part", sf_dir)
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 1, true_windows
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    li_scans = re.findall(r"lineitem", plan)
    assert len(li_scans) <= 2, "lineitem must be scanned exactly once"


def test_q6_analog_pure_scan_aggregate(spark, sf_dir):
    """discount_revenue_opportunity is the canonical scan probe: every
    predicate reaches PushedFilters and the ReadSchema carries exactly
    the four referenced columns."""
    plan = formatted_plan(spark, "discount_revenue_opportunity", sf_dir)
    pushed = " ".join(pushed_filters(plan))
    for colname in ("l_shipdate", "l_discount", "l_quantity"):
        assert colname in pushed, pushed
    schemas = read_schemas(plan)
    assert len(schemas) == 1, "one table, one scan"
    assert schemas[0].count(",") == 3, schemas[0]  # exactly 4 columns


def test_scalar_threshold_queries_share_one_fact_scan(spark, sf_dir):
    """Q11/Q15 analogs rejoin their own aggregate against a global
    scalar (threshold / max). The lazy localCheckpoint must truncate
    the lineage so BOTH consumers read the materialized aggregate —
    the formatted plan shows ExistingRDD scans and NO lineitem parquet
    scan (lineitem is read once, inside the checkpointed RDD)."""
    for name in ("top_value_partkeys", "top_revenue_supplier"):
        plan = formatted_plan(spark, name, sf_dir)
        assert "ExistingRDD" in plan, name
        assert not re.search(r"lineitem", plan), (
            f"{name}: lineitem re-scanned outside the checkpointed aggregate"
        )


def test_q16_analog_not_in_is_broadcast_anti_join(spark, sf_dir):
    """The NOT-IN supplier exclusion must compile to a broadcast LEFT
    ANTI probe (non-null key), never a shuffled subquery join."""
    plan = formatted_plan(spark, "supplier_variety_by_part_attrs", sf_dir)
    assert re.search(r"BroadcastHashJoin[^\n]*LeftAnti", plan), plan[:2500]
    assert "TakeOrderedAndProject" in plan


def test_q20_analog_window_share_single_aggregate(spark, sf_dir):
    """excess_shipping_suppliers computes part totals with one window
    over the (partkey, suppkey) aggregate — not a second aggregate
    joined back — and broadcasts part/supplier/nation."""
    plan = formatted_plan(spark, "excess_shipping_suppliers", sf_dir)
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 1, true_windows
    assert "BroadcastHashJoin" in plan


def test_tfidf_topk_uses_window_group_limit(spark, sf_dir):
    """The per-doc top-3 rank filter must push into the window sort
    (WindowGroupLimit) — no document materializes its full vocabulary
    past the operator."""
    plan = formatted_plan(spark, "text_tfidf_top_terms", sf_dir)
    assert "WindowGroupLimit" in plan


def test_bm25_prunes_tokens_before_shuffle(spark, sf_dir):
    """The query-term IN filter must apply at the token explode —
    before the tf aggregate's exchange — so the shuffle carries only
    query-term hits; top-k is a partial TakeOrderedAndProject."""
    plan = formatted_plan(spark, "text_bm25_search", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # the token IN filter must sit DIRECTLY above the explode's
    # Generate node (tree renders child below parent), pruning
    # non-query tokens before any exchange
    assert re.search(r"Filter \(\d+\)\s*\n[^\n]*\+- Generate \(\d+\)", plan), (
        plan[:2500]
    )


def test_pmi_shuffle_joins_vocab(spark, sf_dir):
    """PMI joins the unigram vocabulary back twice — as shuffle_hash
    joins, NOT broadcasts (ADVICE r9: the vocabulary grows with the
    corpus per Heaps' law); only the two 1-row totals broadcast."""
    plan = formatted_plan(spark, "text_pmi_collocations", sf_dir)
    assert plan.count("ShuffledHashJoin") >= 2, plan.count("ShuffledHashJoin")
    assert "BroadcastHashJoin" not in plan


def test_boilerplate_broadcasts_gram_set(spark, sf_dir):
    """Boilerplate joins its FREQUENT-gram set back as a broadcast —
    unlike the raw vocabulary, the df-threshold caps that set at
    |corpus| / threshold, so it stays bounded relative to the gram
    stream it prunes."""
    plan = formatted_plan(spark, "corpus_boilerplate_scrub", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_embedding_outliers_broadcast_centroids(spark, sf_dir):
    """The label-centroid table (|labels| x dim rows) must broadcast
    back onto the long-form vector stream — vectors are never
    re-shuffled for the distance pass; top-50 is a partial top-k."""
    plan = formatted_plan(spark, "embedding_label_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_cumulative_distinct_users_single_window(spark, sf_dir):
    """First-seen trick: one user-keyed aggregate then a day-grain
    running sum — exactly one Window node over the tiny per-day
    table, never a per-day distinct re-count."""
    plan = formatted_plan(spark, "events_cumulative_distinct_users", sf_dir)
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 1, true_windows


def test_market_basket_has_no_join(spark, sf_dir):
    """The pair expansion must come from per-order array HOFs — the
    plan contains NO join operator at all (the oracle's self-join
    would shuffle the order-part table twice)."""
    plan = formatted_plan(spark, "market_basket_part_pairs", sf_dir)
    assert "Join" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan


def test_rolling_7d_users_no_window(spark, sf_dir):
    """The WAU rewrite must be pure aggregate algebra: contribution
    expansion + dedup, NEVER a running COUNT DISTINCT window (which
    cannot partial-aggregate); the day list joins back as a broadcast
    semi join."""
    plan = formatted_plan(spark, "events_rolling_7d_active_users", sf_dir)
    assert not re.findall(r"\(\d+\) Window\b", plan)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_transition_matrix_single_data_window(spark, sf_dir):
    """One user-keyed LAG pass over the data; the from-type share
    window runs over the tiny |types|^2 count table."""
    plan = formatted_plan(spark, "events_transition_matrix", sf_dir)
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 2, true_windows  # LAG + tiny share window


def test_mad_outliers_broadcast_fences(spark, sf_dir):
    """Median and MAD fence tables (5 rows each) broadcast back onto
    the order stream; the report is a partial top-k."""
    plan = formatted_plan(spark, "orders_mad_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_lsh_verified_pairs_semi_restricts_corpus(spark, sf_dir):
    """The exact-Jaccard verify stage must touch ONLY candidate docs:
    the shingle stream is semi-join-restricted by the broadcast
    candidate doc set before any pair work shuffles."""
    plan = formatted_plan(spark, "dedup_lsh_verified_pairs", sf_dir)
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_centroid_confusion_no_window_argmin(spark, sf_dir):
    """Nearest-centroid assignment is a map-side min(struct) — no
    Window node over data-sized input; centroids broadcast."""
    plan = formatted_plan(spark, "embedding_centroid_confusion", sf_dir)
    data_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    # the only Window allowed is the |labels|^2-row share window
    assert len(data_windows) <= 1, data_windows
    assert "BroadcastHashJoin" in plan


def test_shard_balance_prunes_scan(spark, sf_dir):
    """The shard audit reads (doc_id, n_chars) ONLY — the text column
    must not appear in the parquet ReadSchema."""
    plan = formatted_plan(spark, "corpus_shard_balance", sf_dir)
    # single-table query -> exactly one ReadSchema line, and it must
    # carry only the two audited columns
    schemas = re.findall(r"ReadSchema: [^\n]*", plan)
    assert len(schemas) == 1, schemas
    assert "doc_id" in schemas[0] and "n_chars" in schemas[0], schemas[0]
    assert "text" not in schemas[0], schemas[0]


def test_pagerank_never_broadcasts_node_state(spark, sf_dir):
    """Each power iteration distributes contributions via a
    co-partitioned SHUFFLE_HASH join of the |parts|-sized
    contrib/inc frames onto the src-partitioned edge set (ADVICE r9:
    those frames grow with the data, so a broadcast — the pre-r10
    design — would detonate at scale). The only BroadcastHashJoin
    allowed is the 1-row n-nodes singleton init; no Window node
    appears anywhere."""
    plan = formatted_plan(spark, "part_pagerank_copurchase", sf_dir)
    # the every-other-iteration localCheckpoint truncates the visible
    # plan to the LAST two iterations — 2 joins each, all shuffled-hash
    assert plan.count("ShuffledHashJoin") >= 4, plan.count(
        "ShuffledHashJoin"
    )
    assert "BroadcastHashJoin" not in plan
    assert not re.findall(r"\(\d+\) Window\b", plan)
    assert "TakeOrderedAndProject" in plan


def test_ppr_never_broadcasts_node_state(spark, sf_dir):
    """Same pin for the seed-teleport variant — it shares
    _power_iterate with global PageRank."""
    plan = formatted_plan(spark, "part_ppr_recommendations", sf_dir)
    assert plan.count("ShuffledHashJoin") >= 4
    assert "BroadcastHashJoin" not in plan
    assert not re.findall(r"\(\d+\) Window\b", plan)
    assert "TakeOrderedAndProject" in plan


def test_skewed_tenant_join_aqe_split(spark, sf_dir, tmp_path):
    """AQE skew-join splitting, demonstrated and pinned (VERDICT r9
    item 4 — the one Catalyst scale feature without a pin next to
    DPP/bloom/bucketing): events_skewed_tenant_profile shuffles ~90%
    of the fact stream into the tenant-0 partition; with the skew
    thresholds scaled from their production defaults (256 MB
    threshold / 64 MB advisory / factor 5) down to test-SF bytes
    (4 KB / 2 KB / factor 2 — same ratios; the compressed sf0.1 hot
    block is ~100 KB), the EXECUTED sort-merge join must carry the
    skew=true marker, i.e. AQE split the hot partition into
    advisory-sized chunks at runtime. autoBroadcastJoinThreshold is
    disabled for the run so AQE cannot demote the merge-hinted SMJ
    to a broadcast join at test SF (the AQE-hazard discipline).
    Found the hard way, recorded here: the rule also requires BOTH
    SMJ children to be bare ENSURE_REQUIREMENTS shuffle stages and
    >= 2 mapper chunks per skewed partition (see the query docstring
    and the re-materialization below)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # coalescing first would merge the tiny non-skewed partitions
        # into blocks comparable to the hot one and mask the skew
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    # skew splits happen at MAPPER-chunk granularity: a production
    # scan has thousands of row groups, but the shipped testdata is
    # ONE row group = one mapper, making the hot reduce block a
    # single indivisible chunk no threshold can split — so the test
    # re-materializes sf0.1 events across 16 files to give the scan
    # the mapper parallelism the real deployment has.
    # the skew thresholds above need sf0.1's byte volume (the sf0.001
    # hot block is ~1 KB, under any splittable threshold), so derive
    # the sf0.1 sibling from the fixture's testdata root rather than
    # hardcoding the root itself
    hi_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.1")
    if not os.path.isdir(hi_dir):
        pytest.skip(f"sf0.1 testdata not present at {hi_dir}")
    spark.read.parquet(f"{hi_dir}/events.parquet").repartition(
        16
    ).write.parquet(str(tmp_path / "events.parquet"))
    spark.read.parquet(f"{hi_dir}/customer.parquet").write.parquet(
        str(tmp_path / "customer.parquet")
    )
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset key
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = registry.QUERIES["events_skewed_tenant_profile"](
            spark, str(tmp_path)
        )
        rows = df.collect()
        assert len(rows) == 5  # five event types
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_profile_prunes_scans(spark, sf_dir):
    """The skew audit reads exactly one key column per table — the
    events leg's ReadSchema must carry user_id only."""
    plan = formatted_plan(spark, "join_key_skew_profile", sf_dir)
    m = re.search(r"ReadSchema: [^\n]*user_id[^\n]*", plan)
    assert m, plan[:800]
    assert "event_type" not in m.group(0) and "props" not in m.group(0)


def test_rapid_repeat_pairs_never_broadcasts_events(spark, sf_dir):
    """Both sides of the (user, bucket) interval self-join are the
    fact stream (the probe side 2x via the bucket explode) — the merge
    hint must hold against AQE's data-sized broadcast at test SF."""
    plan = formatted_plan(spark, "events_rapid_repeat_pairs", sf_dir)
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan, plan


def test_phash_band_join_is_sort_merge(spark, sf_dir):
    """The fingerprint band self-join AND the two fingerprint lookups
    are asset-sized on at least one side and must stay sort-merge
    equi-joins — nothing in this plan may broadcast (the fingerprint
    table is the corpus)."""
    plan = formatted_plan(spark, "multimodal_phash_near_dups", sf_dir)
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan, plan


def test_substring_spans_never_broadcasts_grams(spark, sf_dir):
    """The gram stream is the one data-sized structure in this query;
    AQE left alone would broadcast it at test SF (measured: the hash
    table build dominated time and variance, and at 100 TB it's an
    OOM). The MERGE hint must hold: sort-merge self-join, no
    broadcast anywhere."""
    plan = formatted_plan(spark, "dedup_substring_spans", sf_dir)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan


def _broadcast_subtrees(spark, name: str, sf_dir: str) -> list[str]:
    """Indented-subtree texts under each BroadcastExchange of the
    SIMPLE plan — lets a pin anchor on WHAT is broadcast, not merely
    that something is."""
    import contextlib
    import io

    df = registry.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    lines = buf.getvalue().split("\n")
    subs = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        indent = len(ln) - len(ln.lstrip(" :+-"))
        sub = []
        for l2 in lines[i + 1:]:
            ind2 = len(l2) - len(l2.lstrip(" :+-"))
            if l2.strip() and ind2 <= indent:
                break
            sub.append(l2)
        subs.append("\n".join(sub))
    return subs


def test_quality_keep_broadcasts_winners(spark, sf_dir):
    """The per-cluster WINNER table (|clusters| rows) specifically
    must be a broadcast side — anchored on its kept_doc_id output so
    an unrelated broadcast elsewhere in the component pipeline cannot
    satisfy the pin vacuously."""
    subs = _broadcast_subtrees(spark, "dedup_cluster_quality_keep", sf_dir)
    # the winner side is the per-cluster max(struct(len, -id)) aggregate
    # (a SortAggregate — struct buffers aren't UnsafeRow-mutable; the
    # kept_doc_id alias itself collapses above the exchange)
    assert any("max(struct(" in s for s in subs), [s[:120] for s in subs]


def test_vocab_coverage_topv_and_broadcast(spark, sf_dir):
    """The vocabulary is a global top-V sort PREFIX
    (TakeOrderedAndProject — V rows, never the full token-count
    table materialized/sorted), and it broadcasts back onto the
    token stream."""
    plan = formatted_plan(spark, "text_vocab_coverage", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_ewma_window_over_day_grain_only(spark, sf_dir):
    """The EWMA LAG window runs over the (type, day)-grain aggregate —
    exactly one Window node, after a partial+final day aggregate."""
    plan = formatted_plan(spark, "events_ewma_daily", sf_dir)
    true_windows = re.findall(r"\(\d+\) Window\b(?!GroupLimit)", plan)
    assert len(true_windows) == 1, true_windows


def test_cms_sketch_broadcasts(spark, sf_dir):
    """The 256-cell CMS table specifically is the broadcast side —
    anchored on the broadcast subtree containing the cell AGGREGATE
    (the build), so a different broadcast can't satisfy the pin."""
    subs = _broadcast_subtrees(spark, "events_cms_user_counts", sf_dir)
    assert any("HashAggregate" in s for s in subs), [s[:120] for s in subs]


# --------------------------------------------------------------------------
# r7c merge-hinted data-sized joins: the hint must hold (no
# data-sized BroadcastExchange) — companion to SHUFFLE_SCALING
# --------------------------------------------------------------------------


def test_edit1_blocking_join_stays_sort_merge(spark, sf_dir):
    plan = formatted_plan(spark, "customer_name_edit1_pairs", sf_dir)
    assert "SortMergeJoin" in plan
    # the only join is the data-sized blocking-key self-join: ANY
    # broadcast here is a data-sized broadcast
    assert "BroadcastExchange" not in plan


def test_phrase_search_positional_join_stays_sort_merge(spark, sf_dir):
    plan = formatted_plan(spark, "text_phrase_search", sf_dir)
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan


def test_triangle_joins_broadcast_degrees_not_edges(spark, sf_dir):
    plan = formatted_plan(spark, "part_triangle_participation", sf_dir)
    # basket edge-build + wedge self-join are merge-hinted SMJ
    assert plan.count("SortMergeJoin") >= 2
    # the closure semi-join HASHES against the edge-sized probe — the
    # wedge relation (outdeg^2-sized) must stream, never sort
    assert "ShuffledHashJoin LeftSemi" in plan
    assert "SortMergeJoin LeftSemi" not in plan
    # remaining broadcasts are the EXPLICIT node-sized deg tables; a
    # nested-loop or cartesian anywhere is caught by the global audit


def test_substitution_level_join_stays_sort_merge(spark, sf_dir):
    plan = formatted_plan(spark, "part_substitution_candidates", sf_dir)
    # the catalog-proportional (type, level) probe|><|pool join is
    # merge-hinted; any broadcast here would be a data-sized broadcast
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan


def test_join_view_delta_terms_stay_sort_merge(spark, sf_dir):
    plan = formatted_plan(spark, "orders_join_view_incremental_refresh", sf_dir)
    # all four corpus-proportional join terms pinned to SMJ
    assert plan.count("SortMergeJoin") >= 4
    assert "BroadcastExchange" not in plan


def test_dpp_query_gets_dynamic_partition_pruning(spark, sf_dir):
    """lineitem_dpp_month_revenue's fact scan must carry a
    dynamicpruningexpression partition filter (the month set is only
    known after the dim-side quarter filter runs), the dim must ride
    a broadcast, and the fact must be the hive-partitioned layout —
    reading 3 of ~80 month directories at runtime. This is the
    remaining Catalyst scale feature next to the static product-dir
    pruning (landfire) and the runtime bloom-filter pin."""
    plan = formatted_plan(spark, "lineitem_dpp_month_revenue", sf_dir)
    low = plan.lower()
    assert "dynamicpruningexpression" in low, plan
    assert "ship_month" in plan
    assert "BroadcastExchange" in plan or "broadcastexchange" in low
    # the pruning subquery must REUSE the join's broadcast, not run
    # its own second dim scan+exchange — only visible in the FINAL
    # adaptive plan, so execute first
    df = registry.QUERIES["lineitem_dpp_month_revenue"](spark, sf_dir)
    df.collect()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    final = df._jdf.queryExecution().explainString(mode)
    assert "ReusedExchange" in final or "SubqueryBroadcast" in final, final


def test_ivf_served_plan_prunes_invlist_partitions(spark, sf_dir):
    """similarity_topk_ivf_served must SERVE, never rebuild: the plan
    reads the cell-partitioned inverted-list artifact with a
    dynamicpruningexpression on cell (only the probed cells' files),
    the query-side embeddings scan pushes the bounded-batch filter
    (vec_id < Q_CAP) into parquet, and no Lloyd stage (iterative
    aggregate over the corpus) appears — training lives behind the
    artifact cache. The K-sizing contract itself is exercised by
    tests/test_vectorops.py (scaled recall floor + inline replay)."""
    plan = formatted_plan(spark, "similarity_topk_ivf_served", sf_dir)
    low = plan.lower()
    assert "ivf_invlists" in plan, plan[:2000]
    assert "dynamicpruningexpression(cell" in low, plan[:3000]
    assert "LessThan(vec_id,50000)" in plan
    # serving consumes the persisted centroid parquet, not kmeans_train
    assert "ivf_centroids_scaled" in plan


def test_ivfpq_served_plan_prunes_codes_partitions(spark, sf_dir):
    """similarity_topk_ivfpq_served must SERVE from the persisted
    cell-partitioned codes artifact (r12): the plan reads ivfpq_codes
    with a dynamicpruningexpression on cell (only probed inverted
    lists), and no corpus-wide assignment/coding stage appears — the
    (cells->codes) build lives behind the artifact cache. Value
    equality with the inline-coding exhibit is pinned by
    tests/test_vectorops.py's served==trained comparison."""
    plan = formatted_plan(spark, "similarity_topk_ivfpq_served", sf_dir)
    low = plan.lower()
    assert "ivfpq_codes" in plan, plan[:2000]
    assert "dynamicpruningexpression(cell" in low, plan[:3000]
    assert "ivf_centroids" in plan and "pq_codebook" in plan


def test_semdedup_serves_from_persisted_centroids(spark, sf_dir):
    """dedup_semantic_semdedup consumes the _ivf_centroids artifact
    (its inline trainer was byte-identical to the artifact's builder):
    the plan must read the persisted centroid parquet and contain no
    Lloyd iteration (no corpus-wide aggregate under the centroid
    broadcast). Decision equality is pinned by the numpy replay test."""
    plan = formatted_plan(spark, "dedup_semantic_semdedup", sf_dir)
    assert "ivf_centroids" in plan, plan[:2000]
