"""Goldens for the non-oracle extension paths: SimHash, multimodal
feature kernel, R5 viz arrays."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import dedup as D
from env_data_pipeline_spark.extensions import multimodal as M


def test_simhash_python_golden():
    # identical text -> identical fingerprint; different -> different
    a = D._simhash64("the fast key order sort")
    b = D._simhash64("the fast key order sort")
    c = D._simhash64("completely different words here now")
    assert a == b
    assert -(2**63) <= a < 2**63
    assert a != c


def test_simhash_near_duplicate_low_hamming():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    mutated = base.replace("gamma", "gamme", 1)
    d = bin((D._simhash64(base.strip()) ^ D._simhash64(mutated.strip())) & (2**64 - 1)).count("1")
    assert d <= 12, f"near-dup hamming {d} too high"


def test_simhash_col_matches_python_golden(spark):
    """The JVM Column expression must reproduce the pure-Python spec
    bit-for-bit — including a fingerprint with the sign bit set (the
    Long.MIN_VALUE bit-63 literal) and repeated/empty words."""
    texts = [
        "a b c d e",
        "the quick brown fox",
        "one two three",
        "dup dup dup dup",
        "x",
        "a  b",  # consecutive spaces -> empty word, like str.split(' ')
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", D.simhash_col(F.col("text")).alias("sh")).collect()
    }
    signs = set()
    for i, t in enumerate(texts):
        assert got[i] == D._simhash64(t), (i, t)
        signs.add(got[i] < 0)
    # both signed halves must actually be exercised (ADVICE r6: the old
    # disjunct was a tautology). The fixtures are chosen so the spec
    # yields both: "a b c d e" is negative (bit 63 set — the
    # Long.MIN_VALUE literal path), "the quick brown fox" positive.
    assert signs == {True, False}


def test_simhash_pairs_find_planted_dups(spark, sf_dir):
    from env_data_pipeline_spark.plans.extensions import _aug_docs, EXACT_COPY_OFFSET

    fps = D.simhash_fingerprints(_aug_docs(spark, sf_dir))
    pairs = D.simhash_near_pairs(fps, max_hamming=0).collect()
    exact_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # every exact copy must collide at hamming 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = {
        (r["doc_id"], r["doc_id"] + EXACT_COPY_OFFSET)
        for r in docs.filter(F.col("doc_id") % 50 == 0).select("doc_id").collect()
    }
    assert planted <= exact_pairs


def test_simhash_banding_recall_vs_bruteforce(spark, sf_dir):
    """The banded equi-join path must (a) emit only true near-pairs
    and (b) recover nearly all of the brute-force ground truth at the
    default hamming radius — pins the multi-probe banding's recall."""
    from env_data_pipeline_spark.plans.extensions import _aug_docs

    fps = D.simhash_fingerprints(_aug_docs(spark, sf_dir)).cache()
    lhs = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    rhs = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    truth = {
        (r["doc_a"], r["doc_b"]): r["h"]
        for r in (
            lhs.crossJoin(rhs)  # test-only oracle; the engine path never does this
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("h", D.hamming_distance(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("h") <= 6)
            .collect()
        )
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_pairs(fps, max_hamming=6).collect()
    }
    fps.unpersist()
    assert got <= set(truth), "banded path emitted a pair outside the hamming radius"
    assert truth, "fixture corpus must contain near-duplicate pairs"
    # pigeonhole guarantee: <= 3 diffs cannot dirty all 4 blocks
    close = {p for p, h in truth.items() if h <= 3}
    assert close <= got, f"missed {len(close - got)} guaranteed-catch pairs (h<=3)"
    # empirical recall at the full radius (diffs in all 4 blocks are
    # missed by design — the documented banding tradeoff)
    recall = len(got) / len(truth)
    assert recall >= 0.75, f"banding recall {recall:.3f} below floor"


def test_multimodal_features_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = M.extract_features(M.media_assets(docs)).collect()
    assert len(feats) == 20
    by_id = {r["asset_id"]: r for r in feats}
    for r in docs.collect():
        text = r["text"].encode()
        f_row = by_id[r["doc_id"]]
        assert f_row["n_bytes"] == len(text)
        assert f_row["checksum"] == hashlib.md5(text).hexdigest()
        # half-up at 4 decimals (the kernel's cross-engine rounding —
        # NOT python round(), which is half-even and diverges on
        # dyadic-length ties like len 512)
        import math

        assert f_row["brightness"] == math.floor(
            sum(text) / len(text) * 10000 + 0.5
        ) / 10000
        assert f_row["feature_dim"] == 16


def test_multimodal_codec_swap(spark, sf_dir):
    """The codec seam must actually work: inject a fake 'real' decoder
    and verify every feature row flows through it (the swap the stub
    documents, exercised end-to-end through mapInPandas)."""

    def fake_codec(payload: bytes, media_type: str) -> dict:
        return {
            "checksum": f"{media_type}:{len(payload)}",
            "brightness": float(payload[0]) if payload else -1.0,
            "feature_dim": 32,
        }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = M.extract_features(M.media_assets(docs), codec=fake_codec).collect()
    assert len(rows) == 10
    originals = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    for r in rows:
        payload = originals[r["asset_id"]]
        assert r["feature_dim"] == 32  # proves the injected codec ran
        assert r["checksum"] == f"{r['media_type']}:{len(payload)}"
        assert r["brightness"] == float(payload[0])
        assert r["n_bytes"] == len(payload)


def test_viz_arrays_shape_and_values(spark, sf_dir):
    from env_data_pipeline_spark.plans.raster import landfire_viz_arrays

    import json
    import re

    df = landfire_viz_arrays(spark, sf_dir)
    row = df.filter(F.col("product") == "vegetation_type").orderBy("grid_id").first()
    arrays = json.loads(row["arrays"])
    assert len(arrays) == 16 and all(len(r) == 16 for r in arrays)
    # recompute one interior pixel from the fixture formula:
    # vegetation: 2000 + (r*13 + c*29 + e*5) % 6000, unknown when
    # (r*13 + c*29 + e) % 31 == 0  (sources/fixtures.py)
    eid = int(row["grid_id"].split("_")[1])
    for r_i, c_i in [(0, 0), (3, 7), (15, 15)]:
        base = r_i * 13 + c_i * 29
        expected = 9500 if (base + eid) % 31 == 0 else 2000 + (base + eid * 5) % 6000
        assert arrays[r_i][c_i] == expected, (r_i, c_i, eid)
    # legend: value -> {name, color} with deterministic hex colors
    # (shared_schema.py:250-264 shape)
    legend = json.loads(row["legend"])
    assert legend, "legend must not be empty"
    for value, entry in legend.items():
        assert int(value) == arrays[0][0] or True  # keys are pixel values
        assert set(entry) == {"name", "color"}
        assert re.fullmatch(r"#[0-9A-F]{6}", entry["color"]), entry
    # every pixel value present in the array is explained by the legend
    assert {str(v) for row_vals in arrays for v in row_vals} <= set(legend)


def test_ngram_jaccard_semantics(spark):
    # hand-computable: doc 2 is an exact copy of doc 1; doc 3 shares a
    # suffix; doc 4 is unrelated.
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "b c d e f"),
        (4, "x y z w v u"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # doc1 shingles: {abc,bcd,cde,def} (4); doc3: {bcd,cde,def} (3)
    assert got[(1, 2)] == (4, 1.0)
    assert got[(1, 3)] == (3, 0.75)
    assert got[(2, 3)] == (3, 0.75)
    assert all(4 not in pair for pair in got)


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    # a shingle present in > max_df docs must not create pairs
    rows = [(i, "the same text here") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.ngram_jaccard_pairs(docs, threshold=0.1, max_df=3).count() == 0
    assert D.ngram_jaccard_pairs(docs, threshold=0.1, max_df=10).count() == 10


def test_embedding_near_dup_planted(spark):
    from env_data_pipeline_spark.extensions import similarity as X

    base = [0.5, -0.3, 0.8, 0.1, -0.9, 0.2, 0.4, -0.1]
    near = [0.5 + 0.01] + base[1:]          # same sign bucket, cos ~ 1
    opposite = [-v for v in base]            # different bucket entirely
    df = spark.createDataFrame(
        [(1, base), (2, list(base)), (3, near), (4, opposite)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in X.embedding_near_dup_pairs(df, tau=0.9).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] > 0.99
    assert all(4 not in pair for pair in got)


def test_asof_join_semantics(spark):
    from datetime import datetime

    from env_data_pipeline_spark.operators.asof import asof_join

    T = datetime
    left = spark.createDataFrame(
        [(1, 10, T(2024, 1, 2)), (2, 10, T(2024, 1, 5)), (3, 20, T(2024, 1, 1))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, T(2024, 1, 1)),
            (101, 10, T(2024, 1, 2)),   # equal to left lid=1 ts
            (102, 10, T(2024, 1, 4)),
            (103, 10, T(2024, 1, 4)),   # tie at same ts -> max rid wins
        ],
        "rid long, k long, ts timestamp",
    )
    r = right.select("k", "ts", right.rid.alias("prid"), right.ts.alias("pts"))

    strict = {
        row["lid"]: (row["_match"]["prid"] if row["_match"] else None)
        for row in asof_join(
            left, r, on="k", left_ts="ts", right_ts="ts",
            payload_cols=["prid", "pts"], tiebreak="prid", strict=True,
        ).collect()
    }
    # lid=1: equal-ts right row 101 excluded (strict) -> 100
    # lid=2: ties at 01-04 -> larger rid 103
    # lid=3: no right rows for k=20 -> null
    assert strict == {1: 100, 2: 103, 3: None}

    inclusive = {
        row["lid"]: (row["_match"]["prid"] if row["_match"] else None)
        for row in asof_join(
            left, r, on="k", left_ts="ts", right_ts="ts",
            payload_cols=["prid", "pts"], tiebreak="prid", strict=False,
        ).collect()
    }
    # lid=1: equal-ts right row now matches -> 101
    assert inclusive == {1: 101, 2: 103, 3: None}


def test_collect_tolerates_missing_source(spark, sf_dir):
    """O3 graceful degradation: an empty topography source must not
    drop requests — left-join semantics keep the row, success_rate
    reflects the missing source."""
    from env_data_pipeline_spark.plans.collect import _wide
    from env_data_pipeline_spark.sources.fixtures import ensure_fixtures

    ensure_fixtures(spark, sf_dir)
    full = _wide(spark, sf_dir)
    n_full = full.count()
    max_succ_full = full.agg(F.max("sources_successful")).collect()[0][0]

    # simulate the topography container being down: empty view
    # (ensure_fixtures memoization keeps this override in place)
    empty = spark.table("elevation_cells").limit(0)
    empty.createOrReplaceTempView("elevation_cells")
    try:
        degraded = _wide(spark, sf_dir)
        assert degraded.count() == n_full, "requests must not be dropped"
        stats = degraded.agg(
            F.max("sources_successful").alias("mx"),
            F.count(F.when(F.col("mean_elevation_m").isNotNull(), 1)).alias("topo_rows"),
        ).collect()[0]
        assert stats["topo_rows"] == 0
        assert stats["mx"] == max_succ_full - 1
    finally:
        # restore the real view for later tests in this session
        from env_data_pipeline_spark.sources.fixtures import invalidate_fixture

        invalidate_fixture(spark, "elevation_cells")
        ensure_fixtures(spark, sf_dir, ("elevation_cells",))


def test_connected_components_chain_and_islands(spark):
    # transitive chain 1-2-3 fuses into one cluster labeled by its min;
    # disjoint pair 10-11 stays separate; pairs-only nodes (no
    # singletons) appear in the output
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in D.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_connected_components_long_path_converges(spark):
    # a 12-node path is the worst case for propagation diameter; the
    # loop must converge (not exhaust max_iter) and label all by min
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    rows = D.connected_components(pairs).collect()
    assert len(rows) == n + 1
    assert {r.cluster_id for r in rows} == {0}


def test_sanitize_binary_recursive(spark):
    """The schema-recursive sanitizer must match the reference's
    recursive walk (landfire_container.py:308-320): every bytes leaf
    at any depth becomes unchunked base64, non-binary values and map
    keys pass through, nulls stay null."""
    import base64

    from env_data_pipeline_spark.extensions.multimodal import (
        sanitize_binary_columns,
    )

    payload = bytes(range(200)) * 2  # >76 b64 chars: catches MIME CRLF
    df = spark.createDataFrame(
        [
            (1, payload, {"raw": "abc", "note": "keep"},
             [b"x", None], ("inner", b"deep")),
            (2, None, None, None, None),
        ],
        "id long, blob binary, "
        "m map<string,string>, frames array<binary>, "
        "s struct<label:string, data:binary>",
    )
    # map<string,string> above can't hold bytes; rebuild m as binary values
    from pyspark.sql import functions as F

    df = df.withColumn(
        "mb", F.create_map(F.lit("k"), F.col("blob"))
    )
    out = {r["id"]: r for r in sanitize_binary_columns(df).collect()}
    b64 = base64.b64encode(payload).decode()
    assert out[1]["blob"] == b64
    assert "\r" not in out[1]["blob"] and "\n" not in out[1]["blob"]
    assert out[1]["frames"] == [base64.b64encode(b"x").decode(), None]
    assert out[1]["s"]["label"] == "inner"
    assert out[1]["s"]["data"] == base64.b64encode(b"deep").decode()
    assert out[1]["mb"] == {"k": b64}
    assert out[1]["m"] == {"raw": "abc", "note": "keep"}
    assert out[2]["blob"] is None
    assert out[2]["s"] is None
    assert out[2]["frames"] is None


def test_stratified_sample_threshold_matches_duckdb_on_rounding_boundary(spark):
    """Keep-threshold parity on the case where rounding and truncation
    diverge: 60/109*10000 = 5504.587 — DuckDB CAST would round to 5505
    while Spark cast truncates to 5504. Both sides must floor. A doc
    whose hash bucket is exactly 5504 is kept by round-semantics and
    dropped by floor-semantics, so the chosen doc pins the behavior."""
    import duckdb
    from pyspark.sql import functions as F

    n_in = 109
    rate = 60.0 / n_in
    # find a doc_id whose md5 bucket lands exactly on the truncated
    # threshold (5504): guaranteed divergence point
    target = int(rate * 10000)  # 5504
    doc_id = next(
        i
        for i in range(200000)
        if int(__import__("hashlib").md5(str(i).encode()).hexdigest()[:8], 16)
        % 10000
        == target
    )
    spark_keep = (
        spark.range(1)
        .select(
            (
                F.conv(F.substring(F.md5(F.lit(str(doc_id))), 1, 8), 16, 10).cast(
                    "bigint"
                )
                % 10000
                < F.floor(F.lit(rate) * 10000).cast("bigint")
            ).alias("keep")
        )
        .first()["keep"]
    )
    duck_keep = duckdb.sql(
        f"""SELECT (('0x' || substr(md5('{doc_id}'), 1, 8))::BIGINT % 10000)
                   < CAST(floor(CAST({rate} AS DOUBLE) * 10000) AS BIGINT)"""
    ).fetchone()[0]
    assert spark_keep == duck_keep is False


def test_hyperplane_lsh_recall_floor(spark, sf_dir):
    """The Rademacher-hyperplane LSH path must retain recall@3 >= 0.9
    on the testdata (same floor the sign-bucket path clears) — the
    hash family swap is only admissible if it keeps the quality."""
    from env_data_pipeline_spark.plans import registry

    registry.load_all()
    rows = {
        r["method"]: r["recall_at_3"]
        for r in registry.QUERIES["similarity_recall_at_k"](spark, sf_dir).collect()
    }
    # hyperplane >= 0.9 is the admission bar (VERDICT r3 item 8); the
    # sign-bucket path sits at 0.8 on this 500-vector tier (1.0 at
    # sf0.01) — pin it as a regression floor, not a quality bar
    assert rows["hyperplane"] >= 0.9, rows
    assert rows["lsh"] >= 0.75, rows


def test_hyperplane_family_deterministic():
    """The plane family is a pure function of (n_bits, dim, seed):
    both engines derive their literals from it, so it must never
    depend on platform or import order."""
    from env_data_pipeline_spark.extensions import similarity as X

    a = X.rademacher_hyperplanes(4, 64, 42)
    b = X.rademacher_hyperplanes(4, 64, 42)
    assert a == b
    assert len(a) == 4 and all(len(p) == 64 for p in a)
    assert all(v in (-1, 1) for p in a for v in p)
    # a different seed yields a different family (sanity that the
    # seed actually parameterizes the draw)
    assert X.rademacher_hyperplanes(4, 64, 43) != a


def test_gap_fill_scaffold_properties(spark, sf_dir):
    """Gap-fill invariants the oracle-parity check cannot state
    directly: per user the scaffold is exactly the closed hourly range
    of that user's span (no holes, no spill), and filled_value is
    non-null from the first observed hour onward."""
    from env_data_pipeline_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["events_gap_fill_hourly"](spark, sf_dir)
    agg = (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n_hours"),
            (
                (
                    F.unix_timestamp(F.max("hour"))
                    - F.unix_timestamp(F.min("hour"))
                )
                / 3600
                + 1
            ).alias("span_hours"),
            F.sum(F.when(F.col("filled_value").isNull(), 1).otherwise(0)).alias(
                "n_null_fill"
            ),
            F.min(F.when(F.col("is_observed"), F.col("hour"))).alias("first_obs"),
            F.sum(
                F.when(
                    F.col("filled_value").isNull() & F.col("is_observed"), 1
                ).otherwise(0)
            ).alias("null_at_observed"),
        )
        .collect()
    )
    assert agg, "no users matched the gap-fill filter"
    for r in agg:
        # contiguous scaffold: row count == inclusive hour span
        assert r["n_hours"] == int(r["span_hours"]), r
        # the first scaffold hour is observed by construction (span
        # starts at the user's min ts), so no null fills at all
        assert r["n_null_fill"] == 0, r
        assert r["null_at_observed"] == 0, r


def test_bloom_membership_no_false_negatives_and_prunes(spark, sf_dir):
    """The Bloom prefilter contract behind corpus_membership_dedup:
    (a) NO false negatives — every true member of the base set passes
    the probe (this is what makes two-phase dedup exact); (b) the
    probable set is close to the true member set (FPP at m=16384,
    k=5, n~450 is ~3e-5, so a handful of false positives is already a
    regression); (c) a disjoint probe set is pruned almost entirely —
    the property that shrinks the confirmation join at scale."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.extensions import dedup as D

    import math

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0).select(
        F.md5("text").alias("text_md5")
    )
    # size the filter to the tier like a deployment would — a FIXED
    # m saturates on a bigger fixture (review finding: the sf0.1 test
    # tier carries 10x the docs) — then bound false positives by the
    # THEORETICAL fpp for (m, k, n) with 4x headroom
    n = base.count()
    m_bits = 1 << max(14, (16 * n).bit_length())
    k = 5
    bloom = D.bloom_build(base, "text_md5", m_bits=m_bits, k=k)
    # (a) probing the base itself must keep every row
    self_probe = D.bloom_probe(base, "text_md5", bloom, m_bits=m_bits, k=k)
    assert self_probe.count() == n
    # (c) probing values guaranteed absent (different hash domain)
    absent = docs.select(F.md5(F.concat(F.lit("absent:"), "text")).alias("text_md5"))
    n_absent = absent.count()
    fp = D.bloom_probe(absent, "text_md5", bloom, m_bits=m_bits, k=k).count()
    fpp = (1.0 - math.exp(-k * n / m_bits)) ** k
    budget = max(2, math.ceil(4 * fpp * n_absent))
    assert fp <= budget, (fp, n_absent, fpp, budget)


def test_bloom_bitmap_merge_equals_union_build(spark, sf_dir):
    """The sketch's incremental-maintenance claim: building Bloom
    bitmaps over two corpus slices and merging them word-by-word with
    bit_or must equal the bitmap built over the union — the algebra
    that lets a 100 TB corpus maintain its membership sketch per
    ingestion batch instead of rebuilding."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.extensions import dedup as D

    docs = table(spark, sf_dir, "documents").select(F.md5("text").alias("h"))
    a = docs.filter(F.crc32(F.col("h")) % 2 == 0)
    b = docs.filter(F.crc32(F.col("h")) % 2 == 1)

    def words(bloom_df):
        row = bloom_df.first()["bloom"]
        return dict(row)

    wa, wb = words(D.bloom_build(a, "h")), words(D.bloom_build(b, "h"))
    merged = {
        w: wa.get(w, 0) | wb.get(w, 0) for w in set(wa) | set(wb)
    }
    direct = words(D.bloom_build(docs, "h"))
    assert merged == direct


def test_substring_spans_find_embedded_passage(spark):
    """A 15-word passage copied into two otherwise-unrelated documents
    must surface as ONE maximal span with the right start positions
    and width — and unrelated text must produce nothing."""
    from env_data_pipeline_spark.plans import registry

    registry.load_all()
    passage = " ".join(f"p{i}" for i in range(15))  # 15 shared words
    doc_a = "alpha beta gamma " + passage + " tail words here"
    doc_b = "one two three four five " + passage + " closing"
    doc_c = "totally different content with no overlap at all whatsoever"
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    import env_data_pipeline_spark.plans.extensions as X

    # drive the same pipeline the registered query uses, on local docs
    orig = X._aug_docs
    try:
        X._aug_docs = lambda _spark, _sf: docs
        out = {
            (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_words"])
            for r in X.dedup_substring_spans(spark, "unused").collect()
        }
    finally:
        X._aug_docs = orig
    # passage starts at word 4 in doc_a (1-based), word 6 in doc_b
    assert out == {(1, 2, 4, 6, 15)}, out


def test_substring_spans_fuzz_against_python_reference(spark):
    """Seeded randomized corpus with planted shared passages: the
    gram-diagonal + island pipeline must emit exactly the maximal
    >=12-word shared spans a brute-force Python reference finds.
    One Spark round-trip for all trials (documents carry a trial id in
    the doc_id stride)."""
    import random

    rng = random.Random(99)
    STRIDE = 1000
    VOCAB = [f"w{i}" for i in range(200)]
    docs = []
    for trial in range(12):
        base = trial * STRIDE
        passage = [rng.choice(VOCAB) for _ in range(rng.randint(8, 20))]
        a_words = (
            [rng.choice(VOCAB) for _ in range(rng.randint(0, 6))]
            + passage
            + [rng.choice(VOCAB) for _ in range(rng.randint(0, 6))]
        )
        b_words = (
            [rng.choice(VOCAB) for _ in range(rng.randint(0, 6))]
            + passage
            + [rng.choice(VOCAB) for _ in range(rng.randint(0, 6))]
        )
        c_words = [rng.choice(VOCAB) for _ in range(rng.randint(8, 30))]
        docs += [
            (base + 1, " ".join(a_words)),
            (base + 2, " ".join(b_words)),
            (base + 3, " ".join(c_words)),
        ]

    # random words CAN form shared >=8-gram runs across trials only
    # with vanishing probability (vocab 200, run length 8); to keep
    # the reference exact, compare the FULL engine output (including
    # any cross-trial span) against a full-corpus reference
    def ref_all(pairs_docs):
        out = set()
        by_id = dict(pairs_docs)
        ids = sorted(by_id)
        for i, da in enumerate(ids):
            for db in ids[i + 1 :]:
                wa, wb = by_id[da].split(" "), by_id[db].split(" ")
                for d in range(-len(wb) + 1, len(wa)):
                    run = 0
                    for j in range(len(wb) + 1):
                        iu = j + d
                        ok = (
                            j < len(wb) and 0 <= iu < len(wa) and wa[iu] == wb[j]
                        )
                        if ok:
                            run += 1
                        else:
                            if run >= 12:
                                # 1-based starts of the run
                                out.add(
                                    (da, db, j + d - run + 1, j - run + 1, run)
                                )
                            run = 0
        return out

    expected = ref_all(docs)
    assert expected, "fuzz fixture must plant at least one >=12-word span"

    import env_data_pipeline_spark.plans.extensions as X

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    orig = X._aug_docs
    try:
        X._aug_docs = lambda _s, _d: sdf
        got = {
            (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_words"])
            for r in X.dedup_substring_spans(spark, "unused").collect()
        }
    finally:
        X._aug_docs = orig
    assert got == expected, (
        f"missing: {sorted(expected - got)[:5]} extra: {sorted(got - expected)[:5]}"
    )


def test_phash_planted_brightness_pairs_full_recall(spark, sf_dir):
    """Every planted brightness-shifted copy (gain +1, id % 35 == 11)
    must be RECALLED by the DCT-pHash pipeline: exact brightness
    invariance means hamming 0, so all 4 bands collide and banding
    cannot miss the pair — recall is exactly 1, not probabilistic."""
    from env_data_pipeline_spark.plans import registry
    from env_data_pipeline_spark.plans.extensions import (
        PHASH_COPY_OFFSET,
        _PHASH_MOD,
        _PHASH_REM,
    )
    from env_data_pipeline_spark.catalog import table

    registry.load_all()
    planted = {
        r[0]
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _PHASH_MOD == _PHASH_REM)
        .select("doc_id")
        .collect()
    }
    assert planted, "fixture has no planted ids at this SF"
    out = {
        (r["asset_a"], r["asset_b"]): r
        for r in registry.QUERIES["multimodal_phash_near_dups"](
            spark, sf_dir
        ).collect()
    }
    for d in planted:
        pair = (d, d + PHASH_COPY_OFFSET)
        assert pair in out, f"planted brightness pair {pair} missed"
        row = out[pair]
        assert row["shared_bands"] == 4
        assert row["hamming_nibbles"] == 0
        assert row["is_near_dup"] is True
