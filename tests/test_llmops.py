"""Unit tests for the training-data pipeline operators
(extensions/llmops.py) on constructed inputs with hand-computed
expectations — the corpus-level queries are oracle-checked separately
(test_oracle_parity via the registry), so these pin the operator
semantics where the synthetic corpus has no coverage (real PII
strings, exact repetition ratios, packing invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import llmops as L


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_real_strings(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+spam@ex-ample.co.uk now"),
            (2, "call 555-867-5309 or 555-000-1111 today"),
            (3, "host 192.168.0.1 and 10.0.255.3"),
            (4, "clean text with no identifiers at all"),
            (5, "mixed bob@x.io 555-123-4567 127.0.0.1"),
        ],
        "doc_id bigint, t string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            L.redact_pii(F.col("t")).alias("red"),
            *[c.alias(n) for n, c in L.pii_counts(F.col("t")).items()],
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> now"
    assert out[1]["email"] == 1
    assert out[2]["red"] == "call <PHONE> or <PHONE> today"
    assert out[2]["phone"] == 2
    assert out[3]["red"] == "host <IP> and <IP>"
    assert out[3]["ipv4"] == 2
    assert out[4]["red"] == "clean text with no identifiers at all"
    assert (out[4]["email"], out[4]["phone"], out[4]["ipv4"]) == (0, 0, 0)
    assert out[5]["red"] == "mixed <EMAIL> <PHONE> <IP>"


def test_pii_email_scrubbed_before_numeric_patterns(spark):
    # an email whose local part contains a phone-shaped token must be
    # consumed by the email pass, not double-redacted
    df = spark.createDataFrame([(1, "x 555-123-4567@corp.com y")], "doc_id bigint, t string")
    red = df.select(L.redact_pii(F.col("t")).alias("r")).first()["r"]
    assert red == "x <EMAIL> y"


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_exact_ratios(spark):
    prof = {
        r["doc_id"]: r
        for r in L.repetition_profile(
            _docs(
                spark,
                [
                    (1, "a a a a"),  # 1 distinct / 4 words; bigrams: aa x3
                    (2, "a b c d e f g h i j"),  # all distinct, long enough
                    # that top_word_frac 0.1 clears the 0.15 gate
                    (3, "a b a b a"),  # 2 distinct / 5; bigrams ab,ba,ab,ba
                ],
            )
        ).collect()
    }
    r1 = prof[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == pytest.approx(0.75)
    assert r1["top_word_frac"] == pytest.approx(1.0)
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-4)
    assert r1["repetition_bucket"] == "HIGH_REPETITION"
    r2 = prof[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_word_frac"] == pytest.approx(0.1)
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["repetition_bucket"] == "OK"
    r3 = prof[3]
    assert r3["top_word_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert r3["dup_bigram_frac"] == pytest.approx(0.5)


def test_repetition_single_word_doc(spark):
    r = L.repetition_profile(_docs(spark, [(1, "solo")])).first()
    assert r["n_words"] == 1
    assert r["dup_word_frac"] == 0.0
    assert r["top_word_frac"] == 1.0  # the one word is 100% of the doc
    assert r["dup_bigram_frac"] == 0.0


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_flags_copied_ngram_only(spark):
    eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            (1, "x y alpha beta gamma delta z"),  # shares 4-grams
            (2, "totally different words here now"),  # disjoint
            (3, "beta gamma delta epsilon trailing"),  # shares one 4-gram
        ],
    )
    hits = {
        r["doc_id"]: r["n_eval_ngram_hits"]
        for r in L.contamination_report(train, eval_docs, n=4).collect()
    }
    # doc 1 contains 'alpha beta gamma delta' (1 hit of eval's 2 grams)
    assert hits == {1: 1, 3: 1}


def test_contamination_short_docs_produce_no_shingles(spark):
    short = _docs(spark, [(1, "one two three")])  # < 4 words
    assert L.shingle_hashes(short, n=4).count() == 0


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_invariants(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    budget, shards = 256, 16
    packed = L.pack_sequences(docs, budget=budget, n_shards=shards).collect()
    # every doc lands exactly once
    assert sum(r["n_docs"] for r in packed) == docs.count()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["seq_id"])
        # seq ids contiguous from 0 (no empty sequences skipped...
        # gaps can only appear if a single doc overflows multiple
        # budgets, which the corpus (max ~100 tokens) cannot do)
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        # each sequence starts before the budget line: tokens BEFORE
        # the last doc of the sequence stay under budget (overflow is
        # only ever the final straddling doc)
        for r in rows:
            assert r["seq_tokens"] >= 1
            assert r["fill_ratio"] == pytest.approx(r["seq_tokens"] / budget, abs=1e-4)


def test_pack_sequences_exact_tiny_case(spark):
    # shard 0 only: tokens 3,2,4 with budget 5 ->
    # prefix-excl 0,3,5 -> seq 0,0,1
    docs = _docs(spark, [(0, "a b c"), (16, "d e"), (32, "f g h i")])
    rows = {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
        for r in L.pack_sequences(docs, budget=5, n_shards=16).collect()
    }
    assert rows == {(0, 0): (2, 5), (0, 1): (1, 4)}


# ---------------------------------------------------------------------------
# heavy hitters / temperature weights
# ---------------------------------------------------------------------------


def test_heavy_hitters_ranking_and_share(spark):
    docs = _docs(spark, [(1, "a a a b b c"), (2, "b a d")])
    rows = L.heavy_hitters(docs, k=2).collect()
    assert [(r["token"], r["n_occurrences"], r["rank"]) for r in rows] == [
        ("a", 4, 1),
        ("b", 3, 2),
    ]
    assert rows[0]["corpus_share"] == pytest.approx(4 / 9, abs=1e-6)


def test_temperature_alpha_one_is_identity(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    for r in L.temperature_weights(docs, alpha=1.0).collect():
        assert r["p_temp"] == pytest.approx(r["p_raw"], abs=1e-6)
        assert r["sample_factor"] == pytest.approx(1.0, abs=1e-4)


def test_temperature_flattens_toward_uniform(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    rows = L.temperature_weights(docs, alpha=0.7).collect()
    for r in rows:
        if r["p_raw"] > 1 / len(rows):
            assert r["p_temp"] < r["p_raw"]  # majority lang downweighted
        else:
            assert r["p_temp"] > r["p_raw"]  # minority langs upweighted


# ---------------------------------------------------------------------------
# curation verdict priority
# ---------------------------------------------------------------------------


def test_curation_verdict_gate_priority(spark):
    """A doc failing several gates must report the HIGHEST-priority
    reason: contaminated > low_quality > high_repetition >
    lang_mismatch; a clean doc keeps."""
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # eval doc (source=src0): excluded from output
        (0, "en", "src0", eval_text),
        # contaminated AND short AND repetitive -> 'contaminated' wins
        (1, "en", "s1", "alpha beta gamma delta x x"),
        # short (quality TOO_SHORT) and repetitive -> 'low_quality'
        (2, "en", "s1", "x x x x"),
        # long, quality OK (has stopwords), top-word heavy -> 'high_repetition'
        (3, "en", "s1", "the a of and to in x x x x y z w v u t s r"),
        # clean English text labeled de -> 'lang_mismatch'
        (4, "de", "s1", "the a of and to in one two three four five six"),
        # clean English text labeled en -> KEEP
        (5, "en", "s1", "the a of and to in one two three four five six"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string"
    )
    from env_data_pipeline_spark.extensions.llmops import curation_verdict

    out = {
        r["doc_id"]: (r["verdict"], r["drop_reason"])
        for r in curation_verdict(docs, eval_source="src0", ngram=4).collect()
    }
    assert 0 not in out, "eval slice must be excluded from the verdict frame"
    assert out[1] == ("DROP", "contaminated")
    assert out[2] == ("DROP", "low_quality")
    assert out[3] == ("DROP", "high_repetition")
    assert out[4] == ("DROP", "lang_mismatch")
    assert out[5] == ("KEEP", None)


# ---------------------------------------------------------------------------
# chunk windows / unigram logprob
# ---------------------------------------------------------------------------


def test_chunk_windows_exact_layout(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(10)))])
    rows = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in L.chunk_windows(docs, width=4, stride=2).collect()
    )
    assert rows == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w2 w3 w4 w5", 4),
        (2, "w4 w5 w6 w7", 4),
        (3, "w6 w7 w8 w9", 4),
    ]
    # doc shorter than the width -> one partial window
    short = L.chunk_windows(_docs(spark, [(2, "a b c")]), width=4, stride=2).collect()
    assert [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in short] == [
        (0, "a b c", 3)
    ]


def test_chunk_windows_cover_every_token(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    chunks = L.chunk_windows(docs, width=32, stride=16)
    # stride coverage invariant: per doc, sum over chunks of
    # (n_tokens - overlap) telescopes back to the doc length; check
    # via the last chunk reaching the end: max(chunk_id*stride +
    # n_tokens) == doc n_words
    agg = {
        r["doc_id"]: r["reach"]
        for r in chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_id") * 16 + F.col("n_tokens")).alias("reach")
        )
        .collect()
    }
    lens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
        ).collect()
    }
    assert agg == lens


def test_chunk_windows_rejects_bad_stride(spark):
    with pytest.raises(ValueError, match="stride"):
        L.chunk_windows(_docs(spark, [(1, "a b")]), width=4, stride=8)


def test_unigram_logprob_rare_words_score_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "common common common common"),
            (2, "common common rare unique"),
        ],
    )
    scores = {
        r["doc_id"]: r["mean_neg_logp"]
        for r in L.unigram_logprob_scores(docs).collect()
    }
    # doc 2 carries two singleton words -> higher mean information
    assert scores[2] > scores[1]
    # doc 1 is all the corpus-dominant word: -ln(6/8) each
    import math

    assert scores[1] == pytest.approx(-math.log(6 / 8), abs=1e-6)


# ---------------------------------------------------------------------------
# resample execution
# ---------------------------------------------------------------------------


def test_resample_counts_bracket_target(spark, sf_dir):
    """The scheme's invariant, asserted independently of the mirrored
    oracle: every group's n_docs_out sits in [n_in*floor(f),
    n_in*ceil(f)], and the achieved factor lands near the target
    (binomial draw over n_in docs — tolerance 4 sigma)."""
    import math

    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    for r in L.resample_execute(docs, key="lang", alpha=0.7).collect():
        f, n_in = r["target_factor"], r["n_docs_in"]
        lo, hi = math.floor(f), math.ceil(f)
        assert n_in * lo <= r["n_docs_out"] <= n_in * hi
        frac = f - lo
        sigma = math.sqrt(max(frac * (1 - frac), 1e-9) / n_in)
        assert abs(r["achieved_factor"] - f) <= 4 * sigma + 1e-4, (
            f"{r['lang']}: achieved {r['achieved_factor']} vs target {f} "
            f"(n={n_in}, 4sigma={4*sigma:.4f})"
        )


def test_resample_keeps_null_key_group(spark):
    docs = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(40)],
        "doc_id bigint, lang string",
    )
    rows = {r["lang"]: r for r in L.resample_execute(docs, key="lang").collect()}
    assert set(rows) == {"en", None}, "NULL-key docs must keep their group"
    assert rows[None]["n_docs_in"] == 20
    assert sum(r["n_docs_in"] for r in rows.values()) == 40


def test_resample_deterministic(spark, sf_dir):
    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, L.resample_execute(docs).collect()))
    b = sorted(map(tuple, L.resample_execute(docs).collect()))
    # counts are integers and factors are rounded from identical
    # inputs — same session, same corpus, exact equality holds
    assert a == b
