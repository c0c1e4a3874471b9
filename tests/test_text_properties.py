"""Property tests for the X4 fingerprint pair: the rolling hash must
be order-SENSITIVE and the bag fingerprint order-INSENSITIVE — the
invariant that makes them complements — and both must be
whitespace-tokenization-stable. Hypothesis drives word lists through
one Spark round trip per case batch (batched via a single DataFrame
so the property run stays fast)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import text as TX

WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


def _fingerprints(spark, texts: list[str]) -> list[tuple]:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    vals = df.select("text", TX.word_hash_vals(F.col("text")).alias("vals"))
    out = vals.select(
        "text",
        TX.rolling_fingerprint(F.col("vals")).alias("roll"),
        TX.bag_fingerprint(F.col("text")).alias("bag"),
    )
    return [(r["roll"], r["bag"]) for r in out.collect()]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(WORD, min_size=2, max_size=12, unique=True))
def test_reversal_changes_rolling_but_not_bag(spark, words):
    fwd = " ".join(words)
    rev = " ".join(reversed(words))
    (roll_f, bag_f), (roll_r, bag_r) = _fingerprints(spark, [fwd, rev])
    assert bag_f == bag_r, "bag fingerprint must ignore order"
    if words != list(reversed(words)):
        assert roll_f != roll_r, "rolling fingerprint must see order"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(WORD, min_size=1, max_size=12))
def test_fingerprints_deterministic(spark, words):
    text = " ".join(words)
    (a_roll, a_bag), (b_roll, b_bag) = _fingerprints(spark, [text, text])
    assert a_roll == b_roll and a_bag == b_bag


def test_phrase_search_counts_adjacent_occurrences(spark, tmp_path):
    """'spark window spark window' back-to-back is TWO occurrences —
    the case a replace-length oracle would undercount (boundary space
    shared between adjacent matches)."""
    from env_data_pipeline_spark.plans.textstats import text_phrase_search

    docs = [
        (0, "spark window spark window", "en", "s0", 25),
        (1, "a spark window b", "en", "s0", 16),
        (2, "window spark", "en", "s0", 12),          # wrong order: no hit
        (3, "sparkly window", "en", "s0", 14),        # substring decoy: no hit
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in text_phrase_search(spark, str(tmp_path)).collect()
    }
    assert got == {0: 2, 1: 1}


def test_sparse_cosine_pairs_matches_python_reference(spark, sf_dir):
    """Full pure-Python replay of the prefix-filtered sparse cosine
    join (tokenize -> tf-idf units -> df cap -> 8-term prefix ->
    inverted index -> exact integer dot / IEEE sqrt norms) on the
    real sf0.001 corpus."""
    import math
    from collections import Counter, defaultdict

    from env_data_pipeline_spark.plans.textstats import (
        _SSJ_MAX_DF,
        _SSJ_PREFIX,
        _SSJ_TAU_U,
        _SSJ_TOPK,
        text_sparse_cosine_pairs,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n_docs = len(docs)
    tf = {
        d: Counter(t for t in txt.split(" ") if t) for d, txt in docs.items()
    }
    df = Counter(t for c in tf.values() for t in c)
    pfx = {}
    for d, c in tf.items():
        scored = [
            ((cnt * (n_docs + 1) * 1000) // (df[t] + 1), t)
            for t, cnt in c.items()
            if df[t] <= _SSJ_MAX_DF
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        pfx[d] = {t: u for u, t in scored[:_SSJ_PREFIX]}
    nrm = {
        d: math.sqrt(float(sum(u * u for u in v.values())))
        for d, v in pfx.items()
        if v
    }
    post = defaultdict(list)
    for d, v in pfx.items():
        for t, u in v.items():
            post[t].append((d, u))
    dots = defaultdict(lambda: [0, 0])
    for t, plist in post.items():
        for i, (da, ua) in enumerate(plist):
            for db, ub in plist[i + 1 :]:
                a, b = (da, db) if da < db else (db, da)
                ua2, ub2 = (ua, ub) if da < db else (ub, ua)
                dots[(a, b)][0] += ua2 * ub2
                dots[(a, b)][1] += 1
    cand = []
    for (a, b), (dot, ns) in dots.items():
        cos_u = math.floor(dot / (nrm[a] * nrm[b]) * 1_000_000)
        if cos_u >= _SSJ_TAU_U:
            cand.append((-cos_u, a, b, ns))
    cand.sort()
    expect = [
        (a, b, ns, round(-cu / 1_000_000.0, 4)) for cu, a, b, ns in cand
    ][:_SSJ_TOPK]

    got = [
        (r.doc_a, r.doc_b, r.n_shared, r.cosine_sim)
        for r in text_sparse_cosine_pairs(spark, sf_dir).collect()
    ]
    assert got == expect
    assert got, "corpus must produce similar pairs"


def test_ngram_novelty_planted_overlap(spark, tmp_path):
    """Two sources sharing exactly one trigram plus one fully-novel
    source: novelty permilles replay the planted set arithmetic."""
    from pyspark.sql import functions as F  # noqa: F401

    from env_data_pipeline_spark.plans.textstats import text_ngram_novelty

    rows = [
        # srcA: trigrams {a b c, b c d} — shares 'a b c' with srcB
        (1, "a b c d", "en", "srcA", 7),
        # srcB: trigrams {a b c, x y z}
        (2, "a b c", "en", "srcB", 5),
        (3, "x y z", "en", "srcB", 5),
        # srcC: {p q r} — fully novel
        (4, "p q r", "en", "srcC", 5),
        # too short for any trigram: contributes nothing
        (5, "q r", "en", "srcC", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.source: r for r in text_ngram_novelty(spark, str(tmp_path)).collect()}
    assert got["srcA"].n_grams == 2 and got["srcA"].n_shared == 1
    assert got["srcA"].novelty_permille == 500
    assert got["srcB"].n_grams == 2 and got["srcB"].n_shared == 1
    assert got["srcC"].n_grams == 1 and got["srcC"].n_shared == 0
    assert got["srcC"].novelty_permille == 1000
