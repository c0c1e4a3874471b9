"""Corpus-filter tiers (extensions/llmops.py): the planted guarantees
the registry oracles cannot check — CCNet perplexity tertiles must
rank target-like text into the head and off-distribution text into
the tail, and each Gopher rule must fire on exactly its own planted
violations — plus an exact pure-Python replay of the integer
perplexity recursion (hash, grid floor, BIGINT div, stratified rank).
"""

from __future__ import annotations

import hashlib
import math

from env_data_pipeline_spark.extensions import llmops as L

_B = 64
_STRATA = 2
_GRID = 1_000_000


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def _planted_corpus():
    """Target = vocab A; raw = 18 vocab-A docs (in-distribution, low
    perplexity) + 18 vocab-B docs (every token OOV for the target LM,
    high perplexity), one language so the tertile cut must separate
    them on score alone. Texts vary so scores are not ties."""
    a_words = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    b_words = ["uno", "dos", "tres", "cuatro", "cinco", "seis"]
    rows = []
    doc_id = 0
    for i in range(12):
        text = " ".join(a_words[(i + j) % 6] for j in range(8))
        rows.append((doc_id, text, "en", "src0"))
        doc_id += 1
    for i in range(18):
        text = " ".join(a_words[(2 * i + j) % 6] for j in range(6 + i % 4))
        rows.append((doc_id, text, "en", "srcA"))
        doc_id += 1
    for i in range(18):
        text = " ".join(b_words[(3 * i + j) % 6] for j in range(6 + i % 4))
        rows.append((doc_id, text, "en", "srcB"))
        doc_id += 1
    return rows


def test_perplexity_ranks_target_like_text_into_head(spark):
    scored = L.ppl_scored_docs(
        _docs(spark, _planted_corpus()),
        target_source="src0",
        buckets=_B,
        strata=_STRATA,
    ).collect()
    by_bucket: dict[str, list[int]] = {}
    for r in scored:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    # vocab-A raw docs are 12..29, vocab-B raw docs are 30..47; every
    # vocab-B doc must score strictly above every vocab-A doc, so the
    # head third is pure vocab-A and the tail third pure vocab-B
    a_scores = [r["ippl"] for r in scored if r["doc_id"] < 30]
    b_scores = [r["ippl"] for r in scored if r["doc_id"] >= 30]
    assert max(a_scores) < min(b_scores)
    assert all(d < 30 for d in by_bucket["head"]), by_bucket["head"]
    assert all(d >= 30 for d in by_bucket["tail"]), by_bucket["tail"]


def test_perplexity_buckets_aggregate_shares(spark):
    out = L.perplexity_buckets(
        _docs(spark, _planted_corpus()),
        target_source="src0",
        buckets=_B,
        strata=_STRATA,
    ).collect()
    assert {r["bucket"] for r in out} == {"head", "middle", "tail"}
    rows = {r["bucket"]: r for r in out}
    assert rows["head"]["mean_ippl"] < rows["tail"]["mean_ippl"]
    assert sum(r["n_docs"] for r in out) == 36
    for r in out:
        assert r["min_ippl"] <= r["mean_ippl"] <= r["max_ippl"]
        # tertile cut: every bucket holds a third-ish of its language
        assert 250 <= r["lang_share_permille"] <= 420


def _py_replay(rows, target_source, buckets, strata):
    """Exact integer replay of ppl_scored_docs: md5-prefix hash,
    add-1-smoothed grid-floored neg-log-prob, BIGINT div mean,
    stratified tertile rank."""
    ct: dict[int, int] = {}
    n_t = 0
    for _, text, _, source in rows:
        if source != target_source:
            continue
        for w in text.split(" "):
            if w:
                ct[_h48(w) % buckets] = ct.get(_h48(w) % buckets, 0) + 1
                n_t += 1
    inlp = {
        b: math.floor(
            -_GRID * math.log((ct.get(b, 0) + 1) / float(n_t + buckets))
        )
        for b in range(buckets)
    }
    scored = []
    for doc_id, text, lang, source in rows:
        if source == target_source:
            continue
        toks = [w for w in text.split(" ") if w]
        if not toks:
            continue
        s = sum(inlp[_h48(w) % buckets] for w in toks)
        scored.append(
            (
                doc_id,
                lang,
                s // len(toks),
                _h48(f"{doc_id}|ppl") % strata,
            )
        )
    out = {}
    strata_groups: dict[tuple, list] = {}
    for doc_id, lang, ippl, salt in scored:
        strata_groups.setdefault((lang, salt), []).append((ippl, doc_id))
    for key, grp in strata_groups.items():
        grp.sort()
        n = len(grp)
        for rn, (ippl, doc_id) in enumerate(grp, start=1):
            bucket = (
                "head"
                if 3 * rn <= n
                else ("middle" if 3 * rn <= 2 * n else "tail")
            )
            out[doc_id] = (ippl, bucket)
    return out


def test_perplexity_matches_pure_python_replay(spark):
    rows = _planted_corpus()
    expect = _py_replay(rows, "src0", _B, _STRATA)
    got = {
        r["doc_id"]: (r["ippl"], r["bucket"])
        for r in L.ppl_scored_docs(
            _docs(spark, rows), target_source="src0", buckets=_B, strata=_STRATA
        ).collect()
    }
    assert got == expect


def _gopher_corpus():
    """One planted violation per rule, one clean doc, per two sources.
    Base text passes all rules: 25 words, mean length in [3, 10],
    two stopwords, no word above 20%."""
    filler = [
        "table", "query", "scan", "merge", "batch", "value", "window",
        "column", "group", "order", "joins", "parts", "hash", "sort",
        "spark", "frame", "stage", "plans", "codes", "files", "rows",
        "tasks", "nodes",
    ]
    clean = "the of " + " ".join(filler)  # 25 words, 2 stopwords
    short = "the of table query scan"  # < 20 words
    longw = "the of " + " ".join(["exceptionallylong"] * 23)  # mean len > 10
    nostop = " ".join(filler + ["extra", "other"])  # 0 stopwords
    repet = "the of " + " ".join(["dupe"] * 23)  # 'dupe' = 23/25 > 20%
    rows = []
    doc_id = 0
    for source in ("sA", "sB"):
        for text in (clean, short, longw, nostop, repet):
            rows.append((doc_id, text, "en", source))
            doc_id += 1
    return rows


def test_gopher_rules_fire_on_their_own_violations(spark):
    out = {
        r["source"]: r
        for r in L.gopher_rules(_docs(spark, _gopher_corpus())).collect()
    }
    for source in ("sA", "sB"):
        r = out[source]
        assert r["n_docs"] == 5
        assert r["fail_word_count"] == 1  # the short doc
        assert r["fail_word_length"] == 1  # the long-word doc
        # only the nostop doc lacks two stopword instances
        assert r["fail_stopwords"] == 1
        # repet fails repetition; longw repeats its long word 23x too
        assert r["fail_repetition"] == 2
        assert r["n_pass"] == 1  # only the clean doc survives all
        assert r["drop_permille"] == 800


def test_gopher_flags_per_doc(spark):
    flags = {
        r["doc_id"]: r
        for r in L.gopher_rule_flags(_docs(spark, _gopher_corpus()))
        .collect()
    }
    clean = flags[0]
    assert (
        clean["ok_word_count"]
        and clean["ok_word_length"]
        and clean["ok_stopwords"]
        and clean["ok_repetition"]
    )
    assert not flags[1]["ok_word_count"]
    assert not flags[2]["ok_word_length"]
    assert not flags[3]["ok_stopwords"]
    assert not flags[4]["ok_repetition"]


def test_selection_agreement_head_selected_more_than_tail(spark):
    """On the planted vocab-shift corpus, BOTH selectors track the
    vocab-A target, so the perplexity head must carry a decisively
    higher DSIR-selected share than the tail. Kernel-level with
    test-sized strata (the production-constant registered query is
    oracle-verified separately; 36 docs over 64 strata would select
    nothing — the quarter cut needs >=4 docs per stratum)."""
    docs = _docs(spark, _planted_corpus())
    sel = {
        r["doc_id"]: r["selected"]
        for r in L.dsir_scored_docs(
            docs, "src0", 32, 1, 4, strata=4
        ).collect()
    }
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in L.ppl_scored_docs(
            docs, target_source="src0", buckets=_B, strata=_STRATA
        ).collect()
    }
    assert set(sel) == set(buckets)
    rate = {}
    for bucket in ("head", "tail"):
        ids = [d for d, b in buckets.items() if b == bucket]
        rate[bucket] = sum(1 for d in ids if sel[d]) / len(ids)
    assert rate["head"] > rate["tail"], rate
    assert rate["head"] >= 0.4  # the vocab-A head is where selection lands


def test_streaming_tier_refresh_equals_batch_table(spark, sf_dir):
    """The frozen-boundary streaming classification must reproduce
    the batch tertile table exactly (same rows, same counters)."""
    from env_data_pipeline_spark.plans.corpusfilters import (
        corpus_perplexity_buckets,
        streaming_perplexity_tier_refresh,
    )

    stream = sorted(
        (
            tuple(r)
            for r in streaming_perplexity_tier_refresh(spark, sf_dir)
            .select(
                "lang", "bucket", "n_docs", "min_ippl", "max_ippl",
                "mean_ippl", "lang_share_permille",
            )
            .collect()
        ),
    )
    batch_cols = sorted(
        (
            tuple(r)
            for r in corpus_perplexity_buckets(spark, sf_dir)
            .select(
                "lang", "bucket", "n_docs", "min_ippl", "max_ippl",
                "mean_ippl", "lang_share_permille",
            )
            .collect()
        ),
    )
    assert stream == batch_cols


def test_streaming_tier_handles_null_lang(spark, tmp_path):
    """A NULL-lang corpus must land on ONE boundary row per stratum
    (the null-safe thr merge): streaming output still equals the
    batch tertile table exactly — the regression pin for the
    half-row double-classification bug."""
    from env_data_pipeline_spark.plans.corpusfilters import (
        corpus_perplexity_buckets,
        streaming_perplexity_tier_refresh,
    )

    rows = [
        (doc_id, text, None if doc_id % 3 == 0 else lang, source)
        for doc_id, text, lang, source in _planted_corpus()
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    cols = [
        "lang", "bucket", "n_docs", "min_ippl", "max_ippl", "mean_ippl",
        "lang_share_permille",
    ]
    key = lambda t: ((t[0] is None, t[0] or ""), t[1])  # noqa: E731
    batch = sorted(
        (
            tuple(r)
            for r in corpus_perplexity_buckets(spark, str(tmp_path))
            .select(*cols)
            .collect()
        ),
        key=key,
    )
    stream = sorted(
        (
            tuple(r)
            for r in streaming_perplexity_tier_refresh(spark, str(tmp_path))
            .select(*cols)
            .collect()
        ),
        key=key,
    )
    assert stream == batch
    assert any(r[0] is None for r in batch)  # NULL lang really present
