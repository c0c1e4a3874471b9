"""DSIR importance resampling (extensions/llmops.py): the planted
distribution-shift guarantee the registry oracle cannot check — on a
corpus where the raw mixture deliberately diverges from the target,
the selected quarter's mixture must move TOWARD the target — plus an
exact pure-Python replay of the integer score/selection recursion on
a tiny corpus (hashing, grid floor, Gumbel key, stratified rank)."""

from __future__ import annotations

import hashlib
import math

from env_data_pipeline_spark.extensions import llmops as L

_B = 32
_STRATA = 4
_GRID = 1_000_000


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _planted_corpus():
    """Target (src0) is pure vocab-A 'en'; raw is half vocab-A 'en',
    half vocab-B 'zh' — so raw_share(en)=0.5 while target_share(en)=1,
    and a working importance sampler pulls the selected quarter's en
    share decisively above 0.5. Texts vary per doc so scores are not
    degenerate ties."""
    a_words = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    b_words = ["uno", "dos", "tres", "cuatro", "cinco", "seis"]
    rows = []
    doc_id = 0
    for i in range(12):  # target: vocab A only
        text = " ".join(a_words[(i + j) % 6] for j in range(8))
        rows.append((doc_id, text, "en", "src0"))
        doc_id += 1
    for i in range(40):  # raw vocab-A docs
        text = " ".join(a_words[(2 * i + j) % 6] for j in range(6 + i % 4))
        rows.append((doc_id, text, "en", "src1"))
        doc_id += 1
    for i in range(40):  # raw vocab-B docs
        text = " ".join(b_words[(3 * i + j) % 6] for j in range(6 + i % 4))
        rows.append((doc_id, text, "zh", "src2"))
        doc_id += 1
    return rows


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_resampled_mixture_moves_toward_target(spark):
    out = {
        r["lang"]: r
        for r in L.importance_resample(
            _docs(spark, _planted_corpus()),
            target_source="src0",
            buckets=_B,
            strata=_STRATA,
        ).collect()
    }
    en, zh = out["en"], out["zh"]
    assert en["target_share"] == 1.0 and zh["target_share"] == 0.0
    assert abs(en["raw_share"] - 0.5) < 1e-9
    # the selected mixture must sit strictly closer to the target
    # than the raw mixture does, and decisively so
    assert en["sel_share"] > 0.75, en["sel_share"]
    l1_raw = abs(en["raw_share"] - 1.0) + abs(zh["raw_share"] - 0.0)
    l1_sel = abs(en["sel_share"] - 1.0) + abs(zh["sel_share"] - 0.0)
    assert l1_sel < l1_raw
    # vocab-A raw docs carry positive mean log-importance, vocab-B
    # negative (their grams never appear in the target)
    assert en["mean_logw"] > 0 > zh["mean_logw"]
    # selection kept ~a quarter overall (per-stratum floor rounding)
    n_sel = en["n_selected"] + zh["n_selected"]
    n_raw = en["n_raw"] + zh["n_raw"]
    assert n_raw == 80 and 0.15 <= n_sel / n_raw <= 0.25


def _py_replay(rows, buckets, strata, keep_num=1, keep_den=4):
    """Pure-Python mirror of dsir_scored_docs' exact contract."""
    tgt_cnt = [0] * buckets
    raw_cnt = [0] * buckets
    doc_grams: dict[int, list[int]] = {}
    for doc_id, text, _lang, source in rows:
        ws = [w for w in text.split(" ") if w]
        grams = ["u|" + w for w in ws] + [
            f"b|{a} {b}" for a, b in zip(ws, ws[1:])
        ]
        bs = [_h48(g) % buckets for g in grams]
        if source == "src0":
            for b in bs:
                tgt_cnt[b] += 1
        else:
            for b in bs:
                raw_cnt[b] += 1
            if bs:
                doc_grams[doc_id] = bs
    tt, tr = sum(tgt_cnt), sum(raw_cnt)
    ilr = [
        math.floor(
            _GRID
            * math.log(
                ((tgt_cnt[b] + 1.0) * (tr + buckets))
                / ((raw_cnt[b] + 1.0) * (tt + buckets))
            )
        )
        for b in range(buckets)
    ]
    keyed = []
    for doc_id, bs in doc_grams.items():
        score = sum(ilr[b] for b in bs)
        u = (_h48(f"{doc_id}|dsir") % _GRID + 0.5) / _GRID
        key = score + math.floor(_GRID * -math.log(-math.log(u)))
        salt = _h48(f"{doc_id}|strat") % strata
        keyed.append((doc_id, score, key, salt))
    selected = set()
    for s in range(strata):
        grp = sorted(
            [k for k in keyed if k[3] == s], key=lambda k: (-k[2], k[0])
        )
        for rk, k in enumerate(grp, start=1):
            if rk * keep_den <= len(grp) * keep_num:
                selected.add(k[0])
    return {d: (sc, ky, d in selected) for d, sc, ky, _ in keyed}


def test_scored_docs_exact_python_replay(spark):
    rows = _planted_corpus()
    got = {
        r["doc_id"]: (r["score"], r["sel_key"], r["selected"])
        for r in L.dsir_scored_docs(
            _docs(spark, rows),
            target_source="src0",
            buckets=_B,
            strata=_STRATA,
        ).collect()
    }
    want = _py_replay(rows, _B, _STRATA)
    assert got == want


def test_kl_shift_planted_reduction(spark):
    """On the planted shifted corpus the selected quarter's hashed
    n-gram distribution must sit far closer to the target: KL
    reduction should recover most of the raw gap."""
    (row,) = L.importance_kl_shift(
        _docs(spark, _planted_corpus()),
        target_source="src0",
        buckets=_B,
        strata=_STRATA,
    ).collect()
    assert row["n_buckets"] == _B
    assert row["kl_target_raw"] > 0
    assert row["kl_target_selected"] < row["kl_target_raw"]
    assert row["kl_reduction"] >= 0.5 * row["kl_target_raw"]


def test_resample_null_lang_merges_one_row(spark):
    """NULL-lang docs on the raw and target side must merge into ONE
    summary row (the engine's null-safe join mirrors the oracle's
    IS NOT DISTINCT FROM)."""
    rows = _planted_corpus() + [
        (900, "alpha beta gamma delta omega sigma alpha beta", None, "src0"),
        (901, "uno dos tres cuatro cinco seis uno dos", None, "src1"),
    ]
    out = L.importance_resample(
        _docs(spark, rows), target_source="src0", buckets=_B, strata=_STRATA
    ).collect()
    null_rows = [r for r in out if r["lang"] is None]
    assert len(null_rows) == 1
    (nr,) = null_rows
    assert nr["n_raw"] == 1 and nr["n_target"] == 1
