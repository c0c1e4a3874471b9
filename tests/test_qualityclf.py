"""Trained quality classifier: pure-Python gradient replay, AUC
floor on planted labels, artifact reuse, and serving-plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions.text import EN_STOPWORDS
from env_data_pipeline_spark.plans.qualityclf import (
    _QC_D,
    _QC_GRID,
    _QC_LR,
    _QC_ROUNDS,
    doc_features,
    doc_labels,
    score_docs,
    train_quality_weights,
)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark `div`,
    DuckDB `//`."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:12], 16) % _QC_D


def _py_train(docs: list[tuple[int, str]], rounds: int) -> list[int]:
    """Independent pure-Python replay of the exact integer recursion
    (labels, hashing, hard sigmoid, truncating divisions)."""
    stop = set(EN_STOPWORDS)
    feats, ys = {}, {}
    for doc_id, text in docs:
        w = text.split(" ")
        n = len(w)
        # ASCII class [a-zA-Z0-9 ], matching the engine's regexp and
        # the oracle — Python's Unicode-aware isalnum() would diverge
        # on non-ASCII corpora (ADVICE r11)
        n_punct = sum(
            1
            for ch in text
            if not (
                "a" <= ch <= "z"
                or "A" <= ch <= "Z"
                or "0" <= ch <= "9"
                or ch == " "
            )
        )
        n_stop = sum(1 for x in w if x in stop)
        bad = (
            n < 10
            or 5 * n_punct > max(len(text), 1)
            or 100 * n_stop < max(n, 1)
        )
        ys[doc_id] = 0 if bad else 1
        feats[doc_id] = sorted(
            {_bucket(x) for x in w if len(x) > 0} | {_QC_D}
        )
    n_docs = len(docs)
    wts = [0] * (_QC_D + 1)
    half = _QC_GRID // 2
    for _ in range(rounds):
        grad = [0] * (_QC_D + 1)
        for doc_id, _ in docs:
            z = sum(wts[j] for j in feats[doc_id])
            s = min(_QC_GRID, max(0, _tdiv(z, 4) + half))
            err = s - ys[doc_id] * _QC_GRID
            for j in feats[doc_id]:
                grad[j] += err
        for j in range(_QC_D + 1):
            wts[j] -= _tdiv(grad[j] * _QC_LR, n_docs)
    return wts


@pytest.fixture()
def mixed_docs(spark, tmp_path):
    """24 natural docs (stopword-rich prose) + 12 gibberish docs (no
    stopwords -> LOW_NATURALNESS label 0) + 4 short docs (label 0)."""
    rows = []
    i = 0
    for k in range(24):
        body = f"the quick fox of run{k} jumped to a log and the dog of barn{k} slept in peace today"
        rows.append((i, body))
        i += 1
    for k in range(12):
        body = " ".join(f"zxq{k}w{j}" for j in range(14))
        rows.append((i, body))
        i += 1
    for k in range(4):
        rows.append((i, f"tiny doc {k}"))
        i += 1
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return rows, str(tmp_path)


def test_train_matches_python_replay(spark, mixed_docs):
    rows, d = mixed_docs
    docs = spark.read.parquet(f"{d}/documents.parquet")
    got = {
        r.fid: r.wu for r in train_quality_weights(docs, _QC_ROUNDS).collect()
    }
    exp = _py_train(rows, _QC_ROUNDS)
    assert len(got) == _QC_D + 1
    assert got == {j: exp[j] for j in range(_QC_D + 1)}


def test_classifier_auc_floor_on_planted_labels(spark, mixed_docs):
    """AUC >= 0.9 separating planted natural vs gibberish/short docs
    — the classifier must LEARN the gate from hashed unigrams, not
    merely agree with it on easy points (VERDICT r10 item 4)."""
    rows, d = mixed_docs
    docs = spark.read.parquet(f"{d}/documents.parquet")
    w = train_quality_weights(docs, _QC_ROUNDS)
    sc = {
        r.doc_id: r.z_u
        for r in score_docs(doc_features(docs), w).collect()
    }
    lab = {r.doc_id: r.y for r in doc_labels(docs).collect()}
    pos = [sc[i] for i in sc if lab[i] == 1]
    neg = [sc[i] for i in sc if lab[i] == 0]
    assert len(pos) == 24 and len(neg) == 16
    wins = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.9, auc


def test_weights_artifact_is_persisted_and_reused(spark, sf_dir):
    import os

    from env_data_pipeline_spark.plans.artifacts import artifact_path
    from env_data_pipeline_spark.plans.qualityclf import (
        QC_ARTIFACT_PARAMS,
        quality_weights_artifact,
    )

    quality_weights_artifact(spark, sf_dir).collect()
    d = artifact_path(sf_dir, "documents", "quality_clf_weights", QC_ARTIFACT_PARAMS)
    assert os.path.exists(d)
    before = os.path.getmtime(d)
    w = quality_weights_artifact(spark, sf_dir)
    assert w.count() == _QC_D + 1
    assert os.path.getmtime(d) == before


def test_score_plan_serves_from_artifact(spark, sf_dir):
    """The scoring query's plan must consume the persisted weight
    parquet (broadcast) and contain no training iteration — no
    per-round joins, just feature hashing + one doc-grain sum."""
    from env_data_pipeline_spark.plans.qualityclf import (
        text_quality_classifier_score,
    )

    df = text_quality_classifier_score(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "quality_clf_weights" in plan
    # training is 8 chained rounds; a served plan joins the weight
    # table exactly once
    assert plan.count("quality_clf_weights") == 1
    assert "BroadcastExchange" in plan
