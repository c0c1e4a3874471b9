"""Property tests for the PII scrub: completeness (no pattern
matches survive redaction), idempotence (re-redacting is a no-op),
and containment (clean text passes through byte-identical) — driven
by hypothesis over generated carrier text with injected PII."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import llmops as L

# carrier words: no digits or '@' so injected PII is the only signal
CARRIER_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")),
    min_size=1,
    max_size=8,
)

EMAIL = st.builds(
    lambda a, b, tld: f"{a}@{b}.{tld}",
    st.text(alphabet="abcxyz0123456789._", min_size=1, max_size=10).filter(
        lambda s: s.strip("._") == s and s != ""
    ),
    st.text(alphabet="abcxyz0123456789", min_size=1, max_size=8),
    st.sampled_from(["com", "io", "co", "net"]),
)
PHONE = st.builds(
    lambda a, b, c: f"{a:03d}-{b:03d}-{c:04d}",
    st.integers(0, 999),
    st.integers(0, 999),
    st.integers(0, 9999),
)
IPV4 = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *([st.integers(0, 255)] * 4),
)
PII = st.one_of(EMAIL, PHONE, IPV4)


def _interleave(words: list[str], pii: list[str]) -> str:
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i < len(pii):
            out.append(pii[i])
    out.extend(pii[len(words) :])
    return " ".join(out)


def _scrub(spark, texts: list[str]):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    counts = L.pii_counts(F.col("t"))
    red = df.select(
        "t",
        L.redact_pii(F.col("t")).alias("red"),
        *[c.alias(f"n_{n}") for n, c in counts.items()],
    )
    post = red.select(
        "t",
        "red",
        *[F.col(f"n_{n}") for n in L.PII_ORDER],
        *[
            c.alias(f"post_{n}")
            for n, c in L.pii_counts(F.col("red")).items()
        ],
        L.redact_pii(F.col("red")).alias("red2"),
    )
    return post.collect()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(CARRIER_WORD, min_size=1, max_size=8),
    pii=st.lists(PII, min_size=0, max_size=4),
)
def test_redaction_complete_and_idempotent(spark, words, pii):
    text = _interleave(words, pii)
    (row,) = _scrub(spark, [text])
    # completeness: nothing matching any pattern survives
    for n in L.PII_ORDER:
        assert row[f"post_{n}"] == 0, (
            f"{n} pattern still matches after redaction: {row['red']!r}"
        )
    # idempotence: a second pass is a no-op
    assert row["red2"] == row["red"]
    # reconciliation: each class count equals its token occurrences in
    # the redacted output (counts are computed on progressively
    # scrubbed text, so PII consumed by an earlier class is never
    # double-reported)
    for n in L.PII_ORDER:
        token = L.PII_PATTERNS[n][1]
        assert row[f"n_{n}"] == row["red"].count(token), (
            f"{n} count {row[f'n_{n}']} != {token} tokens in {row['red']!r}"
        )
    # at least as many redactions as injected PII items (carrier text
    # cannot produce emails/phones/IPs: no digits, no '@')
    assert sum(row[f"n_{n}"] for n in L.PII_ORDER) >= len(pii) - sum(
        1 for p in pii if "@" in p and "." not in p.split("@")[1]
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(CARRIER_WORD, min_size=1, max_size=12))
def test_clean_text_passes_through_unchanged(spark, words):
    text = " ".join(words)
    (row,) = _scrub(spark, [text])
    assert row["red"] == text
    assert all(row[f"n_{n}"] == 0 for n in L.PII_ORDER)
