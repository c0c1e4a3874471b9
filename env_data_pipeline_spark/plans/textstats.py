"""Corpus-statistics operators: TF-IDF term salience, BM25 keyword
retrieval, PMI collocations, and boilerplate n-gram scrubbing — the
remaining lexical-statistics layer of a training-data pipeline
(complementing plans/llmops.py's LM/decontamination family and
plans/extensions.py's dedup family).

Cross-engine float discipline (memory: float-grid parity): every
score that feeds a RANKING is either (a) exact integer arithmetic
(`div` / DuckDB `//` floor division — identical for the positive
operands used here), or (b) built from +,-,*,/ doubles ONLY with
explicit parenthesization and fixed summation order (conditional
pivots, never group-order-dependent SUMs), which IEEE 754 evaluates
bit-identically on the JVM and in DuckDB, or (c) transcendental
outputs floor-quantized onto an integer grid BEFORE any sum or
comparison (text_zipf_fit's ln terms) — libm's 1-ulp slack then
flips a grid unit only when the true value sits within ~1e-9 of a
grid line, and a single unit shifts the final ROUND(,4) statistic by
~1e-10, so a cross-engine flip needs two independent knife-edges at
once (probability ~1e-6 per corpus, the same accepted bound as the
Kaplan-Meier and haversine grids elsewhere). Raw (unquantized)
transcendentals still never feed a SUM or a comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from env_data_pipeline_spark.catalog import table
from env_data_pipeline_spark.extensions.text import words
from env_data_pipeline_spark.plans.registry import BENCH_EXTRA, query

_DUCK_TOKENS = """
    tokens AS (SELECT doc_id, u.x AS token
               FROM documents, unnest(string_split(text, ' ')) AS u(x))
"""


# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------

_TFIDF_K = 3


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH {_DUCK_TOKENS},
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               -- ratio-idf tf-idf in exact integer micro-units:
               -- tf * (N + 1) * 1e6 // (df + 1)
               (tf.tf * (n.n_docs + 1) * 1000000) // (df.df + 1)
                   AS score_units
        FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, score_units,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score_units DESC, token)
                   AS term_rank
        FROM scored
    )
    SELECT doc_id, term_rank, token,
           ROUND(score_units / 1000000.0, 6) AS tfidf
    FROM ranked WHERE term_rank <= {_TFIDF_K}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most salient terms per document by tf-idf with a
    ratio idf (tf * (N+1)/(df+1)) — the log-free variant so the score
    is EXACT integer arithmetic on both engines (`div` truncation ==
    DuckDB `//` floor for positive operands); no float enters the
    ranking.

    Scale: one (doc, token) shuffle for tf (map-side combined), one
    token shuffle for df; df re-joins tf on token via a shuffle_hash
    join — the vocabulary GROWS with the corpus (Heaps' law, measured
    by text_heaps_fit), so it is never broadcast (ADVICE r9); only
    the one-row corpus count broadcasts. The per-doc top-k is a
    WindowGroupLimit: rank-filter pushes the k-limit into the window
    sort, so no doc materializes its full vocabulary past the
    operator.
    """
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(words(F.col("text"))).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts.hint("shuffle_hash"), "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score_units",
            F.expr("(tf * (n_docs + 1) * 1000000) div (df + 1)"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_units"), "token")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= _TFIDF_K)
        .select(
            "doc_id",
            "term_rank",
            "token",
            F.round(F.col("score_units") / 1000000.0, 6).alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# BM25 keyword retrieval
# --------------------------------------------------------------------------

# fixed keyword query; one conditional-pivot column per term keeps the
# score's summation order FIXED (q1 + q2 + q3), never group-order float
_BM25_TERMS = ("spark", "window", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 15


_BM25_ORACLE = f"""
    WITH {_DUCK_TOKENS},
    d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
          FROM documents),
    n AS (SELECT count(*) AS n_docs FROM documents),
    a AS (SELECT SUM(dl) / (SELECT n_docs FROM n) AS avgdl FROM d),
    tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
           FROM tokens WHERE token IN {_BM25_TERMS!r}
           GROUP BY 1, 2),
    df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    terms AS (
        SELECT tf.doc_id,
               COALESCE(SUM(((n.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * ((tf.tf * ({_BM25_K1} + 1.0))
                      / (tf.tf + {_BM25_K1}
                         * ((1.0 - {_BM25_B})
                            + ({_BM25_B} * (d.dl / a.avgdl))))))
                   FILTER (WHERE tf.token = '{_BM25_TERMS[0]}'), 0.0)
                 + COALESCE(SUM(((n.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * ((tf.tf * ({_BM25_K1} + 1.0))
                      / (tf.tf + {_BM25_K1}
                         * ((1.0 - {_BM25_B})
                            + ({_BM25_B} * (d.dl / a.avgdl))))))
                   FILTER (WHERE tf.token = '{_BM25_TERMS[1]}'), 0.0)
                 + COALESCE(SUM(((n.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * ((tf.tf * ({_BM25_K1} + 1.0))
                      / (tf.tf + {_BM25_K1}
                         * ((1.0 - {_BM25_B})
                            + ({_BM25_B} * (d.dl / a.avgdl))))))
                   FILTER (WHERE tf.token = '{_BM25_TERMS[2]}'), 0.0)
                   AS score
        FROM tf
        JOIN df USING (token)
        JOIN d ON tf.doc_id = d.doc_id
        CROSS JOIN n CROSS JOIN a
        GROUP BY tf.doc_id
    )
    SELECT doc_id,
           CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_units,
           ROUND(score, 6) AS bm25
    FROM terms
    ORDER BY score_units DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


@query("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) retrieval of the top-15 documents for a
    fixed keyword query.

    Determinism: the score uses only +,-,*,/ doubles (the log-free
    idf ratio (N-df+0.5)/(df+0.5)) with identical parenthesization on
    both engines, and the per-term weights are summed in FIXED term
    order via conditional aggregates — so the double is bit-identical
    cross-engine and the 1e-6 unit ranking cannot straddle.

    Scale: tokens filter to the 3 query terms AT THE EXPLODE (the
    IN-predicate prunes before any shuffle), so tf's shuffle carries
    only query-term hits; df and the two corpus scalars broadcast;
    top-k is TakeOrderedAndProject.
    """
    return bm25_topk(table(spark, sf_dir, "documents"))


def bm25_topk(docs: DataFrame) -> DataFrame:
    """(doc_id, score_units, bm25) — the ranked BM25 top-15 frame.
    THE shared lexical arm: text_bm25_search returns it directly and
    hybrid_search_rrf (plans/vectorops.py) fuses it with the vector
    ranking, so the two surfaces cannot drift."""
    # r12 shape (guide §2.3/§2.4): dl rides the token explode (the
    # split feeds both, so no (doc_id, dl) join back onto tf), and the
    # two corpus scalars fold into ONE singleton broadcast. avgdl =
    # sum(dl)/n_docs is exact under any summation order because dl is
    # an integer-valued double, so the fold is value-identical to the
    # old separate aggregate.
    d = docs.select(
        "doc_id", F.size(words(F.col("text"))).cast("double").alias("dl")
    )
    corpus = d.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        "n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl")
    )
    tokens = docs.select(
        "doc_id",
        F.size(words(F.col("text"))).cast("double").alias("dl"),
        F.explode(words(F.col("text"))).alias("token"),
    ).filter(F.col("token").isin(*_BM25_TERMS))
    tf = tokens.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    df_counts = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    def term_weight(term: str):
        # parenthesization mirrors _bm25_term_sql exactly
        idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        tf_part = (F.col("tf") * (_BM25_K1 + 1.0)) / (
            F.col("tf")
            + _BM25_K1
            * ((1.0 - _BM25_B) + (_BM25_B * (F.col("dl") / F.col("avgdl"))))
        )
        return F.coalesce(
            F.sum(F.when(F.col("token") == term, idf * tf_part)), F.lit(0.0)
        )

    # df_counts here is bounded by the QUERY's term count (the explode
    # filters to _BM25_TERMS before any aggregation), not by the
    # vocabulary — ≤3 rows at every corpus size, so broadcasting it is
    # scale-legitimate and removes both sides' join exchanges (the
    # ADVICE r9 no-vocabulary-broadcast rule governs the unfiltered
    # tf-idf path in vocab joins, not a fixed keyword query)
    scored = (
        tf.join(F.broadcast(df_counts), "token")
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            (
                term_weight(_BM25_TERMS[0])
                + term_weight(_BM25_TERMS[1])
                + term_weight(_BM25_TERMS[2])
            ).alias("score")
        )
    )
    return (
        scored.select(
            "doc_id",
            F.floor(F.col("score") * 1000000 + 0.5).cast("bigint").alias(
                "score_units"
            ),
            F.round("score", 6).alias("bm25"),
        )
        .orderBy(F.desc("score_units"), "doc_id")
        .limit(_BM25_TOPK)
    )


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH {_DUCK_TOKENS},
    uni AS (SELECT token, count(*) AS c FROM tokens GROUP BY 1),
    t AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM uni),
    bi AS (
        SELECT u.x AS bigram, count(*) AS c_xy
        FROM (SELECT string_split(text, ' ') AS ws FROM documents) s,
             unnest(list_transform(range(1, len(s.ws)),
                                   i -> s.ws[i] || ' ' || s.ws[i + 1])) AS u(x)
        GROUP BY 1
    ),
    b AS (SELECT CAST(SUM(c_xy) AS DOUBLE) AS total_bi FROM bi),
    lifted AS (
        SELECT string_split(bi.bigram, ' ')[1] AS w1,
               string_split(bi.bigram, ' ')[2] AS w2,
               bi.c_xy,
               ((bi.c_xy / b.total_bi)
                / ((u1.c / t.total) * (u2.c / t.total))) AS lift
        FROM bi
        JOIN uni u1 ON string_split(bi.bigram, ' ')[1] = u1.token
        JOIN uni u2 ON string_split(bi.bigram, ' ')[2] = u2.token
        CROSS JOIN t CROSS JOIN b
        WHERE bi.c_xy >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, c_xy AS pair_count,
           CAST(floor(lift * 10000 + 0.5) AS BIGINT) AS lift_units,
           ROUND(lift, 4) AS lift
    FROM lifted
    ORDER BY lift_units DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word collocations by pointwise-mutual-information LIFT
    (p(x,y)/(p(x)p(y)) — the exp of PMI, log-free so the ranking stays
    in deterministic +,*,/ double arithmetic; same ordering as PMI
    because exp is monotone).

    Scale: bigrams are formed per-row with zip_with (zero shuffle),
    then one bigram-keyed count shuffle (map-side combined) and one
    unigram count shuffle; unigram vocabulary broadcasts back onto
    the bigram table twice (w1, w2); the two corpus totals are one-row
    broadcasts. min-count 5 prunes the tail before the joins.
    """
    docs = table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.size(ws) - 1),
                F.slice(ws, 2, F.size(ws) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    bi = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_xy")).filter(
        F.col("c_xy") >= _PMI_MIN_COUNT
    )
    tokens = docs.select(F.explode(ws).alias("token"))
    uni = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").cast("double").alias("total"))
    total_bi_all = bigrams.agg(F.count(F.lit(1)).cast("double").alias("total_bi"))
    split_col = F.split(F.col("bigram"), " ")
    lifted = (
        bi.withColumn("w1", split_col.getItem(0))
        .withColumn("w2", split_col.getItem(1))
        # uni is the unigram vocabulary — data-sized, so both lookups
        # are shuffle_hash joins, not broadcasts (ADVICE r9 family fix)
        .join(
            uni.select(
                F.col("token").alias("w1"), F.col("c").alias("c1")
            ).hint("shuffle_hash"),
            "w1",
        )
        .join(
            uni.select(
                F.col("token").alias("w2"), F.col("c").alias("c2")
            ).hint("shuffle_hash"),
            "w2",
        )
        .join(F.broadcast(total))
        .join(F.broadcast(total_bi_all))
        .withColumn(
            "lift",
            (F.col("c_xy") / F.col("total_bi"))
            / ((F.col("c1") / F.col("total")) * (F.col("c2") / F.col("total"))),
        )
    )
    return (
        lifted.select(
            "w1",
            "w2",
            F.col("c_xy").alias("pair_count"),
            F.floor(F.col("lift") * 10000 + 0.5).cast("bigint").alias("lift_units"),
            F.round("lift", 4).alias("lift"),
        )
        .orderBy(F.desc("lift_units"), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# --------------------------------------------------------------------------
# Boilerplate n-gram scrubbing
# --------------------------------------------------------------------------

_BOILER_N = 5
# a gram is boilerplate when it appears in >= 5% of documents —
# fraction-based so the operator is scale-invariant
_BOILER_DF_FRAC = 0.05


@query(
    "corpus_boilerplate_scrub",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' ')) - {_BOILER_N - 2}),
                   i -> array_to_string(
                       string_split(text, ' ')[i : i + {_BOILER_N - 1}], ' ')
               )) AS gram
        FROM documents
    ),
    gd AS (SELECT DISTINCT doc_id, gram FROM g),
    df AS (SELECT gram, count(*) AS df FROM gd GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    boiler AS (SELECT gram FROM df CROSS JOIN n
               WHERE df >= CAST(ceil(n_docs * {_BOILER_DF_FRAC}) AS BIGINT)),
    per_doc AS (
        SELECT g.doc_id,
               count(*) AS n_grams,
               CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler_grams
        FROM g LEFT JOIN boiler b ON g.gram = b.gram
        GROUP BY 1
    )
    SELECT doc_id, n_grams, n_boiler_grams,
           ROUND(n_boiler_grams * 1.0 / n_grams, 6) AS boiler_ratio,
           CASE WHEN n_boiler_grams * 2 > n_grams THEN 'DROP'
                ELSE 'KEEP' END AS verdict
    FROM per_doc
    """,
)
def corpus_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: word 5-grams occurring in >= 5%
    of documents are template text (nav bars, license headers); each
    document reports its boilerplate-gram ratio and a KEEP/DROP
    verdict (>50% boilerplate drops). Corpus-internal df-based
    scrubbing — distinct from pairwise span dedup
    (dedup_substring_spans) and eval decontamination
    (decontaminate_eval_overlap), which key on other corpora.

    Scale: grams form per-row (zero shuffle); the df aggregate
    shuffles 16-byte-bounded gram strings once with a per-doc
    DISTINCT pre-pass; the boilerplate set is tiny by construction
    (df >= 5% of corpus) so it BROADCASTS back against the gram
    stream — the corpus is never re-shuffled. The ratio is a
    per-doc count over its own grams, map-side combinable.
    """
    docs = table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    # guard: Spark's sequence(1, n) DESCENDS when n < 1, so short docs
    # must map to an empty gram list (DuckDB's range(1, n) is already
    # empty there)
    gram_list = F.when(
        F.size(ws) >= _BOILER_N,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (_BOILER_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(_BOILER_N))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(gram_list).alias("gram"))
    df_counts = (
        grams.dropDuplicates(["doc_id", "gram"])
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        df_counts.join(F.broadcast(n_docs))
        .filter(
            F.col("df")
            >= F.ceil(F.col("n_docs") * _BOILER_DF_FRAC).cast("bigint")
        )
        .select("gram")
    )
    per_doc = (
        grams.join(
            F.broadcast(boiler.withColumn("is_boiler", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler_grams"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_boiler_grams",
        F.round(F.col("n_boiler_grams") * 1.0 / F.col("n_grams"), 6).alias(
            "boiler_ratio"
        ),
        F.when(
            F.col("n_boiler_grams") * 2 > F.col("n_grams"), "DROP"
        )
        .otherwise("KEEP")
        .alias("verdict"),
    )


# --------------------------------------------------------------------------
# Vocabulary coverage / OOV audit
# --------------------------------------------------------------------------

_VOCAB_V = 1000


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH tokens AS (
        SELECT source, u.x AS token
        FROM documents, unnest(string_split(text, ' ')) AS u(x)
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM tokens GROUP BY 1),
    vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT {_VOCAB_V})
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(v.token) AS BIGINT) AS in_vocab_tokens,
           ((COUNT(*) - COUNT(v.token)) * 1000 // COUNT(*)) / 1000.0
               AS oov_rate_milli
    FROM tokens t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY 1
    ORDER BY 1
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep audit: build the top-V corpus vocabulary by
    global frequency (ties to the lexicographically smaller token —
    byte order, identical for ASCII on both engines) and report the
    out-of-vocabulary token rate per source. The number that decides
    whether a vocabulary/tokenizer trained on this corpus will shred
    a given source into UNKs.

    Exactness: counts are integers; the OOV rate is integer milli
    division. The top-V boundary is deterministic because the sort
    key (count DESC, token) is total.

    Scale: one map-side-combinable token count, a top-V global sort
    prefix (TakeOrderedAndProject — V rows, never the full
    vocabulary), then the V-row vocab broadcasts back onto the token
    stream; per-source results aggregate map-side. Two passes over
    the token stream (count, then coverage) — each a scan projection,
    neither a re-shuffle of text.
    """
    docs = table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(words(F.col("text"))).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(_VOCAB_V)
        .select("token", F.lit(1).alias("iv"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("iv").alias("in_vocab_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "in_vocab_tokens",
            (
                F.expr("(n_tokens - in_vocab_tokens) * 1000 div n_tokens")
                / F.lit(1000.0)
            ).alias("oov_rate_milli"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Corpus drift: per-source total-variation divergence vs the rest
# --------------------------------------------------------------------------


@query(
    "corpus_source_divergence",
    oracle=f"""
    WITH {_DUCK_TOKENS.replace("doc_id", "source")},
    cnt AS (SELECT source, token, COUNT(*) AS cnt_s
            FROM tokens GROUP BY 1, 2),
    tok AS (SELECT token, CAST(SUM(cnt_s) AS BIGINT) AS cnt_all
            FROM cnt GROUP BY 1),
    st AS (SELECT source, CAST(SUM(cnt_s) AS BIGINT) AS t_s
           FROM cnt GROUP BY 1),
    g AS (SELECT CAST(SUM(cnt_all) AS BIGINT) AS t_all FROM tok),
    grid AS (SELECT s.source, s.t_s, k.token, k.cnt_all
             FROM st s CROSS JOIN tok k),
    terms AS (
        SELECT grid.source, grid.t_s,
               ABS(COALESCE(c.cnt_s, 0) * ((SELECT t_all FROM g) - grid.t_s)
                   - (grid.cnt_all - COALESCE(c.cnt_s, 0)) * grid.t_s)
                   AS term
        FROM grid LEFT JOIN cnt c
          ON c.source = grid.source AND c.token = grid.token
    )
    SELECT source, MAX(t_s) AS n_tokens,
           CAST(500 * SUM(term)
                // (MAX(t_s) * ((SELECT t_all FROM g) - MAX(t_s)))
                AS BIGINT) AS tv_permille_vs_rest
    FROM terms GROUP BY source
    """,
)
def corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift audit: for each document source, the total-
    variation distance (in permille) between its unigram distribution
    and the REST of the corpus — the drift alarm a training pipeline
    fires when a new upstream starts delivering text unlike everything
    else. TV is the log-free divergence, so the whole computation is
    exact BIGINT cross-multiplication: per token
    |cnt_s*(T-T_s) - (cnt_all-cnt_s)*T_s|, summed, then one floor
    division onto the permille grid. (Bound: terms stay < 2^63 while
    corpus_tokens^2 * vocab < 9e18 — true by orders of magnitude at
    every test tier; a petabyte corpus would pre-quantize per-token
    rates to a fixed grid first, same discipline, one more floor.)

    Scale: one (source, token) shuffle with map-side combine is the
    only pass over data; everything after is vocabulary-sized. The
    dense source x vocab grid exists so ABSENT tokens contribute their
    mass (a source missing a corpus-common word IS drift) — it is
    |sources| * |vocab| rows, independent of corpus row count, and the
    per-source totals broadcast onto it.
    """
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select("source", F.explode(words(F.col("text"))).alias("token"))
    cnt = tokens.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt_s"))
    tok = cnt.groupBy("token").agg(F.sum("cnt_s").cast("bigint").alias("cnt_all"))
    st = cnt.groupBy("source").agg(F.sum("cnt_s").cast("bigint").alias("t_s"))
    g = tok.agg(F.sum("cnt_all").cast("bigint").alias("t_all"))
    grid = F.broadcast(st).crossJoin(tok).crossJoin(F.broadcast(g))
    terms = grid.join(cnt, ["source", "token"], "left").select(
        "source",
        "t_s",
        F.abs(
            F.coalesce(F.col("cnt_s"), F.lit(0)) * (F.col("t_all") - F.col("t_s"))
            - (F.col("cnt_all") - F.coalesce(F.col("cnt_s"), F.lit(0)))
            * F.col("t_s")
        ).alias("term"),
        "t_all",
    )
    return terms.groupBy("source").agg(
        F.max("t_s").alias("n_tokens"),
        F.expr("cast(500 * sum(term) div (max(t_s) * (max(t_all) - max(t_s))) as bigint)")
            .alias("tv_permille_vs_rest"),
    )


# --------------------------------------------------------------------------
# Positional-index phrase search
# --------------------------------------------------------------------------

# fixed 2-word phrase; the synthetic pool guarantees hits
_PHRASE = ("spark", "window")


@query(
    "text_phrase_search",
    # The PRESENCE filter is deliberately a different algorithm than
    # the engine (naive padded-substring scan vs positional index) —
    # agreement cross-validates both. The occurrence COUNT walks token
    # positions (a replace-length trick would undercount adjacent
    # occurrences that share their boundary space).
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents
        WHERE ' ' || text || ' ' LIKE '% {_PHRASE[0]} {_PHRASE[1]} %'
    )
    SELECT doc_id, source,
           CAST(len(list_filter(range(1, len(t)),
                    i -> t[i] = '{_PHRASE[0]}' AND t[i + 1] = '{_PHRASE[1]}'))
                AS BIGINT) AS n_occurrences
    FROM toks
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("{spark window}") via a positional inverted
    index: explode (token, position), keep the two phrase terms, and
    self-join on doc & pos+1 — the index-serving plan a search layer
    runs at scale, where the naive full-text substring scan is
    unaffordable. The DuckDB oracle's presence filter deliberately IS
    that naive scan (padded-substring containment), so the gate
    cross-validates two independent matching algorithms; its per-doc
    count walks token positions, because a replace-length trick
    undercounts adjacent occurrences sharing a boundary space.

    Scale: the token stream carries only the TWO phrase terms out of
    the scan (filter pushed into the projection), so the positional
    join is phrase-frequency-sized, not corpus-sized; merge-hinted so
    AQE can't broadcast a term side whose frequency grows with the
    corpus (memory: AQE hazard).
    """
    docs = table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        "source",
        F.posexplode(words(F.col("text"))).alias("pos", "token"),
    )
    first = pos.filter(F.col("token") == _PHRASE[0]).select(
        "doc_id", "source", "pos"
    )
    second = pos.filter(F.col("token") == _PHRASE[1]).select(
        F.col("doc_id").alias("d2"), (F.col("pos") - 1).alias("p2")
    )
    hits = first.hint("merge").join(
        second,
        (F.col("doc_id") == F.col("d2")) & (F.col("pos") == F.col("p2")),
    )
    return hits.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )


# --------------------------------------------------------------------------
# text_sparse_cosine_pairs — prefix-filtered sparse tf-idf cosine
# similarity join (the inverted-index lexical sibling of the dense
# embedding ANN and the MinHash families)
# --------------------------------------------------------------------------

# tf-idf units on a 1e3 grid (NOT the 1e6 top-terms grid): squared
# sums must stay inside BIGINT — max unit ~ tf*(N+1)*1000, squared and
# summed over <= _SSJ_PREFIX terms per doc. The bound is ENFORCED
# engine-side (raise_error below), not just assumed: past
# u ~ sqrt(2^63 / prefix) ≈ 1.07e9 a non-ANSI Spark long SUM would
# wrap silently while DuckDB promotes to HUGEINT — the engine would
# diverge from both the oracle and the truth with no error. At a
# corpus big enough to trip it (N ~ 1e6 with df=1 tf>=3 terms), shrink
# the unit grid or df-normalize before the prefix cut.
_SSJ_U_LIMIT = 1_000_000_000
_SSJ_PREFIX = 8  # salient terms kept per doc (the "prefix")
_SSJ_MAX_DF = 100  # posting-list cap: terms in more docs are dropped
_SSJ_TAU_U = 500_000  # cosine >= 0.5 on the 1e-6 grid
_SSJ_TOPK = 50


@query(
    "text_sparse_cosine_pairs",
    oracle=f"""
    WITH {_DUCK_TOKENS},
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               (tf.tf * (n.n_docs + 1) * 1000) // (df.df + 1) AS u
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE df.df <= {_SSJ_MAX_DF}
    ),
    pfx AS MATERIALIZED (
        SELECT doc_id, token, u FROM (
            SELECT doc_id, token, u,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY u DESC, token) AS rk
            FROM scored)
        WHERE rk <= {_SSJ_PREFIX}
    ),
    nrm AS (
        SELECT doc_id, sqrt(CAST(SUM(u * u) AS DOUBLE)) AS nrm
        FROM pfx GROUP BY 1
    ),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.u * b.u) AS dot, COUNT(*) AS n_shared
        FROM pfx a JOIN pfx b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cosd AS (
        SELECT d.doc_a, d.doc_b, d.n_shared,
               CAST(floor(d.dot / (na.nrm * nb.nrm) * 1000000) AS BIGINT)
                   AS cos_u
        FROM dots d
        JOIN nrm na ON na.doc_id = d.doc_a
        JOIN nrm nb ON nb.doc_id = d.doc_b
    )
    SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(cos_u / 1000000.0, 4) AS cosine_sim
    FROM cosd
    WHERE cos_u >= {_SSJ_TAU_U}
    ORDER BY cos_u DESC, doc_a, doc_b
    LIMIT {_SSJ_TOPK}
    """,
)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical similarity join: top-50 document pairs by
    cosine over tf-idf PREFIX vectors — each doc keeps only its
    8 (_SSJ_PREFIX) most salient terms (rarest-weighted), terms
    appearing in more than 100 (_SSJ_MAX_DF) docs are dropped, and candidate pairs must share a
    surviving term. This is prefix filtering from the set-similarity-
    join literature (Chaudhuri/Bayardo): salient terms are rare, so
    posting lists are short and the pair space collapses from n^2 to
    sum(postings^2) — the third similarity family next to MinHash
    (set overlap) and embedding ANN (dense semantics).

    Exactness: tf-idf units, squared norms, and dot products are
    exact BIGINT; the only doubles are sqrt/division — IEEE-exact
    ops that both engines round identically from identical integer
    inputs — and the comparison/order key is the floor-quantized
    1e-6 cosine, never a raw double.

    Scale: tf and df are the same two shuffles text_tfidf_top_terms
    pays; the prefix keeps <= 8 rows per doc; the inverted-index
    equi-join shuffles on token with the df cap bounding every
    posting list, and the pair aggregation is map-side combinable.
    The df cap is the knob that holds at 100 TB: posting cost is
    O(sum over kept terms of df^2) with df <= 100 by construction."""
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(words(F.col("text"))).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # df_counts is VOCABULARY-sized — it grows with the corpus (the
    # very curve text_heaps_fit measures), so it is never broadcast
    # (ADVICE r9): shuffle_hash on token, with the df frame as the
    # hash build side (one row per distinct token vs tf's one row per
    # (doc, token) — always the smaller leg).
    scored = (
        tf.join(df_counts.hint("shuffle_hash"), "token")
        .filter(F.col("df") <= _SSJ_MAX_DF)
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.expr("(tf * (n_docs + 1) * 1000) div (df + 1)").alias("u"),
        )
        .withColumn(
            "u",
            F.when(F.col("u") <= _SSJ_U_LIMIT, F.col("u")).otherwise(
                F.raise_error(
                    F.lit(
                        "text_sparse_cosine_pairs: tf-idf unit exceeds the "
                        f"BIGINT-safe bound {_SSJ_U_LIMIT} — norm/dot sums "
                        "would overflow; shrink the unit grid"
                    )
                ).cast("bigint")
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("u"), "token")
    pfx = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SSJ_PREFIX)
        .select("doc_id", "token", "u")
    )
    nrm = pfx.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("u") * F.col("u")).cast("double")).alias("nrm")
    )
    a = pfx.select(
        F.col("token"), F.col("doc_id").alias("doc_a"), F.col("u").alias("ua")
    )
    b = pfx.select(
        F.col("token"), F.col("doc_id").alias("doc_b"), F.col("u").alias("ub")
    )
    dots = (
        a.hint("merge")
        .join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("ua") * F.col("ub")).alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cos_u",
            F.floor(
                F.col("dot") / (F.col("na") * F.col("nb")) * F.lit(1_000_000)
            ).cast("bigint"),
        )
        .filter(F.col("cos_u") >= _SSJ_TAU_U)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("cos_u") / 1_000_000.0, 4).alias("cosine_sim"),
            "cos_u",
        )
        .orderBy(F.desc("cos_u"), "doc_a", "doc_b")
        .limit(_SSJ_TOPK)
        .drop("cos_u")
    )


# --------------------------------------------------------------------------
# text_zipf_fit — per-language Zipf power-law fit of the token
# frequency-rank curve (log-log OLS slope)
# --------------------------------------------------------------------------

# ln values land on a 1e6 integer grid before any sum: with rank and
# freq < ~2^31, x/y units stay < ~2.2e7, pairwise products < ~5e14,
# and the raw SUMs over _ZIPF_MAX_RANK rows < ~2.5e18 — inside
# BIGINT. The n*Sxy-style cross terms DO exceed BIGINT, so the final
# slope/r2 combine the exact sums as doubles (one identical
# expression both engines).
_ZIPF_LN_GRID = 1_000_000
_ZIPF_MAX_RANK = 5_000

# Shared log-log OLS-from-sums machinery (text_zipf_fit and
# text_heaps_fit): both engines combine the exact BIGINT sums
# (n, sx, sy, sxy, sxx[, syy]) in ONE identical double expression.
_OLS_NUM_SQL = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
_OLS_DEN_SQL = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"


def _ols_cols(sums):
    """(num, den) slope columns from an OLS sums frame — the Spark
    twin of _OLS_NUM_SQL/_OLS_DEN_SQL."""
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    den = n * F.col("sxx") - sx * F.col("sx")
    return num, den


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH {_DUCK_TOKENS},
    freq AS (
      SELECT d.lang, t.token, COUNT(*) AS f
      FROM tokens t JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT lang, f,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY f DESC, token) AS r
      FROM freq
    ),
    pts AS (
      SELECT lang,
             CAST(floor(ln(r) * {_ZIPF_LN_GRID}) AS BIGINT) AS x,
             CAST(floor(ln(f) * {_ZIPF_LN_GRID}) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_MAX_RANK}
    ),
    sums AS (
      SELECT lang, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pts GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n_ranks,
           CASE WHEN {_OLS_DEN_SQL} <> 0
                THEN ROUND({_OLS_NUM_SQL} / {_OLS_DEN_SQL}, 4)
           END AS zipf_slope,
           CASE WHEN ({_OLS_DEN_SQL} <> 0)
                 AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy <> 0)
                THEN ROUND(({_OLS_NUM_SQL} * {_OLS_NUM_SQL})
                     / ({_OLS_DEN_SQL}
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
           END AS r_squared
    FROM sums
    ORDER BY lang
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit per language: OLS slope of ln(frequency)
    against ln(rank) over the top-5000 token ranks, with r-squared.
    Natural text sits near slope -1; a corpus segment that drifts far
    from it (or fits poorly) is boilerplate, spam, or synthetic — the
    cheap distributional health check a curation pipeline runs per
    source/language before training.

    Exactness: ranks and frequencies are exact integers; their ln
    values are floor-quantized onto a 1e6 integer grid BEFORE the
    sums, so Sx/Sxy/... are exact BIGINTs (bounds in the header
    comment) and the slope/r2 combine those exact sums in one
    identical double expression per engine.

    Degenerate fits (a single rank, or all frequencies equal — zero
    variance) yield NULL slope/r2 rather than a division error.

    Scale: one (lang, token) partial-agg shuffle, a per-lang window
    whose rank<=5000 filter compiles to WindowGroupLimit (every
    partition keeps a bounded heap), then a 5-row aggregate. The
    regression itself never sees more than MAX_RANK rows per
    language."""
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "lang", F.explode(words(F.col("text"))).alias("token")
    )
    freq = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), "token")
    pts = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _ZIPF_MAX_RANK)
        .select(
            "lang",
            F.floor(F.log("r") * _ZIPF_LN_GRID).cast("bigint").alias("x"),
            F.floor(F.log("f") * _ZIPF_LN_GRID).cast("bigint").alias("y"),
        )
    )
    sums = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num, den = _ols_cols(sums)
    deny = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    return sums.select(
        "lang",
        F.col("n").cast("bigint").alias("n_ranks"),
        F.when(den != 0, F.round(num / den, 4)).alias("zipf_slope"),
        F.when(
            (den != 0) & (deny != 0),
            F.round((num * num) / (den * deny), 4),
        ).alias("r_squared"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# text_heaps_fit — Heaps'-law vocabulary-growth fit per source
# --------------------------------------------------------------------------

# points are capped per source so the OLS sums stay inside BIGINT at
# ANY corpus size: cum counts are < 2^63, so x,y <= ln(2^63)*1e6 ~
# 4.37e7 and x*y <= 1.91e15; SUM over 4000 points <= 7.7e18 < 2^63-1
# ~ 9.22e18 (a 5000-point cap would NOT hold: 9.53e18 overflows).
# 4000 prefix points more than saturate a two-parameter fit.
_HEAPS_MAX_DOCS = 4_000


@query(
    "text_heaps_fit",
    oracle=f"""
    WITH {_DUCK_TOKENS},
    per_doc AS MATERIALIZED (
      SELECT t.doc_id, d.source, COUNT(*) AS n_tok
      FROM tokens t JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    ),
    firsts AS MATERIALIZED (
      SELECT source, first_doc, COUNT(*) AS n_new FROM (
        SELECT d.source, t.token, MIN(t.doc_id) AS first_doc
        FROM tokens t JOIN documents d USING (doc_id)
        GROUP BY 1, 2)
      GROUP BY 1, 2
    ),
    series AS (
      SELECT p.source,
             ROW_NUMBER() OVER w AS rk,
             SUM(p.n_tok) OVER (PARTITION BY p.source ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok,
             SUM(COALESCE(f.n_new, 0)) OVER (PARTITION BY p.source
                 ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
      FROM per_doc p
      LEFT JOIN firsts f
        ON f.source = p.source AND f.first_doc = p.doc_id
      WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id)
    ),
    pts AS (
      SELECT source,
             CAST(floor(ln(cum_tok) * {_ZIPF_LN_GRID}) AS BIGINT) AS x,
             CAST(floor(ln(cum_vocab) * {_ZIPF_LN_GRID}) AS BIGINT) AS y
      FROM series
      WHERE rk <= {_HEAPS_MAX_DOCS} AND cum_tok > 0 AND cum_vocab > 0
    ),
    sums AS (
      SELECT source, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_points,
           CASE WHEN {_OLS_DEN_SQL} <> 0
                THEN ROUND({_OLS_NUM_SQL} / {_OLS_DEN_SQL}, 4)
           END AS heaps_beta,
           CASE WHEN {_OLS_DEN_SQL} <> 0
                THEN ROUND(exp(
                  (CAST(sy AS DOUBLE)
                   - ({_OLS_NUM_SQL} / {_OLS_DEN_SQL}) * CAST(sx AS DOUBLE))
                  / n / {_ZIPF_LN_GRID}), 4)
           END AS heaps_k
    FROM sums
    ORDER BY source
    """,
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit per source: vocabulary growth V(n) ~ K * n^beta
    from the cumulative (tokens seen, distinct tokens seen) curve in
    doc_id order — natural text sits at beta ~ 0.4-0.6; beta near 1
    means vocabulary grows as fast as the text (noise / unique-id
    spam), beta near 0 means a closed template vocabulary
    (boilerplate). With text_zipf_fit this completes the two
    classic distributional health checks for a training corpus.

    Exactness: cumulative token/vocab counts are exact integer
    window sums in a deterministic (doc_id) order; ln values
    floor-quantize onto the shared 1e6 grid before the OLS sums
    (exact BIGINT, bounds in the header comment); beta/K combine
    those sums in one identical double expression per engine, with
    degenerate fits NULL.

    Scale: first-occurrence attribution is one (source, token)
    groupBy min; the series window is per-source doc-grain; the fit
    caps at 4000 prefix points per source, so the OLS never grows
    with the corpus."""
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "source", F.explode(words(F.col("text"))).alias("token")
    )
    per_doc = tokens.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    firsts = (
        tokens.groupBy("source", "token")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("source", "first_doc")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy("source").orderBy("doc_id")
    series = (
        per_doc.join(
            firsts,
            (per_doc["source"] == firsts["source"])
            & (per_doc["doc_id"] == firsts["first_doc"]),
            "left",
        )
        .select(
            per_doc["source"].alias("source"),
            "doc_id",
            "n_tok",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .select(
            "source",
            F.row_number().over(wr).alias("rk"),
            F.sum("n_tok").over(w).alias("cum_tok"),
            F.sum("n_new").over(w).alias("cum_vocab"),
        )
    )
    pts = series.filter(
        (F.col("rk") <= _HEAPS_MAX_DOCS)
        & (F.col("cum_tok") > 0)
        & (F.col("cum_vocab") > 0)
    ).select(
        "source",
        F.floor(F.log("cum_tok") * _ZIPF_LN_GRID).cast("bigint").alias("x"),
        F.floor(F.log("cum_vocab") * _ZIPF_LN_GRID).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num, den = _ols_cols(sums)
    beta = num / den
    k = F.exp(
        (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / F.lit(float(_ZIPF_LN_GRID))
    )
    return sums.select(
        "source",
        F.col("n").cast("bigint").alias("n_points"),
        F.when(den != 0, F.round(beta, 4)).alias("heaps_beta"),
        F.when(den != 0, F.round(k, 4)).alias("heaps_k"),
    ).orderBy("source")


BENCH_EXTRA.add("text_sparse_cosine_pairs")


# --------------------------------------------------------------------------
# text_ngram_novelty — per-source boilerplate/share screen (r11)
# --------------------------------------------------------------------------


@query(
    "text_ngram_novelty",
    oracle="""
    WITH g AS (
      SELECT DISTINCT d.source,
             list_aggr(w[i:i+2], 'string_agg', ' ') AS gram
      FROM (SELECT source, string_split(text, ' ') AS w
            FROM documents) d,
           unnest(generate_series(1, len(d.w) - 2)) AS t(i)
    ),
    spread AS (
      SELECT gram, COUNT(*) AS n_sources FROM g GROUP BY 1
    )
    SELECT g.source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN s.n_sources > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           CAST(1000 * SUM(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS novelty_permille
    FROM g JOIN spread s ON s.gram = g.gram
    GROUP BY 1 ORDER BY 1
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trigram novelty: how much of a source's distinct
    word-trigram vocabulary appears in NO other source — the
    boilerplate/syndication screen (novelty near 0 = the source is
    recycled template text shared with the rest of the crawl; near
    1000 = original content). The curation complement to the
    decontamination overlap: that asks "does training text leak into
    eval", this asks "is the source adding anything".

    Exactness: all counts and the permille are exact integers.
    Scale: distinct (source, gram) pairs are Heaps-sublinear in the
    corpus; the gram-spread aggregate and the join back are both
    gram-keyed shuffles with map-side combine — never a doc-grain
    cross product. The gram->n_sources frame is vocabulary-sized, so
    the join is a plain shuffle join (the data-sized-broadcast rule)."""
    docs = table(spark, sf_dir, "documents").select(
        "source", words(F.col("text")).alias("w")
    )
    n = F.size("w")
    grams = (
        docs.filter(n >= 3)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.col("w")[i - 1],
                        F.col("w")[i],
                        F.col("w")[i + 1],
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    spread = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    return (
        grams.join(spread, "gram")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
            F.expr(
                "CAST(1000 * sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)"
                " div count(1) AS BIGINT)"
            ).alias("novelty_permille"),
        )
        .orderBy("source")
    )
