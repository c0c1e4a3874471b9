"""Independent pure-Python reference for the in-engine BPE merge
trainer (plans/bpetrain.py) — engine/oracle parity alone cannot catch
a shared conceptual error, so the algorithm is replayed from the
Sennrich-2016 description: weighted adjacent-pair counts (overlaps
included), argmax with (freq DESC, left, right) tie-break, leftmost-
first non-overlapping merge application."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions.bpe import (
    MAX_PIECE_LEN,
    word_tokens,
)
from env_data_pipeline_spark.plans.bpetrain import (
    _BPE_ROUNDS,
    bpe_train_merges,
    train_merges,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "s0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def ref_bpe(words: dict[str, int], rounds: int, max_len=None):
    """Reference BPE trainer: returns the merge table rows
    (merge_round, pair_left, pair_right, merged, freq)."""
    segs = {w: list(w) for w in words}
    merges = []
    for rnd in range(rounds):
        freq: Counter = Counter()
        for w, pieces in segs.items():
            wc = words[w]
            for a, b in zip(pieces, pieces[1:]):
                if max_len is None or len(a) + len(b) <= max_len:
                    freq[(a, b)] += wc
        if not freq:
            break
        (l, r), f = min(
            freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd + 1, l, r, l + r, f))
        for w, pieces in segs.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == l
                    and pieces[i + 1] == r
                ):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            segs[w] = out
    return merges


def ref_greedy_count(word: str, vocab: set[str]) -> int:
    """Greedy longest-match segment count (the extensions/bpe.py walk
    semantics: longest vocab piece at each position, default 1)."""
    i, cnt = 0, 0
    while i < len(word):
        step = 1
        for l in range(min(MAX_PIECE_LEN, len(word) - i), 0, -1):
            if word[i : i + l] in vocab:
                step = l
                break
        i += step
        cnt += 1
    return cnt


def test_trainer_matches_python_reference(spark, tmp_path):
    """Handcrafted corpus exercising overlap counting ('aaaa' has
    THREE (a,a) positions), frequency ties broken by pair strings,
    and chained merges (merged pieces re-merging in later rounds)."""
    texts = [
        "aaaa banana banana bandana",
        "aaaa cacao cacao cacao banana",
        "dede dede fefe",
    ]
    _write_docs(spark, tmp_path, texts)
    got = [
        (r.merge_round, r.pair_left, r.pair_right, r.merged, r.freq)
        for r in bpe_train_merges(spark, str(tmp_path)).collect()
    ]
    words: Counter = Counter(
        w for t in texts for w in t.split(" ") if w
    )
    want = ref_bpe(dict(words), _BPE_ROUNDS, MAX_PIECE_LEN)
    assert got == want
    # the fixture must actually exercise >1 round and a chained merge
    assert len(got) >= 6
    assert any(len(m[3]) >= 3 for m in got)


def test_bounded_equals_unbounded_on_shipped_corpus(spark, sf_dir):
    """On the shipped testdata the MAX_PIECE_LEN cap never binds: the
    bounded-piece trainer IS textbook unbounded BPE there (the module
    docstring's pinned claim), and the engine matches the independent
    Python replay of the real corpus end to end."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    words: Counter = Counter(
        w for r in docs for w in r.text.split(" ") if w
    )
    unbounded = ref_bpe(dict(words), _BPE_ROUNDS, None)
    capped = ref_bpe(dict(words), _BPE_ROUNDS, MAX_PIECE_LEN)
    assert unbounded == capped
    got = [
        (r.merge_round, r.pair_left, r.pair_right, r.merged, r.freq)
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    assert got == unbounded


def test_learned_table_drops_into_greedy_walk(spark, tmp_path):
    """The learned merges + corpus alphabet form a (piece, piece_len)
    table the extensions/bpe.py walk consumes UNCHANGED — per-word
    token counts must equal the pure-Python greedy longest-match over
    the same vocab (the VERDICT r9 drop-in contract)."""
    texts = [
        "interlinked interlinked linked links",
        "banana bandana bananas",
        "aaaa aaaa aa",
    ]
    _write_docs(spark, tmp_path, texts)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    learned = train_merges(words, 10)
    chars = docs.select(
        F.explode(F.split(F.regexp_replace("text", " ", ""), "")).alias(
            "piece"
        )
    ).distinct()
    vocab = (
        learned.select(F.col("merged").alias("piece"))
        .unionByName(chars)
        .distinct()
        .select("piece", F.length("piece").alias("piece_len"))
    )
    got = {
        r.word: r.n_bpe for r in word_tokens(docs, vocab).collect()
    }
    vocab_py = {r.piece for r in vocab.collect()}
    assert all(len(p) <= MAX_PIECE_LEN for p in vocab_py)
    want = {
        w: ref_greedy_count(w, vocab_py)
        for w in {x for t in texts for x in t.split(" ") if x}
    }
    assert got == want
    # sanity: the merges actually compress — some word tokenizes to
    # fewer pieces than its character count
    assert any(got[w] < len(w) for w in got)
