"""Real-BPE trainer + encoder: hand-computed merge fixtures (BPE has no
SQL oracle — merge order is inherently iterative — so exactness is
pinned here and the driver entry is rows-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import tokenize
from sql_to_ibis_spark.operators.tokenize import (
    _encode_word,
    _train_from_histogram,
    bpe_encode,
    bpe_token_count,
    train_bpe_merges,
    word_histogram,
)


def test_train_hand_computed():
    # histogram: "low" x5, "lower" x2, "newest" x6, "widest" x3
    # pair counts round 1: es 9, st 9, we 8(2 lower + 6 newest), ...
    # tie es/st at 9 -> lexicographic picks ("e","s"); then ("es","t") 9.
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _train_from_histogram(hist, 2)
    assert merges == [("e", "s"), ("es", "t")]
    # third merge: lo 7 (low 5 + lower 2) beats ne/ew/west variants (6)
    merges = _train_from_histogram(hist, 3)
    assert merges[2] == ("l", "o")


def test_encode_word_rank_order():
    # ranks: (e,s) then (es,t) then (l,o) then (lo,w)
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2, ("lo", "w"): 3}
    cache = {}
    assert _encode_word("newest", ranks, cache) == ["n", "e", "w", "est"]
    assert _encode_word("lowest", ranks, cache) == ["low", "est"]
    assert _encode_word("low", ranks, cache) == ["low"]
    assert _encode_word("xyz", ranks, cache) == ["x", "y", "z"]
    # memo: same object returned for a repeated word
    assert _encode_word("lowest", ranks, cache) is cache["lowest"]


def test_encode_merges_all_occurrences():
    # one merge (a,b): every non-overlapping occurrence merges in one pass
    assert _encode_word("ababab", {("a", "b"): 0}, {}) == ["ab"] * 3
    assert _encode_word("aaab", {("a", "a"): 0}, {}) == ["aa", "a", "b"]


def test_spark_encode_and_count(spark):
    df = spark.createDataFrame(
        [(1, "newest lowest"), (2, "the newest!"), (3, None)],
        ["doc_id", "text"])
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
              ("t", "h"), ("th", "e")]
    rows = {r["doc_id"]: r["tokens"]
            for r in bpe_encode(df, merges).collect()}
    assert rows[1] == ["n", "e", "w", "est", "low", "est"]
    # punctuation is its own pre-token
    assert rows[2] == ["the", "n", "e", "w", "est", "!"]
    assert rows[3] is None
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_count(df, merges).collect()}
    assert counts == {1: 6, 2: 6, 3: None}


def test_histogram_and_train_on_corpus(spark):
    df = spark.createDataFrame(
        [(i, "aaa bbb aaa") for i in range(10)], ["doc_id", "text"])
    hist = {r["word"]: r["cnt"] for r in word_histogram(df).collect()}
    assert hist == {"aaa": 20, "bbb": 10}
    merges = train_bpe_merges(df, num_merges=2)
    # aa beats bb 20 vs 10; then aa+a (20) beats b pairs (10)
    assert merges == [("a", "a"), ("aa", "a")]


def test_fewer_tokens_than_chars_on_real_corpus(spark, engine):
    docs = (engine.catalog.get("documents").df
            .filter(F.col("text").isNotNull() & (F.length("text") > 0))
            .select("doc_id", "text"))
    merges = train_bpe_merges(docs.limit(200), num_merges=50,
                              max_words=5000)
    assert len(merges) == 50
    out = (bpe_token_count(docs.limit(50), merges)
           .join(docs.select("doc_id",
                             F.length("text").alias("n_chars")),
                 "doc_id"))
    bad = out.filter(F.col("n_bpe_tokens") >= F.col("n_chars")).count()
    assert bad == 0  # merges genuinely compress vs character count
    # encode is deterministic: same merges, same result hash
    a = sorted(map(tuple, bpe_encode(docs.limit(50), merges).collect()))
    b = sorted(map(tuple, bpe_encode(docs.limit(50), merges).collect()))
    assert a == b


def test_encode_ids_roundtrip(spark):
    from sql_to_ibis_spark.operators.tokenize import (UNK_ID, bpe_encode_ids,
                                                      bpe_vocab)

    merges = [("e", "s"), ("es", "t")]
    vocab = bpe_vocab(merges)
    assert vocab["es"] == 257 and vocab["est"] == 258
    assert vocab["e"] == ord("e")
    df = spark.createDataFrame([(1, "test"), (2, "café"), (3, None)],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r["token_ids"]
            for r in bpe_encode_ids(df, merges).collect()}
    assert rows[1] == [ord("t"), 258]           # t + est
    # é is latin-1 (id 233); the word splits c,a,f,é — no merges apply
    assert rows[2] == [ord("c"), ord("a"), ord("f"), 233]
    assert rows[3] is None
    # a genuinely non-latin-1 char maps to UNK
    df2 = spark.createDataFrame([(1, "日")], ["doc_id", "text"])
    assert bpe_encode_ids(df2, merges).collect()[0]["token_ids"] == [UNK_ID]


# --- property: the incremental pair-index trainer must equal a naive
# recompute-everything reference on arbitrary histograms ---------------

def _train_naive(word_counts, num_merges):
    words = {w: list(w) for w in word_counts if len(w) >= 2}
    merges = []
    for _ in range(num_merges):
        from collections import Counter
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_incremental_trainer_equals_naive():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=8)
    hists = st.dictionaries(word, st.integers(1, 9), min_size=1,
                            max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(hists, st.integers(0, 10))
    def check(hist, n):
        assert _train_from_histogram(dict(hist), n) == \
            _train_naive(dict(hist), n)

    check()


def test_encode_word_equals_sequential_merge_replay():
    # encoding by repeated lowest-rank merge == replaying the merges in
    # training order over the word (the classic equivalence)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=0, max_size=10)
    hists = st.dictionaries(st.text(alphabet="abc", min_size=2,
                                    max_size=6),
                            st.integers(1, 9), min_size=1, max_size=8)

    def replay(w, merges):
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @settings(max_examples=200, deadline=None)
    @given(hists, word)
    def check(hist, w):
        merges = _train_from_histogram(dict(hist), 6)
        ranks = {m: i for i, m in enumerate(merges)}
        assert _encode_word(w, ranks, {}) == replay(w, merges)

    check()


def test_pack_sequences_with_bpe_counts(spark, engine):
    # the pretraining composition: real-BPE counts drive the packer;
    # window math must match a driver-side prefix-sum recompute
    from sql_to_ibis_spark.operators import text as text_ops

    docs = (engine.catalog.get("documents").df
            .filter(F.col("text").isNotNull())
            .select("doc_id", "text").limit(100))
    merges = train_bpe_merges(docs, num_merges=30, max_words=2000)
    counts = (bpe_token_count(docs, merges)
              .withColumnRenamed("n_bpe_tokens", "n_tokens"))
    packed = {r["doc_id"]: r for r in text_ops.pack_sequences(
        docs, ctx_tokens=64, counts_df=counts).collect()}

    expected_counts = {r["doc_id"]: r["n_tokens"]
                       for r in counts.collect()}
    before = 0
    for doc_id in sorted(expected_counts):
        n = expected_counts[doc_id]
        r = packed[doc_id]
        assert r["n_tokens"] == n
        assert r["start_window"] == before // 64
        assert r["end_window"] == (before + n - 1) // 64
        assert r["offset_in_window"] == before % 64
        before += n
