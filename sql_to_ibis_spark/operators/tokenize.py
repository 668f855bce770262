"""Real byte-pair-encoding over the corpus: a histogram-based trainer
plus an Arrow-batched encoder (the merges-driven upgrade of
``text.bpe_ish_token_count``'s regex estimator).

Scale design, following the original BPE recipe (Sennrich et al. 2016,
public): training operates on the WORD-FREQUENCY HISTOGRAM, not the
corpus — Spark reduces the corpus to (word, count) with one
pre-tokenize + groupBy pass (the only distributed step; linear, one
shuffle), the driver keeps only the top ``max_words`` entries
(bounded: the histogram head carries almost all pair mass), and merge
selection runs locally over that bounded dict with an incremental
pair-count index. At 100 TB the histogram pass is the same shape as
every word-count job; driver state stays O(max_words).

Encoding is embarrassingly parallel: merges broadcast as a rank dict,
``mapInPandas`` applies them per pre-token with a WORD-LEVEL memo
cache per batch — natural text repeats words heavily, so the merge
loop runs once per distinct word per batch, not once per occurrence.
No SQL oracle exists for BPE (merge order is inherently iterative),
so the driver entry is rows-only and exactness is pinned by
hand-computed fixtures in tests/test_tokenize.py.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the same pre-tokenizer family as text.bpe_ish_token_count: words /
# number runs / punctuation runs (whitespace separates, never tokens).
# Whitespace is an EXPLICIT class (the Unicode White_Space set), not
# `\s`: training pre-tokenizes on the JVM (Java regex, where \s is
# ASCII-only) while encoding pre-tokenizes with Python re (unicode \s),
# and the r14 ADVICE found the two split differently around e.g. U+00A0
# — merges trained on one token stream, applied to another. One literal
# class means Java, Python, and the DuckDB/RE2 oracle all agree by
# construction.
_WS_CLASS = ("\t\n\x0b\x0c\r \x85\xa0\u1680"
             "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000")
_PRETOKEN_PATTERN = (
    f"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_WS_CLASS}]+")
_PRETOKEN_RE = re.compile(_PRETOKEN_PATTERN)
_PRETOKEN_SQL = _PRETOKEN_PATTERN


def word_histogram(df: DataFrame, text_col: str = "text",
                   lowercase: bool = True) -> DataFrame:
    """(word, count) over the pre-tokenized corpus — ONE JVM-side
    regexp_extract_all + explode + groupBy; the only distributed step
    of BPE training."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(
            F.regexp_extract_all(t, F.lit(_PRETOKEN_SQL), 0)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _train_from_histogram(word_counts: dict[str, int],
                          num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge selection over a word histogram with an
    incremental pair index: each round merges the most frequent
    adjacent symbol pair (ties broken lexicographically — training is
    DETERMINISTIC for a given histogram), updating only the words that
    contain it."""
    words: dict[str, list[str]] = {
        w: list(w) for w in word_counts if len(w) >= 2}
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for w, syms in words.items():
        c = word_counts[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            pair_words[p].add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(p, n) for p, n in pair_counts.items() if n > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w in list(pair_words[best]):
            syms = words[w]
            c = word_counts[w]
            # retract this word's old pair contributions
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(w)
            # apply the merge left-to-right, then re-add contributions
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += c
                pair_words[p].add(w)
    return merges


def train_bpe_merges(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed histogram pass + local merge selection (see module
    docstring for why this is the scale-correct split). Returns the
    ordered merge list — pass it to :func:`bpe_encode` /
    :func:`bpe_token_count`."""
    head = (word_histogram(df, text_col=text_col, lowercase=lowercase)
            .orderBy(F.col("cnt").desc(), F.col("word"))
            .limit(max_words).collect())
    return _train_from_histogram({r["word"]: r["cnt"] for r in head},
                                 num_merges)


def _encode_word(word: str, ranks: dict[tuple, int],
                 cache: dict[str, list[str]]) -> list[str]:
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        joined = best_pair[0] + best_pair[1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best_pair:
                out.append(joined)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode each document with the trained merges: pre-tokenize,
    then apply merges per pre-token in rank order (lowest first),
    exactly the GPT-2-style encode loop. ``mapInPandas`` with the
    merges broadcast in the closure (a rank dict of a few hundred kB)
    and a per-batch word memo — the merge loop runs once per DISTINCT
    word per batch. Null text encodes to null."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = T.StructType([
        df.schema[id_col],
        T.StructField(out_col, T.ArrayType(T.StringType())),
    ])
    id_name = id_col
    text_name = text_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in _PRETOKEN_RE.findall(text):
                out.extend(_encode_word(w, ranks, cache))
            return out

        for pdf in batches:
            yield pd.DataFrame({
                id_name: pdf[id_name],
                out_col: pdf[text_name].map(enc),
            })

    return df.select(id_name, text_name).mapInPandas(run, schema)


def bpe_token_count(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document real-BPE token count: ``size(bpe_encode(...))``
    (null text counts null, mirroring the estimator's null handling)."""
    enc = bpe_encode(df, merges, text_col=text_col, id_col=id_col,
                     lowercase=lowercase)
    return enc.select(
        F.col(id_col),
        # explicit null guard: size(NULL) is -1 under legacy configs
        F.when(F.col("tokens").isNull(), F.lit(None))
        .otherwise(F.size("tokens")).cast("bigint").alias("n_bpe_tokens"))


def bpe_vocab(merges: Iterable[tuple[str, str]]) -> dict[str, int]:
    """Deterministic token→id map for a merge list: ids 0–255 are the
    single bytes/chars (latin-1 order, the fixed base alphabet), then
    one id per merge product in rank order — exactly how merge-based
    vocabs are laid out in practice. Unknown non-latin-1 single chars
    fall back at encode time to :data:`UNK_ID` (id 256; merge products
    start at 257)."""
    vocab = {chr(i): i for i in range(256)}
    nxt = 257  # 256 is UNK
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = nxt
            nxt += 1
    return vocab


UNK_ID = 256


def bpe_encode_ids(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "token_ids",
    lowercase: bool = True,
) -> DataFrame:
    """:func:`bpe_encode`, mapped through :func:`bpe_vocab` to int ids
    (``array<int>``; unknown single chars → :data:`UNK_ID`). Same
    mapInPandas batch shape — the id lookup is one dict get per token."""
    merges = list(merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)
    schema = T.StructType([
        df.schema[id_col],
        T.StructField(out_col, T.ArrayType(T.IntegerType())),
    ])
    id_name, text_name = id_col, text_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            if lowercase:
                text = text.lower()
            out: list[int] = []
            for w in _PRETOKEN_RE.findall(text):
                out.extend(vocab.get(t, UNK_ID)
                           for t in _encode_word(w, ranks, cache))
            return out

        for pdf in batches:
            yield pd.DataFrame({
                id_name: pdf[id_name],
                out_col: pdf[text_name].map(enc),
            })

    return df.select(id_name, text_name).mapInPandas(run, schema)
