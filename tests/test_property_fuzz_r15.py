"""Property-based differential testing over the r15 surfaces: the
binned batch path of interval_join (randomized timestamps/keys/offsets
vs the plain range-residual join) and the unified BPE pre-tokenizer
(JVM regexp_extract_all histogram vs the Python encoder regex on
randomized unicode text, including every whitespace codepoint in the
shared class)."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(max_examples=15, deadline=None,
                suppress_health_check=[
                    HealthCheck.too_slow,
                    HealthCheck.function_scoped_fixture])

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

OFFSETS = [("-30 minutes", "0 seconds"), ("0 seconds", "45 minutes"),
           ("-2 hours", "-1 hour"), ("-10 minutes", "10 minutes"),
           ("-1 hour", "1 hour")]


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 5),            # key
                  st.integers(-7200, 7200),     # seconds from BASE
                  st.integers(0, 999999)),      # micros
        min_size=1, max_size=25),
    rrows=st.lists(
        st.tuples(st.integers(0, 5),
                  st.integers(-7200, 7200),
                  st.integers(0, 999999)),
        min_size=1, max_size=25),
    off=st.sampled_from(OFFSETS),
)
@FUZZ
def test_binned_interval_join_equals_plain_random(spark, lrows, rrows,
                                                  off):
    from sql_to_ibis_spark.streaming import interval_join

    def frame(rows):
        data = [(i, BASE + dt.timedelta(seconds=s, microseconds=us), k)
                for i, (k, s, us) in enumerate(rows)]
        return spark.createDataFrame(data, ["event_id", "ts", "user_id"])

    left, right = frame(lrows), frame(rrows)
    lo, hi = off

    def rows_of(bin_join):
        return sorted(map(tuple, interval_join(
            left, right, by="user_id",
            lower_offset=lo, upper_offset=hi,
            bin_join=bin_join).collect()))

    assert rows_of(True) == rows_of(False)


# every codepoint of the shared whitespace class, plus neighbors that
# must NOT be treated as whitespace by either engine
WS_PROBE = ("\t\n\x0b\x0c\r \x85\xa0\u1680\u2000\u2005"
            "\u200a\u2028\u2029\u202f\u205f\u3000")
NON_WS_PROBE = "\u200b\u2060\ufeff\xad"   # zero-width/soft — NOT ws

TEXT_ALPHABET = st.sampled_from(
    list("abcZ09,.!?-_()[]{}#@é漢字" + WS_PROBE + NON_WS_PROBE))


@given(texts=st.lists(st.text(TEXT_ALPHABET, max_size=40),
                      min_size=1, max_size=8))
@FUZZ
def test_pretokenizer_jvm_equals_python_random(spark, texts):
    from sql_to_ibis_spark.operators.tokenize import (
        _PRETOKEN_RE, word_histogram)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    jvm = {(r["word"], r["cnt"])
           for r in word_histogram(df, lowercase=False).collect()}
    py = Counter(w for t in texts for w in _PRETOKEN_RE.findall(t))
    assert jvm == set(py.items())
