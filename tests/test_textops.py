"""Unit tests for textops repetition signals (the other textops are
oracle-checked end-to-end via tests/test_entry_oracle.py)."""

import pytest

from zeek_duckdb_spark.operators.textops import repetition_features


@pytest.fixture(scope="module")
def rep(spark):
    df = spark.createDataFrame(
        [
            (1, "a b\nc d\na b\nx"),       # 'a b' line duplicated
            (2, "one two one two one"),    # bigram tie: 'one two' vs 'two one'
            (3, ""),                       # empty text
            (4, "solo"),                   # one token: no bigrams
            (5, "z\nz\nz"),                # all lines identical
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in repetition_features(df).collect()}


def test_dup_line_ratio(rep):
    assert rep[1].n_lines == 4
    assert rep[1].dup_line_ratio == pytest.approx(0.25)      # 4 lines, 3 distinct
    assert rep[5].dup_line_ratio == pytest.approx(2 / 3)     # 3 lines, 1 distinct
    assert rep[2].dup_line_ratio == 0.0


def test_dup_line_char_ratio(rep):
    # doc 1: the two 'a b' occurrences = 6 of 13 chars
    assert rep[1].dup_line_char_ratio == pytest.approx(6 / 13, abs=1e-6)
    # doc 5: every char is in a duplicated line ('\n' separators excluded)
    assert rep[5].dup_line_char_ratio == pytest.approx(3 / 5, abs=1e-6)
    assert rep[3].dup_line_char_ratio == 0.0


def test_top_bigram_tie_breaks_lexicographically(rep):
    # 'one two' and 'two one' both occur twice; smallest gram wins:
    # 2 * len('one two') / 19 chars
    assert rep[2].top_bigram_ratio == pytest.approx(14 / 19, abs=1e-6)


def test_degenerate_docs(rep):
    assert rep[3].top_bigram_ratio == 0.0   # empty text
    assert rep[4].top_bigram_ratio == 0.0   # single token, no bigrams
    assert rep[4].dup_line_ratio == 0.0


def test_row_count_preserved(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i}") for i in range(50)], "doc_id long, text string"
    )
    assert repetition_features(df).count() == 50
