"""Property-based differentials for the round-7 text operators:
normalize_text against an independent pure-Python model on arbitrary
unicode, and the BPE concatenation invariant on arbitrary words.

Spark round-trips per hypothesis example are expensive, so each
example carries a BATCH of generated strings through one job."""

import re
import string
import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# printable-ish unicode incl. the stripped classes, combining marks
# (NFC composition fodder), CR/LF, and zero-width junk
_nasty = "́̈​‌‍﻿\r\n\t\x00\x07\x1b\x7f"
text_st = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
        st.sampled_from(list(_nasty)),
    ),
    max_size=40,
)

_CTRL_RE = re.compile("[\x00-\x08\x0b-\x1f\x7f​-‍﻿]")


def _py_normalize(v):
    """Independent model of normalize_text(form='NFC'):
    CRLF -> LF, strip the control class, NFC on non-ASCII."""
    if v is None:
        return None
    v = v.replace("\r\n", "\n")
    v = _CTRL_RE.sub("", v)
    if not v.isascii():
        v = unicodedata.normalize("NFC", v)
    return v


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(text_st, min_size=1, max_size=30))
def test_normalize_text_matches_python_model(spark, vals):
    from zeek_duckdb_spark.operators.textops import normalize_text

    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, t string"
    )
    got = {
        r.id: r.n
        for r in d.select("id", normalize_text(F.col("t")).alias("n")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == _py_normalize(v), repr(v)


word_st = st.text(
    alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=12
)


@settings(max_examples=6, deadline=None)
@given(
    corpus=st.lists(word_st, min_size=3, max_size=25),
    probe=st.lists(word_st, min_size=1, max_size=15),
)
def test_bpe_concatenation_invariant(spark, corpus, probe):
    """Merges only concatenate adjacent symbols, so for ANY trained
    model and ANY word (seen or unseen):
    ''.join(encode(word)) == word + '</w>'."""
    from zeek_duckdb_spark.operators.vocab import (
        _bpe_encode_word,
        bpe_train,
    )

    d = spark.createDataFrame([(" ".join(corpus * 2),)], "text string")
    model = bpe_train(d, num_merges=15, min_count=1)
    ranks = {p: i for i, p in enumerate(model.merges)}
    for w in probe + corpus:
        toks = _bpe_encode_word(w, ranks)
        assert "".join(toks) == w + "</w>", (w, toks)
        assert all(toks), w  # no empty symbols
