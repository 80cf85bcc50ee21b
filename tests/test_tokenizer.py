"""Tokenizer-contract unit tests (SURVEY.md §5 test style 1: tiny inline
frames against the reference pipeline semantics, src/common.py:45-101)."""

import pandas as pd

from anisearch_model_spark.functions.normalize import (
    normalize_series,
    term_frequency_frame,
    tokenize_series,
)


def norm1(s: str) -> str:
    return normalize_series(pd.Series([s])).iloc[0]


def tok1(s) -> list:
    return tokenize_series(pd.Series([s])).iloc[0]


def test_strip_and_lower():
    assert norm1("  Hello WORLD  ") == "hello world"


def test_contractions():
    assert tok1("can't won't stop") == ["cannot", "stop"]


def test_accent_folding():
    assert tok1("café naïve résumé") == ["cafe", "naive", "resume"]


def test_whitespace_collapse():
    assert norm1("a   b\t\tc\nd") == "a b c d"


def test_wrapping_quotes_unwrapped():
    assert norm1('"quoted text"') == "quoted text"
    assert norm1("'single quoted'") == "single quoted"
    # asymmetric quotes stay
    assert norm1('"asym') == '"asym'


def test_url_removal():
    toks = tok1("visit http://x.com/page and www.y.org today")
    assert "http" not in " ".join(toks) and toks[-1] == "today"


def test_boilerplate_removal():
    assert tok1("Good story. [Written by MAL Rewrite] junk") == ["good", "story"]
    assert tok1("Intro (source: wiki) trailing") == ["intro"]


def test_stopwords_removed():
    assert tok1("the and of a an") == []


def test_null_and_empty():
    s = tokenize_series(pd.Series([None, "", "   "]))
    assert s.tolist() == [[], [], []]


def test_term_frequency_frame_counts():
    tf = term_frequency_frame(pd.Series([7]), pd.Series(["dog dog cat"]))
    got = {r.term: r.tf for r in tf.itertuples()}
    assert got == {"dog": 2, "cat": 1}
    assert set(tf["doc_len"]) == {3}


def test_term_frequency_empty_batch():
    tf = term_frequency_frame(pd.Series([], dtype="int64"), pd.Series([], dtype=object))
    assert list(tf.columns) == ["doc_id", "term", "tf", "doc_len"]
    assert len(tf) == 0
