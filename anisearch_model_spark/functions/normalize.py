"""Text normalization + tokenization — THE shared contract.

This module is the single implementation of the text pipeline used by BOTH
the distributed Spark engine (wrapped in vectorized pandas UDFs) and the
single-node oracle (`query/oracle.py`).  Sharing one function is what makes
"rank-identical to the reference engine" achievable: the reference diverged
between its api path (strip only, ``src/api.py:413``) and its test path
(full normalize, ``src/test.py:153``); we normalize both sides identically.

Pipeline (mirrors reference ``preprocess_text`` at ``src/common.py:45-101``,
steps F1-F9 of SURVEY.md §2.7; lemmatization F10 intentionally dropped from
the contract):

  1. strip surrounding whitespace              (common.py:70)
  2. lowercase                                 (common.py name path :184-199)
  3. expand contractions (frozen table)        (common.py:71)
  4. accent folding: NFKD + drop non-ASCII     (common.py:72, unidecode)
  5. collapse runs of whitespace               (common.py:73-75)
  6. unwrap symmetric wrapping quotes          (common.py:77-80)
  7. remove URLs                               (common.py:81-83)
  8. remove boilerplate tails                  (common.py:85-89)
  9. tokenize on [a-z0-9]+ runs                (common.py:91, stricter)
 10. drop stopwords (frozen list)              (common.py:92)

Everything is pandas ``.str`` ops (C-level, vectorized) — no per-row Python
loops, per the input_hint mandate.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from anisearch_model_spark.config import CONTRACTIONS, STOPWORDS

_CONTRACTION_RE = re.compile(
    "|".join(re.escape(k) for k in sorted(CONTRACTIONS, key=len, reverse=True))
)
_WS_RE = re.compile(r"\s+")
_URL_RE = re.compile(r"http\S+|www\S+|https\S+")
_WRITTEN_BY_RE = re.compile(r"\[written by .*?\].*$", re.DOTALL)
_SOURCE_RE = re.compile(r"\(source:.*?\).*$", re.DOTALL)
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _expand(m: "re.Match[str]") -> str:
    return CONTRACTIONS[m.group(0)]


def normalize_series(s: pd.Series) -> pd.Series:
    """Normalize a Series of raw strings → Series of cleaned strings."""
    s = s.fillna("").astype(str)
    s = s.str.strip()
    s = s.str.lower()
    s = s.str.replace(_CONTRACTION_RE, _expand, regex=True)
    # accent fold: NFKD-decompose then drop anything non-ASCII (combining
    # marks and untransliterable codepoints).
    s = s.str.normalize("NFKD").str.encode("ascii", "ignore").str.decode("ascii")
    s = s.str.replace(_WS_RE, " ", regex=True)
    # unwrap symmetric wrapping quotes (single pass, like the reference)
    quoted = (s.str.startswith('"') & s.str.endswith('"')) | (
        s.str.startswith("'") & s.str.endswith("'")
    )
    quoted &= s.str.len() >= 2
    s = s.where(~quoted, s.str.slice(1, -1))
    s = s.str.replace(_URL_RE, "", regex=True)
    s = s.str.replace(_WRITTEN_BY_RE, "", regex=True)
    s = s.str.replace(_SOURCE_RE, "", regex=True)
    s = s.str.strip()
    return s


def tokenize_series(s: pd.Series) -> pd.Series:
    """Raw strings → Series of token lists (normalized, stopwords removed)."""
    orig_index = s.index
    s = s.reset_index(drop=True)
    norm = normalize_series(s)
    toks = norm.str.findall(_TOKEN_RE)
    if len(toks) == 0:
        toks.index = orig_index
        return toks
    # stopword filter, vectorized via explode/isin rather than per-row loops
    exploded = toks.explode()
    kept = exploded[exploded.notna() & ~exploded.isin(STOPWORDS)]
    grouped = kept.groupby(level=0).agg(list)
    out = grouped.reindex(range(len(toks)))
    out = out.map(lambda v: v if isinstance(v, list) else [])
    out.index = orig_index
    return out


def term_frequency_frame(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized (doc_id, term, tf) + doc_len extraction for a batch.

    Returns a DataFrame with columns ``doc_id, term, tf, doc_len`` where
    ``doc_len`` is the post-stopword token count of the document (repeated
    per term row).  This runs inside ``mapInPandas`` during index build, so
    tf is pre-aggregated map-side before any shuffle.
    """
    toks = tokenize_series(texts)
    lens = toks.str.len().astype("int64")
    frame = pd.DataFrame(
        {"doc_id": doc_ids.to_numpy(), "doc_len": lens.to_numpy(), "_toks": toks.to_numpy()}
    )
    frame = frame.explode("_toks")
    frame = frame[frame["_toks"].notna()]
    if frame.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "term": pd.Series(dtype=object),
                "tf": pd.Series(dtype="int64"),
                "doc_len": pd.Series(dtype="int64"),
            }
        )
    grouped = (
        frame.groupby(["doc_id", "doc_len", "_toks"], sort=False)
        .size()
        .reset_index(name="tf")
        .rename(columns={"_toks": "term"})
    )
    return grouped[["doc_id", "term", "tf", "doc_len"]].astype(
        {"doc_id": "int64", "tf": "int64", "doc_len": "int64"}
    )


def doc_length_series(texts: pd.Series) -> pd.Series:
    """Post-normalization token counts (BM25 ``dl``)."""
    return tokenize_series(texts).str.len().astype("int64")


def bm25_idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Lucene-style non-negative BM25 idf: ln(1 + (N - df + .5)/(df + .5))."""
    df = np.asarray(df, dtype="float64")
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(
    tf: np.ndarray, dl: np.ndarray, idf: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Per-(term, doc) BM25 partial score; float64 throughout.

    Replaces the reference's 1×N cosine kernel (``src/api.py:270-313``).
    """
    tf = np.asarray(tf, dtype="float64")
    dl = np.asarray(dl, dtype="float64")
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return np.asarray(idf, dtype="float64") * tf * (k1 + 1.0) / denom
