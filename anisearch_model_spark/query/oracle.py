"""Single-node reference BM25 engine — the oracle that DEFINES the ranking
contract (SURVEY.md §2.5 "rank-identity contract").

This is our stand-in for the reference's single-node scorer
(``src/test.py:140-218``: encode query → per-column cosine → per-column
top-k → merge → dedup → rank).  Pure pandas/NumPy, float64, exhaustive —
no pruning — so it is the ground truth the distributed engine must
reproduce exactly:

  * per-(term, doc) partial score computed by the SAME
    ``bm25_term_score`` kernel the Spark engine uses;
  * per-doc total = sum of partials in ASCENDING TERM ORDER (fixed
    float64 summation order — the distributed engine sorts the same way
    before folding, so scores are bit-identical, not merely close);
  * ordering: score DESC, doc_id ASC (explicit tie-break replacing the
    reference's reliance on stable-sort emission order, src/api.py:345-349);
  * rank: dense 1-based in emission order (src/api.py:448).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from anisearch_model_spark.config import BM25Params
from anisearch_model_spark.functions.normalize import (
    bm25_idf,
    bm25_term_score,
    tokenize_series,
    term_frequency_frame,
)


class OracleIndex:
    """In-memory inverted index over a small corpus (doc_id, text)."""

    def __init__(self, corpus: pd.DataFrame, params: BM25Params | None = None):
        """corpus: DataFrame with columns doc_id (int64, unique), text."""
        self.params = params or BM25Params()
        corpus = corpus.reset_index(drop=True)
        tf = term_frequency_frame(corpus["doc_id"], corpus["text"])
        toks = tokenize_series(corpus["text"])
        self.doc_len = pd.Series(
            toks.str.len().to_numpy(dtype="int64"), index=corpus["doc_id"].to_numpy()
        )
        self.n_docs = int(len(corpus))
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0
        self.postings = tf  # columns: doc_id, term, tf, doc_len
        self.df = tf.groupby("term")["doc_id"].nunique()
        # kept-token streams for the phrase oracle (positions are indices
        # into the post-stopword stream — the positional-index contract)
        self.tokens = dict(zip(corpus["doc_id"].to_numpy(), toks))

    def query_terms(self, query_text: str) -> list[str]:
        """Tokenize a query with the shared contract; SORTED UNIQUE terms.

        Sorting fixes the float summation order; duplicate query terms do
        not re-weight (matching standard BM25 with binary query tf).
        """
        toks = tokenize_series(pd.Series([query_text])).iloc[0]
        return sorted(set(toks))

    def score(self, query_text: str) -> pd.DataFrame:
        """Exhaustive scores for all matching docs → (doc_id, score)."""
        terms = [t for t in self.query_terms(query_text) if t in self.df.index]
        if not terms or self.avgdl == 0.0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        k1, b = self.params.k1, self.params.b
        per_doc: dict[int, float] = {}
        for t in terms:  # ascending term order — fixed summation order
            plist = self.postings[self.postings["term"] == t]
            idf = bm25_idf(np.array([self.df[t]]), self.n_docs)[0]
            partial = bm25_term_score(
                plist["tf"].to_numpy(),
                plist["doc_len"].to_numpy(),
                np.full(len(plist), idf),
                self.avgdl,
                k1,
                b,
            )
            for d, s in zip(plist["doc_id"].to_numpy(), partial):
                per_doc[int(d)] = per_doc.get(int(d), 0.0) + float(s)
        out = pd.DataFrame(
            {"doc_id": list(per_doc.keys()), "score": list(per_doc.values())}
        )
        return out.astype({"doc_id": "int64", "score": "float64"})

    def phrase_topk(self, phrase_text: str, k: int = 10,
                    slop: int = 0) -> pd.DataFrame:
        """Ground truth for the distributed phrase scorer
        (query/phrase.py): naive O(corpus) sliding-window phrase count
        per doc, BM25 of the phrase as a single virtual term (df =
        matching docs, tf = occurrence count), (score DESC, doc_id ASC),
        dense 1-based rank.  ``slop`` relaxes to in-order chains with
        each consecutive gap in [1, 1 + slop]; tf = distinct chain-start
        positions (the distributed kernel's contract)."""
        terms = list(tokenize_series(pd.Series([phrase_text])).iloc[0])
        empty = pd.DataFrame({
            "rank": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        })
        if not terms or self.avgdl == 0.0:
            return empty
        m = len(terms)

        def chain_from(toks: list[str], i: int, j: int) -> bool:
            if j == m - 1:
                return True
            for g in range(1, slop + 2):
                if i + g < len(toks) and toks[i + g] == terms[j + 1] \
                        and chain_from(toks, i + g, j + 1):
                    return True
            return False

        hits: dict[int, int] = {}
        for doc_id, toks in self.tokens.items():
            if slop == 0:
                c = sum(
                    1 for i in range(len(toks) - m + 1)
                    if toks[i: i + m] == terms
                )
            else:
                c = sum(
                    1 for i in range(len(toks))
                    if toks[i] == terms[0] and chain_from(toks, i, 0)
                )
            if c:
                hits[int(doc_id)] = c
        if not hits:
            return empty
        df = len(hits)
        idf = bm25_idf(np.array([df]), self.n_docs)[0]
        doc_ids = np.fromiter(hits.keys(), dtype="int64")
        ptf = np.fromiter(hits.values(), dtype="int64")
        dl = self.doc_len.loc[doc_ids].to_numpy(dtype="int64")
        score = bm25_term_score(
            ptf, dl, np.full(len(ptf), idf), self.avgdl,
            self.params.k1, self.params.b,
        )
        out = pd.DataFrame({"doc_id": doc_ids, "score": score}).sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k).reset_index(drop=True)
        out.insert(0, "rank", np.arange(1, len(out) + 1, dtype="int64"))
        return out.astype({"doc_id": "int64", "score": "float64"})

    def topk(self, query_text: str, k: int = 10) -> pd.DataFrame:
        """(rank, doc_id, score) — score DESC, doc_id ASC, rank dense 1-based."""
        scored = self.score(query_text)
        scored = scored.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        scored = scored.reset_index(drop=True)
        scored.insert(0, "rank", np.arange(1, len(scored) + 1, dtype="int64"))
        return scored
