"""Result snippets: highlight matched terms in the raw transcript text.

The reference API returns whole descriptions with no match context
(``src/api.py:424-466`` ships the full row back); a lexical engine can do
better — the query knows exactly WHICH terms matched.  Contract:

  * tokens are located in the RAW text (``[a-z0-9]+`` runs, case
    insensitive) so snippet offsets are exact; each raw token is matched
    by its NORMALIZED form (shared pipeline: lowercase / contractions /
    accent fold), so a query term ``cafe`` highlights ``Café`` — the same
    equivalence the index itself applied at build time;
  * the snippet is the densest window: the ``window``-char span covering
    the most matched tokens (ties → earliest), snapped to token
    boundaries, with ``...`` ellipses marking truncation;
  * matched tokens inside the window are wrapped in ``pre``/``post``
    tags (default ``**`` / ``**`` — terminal-friendly markdown);
  * deterministic: same text + same term set → same snippet.

Scale shape: snippets attach AFTER ranking, on the bucket-pruned doc_map
probe of engine.search (≤ pages·k rows) — one ``mapInPandas`` pass whose
per-batch cost is O(total tokens of k docs).  The full corpus is never
re-read, and nothing here touches the scoring hot path.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anisearch_model_spark.functions.normalize import normalize_series
from anisearch_model_spark.query.engine import IndexStore

# raw-text tokens must admit the characters normalization would FOLD
# (accents, case) — [^\W_]+ is the unicode word-char run; each raw token
# then normalizes to the _TOKEN_RE alphabet for the term comparison
_RAW_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def make_snippet(text: str, terms: set[str], window: int = 160,
                 pre: str = "**", post: str = "**") -> str:
    """One document's snippet (driver-callable; the distributed path
    batches the normalization — see ``attach_snippets``)."""
    out = _snippet_batch(pd.Series([text]), terms, window, pre, post)
    return out.iloc[0]


def _snippet_batch(texts: pd.Series, terms: set[str], window: int,
                   pre: str, post: str) -> pd.Series:
    """Vectorized core: ONE ``normalize_series`` call covers every raw
    token of the batch; the window/wrap pass is pure-python over the
    (small) per-doc span lists."""
    texts = texts.fillna("").astype(str)
    spans_per_doc: list[list[tuple[int, int, str]]] = [
        [(m.start(), m.end(), m.group()) for m in _RAW_TOKEN_RE.finditer(t)]
        for t in texts
    ]
    flat = [s[2] for spans in spans_per_doc for s in spans]
    if flat:
        norm = normalize_series(pd.Series(flat)).tolist()
    else:
        norm = []
    out = []
    i = 0
    for t, spans in zip(texts, spans_per_doc):
        n = len(spans)
        doc_norm = norm[i: i + n]
        i += n
        matched = [
            j for j in range(n) if doc_norm[j] and doc_norm[j] in terms
        ]
        if not matched:
            # no match (e.g. caller passed an empty term set): head window
            snip = t[:window]
            out.append(snip + ("..." if len(t) > window else ""))
            continue
        # densest window over match START offsets
        starts = [spans[j][0] for j in matched]
        best_a, best_count = 0, -1
        for a in range(len(starts)):
            count = 0
            for b in range(a, len(starts)):
                if starts[b] <= starts[a] + max(window - 1, 0):
                    count += 1
                else:
                    break
            if count > best_count:
                best_a, best_count = a, count
        if len(t) <= window:
            w_start, w_end = 0, len(t)
        else:
            # a little leading context before the cluster anchor (scaled
            # down for small windows), clamped so the window budget is
            # fully used, snapped to a token boundary
            ctx = min(30, window // 4)
            w_start = min(max(0, starts[best_a] - ctx), len(t) - window)
            if w_start > 0:
                lead = t.find(" ", w_start, starts[best_a])
                if 0 <= lead < starts[best_a]:
                    w_start = lead + 1
            w_end = min(len(t), w_start + window)
        # wrap matched tokens inside the window, right-to-left
        snip = t[w_start:w_end]
        for j in reversed(matched):
            s, e, _tok = spans[j]
            if s >= w_start and e <= w_end:
                rs, rel_e = s - w_start, e - w_start
                snip = snip[:rs] + pre + snip[rs:rel_e] + post + snip[rel_e:]
        out.append(
            ("..." if w_start > 0 else "") + snip
            + ("..." if w_end < len(t) else "")
        )
    return pd.Series(out, index=texts.index)


def attach_snippets(result: DataFrame, terms: set[str], text_col: str = "text",
                    window: int = 160, pre: str = "**",
                    post: str = "**") -> DataFrame:
    """Add a ``snippet`` column to a result frame that carries the raw
    ``text_col`` — one mapInPandas pass, schema = input + snippet."""
    from pyspark.sql.types import StringType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates in place, and the
    # input frame's schema object must not grow a phantom column
    schema = StructType(
        list(result.schema.fields) + [StructField("snippet", StringType())]
    )
    bterms = set(terms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["snippet"] = _snippet_batch(
                pdf[text_col], bterms, window, pre, post
            )
            yield pdf

    return result.mapInPandas(run, schema=schema)


def search_snippets(index: IndexStore, query_text: str, k: int = 10,
                    field: str | None = None, page: int = 1,
                    pruned: bool = True, window: int = 160,
                    pre: str = "**", post: str = "**") -> DataFrame:
    """engine.search + a ``snippet`` column.  Highlighted terms are the
    RESOLVED query terms (prefix expansions included), so ``he*``
    highlights ``hero`` and ``heart`` alike."""
    from anisearch_model_spark.query.engine import (
        probe_doc_map,
        resolve_query_idf,
        topk_bmw,
        topk_exhaustive,
    )

    scorer = topk_bmw if pruned else topk_exhaustive
    top = scorer(index, query_text, k * page, field=field)
    if page > 1:
        lo, hi = (page - 1) * k, page * k
        top = top.filter((F.col("rank") > lo) & (F.col("rank") <= hi))
    terms = set(resolve_query_idf(index, query_text, field=field))
    top_local, meta = probe_doc_map(
        index, top, ["doc_id", "conv_id", "turn_idx", "role", "text"]
    )
    joined = meta.join(F.broadcast(top_local), "doc_id", "inner")
    with_snip = attach_snippets(joined, terms, window=window,
                                pre=pre, post=post)
    return with_snip.select(
        "rank", "doc_id", "conv_id", "turn_idx", "role", "score", "snippet"
    ).orderBy("rank")
