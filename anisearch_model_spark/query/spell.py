"""Did-you-mean spell correction over the index dictionary.

Lucene's ``DirectSpellChecker`` analog: a query term that matches
NOTHING in the dictionary gets replacement candidates ranked by
(edit distance ASC, df DESC, term ASC) — closest spelling first, ties
broken toward the more common word, exactly the ranking a "did you
mean" banner wants (fuzzy search, query/engine.py::expand_fuzzy, ranks
by df alone because there ALL candidates score; here the user asked for
one term and we propose the likeliest intended one).

The reference has no lexical vocabulary to check against (dense
encoder, ``/root/reference/src/sbert.py``); this engine's dictionary
makes misspelling detection a bounded filtered scan: length-difference
prefilter + JVM-side ``levenshtein`` (whole-stage codegen), collect
capped at ``n`` rows per unknown term — never a vocabulary load.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def did_you_mean(index, query_text: str, field: str | None = None,
                 max_edits: int = 2, n: int = 3) -> dict:
    """Spell-check a query against the dictionary.

    Returns ``{"query": <corrected>, "changed": bool, "suggestions":
    {unknown_term: [{"term", "df", "distance"}, ...]}}`` — terms that
    match the dictionary pass through untouched; each unknown term is
    replaced in the corrected query by its top suggestion (or kept
    verbatim if nothing lies within ``max_edits``).
    """
    import pandas as pd

    from anisearch_model_spark.functions.normalize import tokenize_series
    from anisearch_model_spark.query.engine import (
        MAX_QUERY_CHARS, IndexStore)

    assert isinstance(index, IndexStore)
    if query_text is None or len(query_text) > MAX_QUERY_CHARS:
        raise ValueError(
            f"query must be a string of <= {MAX_QUERY_CHARS} chars")
    # order-preserving tokenize (parse_query sorts — fine for scoring,
    # wrong for a corrected query echoed back to the user)
    terms = list(tokenize_series(pd.Series([query_text])).iloc[0])
    if not terms:
        return {"query": "", "changed": False, "suggestions": {}}
    dfs = index.term_dfs(sorted(set(terms)), field=field)
    unknown = sorted(t for t in set(terms) if not dfs.get(t))
    suggestions: dict[str, list[dict]] = {}
    for t in unknown:
        # distance computed ONCE per dictionary row (it dominates the
        # scan cost), filtered, then aggregated across fields
        d = index.dictionary.filter(
            F.abs(F.length(F.col("term")) - len(t)) <= max_edits)
        if field is not None:
            d = d.filter(F.col("field") == field)
        rows = (
            d.withColumn("distance",
                         F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("distance") <= max_edits)
            .groupBy("term").agg(F.sum("df").alias("df"),
                                 F.min("distance").alias("distance"))
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .limit(n)
            .collect()
        )
        suggestions[t] = [
            {"term": r["term"], "df": int(r["df"]),
             "distance": int(r["distance"])}
            for r in rows
        ]
    best = {t: s[0]["term"] for t, s in suggestions.items() if s}
    corrected = " ".join(best.get(t, t) for t in terms)
    return {
        "query": corrected,
        "changed": bool(best),
        "suggestions": suggestions,
    }
