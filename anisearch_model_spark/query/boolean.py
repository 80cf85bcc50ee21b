"""Boolean BM25 queries: ``+required -prohibited optional`` clauses.

Lucene-classic semantics over the posting index:

  * a matching doc contains EVERY ``+term``, NO ``-term``, and at least
    one scoring term (required terms score too — Lucene's MUST);
  * score = the ordinary BM25 sum over the doc's required + optional
    terms, ascending-term float64 fold — identical to the plain scorers,
    so a boolean query with no +/- clauses ranks exactly like ``search``;
  * a pure-negative query (only ``-`` clauses) matches nothing (Lucene's
    pure-negative contract);
  * ordering: score DESC, doc_id ASC, dense 1-based rank.

Clause markers are QUERY SYNTAX, not text: ``-state-of-the-art`` is the
prohibited stem ``state`` plus literal tokens ``of/the/art`` — exactly
what a ``-`` prefix means to Lucene's classic parser.  Markers bind to
the whitespace token they prefix; the stem then runs through the shared
tokenizer (a multi-token stem contributes ALL its tokens to the clause).

Scale shape: positive terms need ONE postings scan (term-IN pushdown,
field partition pruning) — the required-count filter is a conditional
aggregate over the same partials relation, not a second scan.
Prohibited terms need one more doc-id-only scan, excluded with a
LEFT ANTI join keyed on doc_id — never a broadcast of a posting list (a
hot ``-term`` can own a large share of a 100 TB corpus).  Driver traffic
stays ≤ k result rows + |query terms| dictionary rows.

The reference engine has no boolean operators at all (dense cosine over
whole descriptions, ``src/api.py:270-313``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anisearch_model_spark.config import BM25Params, MAX_QUERY_CHARS
from anisearch_model_spark.functions.windows import constant_partition
from anisearch_model_spark.query.engine import (
    IndexStore,
    _idf_map,
    _partials,
)


def parse_boolean(query_text: str) -> tuple[list[str], list[str], list[str]]:
    """Query string → (required, optional, prohibited) RAW clause stems,
    markers stripped but stems unparsed — a stem may itself be a prefix
    (``bat*``) or fuzzy (``tabel~``) pattern, resolved against the
    dictionary at query time.  A stem appearing under two markers
    resolves required > prohibited > optional (``+x -x x`` is a
    contradiction the caller meant as MUST; Lucene parses it the same
    way: the last explicit marker wins — we pick the strongest)."""
    if query_text is None or len(query_text) > MAX_QUERY_CHARS:
        raise ValueError(f"query must be a string of <= {MAX_QUERY_CHARS} chars")
    req: set[str] = set()
    pro: set[str] = set()
    opt: set[str] = set()
    for w in query_text.split():
        if w.startswith("+") and len(w) > 1:
            req.add(w[1:])
        elif w.startswith("-") and len(w) > 1:
            pro.add(w[1:])
        else:
            opt.add(w)
    pro -= req
    opt -= req | pro
    return sorted(req), sorted(opt), sorted(pro)


def _expand_stem(index: IndexStore, stem: str,
                 field: str | None) -> tuple[list[str], list[list[str]]]:
    """One raw stem → (literal terms, pattern clauses).  Each literal is
    its own AND-able unit; each ``*``/``~`` pattern becomes ONE clause
    whose members are its dictionary expansion (OR within the clause —
    ``+bat*`` means "must contain SOME bat-prefixed term", the Lucene
    multi-term-in-boolean semantics)."""
    from anisearch_model_spark.query.engine import (
        expand_fuzzy,
        expand_prefixes,
        parse_query_terms,
    )

    lits, prefixes, fuzzy = parse_query_terms(stem)
    pattern_clauses: list[list[str]] = []
    for p in prefixes:
        pattern_clauses.append(sorted(expand_prefixes(index, [p], field=field)))
    for fz in fuzzy:
        pattern_clauses.append(sorted(expand_fuzzy(index, [fz], field=field)))
    return lits, pattern_clauses


def _doc_ids_for_terms(index: IndexStore, terms: list[str],
                       field: str | None = None) -> DataFrame:
    """Distinct doc_ids containing ANY of ``terms`` — doc-id-only block
    decode (tf/dl buffers untouched), term-IN + field-partition pruned."""
    blocks = index.postings.filter(F.col("term").isin(terms))
    if field is not None:
        blocks = blocks.filter(F.col("field") == field)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anisearch_model_spark.index.codec import decode_values

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                deltas = decode_values(row.doc_deltas).astype(np.int64)
                ids = np.empty(int(row.n), dtype=np.int64)
                ids[0] = int(row.first_doc_id)
                if len(ids) > 1:
                    ids[1:] = ids[0] + np.cumsum(deltas)
                outs.append(pd.DataFrame({"doc_id": ids}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select("n", "first_doc_id", "doc_deltas").mapInPandas(
        decode, schema="doc_id long"
    ).dropDuplicates(["doc_id"])


def boolean_topk(index: IndexStore, query_text: str, k: int = 10,
                 params: BM25Params | None = None,
                 field: str | None = None) -> DataFrame:
    """Top-k boolean BM25: (rank, doc_id, score).

    Required clauses are satisfied per CLAUSE: a literal stem's tokens
    are each their own clause (all must appear), a pattern stem's
    expansion is one OR-clause (some member must appear).  Satisfaction
    is counted with a broadcast term→clause-ids map folded inside the
    same per-doc aggregate as the score — no extra scan, no join
    duplication (a term in two clauses contributes both ids from ONE
    partial row)."""
    params = params or BM25Params()
    spark = index.spark
    req_stems, opt_stems, pro_stems = parse_boolean(query_text)
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")

    clauses: list[list[str]] = []
    optional: set[str] = set()
    prohibited: set[str] = set()
    for stem in req_stems:
        lits, patterns = _expand_stem(index, stem, field)
        clauses.extend([t] for t in lits)
        clauses.extend(patterns)
    for stem in opt_stems:
        lits, patterns = _expand_stem(index, stem, field)
        optional.update(lits)
        for p in patterns:
            optional.update(p)
    for stem in pro_stems:
        lits, patterns = _expand_stem(index, stem, field)
        prohibited.update(lits)
        for p in patterns:
            prohibited.update(p)

    scoring = sorted({t for c in clauses for t in c} | optional)
    if not scoring:
        return empty  # pure-negative (or empty) query matches nothing
    idf = _idf_map(index, scoring, field=field)
    if not idf:
        return empty
    # a clause with no corpus-present member can never be satisfied
    clauses = [[t for t in c if t in idf] for c in clauses]
    if any(not c for c in clauses):
        return empty

    partials = _partials(index, sorted(idf), idf, params, field=field)
    n_clauses = len(clauses)
    agg = [
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "pscore"))),
            F.lit(0.0),
            lambda acc, x: acc + x["pscore"],
        ).alias("score")
    ]
    if n_clauses:
        term_clauses: dict[str, list[int]] = {}
        for ci, c in enumerate(clauses):
            for t in c:
                term_clauses.setdefault(t, []).append(ci)
        # literal term→array<clause id> map; a term missing from the map
        # yields NULL, which collect_list skips
        cmap = F.map_from_arrays(
            F.array(*[F.lit(t) for t in term_clauses]),
            F.array(*[
                F.array(*[F.lit(i) for i in ids])
                for ids in term_clauses.values()
            ]),
        )
        agg.append(
            F.size(
                F.array_distinct(
                    F.flatten(F.collect_list(cmap[F.col("term")]))
                )
            ).alias("n_sat")
        )
    scored = partials.groupBy("doc_id").agg(*agg)
    if n_clauses:
        scored = scored.filter(F.col("n_sat") == n_clauses).drop("n_sat")
    if prohibited:
        bad = _doc_ids_for_terms(index, sorted(prohibited), field=field)
        scored = scored.join(bad, "doc_id", "left_anti")
    tomb = index.tombstones
    if len(tomb):
        tdf = spark.createDataFrame([(int(t),) for t in tomb], "doc_id long")
        scored = scored.join(F.broadcast(tdf), "doc_id", "left_anti")
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.partitionBy(constant_partition("doc_id")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )


def boolean_search(index: IndexStore, query_text: str, k: int = 10,
                   params: BM25Params | None = None, field: str | None = None,
                   page: int = 1, with_metadata: bool = True) -> DataFrame:
    """Boolean top-k + doc metadata (engine.search's probe contract)."""
    from anisearch_model_spark.query.engine import probe_doc_map

    top = boolean_topk(index, query_text, k * page, params=params, field=field)
    if page > 1:
        lo, hi = (page - 1) * k, page * k
        top = top.filter((F.col("rank") > lo) & (F.col("rank") <= hi))
    if not with_metadata:
        return top
    top_local, meta = probe_doc_map(
        index, top, ["doc_id", "conv_id", "turn_idx", "role"]
    )
    return (
        meta.join(F.broadcast(top_local), "doc_id", "inner")
        .select("rank", "doc_id", "conv_id", "turn_idx", "role", "score")
        .orderBy("rank")
    )
