"""Train/test decontamination: flag training documents that share an
n-gram with an evaluation/benchmark set.

The GPT-3 appendix-C rule (Brown et al. 2020; tightened by PaLM and
Llama): any training document containing an exact n-gram (13-gram there)
that also appears in a benchmark is contaminated and must be dropped or
audited — near-dedup (operators/dedup.py) does NOT subsume this, because
one shared sentence in a 10-page document never clears a Jaccard
threshold but still leaks the benchmark answer.

Scale shape: the benchmark side is tiny relative to the corpus (10⁴-10⁶
grams), so its distinct gram-hash set BROADCASTS and the flagging join
is map-side against the exploded corpus grams — ZERO shuffle of corpus
data; cost is one tokenize+gram pass over the training side.  Grams are
md5-hashed before the join so the broadcast and the join keys are
fixed-width instead of full n-gram text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hashes(df: DataFrame, text_col: str, n: int,
                 out_col: str) -> DataFrame:
    """(id cols…, gram md5) — lower/trim/whitespace tokens, sliding
    n-grams, hashed; distinct within-document via array_distinct before
    the explode so a repeated sentence inside one doc costs one row."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    # guard: sequence(1, 0) DESCENDS in Spark, so a doc shorter than n
    # tokens must short-circuit to an empty gram array
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n)))
    )
    return df.withColumn(out_col, F.explode(F.array_distinct(grams)))


def flag_contaminated(train: DataFrame, bench: DataFrame,
                      n: int = 13, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """ids of ``train`` documents sharing any exact ``n``-gram with any
    ``bench`` text (bench needs a ``text`` column; its id is irrelevant).

    Returns a one-column DataFrame (``id_col``) of contaminated ids —
    compose with ``left_anti`` to scrub, or join back for an audit
    sample.  The bench gram set is broadcast: the corpus-side relation
    never shuffles.
    """
    bench_grams = (
        _gram_hashes(bench.select(F.col(text_col)), text_col, n, "gram")
        .select("gram").distinct()
    )
    train_grams = _gram_hashes(
        train.select(id_col, text_col), text_col, n, "gram"
    ).select(id_col, "gram")
    return (
        train_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col).distinct()
    )
