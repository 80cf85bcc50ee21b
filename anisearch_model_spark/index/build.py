"""Inverted-index build: tokenize → per-doc tf → bucketed posting blocks.

Reference analog: the index-build stage ``src/sbert.py:154-388`` (per-column
batched SBERT encode → ``np.save``).  Our build replaces dense embeddings
with compressed posting lists and is designed for 10^12 turns:

  * tokenization + per-doc tf happens inside ``mapInPandas`` (Arrow
    batches, map-side pre-aggregation: one (doc,term,tf) row per distinct
    term per doc — never one row per token occurrence);
  * **skew defusal**: a hot term (Zipf head) would make a naive
    ``groupBy(term)`` one-reducer-hot.  We salt by doc-range instead:
    ``bucket = doc_id // span`` and build a mini-index per bucket via
    ``groupBy(bucket).applyInPandas``.  This is the two-level salted
    aggregation of SURVEY.md §4.2 with salt = doc-range: every term's
    postings are split uniformly across buckets, and because buckets are
    disjoint *sorted* docID ranges, the global posting list for a term is
    just the bucket-ascending concatenation of its per-bucket blocks — the
    merge stage is free (no re-sort, no second shuffle of posting data);
  * dictionary df/cf use a plain ``groupBy(term)`` — safe even for hot
    terms because count/sum are combinable (map-side partial agg);
  * the postings table is written ``partitionBy(bucket)`` so a resumable
    re-run plans only missing buckets (see checkpoint.py) and the query
    engine scores bucket-parallel.

Index layout is a pure function of (corpus, num_buckets) — independent of
cluster size, which keeps results rank-identical between N and 4N executors.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anisearch_model_spark.config import (
    BM25Params,
    POSTING_BLOCK_SIZE,
    TOKENIZER_VERSION,
)
from anisearch_model_spark.functions.normalize import term_frequency_frame
from anisearch_model_spark.index.codec import encode_posting_blocks

TF_SCHEMA = "doc_id long, term string, tf long, doc_len long"

POSTINGS_SCHEMA = (
    "term string, bucket int, block_id int, n int, first_doc_id long, "
    "last_doc_id long, max_tf int, min_dl int, doc_deltas binary, "
    "tfs binary, dls binary"
)

DICTIONARY_SCHEMA = "term string, df long, cf long"


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """doc_map rows → (doc_id, term, tf, doc_len); vectorized pandas UDF."""

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield term_frequency_frame(pdf["doc_id"], pdf["text"])

    return docs.select("doc_id", "text").mapInPandas(tok, schema=TF_SCHEMA)


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, doc_len) for every doc — including zero-token docs."""

    def dl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anisearch_model_spark.functions.normalize import doc_length_series

        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "doc_len": doc_length_series(pdf["text"]).to_numpy()}
            )

    return docs.select("doc_id", "text").mapInPandas(dl, schema="doc_id long, doc_len long")


def _build_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """One doc-range bucket of tf rows → encoded posting-block rows."""
    bucket = int(pdf["bucket"].iloc[0])
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    rows = []
    for term, grp in pdf.groupby("term", sort=True):
        for blk in encode_posting_blocks(
            grp["doc_id"].to_numpy(),
            grp["tf"].to_numpy(),
            grp["doc_len"].to_numpy(),
            POSTING_BLOCK_SIZE,
        ):
            blk["term"] = term
            blk["bucket"] = bucket
            rows.append(blk)
    if not rows:
        return pd.DataFrame(
            columns=[
                "term", "bucket", "block_id", "n", "first_doc_id", "last_doc_id",
                "max_tf", "min_dl", "doc_deltas", "tfs", "dls",
            ]
        )
    out = pd.DataFrame(rows)
    return out[
        [
            "term", "bucket", "block_id", "n", "first_doc_id", "last_doc_id",
            "max_tf", "min_dl", "doc_deltas", "tfs", "dls",
        ]
    ]


def bucket_span(n_docs: int, num_buckets: int) -> int:
    return max(1, math.ceil(n_docs / num_buckets))


def build_postings(
    tf: DataFrame, n_docs: int, num_buckets: int = 32, buckets: list[int] | None = None
) -> DataFrame:
    """tf rows → compressed posting blocks, doc-range-salted.

    ``buckets``: optional subset to build (resume path) — becomes a
    doc_id range predicate that Parquet/Iceberg can push down.
    """
    span = bucket_span(n_docs, num_buckets)
    tf = tf.withColumn("bucket", (F.col("doc_id") / F.lit(span)).cast("int"))
    if buckets is not None:
        tf = tf.filter(F.col("bucket").isin([int(b) for b in buckets]))
    return tf.groupBy("bucket").applyInPandas(_build_bucket, schema=POSTINGS_SCHEMA)


def build_dictionary(tf: DataFrame) -> DataFrame:
    """term → (df, cf).  Combinable aggs → map-side partial aggregation
    makes this hot-term-safe without explicit salting."""
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def corpus_stats(doc_len_df: DataFrame, params: BM25Params | None = None) -> dict:
    """N, avgdl (+ frozen tokenizer/params metadata, cf. reference's
    dimension-compatibility check src/api.py:304-305)."""
    params = params or BM25Params()
    row = doc_len_df.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return {
        "n_docs": int(row["n_docs"]),
        "avgdl": float(row["avgdl"] or 0.0),
        "tokenizer_version": TOKENIZER_VERSION,
        "k1": params.k1,
        "b": params.b,
    }
