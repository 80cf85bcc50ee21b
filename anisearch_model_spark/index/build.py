"""Inverted-index build: tokenize → per-doc tf → bucketed posting blocks.

Reference analog: the index-build stage ``src/sbert.py:154-388`` (per-column
batched SBERT encode → ``np.save``).  Our build replaces dense embeddings
with compressed posting lists and is designed for 10^12 turns:

  * PRIMARY PATH (``fused_tokenize_encode``): the corpus arrives
    pre-bucketed into disjoint sorted doc-id ranges (docmap.py), so ONE
    ``mapInPandas`` pass tokenizes AND encodes each bucket — no shuffle
    of posting data at all, and only ~3-bytes-per-posting compressed
    blocks cross the Python/JVM Arrow boundary (the uncompressed
    (doc,term,tf) relation is 20-40× the corpus row count; shipping or
    shuffling it dominated build time);
  * **skew defusal**: a hot term (Zipf head) would make a naive
    ``groupBy(term)`` one-reducer-hot.  Doc-range bucketing IS the salt:
    every term's postings split uniformly across buckets, and because
    buckets are disjoint sorted docID ranges, the global posting list of
    a term is the bucket-ascending concatenation of its per-bucket
    blocks — the merge stage is free (no re-sort, no second shuffle);
  * dictionary df/cf and corpus stats derive from block metadata
    (``dictionary_from_postings``) — the corpus is tokenized exactly once;
  * the postings table is written ``partitionBy(bucket)`` so a resumable
    re-run plans only missing buckets and the query engine scores
    bucket-parallel;
  * SECONDARY PATH (``build_postings``): shuffle-based
    ``groupBy(bucket).applyInPandas`` over an explicit (doc_id, term, tf)
    relation — for callers that already hold tf rows (e.g. boundary-bucket
    merges) rather than raw text.

Index layout is a pure function of (corpus, num_buckets) — independent of
cluster size AND of the run (deterministic bucketing, docmap.py), which
keeps results rank-identical between N and 4N executors and makes resumes
byte-stable.
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
    "term string, bucket int, block_id int, n int, cf long, first_doc_id long, "
    "last_doc_id long, max_tf int, min_dl int, doc_deltas binary, "
    "tfs binary, dls binary"
)

_POSTING_COLS = [
    "term", "bucket", "block_id", "n", "cf", "first_doc_id", "last_doc_id",
    "max_tf", "min_dl", "doc_deltas", "tfs", "dls",
]

DICTIONARY_SCHEMA = "term string, df long, cf long"


def tokenize_docs(docs: DataFrame, include_empty_docs: bool = False) -> DataFrame:
    """doc_map rows → (doc_id, term, tf, doc_len); vectorized pandas UDF.

    With ``include_empty_docs`` a sentinel row (term=NULL, tf=0, doc_len=0)
    is emitted for zero-token docs so ONE tokenize pass can feed stats
    (which must count every doc toward N/avgdl), the dictionary, and the
    postings build — the build tokenizes the corpus exactly once.
    """

    def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            tf = term_frequency_frame(pdf["doc_id"], pdf["text"])
            if include_empty_docs:
                missing = pdf.loc[~pdf["doc_id"].isin(tf["doc_id"]), "doc_id"]
                if len(missing):
                    sentinel = pd.DataFrame(
                        {
                            "doc_id": missing.to_numpy(),
                            "term": None,
                            "tf": 0,
                            "doc_len": 0,
                        }
                    )
                    tf = pd.concat([tf, sentinel], ignore_index=True)
            yield tf

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
    """One doc-range bucket of tf rows → encoded posting-block rows
    (vectorized whole-bucket encode; see codec.encode_bucket_frame)."""
    from anisearch_model_spark.index.codec import encode_bucket_frame

    return encode_bucket_frame(pdf, POSTING_BLOCK_SIZE)


def bucket_span(n_docs: int, num_buckets: int) -> int:
    return max(1, math.ceil(n_docs / num_buckets))


def build_postings(
    tf: DataFrame, n_docs: int, num_buckets: int = 32,
    buckets: list[int] | None = None, span: int | None = None
) -> DataFrame:
    """tf rows → compressed posting blocks, doc-range-salted.

    ``buckets``: optional subset to build (resume path) — becomes a
    doc_id range predicate that Parquet/Iceberg can push down.
    ``span``: explicit docs-per-bucket (incremental appends must reuse
    the original layout's span so bucket = doc_id // span stays stable).
    """
    if span is None:
        span = bucket_span(n_docs, num_buckets)
    tf = tf.withColumn("bucket", (F.col("doc_id") / F.lit(span)).cast("int"))
    if buckets is not None:
        tf = tf.filter(F.col("bucket").isin([int(b) for b in buckets]))
    return tf.groupBy("bucket").applyInPandas(_build_bucket, schema=POSTINGS_SCHEMA)


def fused_tokenize_encode(docs_bucketed: DataFrame, bucket_offset: int = 0) -> DataFrame:
    """THE scale path: tokenize + encode each doc-range partition in ONE
    ``mapInPandas`` pass over the bucketed corpus (buckets are whole
    within a partition; + offset for appends).

    Why fused: the intermediate (doc_id, term, tf) relation is ~20-40× the
    row count of the corpus.  Shipping it across the Arrow boundary and
    shuffling it to buckets dominated build time and anti-scaled with
    cores (measured: plain multiprocessing tokenize scales 12.8× at 32
    procs, but the tf-shuffle build got SLOWER from local[8]→local[32]).
    Fused, only compressed posting blocks leave Python — ~3 bytes/posting
    instead of ~40 — and the postings build has ZERO shuffle: partitions
    are already disjoint sorted doc ranges, so per-partition mini-indexes
    concatenate into the global index for free (the salted two-level
    aggregation of SURVEY.md §4.2 with salt ≡ doc-range partition).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            tf = term_frequency_frame(pdf["doc_id"], pdf["text"])
            # doc→bucket is order-preserving within the batch (docs arrive
            # bucket-sorted from bucketed_corpus); map via merge
            tf = tf.merge(
                pdf[["doc_id", "bucket"]].drop_duplicates("doc_id"),
                on="doc_id", how="left",
            )
            frames.append(tf)
        if not frames:
            yield pd.DataFrame(columns=_POSTING_COLS)
            return
        all_tf = pd.concat(frames, ignore_index=True)
        all_tf["bucket"] = all_tf["bucket"].astype("int64") + bucket_offset
        outs = [
            _build_bucket(grp) for _b, grp in all_tf.groupby("bucket", sort=True)
        ]
        yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            columns=_POSTING_COLS
        )

    return docs_bucketed.select("bucket", "doc_id", "text").mapInPandas(
        run, schema=POSTINGS_SCHEMA
    )


def dictionary_from_postings(postings: DataFrame) -> DataFrame:
    """term → (df, cf) derived from block metadata — no re-tokenize.

    df = Σ block n (each doc appears once per term), cf = Σ block cf.
    Combinable aggs → map-side partial aggregation; hot-term safe.
    """
    return postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("cf").alias("cf")
    )


def postings_to_tf(postings: DataFrame) -> DataFrame:
    """Inverse of the encode path: posting blocks → (doc_id, term, tf,
    doc_len) rows.  Used by incremental appends to merge the boundary
    bucket (re-encoding old∪new reproduces exactly what a from-scratch
    build of that bucket would emit)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anisearch_model_spark.index.codec import decode_posting_block

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                d, t, dl = decode_posting_block(
                    {
                        "first_doc_id": row.first_doc_id,
                        "doc_deltas": row.doc_deltas,
                        "tfs": row.tfs,
                        "dls": row.dls,
                    }
                )
                outs.append(
                    pd.DataFrame(
                        {"doc_id": d, "term": row.term, "tf": t, "doc_len": dl}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return postings.select(
        "term", "first_doc_id", "doc_deltas", "tfs", "dls"
    ).mapInPandas(decode, schema=TF_SCHEMA)


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
