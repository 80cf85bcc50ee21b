"""Inverted-index build: tokenize → per-doc tf → bucketed posting blocks.

Reference analog: the index-build stage ``src/sbert.py:154-388`` (per-column
batched SBERT encode → ``np.save``).  Our build replaces dense embeddings
with compressed posting lists and is designed for 10^12 turns:

  * ONE fused pass (``fused_tokenize_encode``): the corpus arrives
    pre-bucketed into disjoint sorted doc-id ranges (docmap.py), so one
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
  * **field qualification** (reference per-column index analog,
    ``src/sbert.py:336-356``): every doc (turn) carries one field value
    (its role); blocks are built per ``(bucket, field, term)``, so a
    field-scoped query prunes at the scan while an unscoped query reads
    all fields — per-doc partials are unchanged (fields partition the doc
    set), so unscoped results stay bit-identical;
  * dictionary df/cf per (term, field) and corpus stats derive from block
    metadata (``dictionary_from_postings``) — the corpus is tokenized
    exactly once;
  * the postings table is written ``partitionBy(bucket, field)`` so a
    resumable re-run plans only missing buckets, the query engine scores
    bucket-parallel, and a field filter is directory-level pruning.

Index layout is a pure function of (corpus, num_buckets, field_col) —
independent of cluster size AND of the run (deterministic bucketing,
docmap.py), which keeps results rank-identical between N and 4N executors
and makes resumes byte-stable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anisearch_model_spark.config import POSTING_BLOCK_SIZE
from anisearch_model_spark.functions.normalize import term_frequency_frame

UNSCOPED_FIELD = "*"  # field value when the index is built without field_col

POSTINGS_SCHEMA = (
    "term string, bucket int, field string, block_id int, n int, cf long, "
    "first_doc_id long, last_doc_id long, max_tf int, min_dl int, "
    "doc_deltas binary, tfs binary, dls binary"
)

_POSTING_COLS = [
    "term", "bucket", "field", "block_id", "n", "cf", "first_doc_id",
    "last_doc_id", "max_tf", "min_dl", "doc_deltas", "tfs", "dls",
]

DICTIONARY_SCHEMA = "term string, field string, df long, cf long"


def _build_bucket(pdf: pd.DataFrame, codec: str = "varint") -> pd.DataFrame:
    """One (bucket, field) group of tf rows → encoded posting-block rows
    (vectorized whole-bucket encode; see codec.encode_bucket_frame)."""
    from anisearch_model_spark.index.codec import encode_bucket_frame

    return encode_bucket_frame(pdf, POSTING_BLOCK_SIZE, codec=codec)


def fused_tokenize_encode(docs_bucketed: DataFrame, bucket_offset: int = 0,
                          field_col: str | None = None,
                          codec: str = "varint") -> DataFrame:
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

    ``field_col``: when set (e.g. "role"), blocks are built per
    (bucket, field) — each doc belongs to exactly one field, so this only
    PARTITIONS the posting data; tf/dl values are untouched.
    """
    sel = ["bucket", "doc_id", "text"] + ([field_col] if field_col else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            tf = term_frequency_frame(pdf["doc_id"], pdf["text"])
            # doc→(bucket, field) is order-preserving within the batch
            # (docs arrive bucket-sorted from bucketed_corpus); map via merge
            meta_cols = ["doc_id", "bucket"] + ([field_col] if field_col else [])
            tf = tf.merge(
                pdf[meta_cols].drop_duplicates("doc_id"), on="doc_id", how="left",
            )
            tf["field"] = tf[field_col] if field_col else UNSCOPED_FIELD
            frames.append(tf)
        if not frames:
            yield pd.DataFrame(columns=_POSTING_COLS)
            return
        all_tf = pd.concat(frames, ignore_index=True)
        all_tf["bucket"] = all_tf["bucket"].astype("int64") + bucket_offset
        outs = []
        for (_b, fld), grp in all_tf.groupby(["bucket", "field"], sort=True):
            enc = _build_bucket(grp, codec=codec)
            enc["field"] = fld
            outs.append(enc[_POSTING_COLS])
        yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            columns=_POSTING_COLS
        )

    return docs_bucketed.select(*sel).mapInPandas(run, schema=POSTINGS_SCHEMA)


def dictionary_from_postings(postings: DataFrame) -> DataFrame:
    """(term, field) → (df, cf) derived from block metadata — no
    re-tokenize.  df = Σ block n (each doc appears once per term within
    its field), cf = Σ block cf; the UNSCOPED df/cf of a term is the sum
    over its fields (fields partition the doc set).  Combinable aggs →
    map-side partial aggregation; hot-term safe.
    """
    return postings.groupBy("term", "field").agg(
        F.sum("n").alias("df"), F.sum("cf").alias("cf")
    )
