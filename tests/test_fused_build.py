"""Round-6 fused build (store.build_index ``with_positions=True``): the
single tokenize pass must produce BYTE-identical postings and positions
to the legacy two-pass build, stamp the positions commit point itself,
and keep the fail/resume contract."""

import shutil

from anisearch_model_spark.datagen import gen_transcripts
from anisearch_model_spark.index.build import POSTINGS_SCHEMA
from anisearch_model_spark.index.positions import (
    POSITIONS_SCHEMA,
    build_positions,
    positions_ready,
)
from anisearch_model_spark.index.store import build_index

_POST_COLS = [
    "term", "bucket", "field", "block_id", "n", "cf", "first_doc_id",
    "last_doc_id", "max_tf", "min_dl", "doc_deltas", "tfs", "dls",
]
_POS_COLS = [
    "term", "bucket", "field", "block_id", "n", "first_doc_id",
    "last_doc_id", "doc_deltas", "tfs", "dls", "pos_deltas",
]


def _canon(df, cols):
    rows = df.select(*cols).collect()
    return sorted(
        tuple(bytes(x) if isinstance(x, (bytearray, bytes)) else x for x in r)
        for r in rows
    )


def test_fused_build_byte_identical(spark, tmp_path):
    tr = gen_transcripts(spark, 4000, seed=7)
    old_dir, new_dir = str(tmp_path / "old"), str(tmp_path / "new")
    build_index(spark, tr, old_dir, num_buckets=4, with_positions=False)
    build_positions(spark, old_dir)
    build_index(spark, tr, new_dir, num_buckets=4)

    # fused build stamps the positions commit point itself
    ok, reason = positions_ready(new_dir)
    assert ok, reason
    # ... and a subsequent build_positions is a pure re-stamp, no tokenize
    assert build_positions(spark, new_dir)["buckets_built"] == 0

    a = _canon(spark.read.schema(POSTINGS_SCHEMA).parquet(
        f"{old_dir}/postings"), _POST_COLS)
    b = _canon(spark.read.schema(POSTINGS_SCHEMA).parquet(
        f"{new_dir}/postings"), _POST_COLS)
    assert a == b and len(a) > 0
    pa = _canon(spark.read.schema(POSITIONS_SCHEMA).parquet(
        f"{old_dir}/positions"), _POS_COLS)
    pb = _canon(spark.read.schema(POSITIONS_SCHEMA).parquet(
        f"{new_dir}/positions"), _POS_COLS)
    assert pa == pb and len(pa) > 0


def test_fused_build_partial_then_resume(spark, tmp_path):
    """A fail_after_buckets crash leaves positions UNSTAMPED (phrase
    search refuses); the resumed build completes the remaining buckets
    and stamps — identical tables to a clean one-shot build."""
    tr = gen_transcripts(spark, 3000, seed=9)
    d = str(tmp_path / "crash")
    build_index(spark, tr, d, num_buckets=4, fail_after_buckets=2)
    ok, _reason = positions_ready(d)
    assert not ok
    build_index(spark, tr, d, num_buckets=4)  # resume
    ok, reason = positions_ready(d)
    assert ok, reason

    ref = str(tmp_path / "ref")
    shutil.rmtree(ref, ignore_errors=True)
    build_index(spark, tr, ref, num_buckets=4)
    a = _canon(spark.read.schema(POSTINGS_SCHEMA).parquet(
        f"{d}/postings"), _POST_COLS)
    b = _canon(spark.read.schema(POSTINGS_SCHEMA).parquet(
        f"{ref}/postings"), _POST_COLS)
    assert a == b and len(a) > 0
    pa = _canon(spark.read.schema(POSITIONS_SCHEMA).parquet(
        f"{d}/positions"), _POS_COLS)
    pb = _canon(spark.read.schema(POSITIONS_SCHEMA).parquet(
        f"{ref}/positions"), _POS_COLS)
    assert pa == pb and len(pa) > 0


def test_fused_build_pfor_codec(spark, tmp_path):
    """Codec parameter flows through the fused pass to BOTH tables."""
    from anisearch_model_spark.index.codec import FLAG_PFOR

    tr = gen_transcripts(spark, 1500, seed=11)
    d = str(tmp_path / "pfor")
    build_index(spark, tr, d, num_buckets=2, codec="pfor")
    ok, reason = positions_ready(d)
    assert ok, reason
    post = spark.read.schema(POSTINGS_SCHEMA).parquet(f"{d}/postings")
    row = post.limit(1).collect()[0]
    assert bytes(row["doc_deltas"])[:1] == FLAG_PFOR
    pos = spark.read.schema(POSITIONS_SCHEMA).parquet(f"{d}/positions")
    prow = pos.limit(1).collect()[0]
    assert bytes(prow["pos_deltas"])[:1] == FLAG_PFOR
