"""Varint / posting-block codec round-trip properties (SURVEY.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anisearch_model_spark.index.codec import (
    decode_posting_block,
    encode_posting_blocks,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_boundaries():
    arr = np.array([0, 1, 127, 128, 16383, 16384, 2**62], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_posting_block_roundtrip(n):
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, n)
    dls = rng.integers(1, 300, n)
    blocks = encode_posting_blocks(docs, tfs, dls, block_size=128)
    assert len(blocks) == (n + 127) // 128
    d2, t2, l2 = zip(*(decode_posting_block(b) for b in blocks))
    assert np.array_equal(np.concatenate(d2), docs)
    assert np.array_equal(np.concatenate(t2), tfs)
    assert np.array_equal(np.concatenate(l2), dls)
    for b in blocks:
        d, t, dl = decode_posting_block(b)
        # block-max metadata correctness: recorded bound == true block max/min
        assert b["max_tf"] == t.max()
        assert b["min_dl"] == dl.min()
        assert b["first_doc_id"] == d[0] and b["last_doc_id"] == d[-1]


def test_unsorted_input_is_sorted():
    docs = np.array([5, 1, 9], dtype=np.int64)
    blocks = encode_posting_blocks(docs, [1, 2, 3], [10, 10, 10])
    d, t, _ = decode_posting_block(blocks[0])
    assert d.tolist() == [1, 5, 9] and t.tolist() == [2, 1, 3]


# ------------------------------------------------------------------- pfor


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_pfor_roundtrip(values):
    from anisearch_model_spark.index.codec import pfor_decode, pfor_encode

    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(arr)), arr)


def test_pfor_skewed_tail_uses_exceptions():
    """Classic PFor shape: 90% small values pick a narrow width; the Zipf
    tail rides the exception list instead of widening every value."""
    from anisearch_model_spark.index.codec import pfor_decode, pfor_encode

    rng = np.random.default_rng(0)
    vals = rng.integers(1, 8, size=128).astype(np.uint64)   # 3-bit body
    vals[::16] = rng.integers(2**20, 2**30, size=8)          # fat outliers
    buf = pfor_encode(vals)
    assert np.array_equal(pfor_decode(buf), vals)
    # narrow width kept: body ≈ 128*3 bits ≈ 48B, so buffer ≪ 8B/value
    assert len(buf) < 128 * 4


def test_pfor_width64_values_roundtrip():
    """Values ≥ 2^63 force width=64 — the shift-by-operand-width path that
    is undefined in C and platform-dependent in numpy must be special-cased
    (high = 0, no exceptions)."""
    import warnings
    from anisearch_model_spark.index.codec import pfor_decode, pfor_encode

    vals = np.array([2**64 - 1, 2**63, 0, 12345], dtype=np.uint64)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any numpy shift warning → fail
        buf = pfor_encode(vals)
    assert np.array_equal(pfor_decode(buf), vals)


def test_index_store_format_version_gate(spark, tmp_path):
    """stats.json version gate: a PRESENT-but-different version always
    rejects; a MISSING version (index predates the stats stamp) falls
    back to sniffing EVERY posting buffer (doc_deltas, tfs, dls) of the
    sampled blocks for a codec flag byte and accepts a byte-compatible
    flag-prefixed index instead of forcing a rebuild — but a single
    unflagged buffer (a legacy payload whose doc_deltas merely START
    with 0x56/0x50 by chance) must still reject."""
    import glob, json, os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.engine import IndexStore

    d = str(tmp_path / "ver_idx")
    build_index(spark, gen_transcripts(spark, 50, seed=3), d, num_buckets=2)
    IndexStore(spark, d)  # fresh build opens fine
    stats = json.load(open(os.path.join(d, "stats.json")))
    del stats["index_format_version"]  # pre-stamp but flag-prefixed index
    json.dump(stats, open(os.path.join(d, "stats.json"), "w"))
    IndexStore(spark, d)  # accepted via the flag-byte sniff
    stats["index_format_version"] = "bogus-v0"  # genuinely incompatible
    json.dump(stats, open(os.path.join(d, "stats.json"), "w"))
    with pytest.raises(ValueError, match="format version"):
        IndexStore(spark, d)

    # strict sniff: strip the flag byte from ONE tfs buffer in the first
    # sampled file — the legacy-false-accept shape (doc_deltas still
    # flagged) — and the missing-version fallback must reject
    del stats["index_format_version"]
    json.dump(stats, open(os.path.join(d, "stats.json"), "w"))
    path = sorted(glob.glob(
        os.path.join(d, "postings", "**", "*.parquet"), recursive=True))[0]
    t = pq.read_table(path)
    tfs = t.column("tfs").to_pylist()
    tfs[0] = b"\x01\x02\x03"  # raw legacy-style payload, no flag byte
    cols = {name: (pa.array(tfs, type=pa.binary()) if name == "tfs"
                   else t.column(name)) for name in t.column_names}
    pq.write_table(pa.table(cols), path)
    with pytest.raises(ValueError, match="format version"):
        IndexStore(spark, d)


def test_flagged_codecs_mix_in_one_block_stream():
    """Buffers are self-describing: a varint block and a pfor block decode
    through the same decode_posting_block (mixed-codec index, e.g. an
    incremental append with a different codec)."""
    from anisearch_model_spark.index.codec import decode_values, encode_values

    arr = np.array([1, 127, 128, 300000], dtype=np.uint64)
    for codec in ("varint", "pfor"):
        assert np.array_equal(decode_values(encode_values(arr, codec)), arr)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_posting_block_roundtrip_codecs(codec):
    rng = np.random.default_rng(7)
    n = 400
    docs = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, n)
    dls = rng.integers(1, 300, n)
    blocks = encode_posting_blocks(docs, tfs, dls, block_size=128, codec=codec)
    d2, t2, l2 = zip(*(decode_posting_block(b) for b in blocks))
    assert np.array_equal(np.concatenate(d2), docs)
    assert np.array_equal(np.concatenate(t2), tfs)
    assert np.array_equal(np.concatenate(l2), dls)


def test_bucket_frame_matches_per_term_blocks_pfor(spark):
    """encode_bucket_frame(codec=pfor) stays byte-identical to the per-term
    reference encoder (the same guarantee the varint path has)."""
    import pandas as pd
    from anisearch_model_spark.index.codec import encode_bucket_frame

    rng = np.random.default_rng(3)
    rows = []
    for term in ["alpha", "beta", "gamma"]:
        docs = np.sort(rng.choice(4000, size=300, replace=False))
        for d in docs:
            rows.append((int(d), term, int(rng.integers(1, 30)),
                         int(rng.integers(5, 400)), 0))
    pdf = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "doc_len", "bucket"])
    out = encode_bucket_frame(pdf, block_size=128, codec="pfor")
    for term, grp in pdf.groupby("term"):
        expect = encode_posting_blocks(
            grp["doc_id"].to_numpy(), grp["tf"].to_numpy(),
            grp["doc_len"].to_numpy(), block_size=128, codec="pfor")
        got = out[out["term"] == term].sort_values("block_id")
        assert len(got) == len(expect)
        for row, exp in zip(got.itertuples(index=False), expect):
            assert row.doc_deltas == exp["doc_deltas"]
            assert row.tfs == exp["tfs"]
            assert row.dls == exp["dls"]
            assert row.max_tf == exp["max_tf"] and row.min_dl == exp["min_dl"]


def test_pfor_index_rank_identical_to_varint(spark, index_dir, tmp_path):
    """Codec choice is lossless: a pfor-coded index returns bit-identical
    scores/ranks to the varint index over the same corpus, and stats.json
    records the codec."""
    import json, os
    from anisearch_model_spark.datagen import gen_transcripts
    from anisearch_model_spark.index.store import build_index
    from anisearch_model_spark.query.engine import IndexStore, topk_bmw, topk_exhaustive

    d = str(tmp_path / "pfor_idx")
    tr = gen_transcripts(spark, 3000, seed=42)
    build_index(spark, tr, d, num_buckets=6, codec="pfor")
    with open(os.path.join(d, "stats.json")) as f:
        assert json.load(f)["codec"] == "pfor"
    a = IndexStore(spark, index_dir)   # varint
    b = IndexStore(spark, d)           # pfor
    for q in ["hero battle magic world", "story"]:
        ra = topk_exhaustive(a, q, 10).toPandas()
        rb = topk_exhaustive(b, q, 10).toPandas()
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
        np.testing.assert_array_equal(ra["score"].to_numpy(), rb["score"].to_numpy())
        rp = topk_bmw(b, q, 10).toPandas()
        assert rp["doc_id"].tolist() == ra["doc_id"].tolist()
