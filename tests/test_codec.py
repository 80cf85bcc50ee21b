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
