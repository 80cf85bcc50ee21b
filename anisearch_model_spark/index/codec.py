"""Posting-list block codec: NumPy-vectorized varint + block-max metadata.

Replaces the reference's index artifact — a dense float32 embedding matrix
persisted with ``np.save`` (``src/sbert.py:344-347``) and positionally
aligned with the corpus (``src/api.py:248-267``) — with compressed posting
blocks: sorted docID deltas + term frequencies, LEB128-varint encoded in
blocks of ``POSTING_BLOCK_SIZE`` docs, each block carrying ``(first_doc_id,
max_tf, min_dl)`` so the scorer can compute a block-max BM25 upper bound
(score is monotone ↑ in tf and ↓ in dl, so score(max_tf, min_dl) bounds
every doc in the block).

All encode/decode paths are vectorized (no per-value Python loops beyond a
≤10-round byte sweep), since they run inside executor-side pandas UDFs.
"""

from __future__ import annotations

import numpy as np

from anisearch_model_spark.config import POSTING_BLOCK_SIZE

_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array → bytes (vectorized)."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b""
    remaining = a.copy()
    finished = np.zeros(n, dtype=bool)
    lens = np.zeros(n, dtype=np.int64)
    cols = []
    for _ in range(_MAX_VARINT_BYTES):
        active = ~finished
        if not active.any():
            break
        byte = (remaining & np.uint64(0x7F)).astype(np.uint8)
        remaining = remaining >> np.uint64(7)
        more = remaining > 0
        byte = np.where(more, byte | 0x80, byte)
        cols.append(np.where(active, byte, 0).astype(np.uint8))
        lens[active] += 1
        finished |= active & ~more
    mat = np.stack(cols, axis=1)  # (n, rounds)
    mask = np.arange(mat.shape[1]) < lens[:, None]
    return mat[mask].tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.array([], dtype=np.uint64)
    ends = (b & 0x80) == 0
    value_id = np.cumsum(ends) - ends  # per-byte owning value index
    n_values = int(ends.sum())
    starts = np.zeros(len(b), dtype=np.int64)
    end_pos = np.nonzero(ends)[0]
    # start position of each value's byte run
    run_starts = np.concatenate([[0], end_pos[:-1] + 1])
    pos_in_value = np.arange(len(b)) - run_starts[value_id]
    payload = (b & 0x7F).astype(np.uint64) << (7 * pos_in_value).astype(np.uint64)
    out = np.zeros(n_values, dtype=np.uint64)
    np.bitwise_or.at(out, value_id, payload)
    return out


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = POSTING_BLOCK_SIZE,
) -> list[dict]:
    """Split one term's postings (sorted by doc_id asc) into encoded blocks.

    Returns a list of dicts with keys
    ``block_id, n, first_doc_id, last_doc_id, max_tf, min_dl,
    doc_deltas, tfs`` — directly rows of the ``postings`` table.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    blocks = []
    for bi, start in enumerate(range(0, len(doc_ids), block_size)):
        d = doc_ids[start : start + block_size]
        t = tfs[start : start + block_size]
        dl = dls[start : start + block_size]
        deltas = np.diff(d)  # n-1 gaps; first doc stored explicitly
        blocks.append(
            {
                "block_id": bi,
                "n": int(len(d)),
                "first_doc_id": int(d[0]),
                "last_doc_id": int(d[-1]),
                "max_tf": int(t.max()),
                "min_dl": int(dl.min()),
                "doc_deltas": varint_encode(deltas.astype(np.uint64)),
                "tfs": varint_encode(t.astype(np.uint64)),
                "dls": varint_encode(dl.astype(np.uint64)),
            }
        )
    return blocks


def decode_posting_block(block: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids int64, tfs int64, dls int64)."""
    deltas = varint_decode(block["doc_deltas"]).astype(np.int64)
    doc_ids = block["first_doc_id"] + np.concatenate([[0], np.cumsum(deltas)])
    tfs = varint_decode(block["tfs"]).astype(np.int64)
    dls = varint_decode(block["dls"]).astype(np.int64)
    return doc_ids, tfs, dls
