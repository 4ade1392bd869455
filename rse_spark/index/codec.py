"""Posting-list compression: delta + LEB128 varint, with block-max metadata.

The reference stores one posting per relational row
(``keywords(page_id, word, frequency)``, reference
crawler/src/postgres/init_db.sql:10-16). At 10^12-file scale that blows
up storage and scan cost, so per the driver contract (BASELINE.json:6)
posting lists are delta-encoded and varint-compressed into a single
BinaryType value per (term, segment), with per-block maxima for
block-max WAND pruning.

Layout of the binary payload (all LEB128 varints):
    repeat n times: (doc_id_gap, tf, doc_len)
``doc_id_gap`` is the delta vs. the previous posting's doc_id (first is
absolute). ``doc_len`` rides along so BM25 scoring needs NO join against
a doc_stats table at query time — at cluster scale that join is a full
shuffle of the candidate set; one extra varint per posting is cheaper.

All encode/decode is numpy-vectorized (no per-element Python loops) —
suitable for Arrow-batched pandas UDFs per BASELINE.json input_hint
("no per-row Python").
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array -> uint8 byte array (vectorized)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if len(vals) == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value: 1 + count of thresholds passed
    nb = np.ones(len(vals), dtype=np.int64)
    for k in range(1, 10):
        nb += (vals >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for b in range(max_nb):
        mask = nb > b
        idx = starts[mask] + b
        byte = (vals[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > b).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte array -> uint64 array (vectorized reduceat)."""
    buf = np.frombuffer(bytes(buf), dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(buf) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (buf & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    pos = np.arange(len(buf), dtype=np.int64) - np.repeat(starts, lens)
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def bm25_impact(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                k1: float = K1, b: float = B) -> np.ndarray:
    """Per-posting BM25 impact WITHOUT idf: tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl.astype(np.float64) / float(avgdl))
    return tf * (k1 + 1.0) / denom


def block_bounds(max_tfs, min_dls, avgdl: float,
                 k1: float = K1, b: float = B) -> np.ndarray:
    """Per-block upper bound of the idf-less BM25 impact, computed at
    QUERY time from avgdl-independent block metadata.

    The impact tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is increasing in tf
    and decreasing in dl, so evaluating it at (max_tf, min_dl) of a block
    bounds every posting in the block — for whatever avgdl the corpus has
    at query time. This is what lets stream-appended segments stay valid
    for WAND after corpus-level avgdl drifts (round-1 VERDICT item 1)."""
    return bm25_impact(
        np.asarray(max_tfs, dtype=np.int64),
        np.asarray(min_dls, dtype=np.int64),
        avgdl, k1, b,
    )


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[bytes, list[int], list[int], list[int], list[int]]:
    """Encode one posting list (sorted by doc_id ascending).

    Returns (payload, block_offsets, block_last_doc, block_max_tf,
    block_min_dl): ``block_offsets[i]`` is the byte offset where block i
    starts, ``block_last_doc[i]`` the last absolute doc_id of block i
    (the skip pointer), ``block_max_tf[i]`` / ``block_min_dl[i]`` the
    block's max tf and min doc_len. Block metadata is deliberately
    avgdl-FREE: the WAND upper bound is derived query-side via
    :func:`block_bounds`, so encoded segments never go stale when the
    corpus avgdl shifts under streaming appends."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return b"", [], [], [], []
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(doc_ids[0])
    if n > 1:
        gaps[1:] = np.diff(doc_ids).astype(np.uint64)

    interleaved = np.empty(3 * n, dtype=np.uint64)
    interleaved[0::3] = gaps
    interleaved[1::3] = np.ascontiguousarray(tfs, dtype=np.uint64)
    interleaved[2::3] = np.ascontiguousarray(dls, dtype=np.uint64)
    payload = varint_encode(interleaved)

    # per-value byte counts -> cumulative offsets at posting granularity
    nb = np.ones(3 * n, dtype=np.int64)
    for k in range(1, 10):
        nb += (interleaved >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    val_ends = np.cumsum(nb)
    posting_starts = np.concatenate(([0], val_ends[2::3][:-1]))  # byte offset of each posting

    tfs_a = np.ascontiguousarray(tfs, dtype=np.int64)
    dls_a = np.ascontiguousarray(dls, dtype=np.int64)
    block_offsets: list[int] = []
    block_last: list[int] = []
    block_max_tf: list[int] = []
    block_min_dl: list[int] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        block_offsets.append(int(posting_starts[s]))
        block_last.append(int(doc_ids[e - 1]))
        block_max_tf.append(int(tfs_a[s:e].max()))
        block_min_dl.append(int(dls_a[s:e].min()))
    return payload.tobytes(), block_offsets, block_last, block_max_tf, block_min_dl


def decode_postings(payload: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list -> (doc_ids, tfs, dls)."""
    if not payload:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    vals = varint_decode(np.frombuffer(payload, dtype=np.uint8))
    gaps = vals[0::3].astype(np.int64)
    tfs = vals[1::3].astype(np.int64)
    dls = vals[2::3].astype(np.int64)
    doc_ids = np.cumsum(gaps)
    return doc_ids, tfs, dls


def decode_block(
    payload: bytes, offset: int, next_offset: int | None, base_doc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block given its byte range and the previous block's
    last doc_id (``base_doc``; 0 for the first block — the first gap of
    block 0 is the absolute doc_id). Enables WAND block skipping without
    decoding the whole list."""
    buf = np.frombuffer(payload, dtype=np.uint8)[
        offset: next_offset if next_offset is not None else len(payload)
    ]
    vals = varint_decode(buf)
    gaps = vals[0::3].astype(np.int64)
    tfs = vals[1::3].astype(np.int64)
    dls = vals[2::3].astype(np.int64)
    doc_ids = np.cumsum(gaps) + (base_doc if offset > 0 else 0)
    return doc_ids, tfs, dls
