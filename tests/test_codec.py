"""Delta+varint codec: round-trip identity, block-max correctness.

Property tests per SURVEY.md §5.1: random posting lists encode->decode
to identity; monotone doc_ids; block metadata consistent.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rse_spark.index.codec import (
    BLOCK_SIZE,
    block_bounds,
    bm25_impact,
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**12),  # doc gap
            st.integers(min_value=1, max_value=1000),    # tf
            st.integers(min_value=1, max_value=100000),  # dl
        ),
        min_size=0,
        max_size=500,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(entries):
    if entries:
        gaps, tfs, dls = map(np.array, zip(*entries))
        doc_ids = np.cumsum(gaps)
    else:
        doc_ids = np.empty(0, dtype=np.int64)
        tfs = dls = doc_ids
    payload, offs, last, max_tf, min_dl = encode_postings(doc_ids, tfs, dls)
    d, t, l = decode_postings(payload)
    assert d.tolist() == list(doc_ids)
    assert t.tolist() == list(tfs)
    assert l.tolist() == list(dls)
    n_blocks = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(offs) == len(last) == len(max_tf) == len(min_dl) == n_blocks
    if len(doc_ids):
        assert last[-1] == int(doc_ids[-1])
        assert max(max_tf) == int(np.max(tfs))
        assert min(min_dl) == int(np.min(dls))
        # query-side bound dominates every true impact, for ANY avgdl
        for avgdl in (1.0, 50.0, 5000.0):
            imp = bm25_impact(np.asarray(tfs), np.asarray(dls), avgdl)
            ub = block_bounds(max_tf, min_dl, avgdl)
            for b in range(n_blocks):
                s, e = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, len(doc_ids))
                assert ub[b] >= imp[s:e].max() - 1e-12


def test_block_decode_matches_full():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = np.cumsum(rng.integers(1, 50, size=n))
    tfs = rng.integers(1, 30, size=n)
    dls = rng.integers(10, 500, size=n)
    payload, offs, last, _, _ = encode_postings(doc_ids, tfs, dls)
    got_d, got_t, got_l = [], [], []
    for i, off in enumerate(offs):
        nxt = offs[i + 1] if i + 1 < len(offs) else None
        base = last[i - 1] if i > 0 else 0
        d, t, l = decode_block(payload, off, nxt, base)
        got_d += d.tolist()
        got_t += t.tolist()
        got_l += l.tolist()
    assert got_d == doc_ids.tolist()
    assert got_t == tfs.tolist()
    assert got_l == dls.tolist()


def test_monotonicity_enforced():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 5]), np.array([1, 1]), np.array([1, 1])
        )
