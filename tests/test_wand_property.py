"""Property test: block-max WAND (with BMW pivot re-check) is
rank-identical to brute-force scoring over arbitrary random posting
lists — ties, singleton lists, k > n, shared docs, skewed tfs, and
avgdl values far from the lists' own lengths."""

from __future__ import annotations

import heapq
import random

import numpy as np
import pytest

from rse_spark.index.codec import B, K1, encode_postings
from rse_spark.query.wand import _ListIter, wand_topk_lists


def _brute(lists, weights, k, avgdl):
    scores: dict[int, float] = {}
    matched: dict[int, int] = {}
    for (docs, tfs, dls), w in zip(lists, weights):
        for d, tf, dl in zip(docs, tfs, dls):
            c = w * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * dl / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + c
            matched[d] = matched.get(d, 0) + 1
    items = [(s, -d, matched[d]) for d, s in scores.items()]
    top = heapq.nlargest(k, items)
    return [(-nd, s, m) for (s, nd, m) in top]


def _random_case(rng: random.Random):
    n_lists = rng.randint(1, 5)
    universe = rng.randint(1, 400)
    lists, weights, iters = [], [], []
    avgdl = rng.choice([1.0, 17.3, 100.0, 5000.0])
    for _ in range(n_lists):
        n = rng.randint(1, min(universe, rng.choice([1, 3, 50, 300])))
        docs = np.array(sorted(rng.sample(range(universe), n)), dtype=np.int64)
        if rng.random() < 0.3:
            tfs = np.ones(n, dtype=np.int64)  # constant scores -> ties
            dls = np.full(n, 50, dtype=np.int64)
        else:
            tfs = np.array([rng.randint(1, 40) for _ in range(n)], dtype=np.int64)
            dls = np.array([rng.randint(1, 2000) for _ in range(n)], dtype=np.int64)
        w = rng.choice([0.1, 1.0, 3.7])
        payload, offs, last, max_tf, min_dl = encode_postings(
            docs, tfs, dls, block_size=rng.choice([4, 16, 128])
        )
        lists.append((docs, tfs, dls))
        weights.append(w)
        iters.append(
            _ListIter(payload, offs, last, max_tf, min_dl, w, avgdl)
        )
    k = rng.choice([1, 3, 10, 1000])
    return lists, weights, iters, k, avgdl


@pytest.mark.parametrize("seed", range(60))
def test_wand_matches_brute_force(seed):
    rng = random.Random(seed)
    lists, weights, iters, k, avgdl = _random_case(rng)
    got = sorted(
        wand_topk_lists(iters, k, avgdl),
        key=lambda r: (-r[1], r[0]),
    )
    want = sorted(_brute(lists, weights, k, avgdl),
                  key=lambda r: (-r[1], r[0]))
    assert [(d, m) for d, _, m in got] == [(d, m) for d, _, m in want], (
        f"seed={seed} k={k} avgdl={avgdl}"
    )
    for (d1, s1, _), (d2, s2, _) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
