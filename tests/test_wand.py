"""WAND correctness: rank-identical to exhaustive scoring (SURVEY.md
§4.2.3 — "always shadow-test against exhaustive scoring"), and block
skipping actually skips decodes."""

from __future__ import annotations

import numpy as np
import pytest

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.build import build_index
from rse_spark.index.codec import encode_postings
from rse_spark.query.engine import search_bundle
from rse_spark.query.wand import _ListIter, wand_search


@pytest.fixture(scope="module")
def bundle(spark):
    corpus = spark.createDataFrame(gen_code_corpus(0.0004))  # ~200 docs
    b = build_index(spark, corpus, analyzer="code", docs_per_segment=32)
    b.postings = b.postings.persist()
    b.postings.count()
    return b


def _rows(df):
    return [
        (int(r.doc_id), round(float(r.score), 9), int(r.n_terms_matched))
        for r in df.collect()
    ]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_wand_equals_exact(spark, bundle, mode):
    queries = gen_query_set(0.0004, n_queries=10)
    for q in queries.itertuples():
        exact = _rows(
            search_bundle(spark, bundle, q.query_text, k=10, mode=mode)
        )
        wand = _rows(
            wand_search(
                spark, bundle.postings, q.query_text,
                n_docs=bundle.n_docs, avgdl=bundle.avgdl,
                term_stats=bundle.term_stats, k=10, mode=mode,
            )
        )
        # scores float-compared at 1e-9 after rounding; rank + ids exact
        assert [(d, m) for d, s, m in wand] == [(d, m) for d, s, m in exact], (
            f"q{q.query_id}: {q.query_text!r} mode={mode}"
        )
        for (d1, s1, m1), (d2, s2, m2) in zip(wand, exact):
            assert abs(s1 - s2) < 1e-6


def test_hot_term_query(spark, bundle):
    exact = _rows(search_bundle(spark, bundle, "return def for", k=10))
    wand = _rows(
        wand_search(
            spark, bundle.postings, "return def for",
            n_docs=bundle.n_docs, avgdl=bundle.avgdl,
            term_stats=bundle.term_stats, k=10,
        )
    )
    assert [d for d, *_ in wand] == [d for d, *_ in exact]


def test_block_skipping_skips_decodes():
    """A selective advance across a long list must not decode every block."""
    n = 128 * 50
    doc_ids = np.arange(1, n + 1) * 3
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 100)
    payload, offs, last, max_tf, min_dl = encode_postings(doc_ids, tfs, dls)
    it = _ListIter(payload, offs, last, max_tf, min_dl, qtf_idf=1.0, avgdl=100.0)
    it.advance(int(doc_ids[-5]))  # jump near the end
    assert not it.done
    assert it.cur_doc == int(doc_ids[-5])
    assert it.blocks_decoded <= 3  # first block + landing block only


def test_wand_zero_hit(spark, bundle):
    out = wand_search(
        spark, bundle.postings, "zzzmissingterm",
        n_docs=bundle.n_docs, avgdl=bundle.avgdl,
        term_stats=bundle.term_stats, k=10,
    )
    assert out.count() == 0


def test_bmw_actually_skips_decodes(spark, tmp_path_factory):
    """Regression guard for the round-3 lazy-decode fix: on an
    impact-clustered list (high-tf docs at the head, tf=1 tail) the
    BMW path must leave most tail blocks UNDECODED, not decode each
    one on landing. Results stay identical to the exhaustive path."""
    import pandas as pd

    from rse_spark.index.storage import build_resumable
    from rse_spark.query.serve import DirectSearcher

    rows = []
    for i in range(4096):
        if i < 16:
            t = " ".join(["needle"] * 50) + f" filler{i} pad"
        elif i % 3 == 0:
            t = f"needle filler{i} pad pad"
        else:
            t = f"filler{i} pad pad pad"
        rows.append({"doc_id": i, "content": t})
    root = str(tmp_path_factory.mktemp("bmw_skip"))
    build_resumable(
        spark, spark.createDataFrame(pd.DataFrame(rows)), root,
        analyzer="simple", docs_per_segment=4096, segments_per_group=4,
    )
    s = DirectSearcher(root, analyzer="simple")
    exact = s.search("needle", k=10, algo="numpy")
    wand = s.search("needle", k=10, algo="wand")
    assert [d for d, _, _ in exact] == [d for d, _, _ in wand]
    assert all(
        abs(a[1] - b[1]) < 1e-9 for a, b in zip(exact, wand)
    )
    st = s.last_stats
    # ~11 blocks of 128 postings; only the high-impact head block may
    # need decoding once the heap floor is set
    assert st["blocks_total"] >= 10
    assert st["blocks_decoded"] <= 2, st
