"""Batch query execution equals per-query execution, per query."""

from __future__ import annotations

import pytest

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.build import build_index
from rse_spark.query.engine import search_bundle, search_many


@pytest.fixture(scope="module")
def bundle(spark):
    corpus = spark.createDataFrame(gen_code_corpus(0.0003))
    b = build_index(spark, corpus, analyzer="code", docs_per_segment=32)
    b.postings = b.postings.persist()
    b.postings.count()
    return b


@pytest.mark.parametrize("mode", ["or", "and"])
def test_batch_equals_sequential(spark, bundle, mode):
    qset = gen_query_set(0.0003, n_queries=8)
    queries = [(int(q.query_id), q.query_text) for q in qset.itertuples()]
    batch = search_many(
        spark, bundle.postings, queries,
        n_docs=bundle.n_docs, avgdl=bundle.avgdl,
        term_stats=bundle.term_stats, k=10, mode=mode,
    ).toPandas()
    for qid, text in queries:
        want = search_bundle(spark, bundle, text, k=10, mode=mode).toPandas()
        got = batch[batch.query_id == qid].sort_values("rank")
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (qid, text)
        assert got["score"].round(9).tolist() == want["score"].round(9).tolist()


def test_batch_empty_and_missing(spark, bundle):
    out = search_many(
        spark, bundle.postings, [(0, "zzzmissing"), (1, "")],
        n_docs=bundle.n_docs, avgdl=bundle.avgdl,
        term_stats=bundle.term_stats, k=10,
    )
    assert out.count() == 0
