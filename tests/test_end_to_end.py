"""End-to-end: build index on the synthetic code corpus, query, compare
rank-identically to the independent oracle (SURVEY.md §5.2, north_rule
rank parity), and assert the index invariants (§5.3)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.build import build_index
from rse_spark.query.engine import search_bundle
from rse_spark.query.oracle import bm25_oracle

SF = 0.0002  # ~100 docs — fast unit-scale


@pytest.fixture(scope="module")
def corpus_pdf():
    pdf = gen_code_corpus(SF)
    return pdf


@pytest.fixture(scope="module")
def bundle(spark, corpus_pdf):
    corpus = spark.createDataFrame(corpus_pdf)
    b = build_index(spark, corpus, analyzer="code", docs_per_segment=32)
    b.postings = b.postings.persist()
    b.postings.count()
    return b


@pytest.fixture(scope="module")
def oracle_docs(spark, bundle, corpus_pdf):
    # reconstruct (doc_id, content) with the engine's id assignment
    dm = bundle.doc_map.toPandas()
    merged = dm.merge(corpus_pdf, on=["repo", "path", "commit"])
    return merged[["doc_id", "content"]]


def _ranked(df: pd.DataFrame) -> list[tuple[int, float]]:
    return [(int(r.doc_id), round(float(r.score), 9)) for r in df.itertuples()]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_rank_parity_queries(spark, bundle, oracle_docs, mode):
    queries = gen_query_set(SF, n_queries=12)
    for q in queries.itertuples():
        got = search_bundle(
            spark, bundle, q.query_text, k=10, mode=mode
        ).toPandas()
        want = bm25_oracle(oracle_docs, q.query_text, k=10, mode=mode)
        assert _ranked(got) == _ranked(want), (
            f"query {q.query_id} ({q.query_text!r}) mode={mode}"
        )


def test_zero_hit_query(spark, bundle):
    got = search_bundle(spark, bundle, "zzzmissingterm", k=10).toPandas()
    assert len(got) == 0


def test_empty_query(spark, bundle):
    got = search_bundle(spark, bundle, "  \t ", k=10).toPandas()
    assert len(got) == 0


def test_invariant_sha256(spark, bundle, corpus_pdf):
    """Per-row invariant (BASELINE.json input_hint): sha256(content) of
    every indexed doc equals the source table's."""
    import hashlib

    src = {
        (r.repo, r.path, r.commit): hashlib.sha256(
            r.content.encode()
        ).hexdigest()
        for r in corpus_pdf.itertuples()
    }
    joined = (
        bundle.doc_stats.join(bundle.doc_map, "doc_id")
        .select("repo", "path", "commit", "content_sha256")
        .collect()
    )
    assert len(joined) == len(src)
    for r in joined:
        assert src[(r.repo, r.path, r.commit)] == r.content_sha256


def test_invariant_tf_conservation(spark, bundle, oracle_docs):
    """Σ tf over the index == Σ token counts over the corpus (no lost or
    duplicated postings, incl. under segmenting)."""
    from rse_spark.tokenizer import tokenize

    want_tokens = sum(
        len(tokenize(c, "code")) for c in oracle_docs["content"]
    )
    got = bundle.term_stats.agg(F.sum("cf").alias("s")).collect()[0]["s"]
    assert int(got) == want_tokens
    # postings-side check too
    got2 = bundle.postings.agg(F.sum("df_seg").alias("s")).collect()[0]["s"]
    n_postings_oracle = sum(
        len(set(tokenize(c, "code"))) for c in oracle_docs["content"]
    )
    assert int(got2) == n_postings_oracle


def test_invariant_doc_ids_dense_unique(bundle):
    n = bundle.n_docs
    ids = [r.doc_id for r in bundle.doc_map.select("doc_id").collect()]
    assert sorted(ids) == list(range(n))


def test_jvm_tokenize_path_equivalent(spark, corpus_pdf, bundle):
    """The pure-JVM split + stem-dict-join tf pipeline must produce the
    same term stats as the tf-map UDF path used by build_index."""
    from rse_spark.index.build import (
        salted_term_stats,
        term_frequencies,
        tokenized,
    )

    corpus = spark.createDataFrame(corpus_pdf)
    ids = bundle.doc_map.select("doc_id", "repo", "path", "commit").join(
        corpus, ["repo", "path", "commit"]
    )
    tf_jvm = term_frequencies(
        tokenized(ids, "code", "jvm"), "code", "jvm"
    )
    a = bundle.term_stats.orderBy("term").toPandas()
    b = salted_term_stats(tf_jvm).orderBy("term").toPandas()
    pd.testing.assert_frame_equal(a, b)
