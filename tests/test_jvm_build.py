"""The JVM stage A (tokens_col split + distinct-term dict stemming,
flat enriched format) must produce an index that is stat- and
rank-identical to the Arrow-UDF stage A. This is the gate for making
'jvm' the default build path (round-1 VERDICT item 2)."""

from __future__ import annotations

import pytest

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.storage import IndexStorage, build_resumable
from rse_spark.query.engine import search


@pytest.mark.parametrize("analyzer", ["code", "simple"])
def test_jvm_build_matches_udf(spark, tmp_path_factory, analyzer):
    corpus_pdf = gen_code_corpus(0.001)  # ~500 docs
    loaded = {}
    for path in ("jvm", "udf"):
        corpus = spark.createDataFrame(corpus_pdf)
        root = str(tmp_path_factory.mktemp(f"bld_{path}_{analyzer}"))
        build_resumable(
            spark, corpus, root, analyzer=analyzer,
            docs_per_segment=64, tokenize_path=path,
        )
        loaded[path] = IndexStorage(root).load(spark)
    a, b = loaded["jvm"], loaded["udf"]
    assert a.n_docs == b.n_docs
    assert abs(a.avgdl - b.avgdl) < 1e-9
    ta = sorted(
        map(tuple, a.term_stats.select("term", "df", "cf").collect())
    )
    tb = sorted(
        map(tuple, b.term_stats.select("term", "df", "cf").collect())
    )
    assert ta == tb
    for q in gen_query_set(0.001, n_queries=5).itertuples():
        got = {}
        for name, idx in loaded.items():
            got[name] = [
                (r.doc_id, round(r.score, 9), r.n_terms_matched)
                for r in search(
                    spark, idx.postings, q.query_text,
                    n_docs=idx.n_docs, avgdl=idx.avgdl,
                    term_stats=idx.term_stats, k=10, analyzer=analyzer,
                ).collect()
            ]
        assert got["jvm"] == got["udf"], q.query_text


def test_default_is_udf(spark, tmp_path_factory):
    # 'udf' measured ~3x faster than 'jvm' at 32 cores (see storage.py
    # docstring); 'auto' must resolve to the measured winner
    corpus = spark.createDataFrame(gen_code_corpus(0.0004))
    root = str(tmp_path_factory.mktemp("bld_auto"))
    store = build_resumable(spark, corpus, root, analyzer="code",
                            docs_per_segment=64)
    assert store.completed_units()["docs"]["tokenize_path"] == "udf"


def test_append_honors_jvm_enriched_format(spark, tmp_path_factory):
    """append_batch on a tokenize_path='jvm' index must write FLAT
    enriched rows (round-2 ADVICE: mixing array-form rows into a flat
    dir silently nulls columns on later reads)."""
    from pyspark.sql import functions as F

    from rse_spark.streaming.stream_index import append_batch

    corpus_pdf = gen_code_corpus(0.001)
    half = len(corpus_pdf) // 2
    root = str(tmp_path_factory.mktemp("bld_jvm_append"))
    build_resumable(
        spark, spark.createDataFrame(corpus_pdf.iloc[:half]), root,
        analyzer="simple", docs_per_segment=64, tokenize_path="jvm",
    )
    n = append_batch(
        spark, spark.createDataFrame(corpus_pdf.iloc[half:]), root,
        analyzer="simple", content_col="content",
        docs_per_segment=64, segments_per_group=4,
    )
    assert n == len(corpus_pdf) - half
    store = IndexStorage(root)
    enriched = spark.read.parquet(store._p("enriched"))
    # flat schema throughout — no array columns, no nulls
    assert "tf_terms" not in enriched.columns
    assert {"doc_id", "term", "tf", "doc_len"} <= set(enriched.columns)
    assert enriched.filter(F.col("term").isNull()
                           | F.col("tf").isNull()).count() == 0
    # the grown index answers queries over BOTH halves
    idx = store.load(spark)
    assert idx.n_docs == len(corpus_pdf)
    hits = search(
        spark, idx.postings, "spark index",
        n_docs=idx.n_docs, avgdl=idx.avgdl,
        term_stats=idx.term_stats, k=10, analyzer="simple",
    ).collect()
    assert hits


def test_append_rejects_nothing_but_matches_udf_default(
    spark, tmp_path_factory
):
    """A udf-format index keeps array-form enriched rows on append."""
    from rse_spark.streaming.stream_index import append_batch

    corpus_pdf = gen_code_corpus(0.0004)
    half = len(corpus_pdf) // 2
    root = str(tmp_path_factory.mktemp("bld_udf_append"))
    build_resumable(
        spark, spark.createDataFrame(corpus_pdf.iloc[:half]), root,
        analyzer="simple", docs_per_segment=64, tokenize_path="udf",
    )
    append_batch(
        spark, spark.createDataFrame(corpus_pdf.iloc[half:]), root,
        analyzer="simple", content_col="content", docs_per_segment=64,
    )
    enriched = spark.read.parquet(IndexStorage(root)._p("enriched"))
    assert "tf_terms" in enriched.columns
