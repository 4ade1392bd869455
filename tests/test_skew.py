"""Hot-term skew: a stop-word-like term in ~95% of docs must not change
correctness — salted term stats equal a plain aggregation, postings
stay conserved, and BM25 parity holds (SURVEY.md §7.4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.fixtures import gen_code_corpus
from rse_spark.index.build import (
    build_index,
    enrich,
    explode_tf,
    salted_term_stats,
)
from rse_spark.query.engine import search_bundle
from rse_spark.query.oracle import bm25_oracle


@pytest.fixture(scope="module")
def skewed_pdf():
    pdf = gen_code_corpus(0.0003)
    # inject a mega-hot term into 95% of docs (several occurrences)
    hot = pdf.index[pdf.index % 20 != 0]
    pdf.loc[hot, "content"] = pdf.loc[hot, "content"] + (
        " zzhot" * 7
    )
    return pdf


def test_salted_equals_plain_agg(spark, skewed_pdf):
    corpus = spark.createDataFrame(skewed_pdf).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    tf = explode_tf(enrich(corpus, "code"))
    salted = salted_term_stats(tf, n_salts=16).orderBy("term").toPandas()
    plain = (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(16)).cast("int")
        )
        .orderBy("term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(salted, plain)
    hot_row = salted[salted.term == "zzhot"]
    assert int(hot_row.df.iloc[0]) == (len(skewed_pdf) * 19) // 20
    assert int(hot_row.cf.iloc[0]) == int(hot_row.df.iloc[0]) * 7


def test_bm25_parity_on_skewed_corpus(spark, skewed_pdf):
    corpus = spark.createDataFrame(skewed_pdf)
    bundle = build_index(spark, corpus, analyzer="code", docs_per_segment=32)
    dm = bundle.doc_map.toPandas().merge(
        skewed_pdf, on=["repo", "path", "commit"]
    )[["doc_id", "content"]]
    for q in ["zzhot", "zzhot parse index", "return zzhot def"]:
        got = [
            (int(r.doc_id), round(float(r.score), 9))
            for r in search_bundle(spark, bundle, q, k=10).collect()
        ]
        want = [
            (int(r.doc_id), round(float(r.score), 9))
            for r in bm25_oracle(dm, q, k=10).itertuples()
        ]
        assert got == want, q
