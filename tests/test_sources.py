"""Multi-format corpus ingestion: each source format normalizes to the
corpus shape, feeds the index builder, and the JSONL sink round-trips."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rse_spark.sources import read_corpus, write_jsonl

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def corpus_files(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("formats"))
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 50).select(
        "doc_id", "text", "lang"
    )
    docs.write.parquet(f"{root}/c.parquet")
    docs.write.json(f"{root}/c.jsonl")
    docs.write.option("header", "true").csv(f"{root}/c.csv")
    txt = str(tmp_path_factory.mktemp("rawtext"))
    for r in docs.limit(5).collect():
        with open(os.path.join(txt, f"doc{r['doc_id']}.txt"), "w") as f:
            f.write(r["text"])
    return root, txt, docs


@pytest.mark.parametrize("fmt", ["parquet", "jsonl", "csv"])
def test_tabular_formats_normalize(spark, corpus_files, fmt):
    root, _, docs = corpus_files
    ext = {"parquet": "parquet", "jsonl": "jsonl", "csv": "csv"}[fmt]
    got = read_corpus(spark, f"{root}/c.{ext}")
    assert "content" in got.columns
    want = {
        (int(r["doc_id"]), r["text"]) for r in docs.collect()
    }
    have = {
        (int(r["doc_id"]), r["content"]) for r in got.collect()
    }
    assert have == want


def test_autodetect_by_directory_contents(spark, corpus_files):
    root, _, _ = corpus_files
    assert read_corpus(spark, f"{root}/c.jsonl").count() == 50


def test_rawtext_one_doc_per_file(spark, corpus_files):
    _, txt, docs = corpus_files
    got = read_corpus(spark, txt, fmt="text")
    rows = got.collect()
    assert len(rows) == 5
    texts = {r["content"] for r in rows}
    want = {r["text"] for r in docs.limit(5).collect()}
    assert texts == want
    assert all(r["path"].endswith(".txt") for r in rows)


def test_jsonl_corpus_feeds_builder(spark, corpus_files, tmp_path_factory):
    root, _, _ = corpus_files
    from rse_spark.index.storage import IndexStorage, build_resumable
    from rse_spark.query.engine import search

    corpus = read_corpus(spark, f"{root}/c.jsonl")
    idx_root = str(tmp_path_factory.mktemp("jsonl_idx"))
    build_resumable(spark, corpus, idx_root, analyzer="simple",
                    docs_per_segment=32)
    idx = IndexStorage(idx_root).load(spark)
    assert idx.n_docs == 50
    hits = search(
        spark, idx.postings, "spark join", n_docs=idx.n_docs,
        avgdl=idx.avgdl, term_stats=idx.term_stats, k=5, analyzer="simple",
    )
    assert hits.count() == 5


def test_jsonl_sink_roundtrip(spark, corpus_files, tmp_path_factory):
    root, _, docs = corpus_files
    out = str(tmp_path_factory.mktemp("sink")) + "/out.jsonl"
    write_jsonl(docs.select("doc_id", "lang"), out)
    back = spark.read.json(out)
    assert back.count() == 50
    assert {r["doc_id"] for r in back.collect()} == set(range(50))
