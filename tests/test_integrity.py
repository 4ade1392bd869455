"""Index integrity verification (index/integrity.py): the north_rule's
per-row sha256 invariant vs the source table + structural checks, and
detection of deliberate corruption."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rse_spark.index.integrity import check_index
from rse_spark.index.storage import IndexStorage, build_resumable

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("integrity_idx"))
    corpus = spark.read.parquet(DOCS)
    build_resumable(
        spark, corpus, root, analyzer="simple", content_col="text",
        docs_per_segment=64, segments_per_group=4,
    )
    return root


def test_clean_index_passes(spark, built):
    corpus = spark.read.parquet(DOCS)
    report = check_index(
        spark, built, corpus=corpus, content_col="text",
    )
    assert report["ok"], report
    assert report["content_sha256"]["pass"]
    assert report["content_sha256"]["rows"] == 500
    assert report["content_sha256"]["sha_mismatch"] == 0
    assert report["doc_ids"]["pass"]
    assert report["term_stats"]["pass"]
    assert report["lineage"]["pass"]
    assert report["codec_sample"]["lists_checked"] > 0
    assert report["codec_sample"]["pass"]


def test_detects_source_drift(spark, built):
    """A corpus whose content changed after indexing must fail the
    per-row sha equality (the crawl-vs-store drift GSE could never
    detect)."""
    corpus = spark.read.parquet(DOCS)
    drifted = corpus.withColumn(
        "text",
        F.when(F.col("doc_id") < 10, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    )
    report = check_index(spark, built, corpus=drifted, content_col="text")
    assert not report["ok"]
    assert report["content_sha256"]["sha_mismatch"] == 10


def test_detects_missing_rows(spark, built):
    """Indexed docs absent from the source table are reported."""
    corpus = spark.read.parquet(DOCS).filter(F.col("doc_id") >= 50)
    report = check_index(spark, built, corpus=corpus, content_col="text")
    assert not report["ok"]
    assert report["content_sha256"]["missing_in_corpus"] == 50


def test_detects_stale_stats_and_lineage(spark, built, tmp_path_factory):
    """Corrupt a COPY of the index: stale term_stats and an orphan
    postings partition both fail their checks."""
    import shutil

    root = os.path.join(
        str(tmp_path_factory.mktemp("integrity_bad")), "idx"
    )
    shutil.copytree(built, root)
    st = IndexStorage(root)
    # stale term_stats: drop a term
    ts = spark.read.parquet(st._p("term_stats"))
    pruned = ts.filter(F.col("term") != "the").collect()
    # rewrite via a fresh frame (avoid read/overwrite overlap)
    spark.createDataFrame(pruned, ts.schema).write.mode(
        "overwrite"
    ).parquet(st._p("term_stats"))
    # orphan partition: a group dir with no manifest unit
    groups = [
        p for p in os.listdir(st._p("postings"))
        if p.startswith("seg_group=")
    ]
    src = os.path.join(st._p("postings"), groups[0])
    shutil.copytree(
        src, os.path.join(st._p("postings"), "seg_group=999")
    )
    report = check_index(spark, root)
    assert not report["ok"]
    assert not report["term_stats"]["pass"]
    assert not report["lineage"]["pass"]
    assert 999 in report["lineage"]["live_groups"]


def test_integrity_after_stream_grow_and_compact(spark, tmp_path_factory):
    """The north_rule sha invariant survives the full index lifecycle:
    stream-grown in sparse batches, then compacted (doc ids renumber,
    segments rewrite) — check_index stays green against the source."""
    from rse_spark.index.compact import compact_groups
    from rse_spark.streaming.stream_index import append_batch

    root = str(tmp_path_factory.mktemp("integrity_lifecycle"))
    docs = spark.read.parquet(DOCS)
    for i, (lo, hi) in enumerate([(0, 80), (80, 150), (150, 300)]):
        append_batch(
            spark, docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            root, analyzer="simple", content_col="text",
            docs_per_segment=64, segments_per_group=4, batch_id=i,
        )
    assert compact_groups(spark, root, min_fill=0.5)["merged"] >= 2
    report = check_index(spark, root, corpus=docs, content_col="text")
    assert report["ok"], report
    assert report["content_sha256"]["rows"] == 300
    assert report["content_sha256"]["join_key"] == ["src_doc_id"]


def test_reports_unindexed_corpus_rows(spark, built):
    """Corpus rows the index never ingested are ALWAYS reported
    (missing_in_index); they fail the check only under
    expect_full_coverage (a gated build legitimately indexes fewer
    rows than its source)."""
    corpus = spark.read.parquet(DOCS)
    extra = corpus.withColumn("doc_id", F.col("doc_id") + 10_000)
    superset = corpus.unionByName(extra)
    report = check_index(spark, built, corpus=superset,
                         content_col="text")
    assert report["content_sha256"]["missing_in_index"] == 500
    assert report["content_sha256"]["pass"]  # report-only by default
    report = check_index(spark, built, corpus=superset,
                         content_col="text", expect_full_coverage=True)
    assert not report["content_sha256"]["pass"]
    assert not report["ok"]
    # full coverage with the true source still passes
    report = check_index(spark, built, corpus=corpus,
                         content_col="text", expect_full_coverage=True)
    assert report["ok"], report


def test_codec_sample_not_vacuous(tmp_path):
    """An empty/missing postings tree must FAIL the codec canary when
    lists are expected, not pass with lists_checked=0."""
    from rse_spark.index.integrity import _decode_sample

    root = str(tmp_path / "empty_idx")
    out = _decode_sample(root, 64, 50, expect_lists=True)
    assert not out["pass"] and out["lists_checked"] == 0
    # and stays a clean pass when the manifest says there is nothing
    out = _decode_sample(root, 64, 50, expect_lists=False)
    assert out["pass"] and out["lists_checked"] == 0


def test_check_cli(spark, built, capsys):
    from rse_spark.cli import main

    rc = main(["check", "--root", built, "--corpus", DOCS,
               "--content-col", "text"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] and report["content_sha256"]["pass"]
