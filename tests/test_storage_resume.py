"""Checkpointed build: kill after N units, resume, identical final index
(SURVEY.md §5.4); lineage manifest recorded per unit."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.fixtures import gen_code_corpus
from rse_spark.index.storage import IndexStorage, build_resumable


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(gen_code_corpus(0.0002)).persist()


def _postings_fingerprint(spark, root):
    idx = IndexStorage(root).load(spark)
    return (
        idx.postings.select(
            "term", "segment_id", "df_seg", F.sha2(F.hex("payload"), 256).alias("h")
        )
        .orderBy("term", "segment_id")
        .toPandas()
    )


def test_kill_resume_identical(spark, corpus, tmp_path_factory):
    clean_root = str(tmp_path_factory.mktemp("idx_clean"))
    resumed_root = str(tmp_path_factory.mktemp("idx_resumed"))

    build_resumable(
        spark, corpus, clean_root, docs_per_segment=16, segments_per_group=2,
        groups_per_job=1,
    )

    # killed run: crash after 2 committed groups
    with pytest.raises(RuntimeError, match="injected failure"):
        build_resumable(
            spark, corpus, resumed_root,
            docs_per_segment=16, segments_per_group=2, fail_after_units=2,
            groups_per_job=1,
        )
    done_before = set(IndexStorage(resumed_root).completed_units())
    assert "docs" in done_before
    assert sum(1 for u in done_before if u.startswith("group=")) == 2

    # resume: completes, does NOT recompute committed units
    store = build_resumable(
        spark, corpus, resumed_root, docs_per_segment=16, segments_per_group=2,
        groups_per_job=1,
    )
    manifest = store.manifest()
    units = [r["unit"] for r in manifest]
    assert "docs" in units
    n_groups = sum(1 for u in units if u.startswith("group="))
    assert n_groups >= 3

    a = _postings_fingerprint(spark, clean_root)
    b = _postings_fingerprint(spark, resumed_root)
    pd.testing.assert_frame_equal(a, b)

    # lineage fields present
    for rec in manifest:
        assert rec["status"] == "done"
        assert "wall_ms" in rec
        if rec["unit"].startswith("group="):
            assert {"sha", "rows", "n_postings", "doc_lo", "doc_hi"} <= set(rec)


def test_loaded_index_queryable(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_q"))
    build_resumable(spark, corpus, root, docs_per_segment=16)
    idx = IndexStorage(root).load(spark)

    from rse_spark.query.engine import search

    hits = search(
        spark, idx.postings, "parse index", n_docs=idx.n_docs,
        avgdl=idx.avgdl, term_stats=idx.term_stats, k=5,
    ).collect()
    assert 0 < len(hits) <= 5

    # matches the in-memory build path end-to-end
    from rse_spark.index.build import build_index
    from rse_spark.query.engine import search_bundle

    bundle = build_index(spark, corpus, docs_per_segment=16)
    hits2 = search_bundle(spark, bundle, "parse index", k=5).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in hits] == [
        (r.doc_id, round(r.score, 9)) for r in hits2
    ]


def test_load_sizes_postings_partitions(spark, corpus, tmp_path_factory):
    """load() derives the postings partition count from on-disk bytes:
    a tiny many-file index collapses to one scan task instead of being
    spread across defaultParallelism, and the rows are unchanged."""
    root = str(tmp_path_factory.mktemp("idx_sz"))
    build_resumable(spark, corpus, root, docs_per_segment=16)
    store = IndexStorage(root)
    idx = store.load(spark)

    n_bytes_parts = store._size_partitions(spark, "postings")
    assert n_bytes_parts == 1  # well under one maxPartitionBytes
    assert idx.postings.rdd.getNumPartitions() == 1

    raw = spark.read.parquet(f"{root}/postings")
    a = sorted(map(tuple, idx.postings.select("term", "segment_id").collect()))
    b = sorted(map(tuple, raw.select("term", "segment_id").collect()))
    assert a == b
