"""Reindex into a new root: rank/score invariance, query filtering,
re-layout, positional carry-over, integrity of the destination.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rse_spark.index.reindex import reindex
from rse_spark.index.storage import IndexStorage
from rse_spark.query.serve import DirectSearcher
from rse_spark.streaming.stream_index import append_batch

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("reidx_src"))
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 300)
    append_batch(spark, docs, root, analyzer="simple",
                 content_col="text", docs_per_segment=64,
                 segments_per_group=2, with_positions=True)
    return root


def _by_src_id(searcher, root, spark, q, k=10):
    """[(src_doc_id, score, matched)] — results in the SOURCE id
    space, so two indexes with different internal numbering compare."""
    hits = searcher.search(q, k=k)
    m = searcher._key_map([d for d, *_ in hits], "src_doc_id")
    return [
        (int(m[d]), round(s, 9), n) for d, s, n in hits
    ]


def test_reindex_full_rank_identical(spark, src, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reidx_dst")) + "/idx"
    summary = reindex(spark, src, dst)
    assert summary["n_docs"] == 300
    s1 = DirectSearcher(src, analyzer="simple")
    s2 = DirectSearcher(dst, analyzer="simple")
    assert s2.n_docs == s1.n_docs
    assert abs(s2.avgdl - s1.avgdl) < 1e-9
    for q in ("spark join", "merge filter table", "the data"):
        assert _by_src_id(s2, dst, spark, q) == \
            _by_src_id(s1, src, spark, q)
    # positional sidecar carried over corpus-free: same phrase answer
    # in the source id space (hit set + occurrence counts)
    ph1 = s1.phrase_search_positions("the data", k=300)
    ph2 = s2.phrase_search_positions("the data", k=300)
    assert len(ph1) > 0
    m1 = s1._key_map([d for d, *_ in ph1], "src_doc_id")
    m2 = s2._key_map([d for d, *_ in ph2], "src_doc_id")
    assert {(int(m1[d]), rest[0]) for d, *rest in ph1} == \
        {(int(m2[d]), rest[0]) for d, *rest in ph2}


def test_reindex_filtered(spark, src, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("reidx_filt")) + "/idx"
    s1 = DirectSearcher(src, analyzer="simple")
    keep = s1.term_docs("spark")
    summary = reindex(spark, src, dst, ql="spark")
    assert summary["n_docs"] == len(keep)
    s2 = DirectSearcher(dst, analyzer="simple")
    assert s2.n_docs == len(keep)
    # every surviving doc (by source id) matched the filter
    all_src = IndexStorage(dst).docs_meta(spark).select(
        "src_doc_id"
    ).collect()
    kept_src = {int(r["src_doc_id"]) for r in all_src}
    m1 = s1._key_map(keep.tolist(), "src_doc_id")
    assert kept_src == {int(v) for v in m1.values()}
    # stats are the DESTINATION corpus's: fewer docs, fresh idf
    assert s2.n_docs < s1.n_docs
    assert s2.search("spark", k=5)  # still searchable
    # destination integrity: manifest groups == live partitions,
    # stats recompute clean (source check skipped: no corpus snapshot)
    from rse_spark.index.integrity import check_index

    rep = check_index(spark, dst)
    for key in ("doc_ids", "term_stats", "corpus_stats", "lineage",
                "codec_sample"):
        assert rep[key]["pass"], (key, rep[key])


def test_reindex_relayout_scores_invariant(spark, src, tmp_path_factory):
    """Changing segment sizing/bucketing must not move a single score:
    df/n_docs/avgdl are layout-independent."""
    dst = str(tmp_path_factory.mktemp("reidx_layout")) + "/idx"
    reindex(spark, src, dst, docs_per_segment=32,
            segments_per_group=4, n_buckets=8)
    s1 = DirectSearcher(src, analyzer="simple")
    s2 = DirectSearcher(dst, analyzer="simple")
    lay = IndexStorage(dst).completed_units()["docs"]["layout"]
    assert (lay["docs_per_segment"], lay["n_buckets"]) == (32, 8)
    for q in ("spark join", "group sort"):
        assert _by_src_id(s2, dst, spark, q) == \
            _by_src_id(s1, src, spark, q)


def test_reindex_validation(spark, src, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("reidx_bad"))
    with pytest.raises(ValueError, match="matches no documents"):
        reindex(spark, src, base + "/x", ql="zzznosuchterm")
    with pytest.raises(FileExistsError):
        reindex(spark, src, src)  # non-empty destination
    with pytest.raises(FileNotFoundError):
        reindex(spark, base + "/notanindex", base + "/y")


def test_reindex_refuses_to_drop_corpus_built_sidecar(
    spark, tmp_path_factory
):
    """A source whose positional sidecar was built FROM THE CORPUS
    (no tf_positions in enriched) cannot be carried corpus-free —
    reindex must refuse rather than silently ship a destination
    without the phrase capability the source had."""
    from rse_spark.index.positions import build_positions

    root = str(tmp_path_factory.mktemp("reidx_legacy")) + "/idx"
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 128)
    append_batch(spark, docs, root, analyzer="simple",
                 content_col="text", docs_per_segment=64,
                 segments_per_group=2, with_positions=False)
    build_positions(spark, docs, root, analyzer="simple",
                    content_col="text")
    dst = str(tmp_path_factory.mktemp("reidx_legacy_dst")) + "/idx"
    with pytest.raises(ValueError, match="corpus-built"):
        reindex(spark, root, dst)
    # the deliberate opt-out works and documents the drop
    summary = reindex(spark, root, dst, with_positions=False)
    assert summary["layout"]["positions"] is False
