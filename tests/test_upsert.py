"""Doc-level upsert/delete: replaced docs' postings are physically gone,
new versions are searchable, stats stay consistent (reference semantics:
INSERT ... ON CONFLICT DO UPDATE, crawler.go:216-228)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rse_spark.index.storage import IndexStorage
from rse_spark.index.upsert import delete_docs, upsert_docs
from rse_spark.query.engine import search
from rse_spark.query.serve import DirectSearcher
from rse_spark.streaming.stream_index import append_batch

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_idx"))
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 300)
    n = append_batch(spark, docs, root, analyzer="simple",
                     content_col="text", docs_per_segment=64,
                     segments_per_group=2)
    assert n == 300
    return root, docs


def _search_df(spark, idx, q, k=10):
    return search(
        spark, idx.postings, q, n_docs=idx.n_docs, avgdl=idx.avgdl,
        term_stats=idx.term_stats, k=k, analyzer="simple",
    )


def test_upsert_replaces_old_postings(spark, built):
    root, docs = built
    st = IndexStorage(root)
    before = st.load(spark)
    # materialize everything from the pre-upsert index NOW — the upsert
    # rewrites files under it, so lazy reads later would hit stale
    # listings
    old_id = before.doc_map.filter(
        F.col("src_doc_id") == 7
    ).collect()[0]["doc_id"]
    df_before = {r["term"]: r["df"] for r in before.term_stats.collect()}
    # every old doc matches some common term; grab doc 7's first token
    old_text = docs.filter(F.col("doc_id") == 7).collect()[0]["text"]
    old_tok = old_text.split(" ")[0]

    updates = docs.filter(F.col("doc_id") == 7).withColumn(
        "text", F.lit("zzzfresh content only")
    )
    n_dead, n_new = upsert_docs(
        spark, updates, root, key=("src_doc_id",),
        analyzer="simple", content_col="text",
    )
    assert (n_dead, n_new) == (1, 1)

    after = st.load(spark)
    assert after.n_docs == 300  # replace, not append

    # the NEW version is findable and maps back to src_doc_id=7
    hits = _search_df(spark, after, "zzzfresh").collect()
    assert len(hits) == 1
    new_id = hits[0]["doc_id"]
    src = after.doc_map.filter(F.col("doc_id") == new_id).collect()[0]
    assert int(src["src_doc_id"]) == 7

    # the OLD doc_id is gone from every posting list of the index
    all_hits = _search_df(spark, after, old_tok, k=400).toPandas()
    assert old_id not in set(all_hits.doc_id)
    # and gone from doc metadata
    assert after.doc_stats.filter(F.col("doc_id") == old_id).count() == 0

    # term_stats df for the old token dropped by exactly doc 7's absence
    df_after = {r["term"]: r["df"] for r in after.term_stats.collect()}
    assert df_after[old_tok] == df_before[old_tok] - 1
    # DirectSearcher (serving tier) sees the same state
    ds = DirectSearcher(root, analyzer="simple")
    assert [h[0] for h in ds.search("zzzfresh", k=5)] == [new_id]


def test_upsert_insert_new_key(spark, built):
    root, docs = built
    import pandas as pd

    fresh = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9999], "text": ["qqqbrand new doc"],
        "lang": ["en"], "source": ["srcX"], "n_chars": [17],
    }))
    n_dead, n_new = upsert_docs(
        spark, fresh, root, key=("src_doc_id",),
        analyzer="simple", content_col="text",
    )
    assert (n_dead, n_new) == (0, 1)
    idx = IndexStorage(root).load(spark)
    assert idx.n_docs == 301
    assert _search_df(spark, idx, "qqqbrand").count() == 1


def test_delete_docs_compacts_groups(spark, built):
    root, docs = built
    st = IndexStorage(root)
    idx = st.load(spark)
    victims = idx.doc_stats.select("doc_id").orderBy("doc_id").limit(10)
    dead = {r["doc_id"] for r in victims.collect()}  # before files move
    n = delete_docs(spark, root, victims)
    assert n == 10
    after = st.load(spark)
    assert after.n_docs == 290
    # postings contain no dead ids (decode every list)
    from rse_spark.query.engine import decode_matched

    decoded = decode_matched(after.postings).select("doc_id").distinct()
    alive = {r["doc_id"] for r in decoded.collect()}
    assert not (alive & dead)
    # avgdl refreshed to the surviving docs
    want = after.doc_stats.agg(F.avg("doc_len")).collect()[0][0]
    assert abs(after.avgdl - float(want)) < 1e-9


def test_delete_by_query(spark, built):
    """ES _delete_by_query: the FULL boolean match set is removed,
    single-term survivors stay, stats refresh, and a re-run matches
    nothing (idempotent)."""
    import numpy as np

    from rse_spark.index.upsert import delete_by_query

    root, _docs = built
    s = DirectSearcher(root, analyzer="simple")
    a = s.term_docs("spark")
    b = s.term_docs("join")
    expect = np.intersect1d(a, b)
    assert len(expect) > 0, "fixture must have conjunctive matches"

    matched, deleted = delete_by_query(
        spark, root, "spark AND join", analyzer="simple", dry_run=True
    )
    assert (matched, deleted) == (len(expect), 0)

    matched, deleted = delete_by_query(
        spark, root, "spark AND join", analyzer="simple"
    )
    assert (matched, deleted) == (len(expect), len(expect))

    s2 = DirectSearcher(root, analyzer="simple")
    assert len(np.intersect1d(s2.term_docs("spark"),
                              s2.term_docs("join"))) == 0
    # docs matching only ONE of the terms must survive untouched
    assert np.array_equal(
        s2.term_docs("spark"), np.setdiff1d(a, expect)
    )
    assert s2.n_docs == 300 - len(expect)
    # idempotent: the second pass sees no survivors to match
    assert delete_by_query(
        spark, root, "spark AND join", analyzer="simple"
    ) == (0, 0)
    # negation works through the same surface: match set respects -atom
    m_neg, _ = delete_by_query(
        spark, root, "filter AND -group", analyzer="simple",
        dry_run=True,
    )
    f = s2.term_docs("filter")
    g = s2.term_docs("group")
    assert m_neg == len(np.setdiff1d(f, g))
