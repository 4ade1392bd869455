"""Cross-index federation (query/federate.py): DFS global stats make
two half-corpus indexes rank exactly like one whole-corpus index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.storage import build_resumable
from rse_spark.query.federate import FederatedSearcher
from rse_spark.query.serve import DirectSearcher


@pytest.fixture(scope="module")
def split_indexes(spark, tmp_path_factory):
    """(whole_root, [half_root_a, half_root_b], src_maps): the same
    corpus as one index and as two disjoint halves."""
    base = tmp_path_factory.mktemp("fed")
    corpus = spark.createDataFrame(
        gen_code_corpus(0.0004).reset_index(names="src_id")
    )
    whole = str(base / "whole")
    build_resumable(spark, corpus, whole, analyzer="code",
                    docs_per_segment=64)
    halves = []
    for i, pred in enumerate(
        (F.col("src_id") % 2 == 0, F.col("src_id") % 2 == 1)
    ):
        r = str(base / f"half{i}")
        build_resumable(spark, corpus.filter(pred), r,
                        analyzer="code", docs_per_segment=64)
        halves.append(r)

    def src_map(root):
        return {
            int(r["doc_id"]): int(r["src_id"])
            for r in spark.read.parquet(f"{root}/enriched")
            .select("doc_id", "src_id").collect()
        }

    return whole, halves, (src_map(whole), [src_map(h) for h in halves])


def test_federated_equals_merged_index(split_indexes):
    """DFS-stat federation over the halves == the single whole-corpus
    index, doc-for-doc and score-for-score."""
    whole, halves, (whole_map, half_maps) = split_indexes
    single = DirectSearcher(whole, analyzer="code")
    fed = FederatedSearcher(halves, analyzer="code")
    for q in gen_query_set(0.0004, n_queries=8).itertuples():
        for mode in ("or", "and"):
            want = [
                (whole_map[d], round(s, 9), m)
                for d, s, m in single.search(q.query_text, k=10,
                                             mode=mode)
            ]
            got = [
                (half_maps[i][d], round(s, 9), m)
                for i, d, s, m in fed.search(q.query_text, k=10,
                                             mode=mode)
            ]
            assert [g[0] for g in got] == [w[0] for w in want], (
                q.query_text, mode,
            )
            for (gd, gs, gm), (wd, ws, wm) in zip(got, want):
                assert abs(gs - ws) < 1e-9 and gm == wm


def test_federated_vs_naive_merge_differs(split_indexes):
    """Scoring each half with its OWN stats (the query_then_fetch
    skew) must disagree with the global ranking somewhere — proving
    the DFS phase is load-bearing, not decorative."""
    whole, halves, (whole_map, half_maps) = split_indexes
    single = DirectSearcher(whole, analyzer="code")
    parts = [DirectSearcher(h, analyzer="code") for h in halves]
    diffs = 0
    for q in gen_query_set(0.0004, n_queries=8).itertuples():
        naive = sorted(
            (
                (half_maps[i][d], s)
                for i, p in enumerate(parts)
                for d, s, _m in p.search(q.query_text, k=10)
            ),
            key=lambda h: (-h[1], h[0]),
        )[:10]
        want = [
            whole_map[d]
            for d, _s, _m in single.search(q.query_text, k=10)
        ]
        if [d for d, _s in naive] != want:
            diffs += 1
    assert diffs > 0, "halves were statistically identical; probe weak"


def test_federated_validation(split_indexes):
    _whole, halves, _maps = split_indexes
    with pytest.raises(ValueError, match="roots"):
        FederatedSearcher([])
    fed = FederatedSearcher(halves, analyzer="code")
    assert fed.search("zzzmissingterm") == []
    assert fed.search("   ") == []
