"""Scatter-gather sharded serving (query/shard.py): per-shard local
top-k with global stats merges into the EXACT global ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rse_spark.fixtures import gen_code_corpus, gen_query_set
from rse_spark.index.storage import build_resumable
from rse_spark.query.serve import DirectSearcher
from rse_spark.query.shard import ShardedSearcher, list_seg_groups


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    r = str(tmp_path_factory.mktemp("shard_idx"))
    corpus = spark.createDataFrame(gen_code_corpus(0.0004))
    build_resumable(spark, corpus, r, analyzer="code",
                    docs_per_segment=32, segments_per_group=2)
    return r


def test_seg_group_discovery(root):
    groups = list_seg_groups(root)
    assert len(groups) >= 4, "fixture must span several groups"
    assert groups == sorted(groups, key=int)


@pytest.mark.parametrize("n_shards", [1, 2, 3, 5])
def test_sharded_equals_global(root, n_shards):
    single = DirectSearcher(root, analyzer="code")
    sharded = ShardedSearcher(root, n_shards, analyzer="code")
    for q in gen_query_set(0.0004, n_queries=8).itertuples():
        for mode in ("or", "and"):
            want = single.search(q.query_text, k=10, mode=mode)
            got = sharded.search(q.query_text, k=10, mode=mode)
            assert got == want, (q.query_text, mode, n_shards)


def test_shards_partition_the_docs(root):
    """Every doc id is scored by exactly one shard (the groups
    partition the doc space)."""
    sharded = ShardedSearcher(root, 3, analyzer="code")
    seen: set[int] = set()
    for s in sharded.shards:
        ids = {d for d, _s, _m in s.search("parse", k=10**6)}
        assert not ids & seen
        seen |= ids
    single = DirectSearcher(root, analyzer="code")
    assert seen == {
        d for d, _s, _m in single.search("parse", k=10**6)
    }


def test_sharded_min_match_and_terms(root):
    single = DirectSearcher(root, analyzer="code")
    sharded = ShardedSearcher(root, 2, analyzer="code")
    q = "parse index merge"
    assert sharded.search(q, k=20, min_match=2) == \
        single.search(q, k=20, min_match=2)
    terms = ["parse", "index"]
    assert sharded.search_terms(terms, k=20, boosts={"parse": 2.0}) \
        == single.search_terms(terms, k=20, boosts={"parse": 2.0})


def test_more_shards_than_groups(root):
    n = len(list_seg_groups(root))
    sharded = ShardedSearcher(root, n + 4, analyzer="code")
    assert len(sharded.shards) == n  # empty shards dropped
    single = DirectSearcher(root, analyzer="code")
    assert sharded.search("parse index", k=10) == \
        single.search("parse index", k=10)
    with pytest.raises(ValueError, match="n_shards"):
        ShardedSearcher(root, 0)


def test_topology_rebuild_on_append(spark, root, tmp_path_factory):
    """A writer commit that adds segment groups triggers a re-split:
    the sharded view serves the new docs without reconstruction."""
    import shutil

    from rse_spark.streaming.stream_index import append_batch

    r2 = str(tmp_path_factory.mktemp("shard_grow"))
    shutil.copytree(root, r2, dirs_exist_ok=True)
    sharded = ShardedSearcher(r2, 2, analyzer="code")
    before_groups = [list(g) for g in sharded.shard_groups]
    sharded.search("parse", k=5)  # warm
    extra = spark.createDataFrame(
        gen_code_corpus(0.0004).assign(
            content=lambda d: d.content + " zzznewterm"
        )
    )
    append_batch(spark, extra, r2, analyzer="code")
    hits = sharded.search("zzznewterm", k=5)
    assert hits, "appended docs must be visible after re-split"
    assert [list(g) for g in sharded.shard_groups] != before_groups
    single = DirectSearcher(r2, analyzer="code")
    assert sharded.search("parse index", k=10) == \
        single.search("parse index", k=10)
