"""Index aliases: blue/green swaps that live replicas follow.

The flip is one atomic file replace; a DirectSearcher opened through
the alias re-resolves on its next query after a flip (same bounded
staleness as a writer commit) — the serving-side half of the
reindex-then-swap lifecycle.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from rse_spark.index.alias import get_alias, resolve, set_alias
from rse_spark.query.serve import DirectSearcher
from rse_spark.streaming.stream_index import append_batch

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("alias_idx")
    roots = []
    for lo, hi in ((0, 150), (150, 300)):
        root = str(base / f"idx_{lo}")
        docs = spark.read.parquet(DOCS).filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        append_batch(spark, docs, root, analyzer="simple",
                     content_col="text", docs_per_segment=64,
                     segments_per_group=2)
        roots.append(root)
    return roots


def test_alias_resolve_and_validation(two_indexes, tmp_path):
    a, b = two_indexes
    alias = str(tmp_path / "current")
    set_alias(alias, a)
    assert get_alias(alias) and resolve(alias) == get_alias(alias)
    # a plain index root resolves to itself
    assert resolve(a) == a
    with pytest.raises(FileNotFoundError):
        set_alias(str(tmp_path / "x"), str(tmp_path / "notanindex"))
    with pytest.raises(ValueError, match="index root"):
        set_alias(a, b)  # refuse to shadow a real index
    # chains refused: alias -> alias
    chained = str(tmp_path / "chain")
    set_alias(chained, a)
    import os
    with open(os.path.join(chained, "ALIAS"), "w") as f:
        f.write(alias)
    with pytest.raises(ValueError, match="chain"):
        resolve(chained)


def test_live_searcher_follows_flip(two_indexes, tmp_path):
    a, b = two_indexes
    alias = str(tmp_path / "current")
    set_alias(alias, a)
    s = DirectSearcher(alias, analyzer="simple")
    sa = DirectSearcher(a, analyzer="simple")
    sb = DirectSearcher(b, analyzer="simple")
    assert s.search("spark join", k=10) == sa.search("spark join", k=10)
    assert s.n_docs == sa.n_docs

    set_alias(alias, b)  # blue/green flip, no replica restart
    assert s.search("spark join", k=10) == sb.search("spark join", k=10)
    assert s.n_docs == sb.n_docs
    # flip back: the same instance returns, caches rebuilt again
    set_alias(alias, a)
    assert s.search("spark join", k=10) == sa.search("spark join", k=10)


def test_alias_cli(two_indexes, tmp_path):
    a, b = two_indexes
    alias = str(tmp_path / "cli_alias")
    out = subprocess.run(
        [sys.executable, "-m", "rse_spark.cli", "alias",
         "--path", alias, "--target", a],
        capture_output=True, text=True, check=True,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["target"].endswith(a.lstrip("/").split("/")[-1])
    out = subprocess.run(
        [sys.executable, "-m", "rse_spark.cli", "alias",
         "--path", alias],
        capture_output=True, text=True, check=True,
    )
    assert json.loads(out.stdout.strip().splitlines()[-1])["target"] \
        == rec["target"]


def test_sharded_coordinator_follows_flip(two_indexes, tmp_path):
    """A ShardedSearcher opened through an alias re-splits its
    topology over the new root after a flip — no coordinator
    restart."""
    from rse_spark.query.shard import ShardedSearcher

    a, b = two_indexes
    alias = str(tmp_path / "shard_alias")
    set_alias(alias, a)
    coord = ShardedSearcher(alias, n_shards=2, analyzer="simple")
    sa = DirectSearcher(a, analyzer="simple")
    sb = DirectSearcher(b, analyzer="simple")
    assert coord.search("spark join", k=10) == \
        sa.search("spark join", k=10)
    set_alias(alias, b)
    assert coord.search("spark join", k=10) == \
        sb.search("spark join", k=10)
    assert coord.root == resolve(alias)
