"""Row-group-pruned content fetch (query/serve.read_ids_pruned) and
the id-clustered content store writer (corpus_io.write_content_store).

Round-4 VERDICT item 5: the serving tier's snippet/phrase fetch must
actually SKIP row groups on an id-sorted store, proven by counters —
not assumed from the pyarrow ``in`` filter.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rse_spark.query.serve import read_ids_pruned

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _sorted_store(path, n=500, rows_per_group=50):
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc number {i} text" for i in range(n)],
    })
    pq.write_table(
        pa.Table.from_pandas(pdf), path, row_group_size=rows_per_group
    )


def test_pruned_read_skips_row_groups(tmp_path):
    path = str(tmp_path / "sorted.parquet")
    _sorted_store(path)  # 10 row groups of 50
    tbl, stats = read_ids_pruned(path, [3, 7, 12], ["doc_id", "text"],
                                 "doc_id")
    assert stats["row_groups_total"] == 10
    assert stats["row_groups_read"] == 1  # all three ids in group 0
    assert sorted(tbl["doc_id"].to_pylist()) == [3, 7, 12]

    tbl, stats = read_ids_pruned(path, [3, 499], ["doc_id", "text"],
                                 "doc_id")
    assert stats["row_groups_read"] == 2
    assert sorted(tbl["doc_id"].to_pylist()) == [3, 499]


def test_unsorted_store_cannot_prune(tmp_path):
    """The documented requirement: without id clustering every group's
    [min, max] spans the id space and nothing skips — the counters
    make that visible."""
    rng = np.random.default_rng(7)
    ids = rng.permutation(500).astype(np.int64)
    pdf = pd.DataFrame({"doc_id": ids, "text": [""] * 500})
    path = str(tmp_path / "unsorted.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), path, row_group_size=50)
    tbl, stats = read_ids_pruned(path, [250], ["doc_id", "text"],
                                 "doc_id")
    assert stats["row_groups_total"] == 10
    assert stats["row_groups_read"] == 10  # every group spans the space
    assert tbl["doc_id"].to_pylist() == [250]


def test_pruned_read_empty_and_missing(tmp_path):
    path = str(tmp_path / "sorted.parquet")
    _sorted_store(path)
    tbl, stats = read_ids_pruned(path, [10_000], ["doc_id", "text"],
                                 "doc_id")
    assert tbl.num_rows == 0
    assert stats["row_groups_read"] == 0
    tbl, _ = read_ids_pruned(path, [], ["doc_id", "text"], "doc_id")
    assert tbl.num_rows == 0


def test_write_content_store_prunes(spark, tmp_path):
    """End-to-end: write_content_store produces a layout where a
    bounded fetch touches a small fraction of row groups."""
    from rse_spark.sources.corpus_io import write_content_store

    docs = spark.read.parquet(DOCS)
    out = str(tmp_path / "store")
    write_content_store(
        docs, out, id_col="doc_id", target_rows_per_file=250,
        parquet_block_bytes=16 * 1024,
    )
    tbl, stats = read_ids_pruned(out, [1, 2, 3], ["doc_id", "text"],
                                 "doc_id")
    assert sorted(tbl["doc_id"].to_pylist()) == [1, 2, 3]
    assert stats["row_groups_total"] >= 2
    assert stats["row_groups_read"] < stats["row_groups_total"]


def test_snippets_record_fetch_stats(spark, tmp_path):
    """The serving surface exposes the skip counters per request."""
    from rse_spark.query.serve import DirectSearcher
    from rse_spark.streaming.stream_index import append_batch

    corpus_path = str(tmp_path / "corpus.parquet")
    _sorted_store(corpus_path, n=200, rows_per_group=20)
    root = str(tmp_path / "idx")
    docs = spark.read.parquet(corpus_path)
    append_batch(spark, docs, root, analyzer="simple",
                 content_col="text", batch_id=0)
    s = DirectSearcher(root, analyzer="simple")
    hits = s.search("number", k=5)
    assert hits
    snips = s.snippets(hits, "number", corpus_path,
                       key_col="src_doc_id")
    assert len(snips) == len(hits)
    st = s.last_fetch_stats
    assert st["row_groups_total"] == 10
    assert 0 < st["row_groups_read"] <= st["row_groups_total"]
    assert "meta_row_groups_total" in st


def test_partition_column_id_falls_back_to_dataset_read(tmp_path):
    """Hive-partitioned store where the id lives ONLY in the partition
    path: no physical file carries id_col, so row-group stats cannot
    prune — the read must fall back to a dataset-level read (partition
    pruning via filters) instead of silently returning empty
    (round-5 ADVICE #4)."""
    root = str(tmp_path / "hive")
    for i in range(4):
        d = os.path.join(root, f"doc_id={i}")
        os.makedirs(d)
        pq.write_table(
            pa.table({"text": [f"content {i}"]}),
            os.path.join(d, "part.parquet"),
        )
    tbl, stats = read_ids_pruned(root, [1, 3], ["doc_id", "text"],
                                 "doc_id")
    assert stats.get("dataset_fallback") == 1
    assert sorted(tbl["doc_id"].to_pylist()) == [1, 3]
    assert sorted(tbl["text"].to_pylist()) == ["content 1", "content 3"]
