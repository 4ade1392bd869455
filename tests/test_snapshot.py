"""Snapshot/restore: generation-consistent point-in-time index copies.

A snapshot taken before a mutation must serve the PRE-mutation results
after restore; a copy torn by a concurrent writer commit must retry
and, if writers never stop, fail loudly instead of persisting a torn
snapshot.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from rse_spark.index.snapshot import (
    SnapshotTornError,
    restore_index,
    snapshot_index,
)
from rse_spark.index.storage import IndexStorage
from rse_spark.query.serve import DirectSearcher
from rse_spark.streaming.stream_index import append_batch

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def built(spark, tmp_path):
    root = str(tmp_path / "idx")
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 200)
    append_batch(spark, docs, root, analyzer="simple",
                 content_col="text", docs_per_segment=64,
                 segments_per_group=2)
    return root


def test_snapshot_restore_roundtrip(spark, built, tmp_path):
    from rse_spark.index.upsert import delete_by_query

    root = built
    before = DirectSearcher(root, analyzer="simple").search(
        "spark join", k=10
    )
    snap = str(tmp_path / "snap")
    gen = snapshot_index(root, snap)
    assert gen == IndexStorage(root).generation()

    # mutate the live index past the snapshot point
    matched, deleted = delete_by_query(
        spark, root, "spark AND join", analyzer="simple"
    )
    assert deleted > 0
    assert DirectSearcher(root, analyzer="simple").search(
        "spark join", k=10
    ) != before

    # restore elsewhere: pre-mutation results, bit-identical
    restored = str(tmp_path / "restored")
    rgen = restore_index(snap, restored)
    assert rgen == gen
    assert DirectSearcher(restored, analyzer="simple").search(
        "spark join", k=10
    ) == before

    # restore over a live index: refused without force, exact with it
    with pytest.raises(FileExistsError):
        restore_index(snap, root)
    restore_index(snap, root, force=True)
    assert DirectSearcher(root, analyzer="simple").search(
        "spark join", k=10
    ) == before


def test_snapshot_torn_copy_retries(built, tmp_path):
    import shutil

    root = built
    store = IndexStorage(root)
    calls = {"n": 0}

    def racing_copy(src, dst):
        # a writer commits DURING the first copy; the second is clean
        shutil.copytree(src, dst)
        if calls["n"] == 0:
            store.bump_generation()
        calls["n"] += 1

    snap = str(tmp_path / "snap")
    gen = snapshot_index(root, snap, _copytree=racing_copy)
    assert calls["n"] == 2  # first attempt discarded, second kept
    assert gen == store.generation()

    def always_racing(src, dst):
        shutil.copytree(src, dst)
        store.bump_generation()

    with pytest.raises(SnapshotTornError):
        snapshot_index(root, str(tmp_path / "snap2"), retries=2,
                       _copytree=always_racing)
    import os
    assert not os.path.exists(str(tmp_path / "snap2"))


def test_snapshot_validation(built, tmp_path):
    root = built
    snap = str(tmp_path / "snap")
    snapshot_index(root, snap)
    with pytest.raises(FileExistsError):
        snapshot_index(root, snap)  # dest exists
    with pytest.raises(FileNotFoundError):
        snapshot_index(str(tmp_path / "notanindex"), str(tmp_path / "x"))
    with pytest.raises(FileNotFoundError):
        restore_index(str(tmp_path / "notasnap"), str(tmp_path / "y"))


def test_snapshot_cli_roundtrip(built, tmp_path):
    """The no-Spark CLI path end-to-end (snapshot then restore)."""
    root = built
    snap = str(tmp_path / "cli_snap")
    out = subprocess.run(
        [sys.executable, "-m", "rse_spark.cli", "snapshot",
         "--root", root, "--dest", snap],
        capture_output=True, text=True, check=True,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["snapshot"] == snap
    dst = str(tmp_path / "cli_restored")
    out = subprocess.run(
        [sys.executable, "-m", "rse_spark.cli", "restore",
         "--snapshot", snap, "--root", dst],
        capture_output=True, text=True, check=True,
    )
    rec2 = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec2["generation"] == rec["generation"]
    assert DirectSearcher(dst, analyzer="simple").search(
        "spark", k=5
    ) == DirectSearcher(root, analyzer="simple").search("spark", k=5)
