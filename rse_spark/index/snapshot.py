"""Point-in-time snapshot / restore of an index directory.

ES _snapshot/_restore parity for the operational surface: a snapshot
is a plain directory copy of the index root (postings, enriched,
positions sidecar, manifest — the manifest IS the catalog, so the copy
is self-describing and servable in place), made CONSISTENT against
concurrent writers by the generation stamp every mutation already
bumps (storage.IndexStorage.bump_generation): the generation is read
before and after the copy, and a mismatch means a writer committed
mid-copy — the torn copy is discarded and retried. No writer pause,
no lock: the copy pays again instead of blocking ingest, the right
trade for a read-heavy serving fleet.

Scale position: in production this directory copy is an object-store
copy of immutable parquet segments plus the tiny manifest — the same
incremental-forever model as ES/Lucene snapshots (segments are
immutable; only new ones transfer). The sandbox implementation copies
everything; the consistency protocol is the part that carries.

GSE has no snapshot story (its state is a Postgres database,
reference docker-compose.yml); this is contract surface beyond the
reference.
"""

from __future__ import annotations

import os
import shutil

from rse_spark.index.storage import IndexStorage


class SnapshotTornError(RuntimeError):
    """Writers kept committing across every copy attempt."""


def snapshot_index(root: str, dest: str, retries: int = 3,
                   _copytree=None) -> int:
    """Copy index ``root`` to ``dest`` (must not exist), consistent at
    one generation. Returns the captured generation number.

    Retries up to ``retries`` times when a writer commit lands during
    the copy (generation changed between the pre- and post-copy
    reads); raises SnapshotTornError when writers outpace every
    attempt — loud, never a silently torn snapshot.
    """
    if os.path.exists(dest):
        raise FileExistsError(dest)
    if not os.path.isdir(os.path.join(root, "manifest")):
        raise FileNotFoundError(f"{root} is not an index (no manifest)")
    copytree = _copytree or shutil.copytree
    store = IndexStorage(root)
    for _ in range(max(1, retries)):
        gen_before = store.generation()
        copytree(root, dest)
        if store.generation() == gen_before:
            return gen_before
        shutil.rmtree(dest, ignore_errors=True)
    raise SnapshotTornError(
        f"writers committed during every one of {retries} copy "
        f"attempts of {root}"
    )


def restore_index(snapshot: str, root: str, force: bool = False) -> int:
    """Restore a snapshot directory to ``root``. Refuses to clobber an
    existing index unless ``force`` (the destructive direction should
    never be the default). Returns the restored generation."""
    if not os.path.isdir(os.path.join(snapshot, "manifest")):
        raise FileNotFoundError(
            f"{snapshot} is not an index snapshot (no manifest)"
        )
    if os.path.exists(root):
        if not force:
            raise FileExistsError(
                f"{root} exists; pass force=True to replace it"
            )
        shutil.rmtree(root)
    shutil.copytree(snapshot, root)
    return IndexStorage(root).generation()
