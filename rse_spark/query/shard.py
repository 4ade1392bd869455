"""Scatter-gather serving over a doc-partitioned index — the
multi-node search topology (ES/Solr/Lucene distributed search),
demonstrated in-process.

The index is already doc-partitioned on disk (``postings/seg_group=G/
bucket=B/``, index/build.py); a *shard* is a subset of segment
groups. Each shard gets its own :class:`~rse_spark.query.serve.
DirectSearcher` restricted to those groups (``seg_groups=``), which
therefore reads and decodes ONLY its partition's posting files —
while ranking with GLOBAL statistics (term df, n_docs, avgdl all come
from the index-wide term_stats/corpus_stats tables every shard
loads). That is the distributed-search correctness contract: BM25 is
per-doc given global stats, so each shard's local top-k contains
every one of its docs that can appear in the global top-k, and the
coordinator's merge of the per-shard pages by (score desc, doc_id
asc) IS the exact global ranking — proven by the equivalence pytest
against the unsharded searcher.

At 100 TB this is the serving architecture: one replica process per
shard on separate hosts, a stats broadcast on writer commits, and a
coordinator doing exactly this merge over RPC instead of threads.
In-process, the scatter runs on a thread pool (parquet IO, Arrow
decode, and the numpy scoring kernels all release the GIL), so it
also measures the real parallel speedup of partitioned serving
(bench: ``serve_sharded_p50_ms``).

Mutation safety matches the single searcher: each child re-checks the
writer GENERATION stamp per query, and the coordinator re-stats it
too — a commit that changed the segment-group TOPOLOGY (compaction,
streaming append) triggers a full re-split, so no shard can silently
miss a group created after construction.
"""

from __future__ import annotations

import glob
import os

from rse_spark.query.serve import DirectSearcher


def list_seg_groups(root: str) -> list[str]:
    """Sorted segment-group partition values present under
    ``postings/`` (numeric sort when they all parse as ints, so group
    10 follows 9, matching the builder's numbering)."""
    vals = []
    for p in glob.glob(os.path.join(root, "postings", "seg_group=*")):
        if os.path.isdir(p):
            vals.append(os.path.basename(p).split("=", 1)[1])
    try:
        return sorted(vals, key=int)
    except ValueError:
        return sorted(vals)


class ShardedSearcher:
    """Coordinator over ``n_shards`` partition-restricted searchers.

    Covers the core scoring surfaces (``search`` / ``search_terms``);
    positional/phrase serving stays on the unsharded
    :class:`DirectSearcher` (the sidecar is not partition-split
    here). Construction splits the current segment groups round-robin
    — adjacent groups land on different shards, so a skewed tail of
    recently-appended groups spreads instead of loading one shard.
    """

    def __init__(self, root: str, n_shards: int,
                 analyzer: str = "code", **searcher_kw):
        from rse_spark.index.alias import resolve as _alias_resolve

        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        # root may be an ALIAS (index/alias.py): resolved at every
        # (re)build, and the alias file joins the topology signature —
        # a blue/green flip re-splits the shards over the new root on
        # the next query, same as a writer commit
        self._given_root = root
        self._alias_resolve = _alias_resolve
        self.root = _alias_resolve(root)
        self._alias_file = (
            os.path.join(root, "ALIAS")
            if self.root != root else None
        )
        self.n_shards = n_shards
        self.analyzer = analyzer
        self._searcher_kw = searcher_kw
        self._gen_path = os.path.join(
            self.root, "manifest", "GENERATION"
        )
        self._build()

    def _gen_stat(self):
        try:
            st = os.stat(self._gen_path)
            sig = (st.st_mtime_ns, st.st_size)
        except FileNotFoundError:
            sig = None
        if self._alias_file is None:
            return sig
        try:
            ast = os.stat(self._alias_file)
            return (sig, (ast.st_mtime_ns, ast.st_size))
        except FileNotFoundError:
            return (sig, None)

    def _build(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        if self._alias_file is not None:
            self.root = self._alias_resolve(self._given_root)
            self._gen_path = os.path.join(
                self.root, "manifest", "GENERATION"
            )
        groups = list_seg_groups(self.root)
        slices: list[list[str]] = [
            groups[i::self.n_shards] for i in range(self.n_shards)
        ]
        # drop empty shards (more shards than groups): a shard with
        # no partition would add scatter overhead for zero work
        slices = [s for s in slices if s]
        self.shards = [
            DirectSearcher(
                self.root, analyzer=self.analyzer, seg_groups=s,
                **self._searcher_kw,
            )
            for s in (slices or [[]])
        ]
        self.shard_groups = slices or [[]]
        # persistent scatter pool: per-query executor creation costs
        # thread spawns every request; a replica coordinator keeps one
        # pool for its lifetime (rebuilt only on topology changes)
        old = getattr(self, "_pool", None)
        if old is not None:
            old.shutdown(wait=False)
        self._pool = (
            ThreadPoolExecutor(max_workers=len(self.shards))
            if len(self.shards) > 1 else None
        )
        self._gen_sig = self._gen_stat()

    def _check_topology(self) -> None:
        if self._gen_stat() != self._gen_sig:
            # a writer committed since the split: segment groups may
            # have appeared/vanished — re-split before serving
            self._build()

    def _scatter(self, fn) -> list:
        if self._pool is None:
            return [fn(self.shards[0])]
        return list(self._pool.map(fn, self.shards))

    @staticmethod
    def _merge(pages: list, k: int) -> list:
        out = [h for page in pages for h in page]
        out.sort(key=lambda h: (-h[1], h[0]))
        return out[:k]

    def search(self, qtext: str, k: int = 10, mode: str = "or",
               min_match: "int | None" = None):
        """Global top-k = merge of per-shard top-k pages — identical
        results (scores, counts, ties) to the unsharded searcher."""
        self._check_topology()
        pages = self._scatter(
            lambda s: s.search(qtext, k=k, mode=mode,
                               min_match=min_match)
        )
        return self._merge(pages, k)

    def search_terms(self, terms: list[str], k: int = 10,
                     mode: str = "or",
                     boosts: "dict[str, float] | None" = None,
                     min_match: "int | None" = None):
        self._check_topology()
        pages = self._scatter(
            lambda s: s.search_terms(terms, k=k, mode=mode,
                                     boosts=boosts,
                                     min_match=min_match)
        )
        return self._merge(pages, k)
