"""Low-latency serving directly over the index segment files.

The distributed paths (engine.search / wand.wand_search) pay Spark's
fixed per-job cost (~1s in local mode) — irrelevant for batch scoring,
dominant for a single interactive query. GSE's API served each query
with 1 + 2N Postgres round-trips (reference crawler/src/api/main.go:63-83);
the equivalent low-latency surface here reads the SAME bucket-pruned
parquet segment files via pyarrow and runs block-max WAND driver-side
(numpy) — no Spark job at all. Both paths read one storage layout and
are equivalence-tested against each other.

Scale position: this is the SERVING tier (one process per replica,
each holding the term dictionary + lazily-read hot segments); the
Spark tier remains the build/batch-analytics engine. On a cluster the
segments live on shared storage and any number of stateless searchers
mount them.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from rse_spark.query.engine import idf as idf_fn
from rse_spark.query.engine import query_terms
from rse_spark.query.wand import _ListIter, intersect_and_lists, wand_topk_lists


class DirectSearcher:
    """Driver/process-local searcher over a persisted index root."""

    def __init__(self, root: str, analyzer: str = "code"):
        self.root = root
        self.analyzer = analyzer
        stats = pq.read_table(os.path.join(root, "corpus_stats")).to_pylist()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        tdict = pq.read_table(
            os.path.join(root, "term_stats"),
            columns=["term", "df", "bucket"],
        )
        self.term_dict = {
            t: (int(d), int(b))
            for t, d, b in zip(
                tdict["term"].to_pylist(),
                tdict["df"].to_pylist(),
                tdict["bucket"].to_pylist(),
            )
        }

    def _matched_lists(self, terms: list[str], weights: dict[str, float]):
        """Read only the bucket partitions of the query terms."""
        by_bucket: dict[int, list[str]] = {}
        for t in terms:
            info = self.term_dict.get(t)
            if info:
                by_bucket.setdefault(info[1], []).append(t)
        iters: dict[int, list[_ListIter]] = {}
        for bucket, bterms in by_bucket.items():
            pattern = os.path.join(
                self.root, "postings", "seg_group=*", f"bucket={bucket}", "*.parquet"
            )
            for path in sorted(glob.glob(pattern)):
                tbl = pq.read_table(
                    path,
                    filters=[("term", "in", bterms)],
                    columns=[
                        "term", "segment_id", "payload", "block_offsets",
                        "block_last", "block_max_impact",
                    ],
                )
                for row in tbl.to_pylist():
                    iters.setdefault(int(row["segment_id"]), []).append(
                        _ListIter(
                            row["payload"],
                            row["block_offsets"],
                            row["block_last"],
                            row["block_max_impact"],
                            weights[row["term"]],
                        )
                    )
        return iters

    def search(self, qtext: str, k: int = 10, mode: str = "or"):
        """Top-k BM25 — returns [(doc_id, score, n_terms_matched)]."""
        qtf = query_terms(qtext, self.analyzer)
        if not qtf:
            return []
        terms = sorted(qtf)
        weights = {
            t: qtf[t] * idf_fn(self.term_dict.get(t, (0, 0))[0], self.n_docs)
            for t in terms
        }
        per_segment = self._matched_lists(terms, weights)
        results: list[tuple[int, float, int]] = []
        n_terms = len(terms)
        for _seg, iters in per_segment.items():
            if mode == "and":
                if len(iters) < n_terms:
                    continue
                results.extend(intersect_and_lists(iters, k, self.avgdl))
            else:
                results.extend(wand_topk_lists(iters, k, self.avgdl))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]
