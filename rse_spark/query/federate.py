"""Cross-index federation with DFS-phase global statistics — ES
``dfs_query_then_fetch`` across indexes / Lucene MultiReader.

Searching several physically separate indexes (per-tenant, per-month,
per-language partitions of a 100-TB corpus) naively merges pages
scored with each index's OWN idf and avgdl — ranks then depend on
which index a doc happens to live in (the classic cross-shard scoring
skew ES documents for query_then_fetch). The fix is the DFS phase:
gather corpus-wide statistics first (one tiny exchange — per-term df
from each index's dictionary, n_docs, total token count), then have
every index score its own postings with the GLOBAL stats. Scores are
then index-location-invariant, so the coordinator's (score desc,
tie) merge IS the ranking one merged index would produce — proven by
the equivalence pytest (two half-corpus indexes vs one whole-corpus
index, scores equal to 1e-9).

Results carry (index_ordinal, doc_id, score, n_terms_matched):
separate indexes have independent doc-id spaces, so the ordinal is
part of the hit's identity. At 100 TB the DFS exchange stays tiny —
|query terms| integers per index — which is why ES can afford it
per-query; here the per-term df lookups are dictionary probes, no
posting IO.
"""

from __future__ import annotations

from rse_spark.query.engine import query_terms
from rse_spark.query.serve import DirectSearcher


class FederatedSearcher:
    """Coordinator over N independent index roots."""

    def __init__(self, roots: "list[str]", analyzer: str = "code",
                 **searcher_kw):
        if not roots:
            raise ValueError("no index roots")
        self.analyzer = analyzer
        self.parts = [
            DirectSearcher(r, analyzer=analyzer, **searcher_kw)
            for r in roots
        ]

    def _global_stats(self, terms: "list[str]"):
        """The DFS phase: federation-wide (n_docs, avgdl, {term: df}).
        avgdl is reconstructed from each index's stored mean — exact,
        because every index persists avgdl as total_tokens / n_docs
        over its own docs."""
        n_docs = sum(p.n_docs for p in self.parts)
        if n_docs == 0:
            return 0, 0.0, {}
        total_len = sum(p.avgdl * p.n_docs for p in self.parts)
        df = {
            t: sum(
                p.term_dict.get(t, (0, 0))[0] for p in self.parts
            )
            for t in terms
        }
        return n_docs, total_len / n_docs, df

    def search(self, qtext: str, k: int = 10, mode: str = "or",
               min_match: "int | None" = None):
        """Top-k across every index: [(index_ordinal, doc_id, score,
        n_terms_matched)], scored with DFS global stats and merged by
        (score desc, index, doc_id)."""
        qtf = query_terms(qtext, self.analyzer)
        if not qtf:
            return []
        terms = sorted(qtf)
        stats = self._global_stats(terms)
        if stats[0] == 0:
            return []
        # rebuild the per-term query multiplicity search() would see
        flat = [t for t in terms for _ in range(int(qtf[t]))]
        out = []
        for i, p in enumerate(self.parts):
            for d, s, m in p.search_terms(
                flat, k=k, mode=mode, min_match=min_match,
                stats_override=stats,
            ):
                out.append((i, d, s, m))
        out.sort(key=lambda h: (-h[2], h[0], h[1]))
        return out[:k]
