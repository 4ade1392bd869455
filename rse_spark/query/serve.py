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

    def __init__(self, root: str, analyzer: str = "code",
                 max_bucket_bytes: int | None = None):
        """``max_bucket_bytes`` bounds the columnar bucket cache: when
        the Arrow tables held exceed the budget, least-recently-queried
        buckets (and their extracted term rows) are evicted and reload
        on the next miss. ``None`` = unbounded (bench/replica default
        where the working set is known to fit)."""
        self.root = root
        self.analyzer = analyzer
        self.max_bucket_bytes = max_bucket_bytes
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
        # bucket -> list of (arrow table, {term: (offset, length)})
        # and a per-term extracted-row cache. Tables stay columnar
        # (payload bytes remain Arrow buffers) so replica memory per
        # bucket is ~the on-disk bucket size, not Python row dicts;
        # row dicts exist only for terms actually queried.
        from collections import OrderedDict

        self._bucket_tables: OrderedDict[int, list] = OrderedDict()
        self._bucket_bytes: dict[int, int] = {}
        self._term_rows: dict[tuple[int, str], list[dict]] = {}
        import threading

        # the HTTP endpoint serves one searcher from many threads.
        # Per-bucket locks: concurrent first touches of DIFFERENT
        # buckets load in parallel; only same-bucket racers serialize.
        self._meta_lock = threading.Lock()
        self._bucket_locks: dict[int, threading.Lock] = {}
        self._threading = threading
        # telemetry is PER-THREAD: many HTTP threads share one searcher
        # and must each read their own query's stats, not a racer's
        self._tls = threading.local()

    _COLS = [
        "term", "segment_id", "payload", "block_offsets",
        "block_last", "block_max_tf", "block_min_dl",
    ]

    @property
    def last_stats(self) -> dict[str, int]:
        """Block-decode telemetry of the CALLING thread's most recent
        ``search(algo='wand')``."""
        return getattr(self._tls, "stats", {})

    @property
    def cached_bucket_bytes(self) -> int:
        with self._meta_lock:
            return sum(self._bucket_bytes.values())

    def _bucket_lock(self, bucket: int):
        with self._meta_lock:
            lock = self._bucket_locks.get(bucket)
            if lock is None:
                lock = self._bucket_locks[bucket] = self._threading.Lock()
            return lock

    def _touch(self, bucket: int) -> list | None:
        """LRU-ordered cache lookup (newest at the right end)."""
        with self._meta_lock:
            tables = self._bucket_tables.get(bucket)
            if tables is not None:
                self._bucket_tables.move_to_end(bucket)
            return tables

    def _publish(self, bucket: int, tables: list) -> None:
        """Install a freshly loaded bucket and evict least-recently
        used buckets beyond the byte budget (the newcomer itself is
        always kept so every query can run)."""
        nbytes = sum(tbl.nbytes for tbl, _spans in tables)
        with self._meta_lock:
            self._bucket_tables[bucket] = tables
            self._bucket_tables.move_to_end(bucket)
            self._bucket_bytes[bucket] = nbytes
            if self.max_bucket_bytes is None:
                return
            while (
                len(self._bucket_tables) > 1
                and sum(self._bucket_bytes.values()) > self.max_bucket_bytes
            ):
                victim, _ = self._bucket_tables.popitem(last=False)
                self._bucket_bytes.pop(victim, None)
                for key in [k for k in self._term_rows if k[0] == victim]:
                    del self._term_rows[key]

    def _load_bucket(self, bucket: int) -> list:
        """Read one bucket's parquet files into Arrow tables and build
        a term -> (offset, length) span index per file. Terms are
        file-sorted (index/build.py sorts postings by term before the
        segment write), so each term is one contiguous run."""
        tables = self._touch(bucket)
        if tables is not None:
            return tables
        with self._bucket_lock(bucket):
            tables = self._touch(bucket)
            if tables is not None:
                return tables
            tables = []
            pattern = os.path.join(
                self.root, "postings", "seg_group=*",
                f"bucket={bucket}", "*.parquet",
            )
            for path in sorted(glob.glob(pattern)):
                tbl = pq.read_table(path, columns=self._COLS)
                terms = tbl["term"].to_pylist()
                # files are written sortWithinPartitions("term")
                # (index/storage.py:131,325) so each term is one run;
                # a span LIST keeps this correct even if a future
                # writer interleaves runs
                spans: dict[str, list[tuple[int, int]]] = {}
                i, n = 0, len(terms)
                while i < n:
                    j = i + 1
                    t = terms[i]
                    while j < n and terms[j] == t:
                        j += 1
                    spans.setdefault(t, []).append((i, j - i))
                    i = j
                tables.append((tbl, spans))
            # publish only when fully built (evicts LRU past budget)
            self._publish(bucket, tables)
            return tables

    def _bucket_rows(self, bucket: int, term: str) -> list[dict]:
        """All (segment) posting rows of one term. First touch of a
        bucket reads its files once into Arrow tables; first touch of
        a term slices just that term's contiguous run out of them. A
        serving replica amortizes this across its query stream; memory
        is bounded by the buckets actually queried (columnar) plus the
        terms actually queried (row form)."""
        key = (bucket, term)
        rows = self._term_rows.get(key)
        if rows is None:
            rows = []
            for tbl, spans in self._load_bucket(bucket):
                for off, ln in spans.get(term, ()):
                    rows.extend(tbl.slice(off, ln).to_pylist())
            with self._meta_lock:
                # cache the row form only while its bucket is resident,
                # so eviction keeps the budget honest
                if bucket in self._bucket_tables:
                    self._term_rows[key] = rows
        return rows

    def warm(self, qtexts: list[str]) -> int:
        """Pre-load the buckets (and term rows) a query stream will
        touch, so first-request latency is excluded from steady-state
        serving. Returns the number of distinct buckets loaded."""
        buckets: set[int] = set()
        for qtext in qtexts:
            for t in query_terms(qtext, self.analyzer):
                info = self.term_dict.get(t)
                if info:
                    buckets.add(info[1])
                    self._bucket_rows(info[1], t)
        return len(buckets)

    def _matched_lists(self, terms: list[str], weights: dict[str, float]):
        """Collect posting-list cursors for the query terms."""
        iters: dict[int, list[_ListIter]] = {}
        for t in terms:
            info = self.term_dict.get(t)
            if not info:
                continue
            for row in self._bucket_rows(info[1], t):
                iters.setdefault(int(row["segment_id"]), []).append(
                    _ListIter(
                        row["payload"],
                        row["block_offsets"],
                        row["block_last"],
                        row["block_max_tf"],
                        row["block_min_dl"],
                        weights[t],
                        self.avgdl,
                    )
                )
        return iters

    def search(self, qtext: str, k: int = 10, mode: str = "or",
               algo: str = "numpy"):
        """Top-k BM25 — returns [(doc_id, score, n_terms_matched)].

        ``algo='numpy'`` (default): decode every matched list with the
        vectorized codec and aggregate scores with bincount — exact,
        and at posting counts up to ~10^6 faster than cursor-based
        pruning because ALL per-posting math is C. ``algo='wand'``:
        the block-skipping cursor path (identical results) — wins when
        a single giant list dwarfs k and block upper bounds are tight.
        """
        return self._search_qtf(
            query_terms(qtext, self.analyzer), k, mode, algo
        )

    def search_terms(self, terms: list[str], k: int = 10,
                     mode: str = "or", algo: str = "numpy"):
        """Top-k over PRE-ANALYZED terms (no tokenizer pass) — the
        entry point for dictionary-expanded queries (prefix), where
        re-analyzing expanded vocabulary terms would re-stem them."""
        qtf: dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        return self._search_qtf(qtf, k, mode, algo)

    def expand_prefix(self, prefix: str, max_terms: int = 64) -> list[str]:
        """All indexed terms starting with ``prefix`` — a pure lookup
        on the in-memory term dictionary (|vocab| entries), capped like
        Lucene's rewrite limit, deterministic order."""
        return sorted(
            t for t in self.term_dict if t.startswith(prefix)
        )[:max_terms]

    def phrase_search(self, phrase: str, corpus_path: str, k: int = 10,
                      content_col: str = "text", id_col: str = "doc_id",
                      key_col: str | None = None):
        """Exact-adjacency phrase top-k: [(doc_id, n_occurrences)].

        Candidates come from the index (conjunctive search over the
        phrase's analyzed terms — every doc containing the raw adjacent
        phrase contains all of them), then ONLY candidate rows are
        fetched from the content store (``corpus_path`` parquet,
        row-group-pruned pyarrow read) and verified with a
        whitespace-adjacency scan — same semantics as the Spark path
        (query/textmatch.phrase_match), equivalence-tested against it.
        The per-query content fetch is bounded by the candidate count;
        GSE's API did the same doc-fetch round-trip per result
        (reference crawler/src/api/main.go:161-182).

        ``key_col`` bridges id spaces: when the index assigned its own
        doc ids over a corpus that carried ``id_col`` (the streaming
        appender keeps it as ``src_doc_id``), pass that metadata column
        name and candidates are mapped through the stored doc metadata
        before the content fetch. ``None`` = index ids == corpus ids."""
        words = phrase.split()
        if not words:
            raise ValueError("empty phrase")
        cand = self._search_qtf(
            query_terms(phrase, self.analyzer), self.n_docs, "and", "numpy"
        )
        if not cand:
            return []
        ids = [d for d, _s, _m in cand]
        text_by_doc = self.fetch_content(
            ids, corpus_path, content_col=content_col,
            id_col=id_col, key_col=key_col,
        )
        n = len(words)
        out = []
        for d in ids:
            sp = (text_by_doc.get(d) or "").split(" ")
            hits = sum(
                1 for i in range(len(sp) - n + 1)
                if sp[i:i + n] == words
            )
            if hits:
                out.append((int(d), hits))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def fetch_content(self, ids: list[int], corpus_path: str,
                      content_col: str = "text",
                      id_col: str = "doc_id",
                      key_col: str | None = None) -> dict[int, str]:
        """{index doc_id: content} for a bounded id set — the serving
        tier's document-store fetch (row-group-pruned pyarrow reads;
        id spaces bridged via the stored doc metadata when the index
        assigned its own ids, see ``phrase_search``)."""
        if key_col is None:
            keymap = {d: d for d in ids}
        else:
            src = os.path.join(self.root, "docs_meta")
            if not os.path.isdir(src):
                # array-format indexes keep docs_meta virtual; the
                # physical enriched table carries the same columns
                src = os.path.join(self.root, "enriched")
            mt = pq.read_table(
                src, columns=["doc_id", key_col],
                filters=[("doc_id", "in", sorted(set(ids)))],
            )
            keymap = dict(
                zip(mt["doc_id"].to_pylist(), mt[key_col].to_pylist())
            )
        tbl = pq.read_table(
            corpus_path, columns=[id_col, content_col],
            filters=[(id_col, "in", sorted(set(keymap.values())))],
        )
        text_by_key = dict(
            zip(tbl[id_col].to_pylist(), tbl[content_col].to_pylist())
        )
        return {
            int(d): text_by_key.get(keymap.get(d)) or "" for d in ids
        }

    def snippets(self, hits, qtext: str, corpus_path: str,
                 content_col: str = "text", id_col: str = "doc_id",
                 key_col: str | None = None,
                 width: int = 16) -> dict[int, str]:
        """{doc_id: snippet} for a result page: a ``width``-token
        window of the document centred on the first token matching any
        analyzed query term (a raw token matches when analyzing it
        yields a query term — so camelCase/stemmed forms highlight
        correctly under the code analyzer). Content comes from the
        same bounded document-store fetch the phrase verifier uses;
        matched tokens are wrapped in **…** (GSE returned bare rows,
        reference crawler/src/api/main.go:34-46 — a result page needs
        previews)."""
        terms = set(query_terms(qtext, self.analyzer))
        ids = [d for d, *_ in hits]
        texts = self.fetch_content(
            ids, corpus_path, content_col=content_col,
            id_col=id_col, key_col=key_col,
        )
        out: dict[int, str] = {}
        for d in ids:
            sp = texts.get(d, "").split(" ")
            match = {
                i for i, w in enumerate(sp)
                if terms & set(query_terms(w, self.analyzer))
            }
            first = min(match) if match else 0
            lo = max(0, first - width // 2)
            window = [
                f"**{w}**" if (lo + i) in match else w
                for i, w in enumerate(sp[lo:lo + width])
            ]
            prefix = "… " if lo > 0 else ""
            suffix = " …" if lo + width < len(sp) else ""
            out[int(d)] = prefix + " ".join(window) + suffix
        return out

    def _search_qtf(self, qtf: dict[str, int], k: int, mode: str,
                    algo: str):
        if not qtf:
            return []
        terms = sorted(qtf)
        weights = {
            t: qtf[t] * idf_fn(self.term_dict.get(t, (0, 0))[0], self.n_docs)
            for t in terms
        }
        if algo == "numpy":
            return self._search_numpy(terms, weights, k, mode)
        per_segment = self._matched_lists(terms, weights)
        results: list[tuple[int, float, int]] = []
        n_terms = len(terms)
        all_iters: list[_ListIter] = []
        for _seg, iters in per_segment.items():
            all_iters.extend(iters)
            if mode == "and":
                if len(iters) < n_terms:
                    continue
                results.extend(intersect_and_lists(iters, k, self.avgdl))
            else:
                results.extend(wand_topk_lists(iters, k, self.avgdl))
        # pruning telemetry: how many blocks the skip pointers let the
        # query avoid decoding (bench.py records this vs the exhaustive
        # path — the 100x-scale claim for WAND, with a number)
        self._tls.stats = {
            "blocks_total": sum(len(it.offs) for it in all_iters),
            "blocks_decoded": sum(it.blocks_decoded for it in all_iters),
        }
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def _search_numpy(self, terms, weights, k: int, mode: str):
        """Vectorized exact scoring across all matched lists."""
        import numpy as np

        from rse_spark.index.codec import B, K1, decode_postings

        doc_chunks, score_chunks = [], []
        for t in terms:
            info = self.term_dict.get(t)
            if not info:
                continue
            w = weights[t]
            for row in self._bucket_rows(info[1], t):
                doc_ids, tfs, dls = decode_postings(bytes(row["payload"]))
                tf = tfs.astype(np.float64)
                contrib = w * tf * (K1 + 1.0) / (
                    tf + K1 * (1.0 - B + B * dls.astype(np.float64) / self.avgdl)
                )
                doc_chunks.append(doc_ids)
                score_chunks.append(contrib)
        if not doc_chunks:
            return []
        docs = np.concatenate(doc_chunks)
        scores = np.concatenate(score_chunks)
        uniq, inv = np.unique(docs, return_inverse=True)
        agg = np.bincount(inv, weights=scores)
        matched = np.bincount(inv).astype(np.int64)
        if mode == "and":
            keep = matched == len(terms)
            uniq, agg, matched = uniq[keep], agg[keep], matched[keep]
            if len(uniq) == 0:
                return []
        if len(uniq) > k:
            # all docs scoring >= the k-th best (ties included, so the
            # doc_id tie-break below stays exact)
            kth = np.partition(agg, len(agg) - k)[len(agg) - k]
            cand = np.nonzero(agg >= kth)[0]
        else:
            cand = np.arange(len(uniq))
        order = sorted(
            cand.tolist(), key=lambda i: (-agg[i], uniq[i])
        )[:k]
        return [
            (int(uniq[i]), float(agg[i]), int(matched[i])) for i in order
        ]
