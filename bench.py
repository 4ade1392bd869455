"""Per-round benchmark: index-build throughput + BM25 query latency.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "index_build_sec": ..., "docs_per_sec": ...,
   "query_p50_ms": ..., "query_p95_ms": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

The index corpus is the deterministic synthetic code corpus at the
matching scale factor (50k docs @ sf0.1 — BASELINE.md "ref-subset
SF=0.1 corpus"); build is timed through a full segment write to disk
(tokenize -> tf -> salted stats -> compress -> parquet), not just a
lazy plan. Query latency is measured over the persisted index with the
fixed reference query set (k=10). Harness queries time the
driver-contract operators on the sf-dir tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from rse_spark import harness
    from rse_spark.fixtures import corpus_path, gen_query_set
    from rse_spark.index.storage import IndexStorage, build_resumable
    from rse_spark.query.wand import wand_search
    from rse_spark.session import get_spark

    corpus_pq = corpus_path(sf)  # generate outside the timed section
    spark = get_spark("rse-bench", cores=cpus)
    from rse_spark.deploy import ensure_shipped

    ensure_shipped(spark)  # workers import rse_spark regardless of cwd

    timings: dict[str, float] = {}
    t_all = time.time()

    # ---- 1. index build (timed through the disk write) ----
    idx_root = tempfile.mkdtemp(prefix="rse_bench_idx_")
    try:
        corpus = spark.read.parquet(corpus_pq)
        n_docs = corpus.count()
        t0 = time.time()
        build_resumable(
            spark,
            corpus,
            idx_root,
            analyzer="code",
            docs_per_segment=4096,
            segments_per_group=4,
            source_snapshot=corpus_pq,
            with_positions=True,
        )
        total_build_sec = time.time() - t0
        # the positional sidecar is now folded into the build (one
        # tokenizer scan; its encode stage derives from the enriched
        # table) — split the wall time via the manifest's stage record
        # so index_build_sec stays comparable across rounds
        positions_build_sec = (
            IndexStorage(idx_root).completed_units()["positions"]["wall_ms"]
            / 1000.0
        )
        build_sec = total_build_sec - positions_build_sec
        timings["index_build"] = round(build_sec, 3)

        # ---- 2. query latency over the persisted index ----
        idx = IndexStorage(idx_root).load(spark)
        postings = idx.postings.persist()
        postings.count()  # warm the cache: steady-state serving
        idx.preload_terms()  # driver-side term dictionary: 1 job/query
        qset = gen_query_set(sf, n_queries=20)
        lat: list[float] = []
        from rse_spark.query.engine import query_terms

        for q in qset.itertuples():
            t0 = time.time()
            info = idx.term_info(sorted(query_terms(q.query_text)))
            wand_search(
                spark, postings, q.query_text,
                n_docs=idx.n_docs, avgdl=idx.avgdl,
                term_info=info, k=10,
            ).collect()
            lat.append(time.time() - t0)
        lat.sort()
        p50 = lat[len(lat) // 2]
        p95 = lat[max(0, int(len(lat) * 0.95) - 1)]
        timings["query_set"] = round(sum(lat), 3)
        postings.unpersist()

        # low-latency serving tier: same index files, pyarrow + numpy
        # WAND driver-side (query/serve.py) — GSE's API-tier analogue
        from rse_spark.query.serve import DirectSearcher

        # cold pass: fresh searcher, every bucket load lands inside the
        # sample — the first-request latency a new replica pays
        searcher = DirectSearcher(idx_root, analyzer="code")
        clat: list[float] = []
        for q in qset.itertuples():
            t0 = time.time()
            searcher.search(q.query_text, k=10)
            clat.append(time.time() - t0)
        clat.sort()
        c50 = clat[len(clat) // 2]
        c95 = clat[max(0, int(len(clat) * 0.95) - 1)]
        # warm pass: buckets + term rows pre-loaded (serve.warm) — the
        # steady-state latency of a serving replica
        searcher.warm([q.query_text for q in qset.itertuples()])
        dlat: list[float] = []
        for q in qset.itertuples():
            t0 = time.time()
            searcher.search(q.query_text, k=10)
            dlat.append(time.time() - t0)
        dlat.sort()
        d50 = dlat[len(dlat) // 2]
        d95 = dlat[max(0, int(len(dlat) * 0.95) - 1)]

        # scatter-gather sharded serving (query/shard.py): 4 doc-
        # partition shards scored in parallel threads with global
        # stats, coordinator merge — the multi-node serving topology,
        # measured against the single-replica warm p50 above
        from rse_spark.query.shard import ShardedSearcher

        shsearcher = ShardedSearcher(idx_root, 4, analyzer="code")
        shsearcher.search("warm up shards", k=10)
        for q in qset.itertuples():
            shsearcher.search(q.query_text, k=10)  # warm shard caches
        shlat: list[float] = []
        for q in qset.itertuples():
            t0 = time.time()
            shsearcher.search(q.query_text, k=10)
            shlat.append(time.time() - t0)
        shlat.sort()
        sh50 = shlat[len(shlat) // 2]

        # prefix queries (dictionary expansion -> pre-analyzed-term
        # scoring): the textmatch surface at serving latency
        plat: list[float] = []
        for pre in ("pa", "so", "me", "in", "co", "re", "de", "st"):
            t0 = time.time()
            searcher.search_terms(searcher.expand_prefix(pre), k=10)
            plat.append(time.time() - t0)
        plat.sort()
        p50_prefix = plat[len(plat) // 2]

        # qlang 3-atom boolean queries at serving latency: presence
        # sets over decoded doc-id arrays + ONE scoring pass
        # restricted to qualifiers (round-4 advice item) — should
        # track single-search latency, not 3x it
        from rse_spark.query.qlang import search_ql

        qlat: list[float] = []
        for q in qset.itertuples():
            toks = q.query_text.split()
            if len(toks) < 3:
                continue
            ql = f"{toks[0]} AND {toks[1]} OR {toks[2]}"
            t0 = time.time()
            search_ql(searcher, ql, k=10)
            qlat.append(time.time() - t0)
        qlat.sort()
        ql_p50 = qlat[len(qlat) // 2] if qlat else 0.0

        # ---- positional sidecar: built as part of the index build
        # above (single tokenizer scan); positions_build_sec is its
        # encode-from-enriched stage, measured there.

        def _tree_bytes(path: str) -> int:
            total = 0
            for dirpath, _dirs, files in os.walk(path):
                for fn in files:
                    total += os.path.getsize(os.path.join(dirpath, fn))
            return total

        positions_bytes = _tree_bytes(os.path.join(idx_root, "positions"))
        postings_bytes = _tree_bytes(os.path.join(idx_root, "postings"))
        pplat: list[float] = []
        for q in qset.itertuples():
            toks = q.query_text.split()
            if len(toks) < 2:
                continue
            t0 = time.time()
            searcher.phrase_search_positions(" ".join(toks[:2]), k=10)
            pplat.append(time.time() - t0)
        pplat.sort()
        phrase_pos_p50 = pplat[len(pplat) // 2] if pplat else 0.0

        # ---- round-6 serving surfaces: MoreLikeThis (term-vector
        # fetch + selection + one scoring pass), SynonymQuery (blended
        # groups), did-you-mean (length-banded vocab DP). Each should
        # track single-search latency, not multiples of it.
        mlat: list[float] = []
        for doc in (1, 7, 42, 99, 123, 500, 777, 1024):
            t0 = time.time()
            try:
                searcher.more_like_this(doc, k=10)
            except ValueError:
                continue  # doc id beyond this sf's corpus
            mlat.append(time.time() - t0)
        mlat.sort()
        mlt_p50 = mlat[len(mlat) // 2] if mlat else 0.0

        # synonym groups and suggest probes must be ANALYZED terms —
        # search_synonym_groups takes pre-analyzed input and the vocab
        # is stemmed, so raw query words would miss the dictionary and
        # measure nothing
        from rse_spark.query.engine import query_terms as _qt

        slat: list[float] = []
        for q in qset.itertuples():
            toks = sorted(_qt(q.query_text, "code"))
            if len(toks) < 2:
                continue
            groups = [toks[:2], toks[2:3] or toks[:1]]
            t0 = time.time()
            hits = searcher.search_synonym_groups(groups, k=10)
            slat.append(time.time() - t0)
            assert hits, groups  # empty would mean we measured a miss
        slat.sort()
        syn_p50 = slat[len(slat) // 2] if slat else 0.0

        glat: list[float] = []
        for q in qset.itertuples():
            toks = sorted(_qt(q.query_text, "code"))
            if not toks:
                continue
            w = toks[0]
            probe = (w[0] + w[2:]) if len(w) > 3 else w + "x"
            t0 = time.time()
            searcher.suggest(probe, n=5)
            glat.append(time.time() - t0)
        glat.sort()
        suggest_p50 = glat[len(glat) // 2] if glat else 0.0

        # ---- window rescoring (ES rescore): BM25 top-50 window +
        # positional phrase counts + re-rank; should cost ~one search
        # plus the phrase terms' position-list decodes
        rlat: list[float] = []
        for q in qset.itertuples():
            words = q.query_text.split()
            if len(words) < 2:
                continue
            t0 = time.time()
            searcher.search_rescored(
                q.query_text, " ".join(words[:2]), k=10, window=50
            )
            rlat.append(time.time() - t0)
        rlat.sort()
        rescore_p50 = rlat[len(rlat) // 2] if rlat else 0.0

        # ---- function_score field_value_factor: score * ln(1+dl) —
        # should cost within noise of the plain search (one scatter +
        # one vectorized log on the already-decoded match set)
        flat: list[float] = []
        for q in qset.itertuples():
            t0 = time.time()
            searcher.search(q.query_text, k=10, fvf="ln1p_dlen")
            flat.append(time.time() - t0)
        flat.sort()
        fvf_p50 = flat[len(flat) // 2] if flat else 0.0

        # ---- hybrid lexical+semantic page (ES search+knn, RRF):
        # BM25 candidates + exact cosine top-20 over a deterministic
        # synthetic vector table in the index's own id space — the
        # metric is the fused page latency (matvec + search + fuse)
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from rse_spark.query.vectors import VectorStore

        rng = _np.random.default_rng(42)
        vecs = rng.standard_normal((n_docs, 64)).astype(_np.float32)
        vec_pq = os.path.join(idx_root, "bench_vectors.parquet")
        _pq.write_table(
            _pa.table({
                "vec_id": _pa.array(range(n_docs), type=_pa.int64()),
                "embedding": _pa.array(
                    vecs.tolist(),
                    type=_pa.list_(_pa.float32()),
                ),
            }),
            vec_pq,
        )
        vstore = VectorStore(vec_pq)
        hlat: list[float] = []
        for q in qset.itertuples():
            t0 = time.time()
            searcher.search_hybrid_rrf(
                q.query_text, vstore, query_id=0, k=10
            )
            hlat.append(time.time() - t0)
        hlat.sort()
        hybrid_p50 = hlat[len(hlat) // 2] if hlat else 0.0

        # ---- batch phrase execution: a SET of phrases resolved from
        # the positional sidecar in ONE Spark job (the cluster-serving
        # shape; per-phrase jobs pay Spark's ~1s fixed cost each)
        from rse_spark.index.positions import phrase_batch_index

        batch_phrases = sorted({
            " ".join(q.query_text.split()[:2])
            for q in qset.itertuples()
            if len(q.query_text.split()) >= 2
        })[:8]
        t0 = time.time()
        n_batch_rows = phrase_batch_index(
            spark, idx_root, batch_phrases
        ).count()
        phrase_batch_sec = time.time() - t0

        # ---- integrity job at bench scale (round-4 verdict item 7):
        # the per-row sha invariant + structural checks demonstrated
        # on the full sf corpus each round, with its wall time
        from rse_spark.index.integrity import check_index

        t0 = time.time()
        integrity = check_index(
            spark, idx_root, corpus=corpus, content_col="content",
            expect_full_coverage=True,
        )
        integrity_sec = time.time() - t0

    finally:
        shutil.rmtree(idx_root, ignore_errors=True)

    # ---- WAND pruning vs exhaustive on an impact-clustered corpus ----
    # The uniform synthetic corpus is impact-FLAT (every term df>=4k,
    # tf near-constant): block upper bounds tie the heap floor and
    # nothing can be pruned — WAND's documented worst case, where the
    # vectorized exhaustive path wins (measured above as serve_*).
    # Block-max pruning exists for the skewed reality: a term whose
    # high-impact postings cluster in few blocks. Plant exactly that,
    # deterministically, and record how many blocks the skip pointers
    # let the query avoid decoding.
    import pandas as pd

    from rse_spark.index.storage import build_resumable as _build

    SEGS, SEG_DOCS = 5, 4096
    rows = []
    for i in range(SEGS * SEG_DOCS):
        if i % SEG_DOCS < 16:  # 16 high-impact docs per segment head
            t = " ".join(["needle"] * 50) + f" filler{i} pad"
        elif i % 3 == 0:
            t = f"needle filler{i} pad pad"
        else:
            t = f"filler{i} pad pad pad"
        rows.append({"doc_id": i, "content": t})
    skew_root = tempfile.mkdtemp(prefix="rse_bench_skew_")
    try:
        _build(
            spark, spark.createDataFrame(pd.DataFrame(rows)), skew_root,
            analyzer="simple", docs_per_segment=SEG_DOCS,
            segments_per_group=4,
        )
        sk = DirectSearcher(skew_root, analyzer="simple")
        sk.warm(["needle"])
        t0 = time.time()
        r_ex = sk.search("needle", k=10, algo="numpy")
        skew_ex = time.time() - t0
        t0 = time.time()
        r_wd = sk.search("needle", k=10, algo="wand")
        skew_wd = time.time() - t0
        assert [d for d, _, _ in r_ex] == [d for d, _, _ in r_wd]
        st = sk.last_stats
        blocks_skipped_pct = round(
            100.0 * (1 - st["blocks_decoded"] / max(1, st["blocks_total"])),
            1,
        )
    finally:
        shutil.rmtree(skew_root, ignore_errors=True)

    # ---- 3. driver-contract operators on the sf-dir tables ----
    qs = harness.queries()
    for name in [
        "bm25_topk", "tf_postings", "tpch_q1", "dedup_exact",
        "minhash_signature", "ngram_tf", "emb_cosine_topk",
        "sessionize", "quality_score", "filter_gate", "extract_refs",
        "doc_rolling_fp",
    ]:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = time.time() - t_all
    print(
        json.dumps(
            {
                "metric": "index_build+bm25_query+operators",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "index_build_sec": round(build_sec, 3),
                "docs_per_sec": round(n_docs / build_sec, 1),
                "query_p50_ms": round(1000 * p50, 1),
                "query_p95_ms": round(1000 * p95, 1),
                "serve_p50_ms": round(1000 * d50, 2),
                "serve_p95_ms": round(1000 * d95, 2),
                "serve_cold_p50_ms": round(1000 * c50, 2),
                "serve_cold_p95_ms": round(1000 * c95, 2),
                "serve_prefix_p50_ms": round(1000 * p50_prefix, 2),
                "serve_ql_p50_ms": round(1000 * ql_p50, 2),
                "serve_mlt_p50_ms": round(1000 * mlt_p50, 2),
                "serve_syn_p50_ms": round(1000 * syn_p50, 2),
                "serve_suggest_p50_ms": round(1000 * suggest_p50, 2),
                "serve_rescore_p50_ms": round(1000 * rescore_p50, 2),
                "serve_fvf_p50_ms": round(1000 * fvf_p50, 2),
                "serve_hybrid_p50_ms": round(1000 * hybrid_p50, 2),
                "serve_sharded_p50_ms": round(1000 * sh50, 2),
                "serve_phrase_pos_p50_ms": round(
                    1000 * phrase_pos_p50, 2
                ),
                "positions_build_sec": round(positions_build_sec, 3),
                "positions_vs_postings_size": round(
                    positions_bytes / max(1, postings_bytes), 3
                ),
                "phrase_batch_sec": round(phrase_batch_sec, 3),
                "phrase_batch_n_phrases": len(batch_phrases),
                "phrase_batch_rows": int(n_batch_rows),
                "integrity_ok": bool(integrity["ok"]),
                "integrity_sec": round(integrity_sec, 3),
                "skew_exhaustive_ms": round(1000 * skew_ex, 2),
                "skew_wand_ms": round(1000 * skew_wd, 2),
                "wand_blocks_skipped_pct": blocks_skipped_pct,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
