"""Round-7 optimization micro-bench (guide §1.4): isolates pieces of
bench.py so changes can be measured without the frozen driver bench.

Usage:
    python bench_extra.py build      # index build + positions, phase split
    python bench_extra.py ops        # harness operators, noop sink + collect
    python bench_extra.py serve      # serving-tier latencies
    python bench_extra.py queryset   # Spark WAND query latency

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Each section repeats (default 2) and prints one JSON line per repeat —
compare the LAST repeat across code versions (JIT/page-cache warm).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    what = sys.argv[1] if len(sys.argv) > 1 else "ops"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rse_spark import harness
    from rse_spark.deploy import ensure_shipped
    from rse_spark.session import get_spark

    spark = get_spark("rse-bench-extra", cores=cpus)
    ensure_shipped(spark)
    sc = spark.sparkContext

    if what == "build":
        from rse_spark.fixtures import corpus_path
        from rse_spark.index.storage import IndexStorage, build_resumable

        corpus_pq = corpus_path(sf)
        for r in range(repeats):
            idx_root = tempfile.mkdtemp(prefix="rse_bx_idx_")
            try:
                corpus = spark.read.parquet(corpus_pq)
                sc.setJobDescription(f"build r{r}")
                t0 = time.time()
                build_resumable(
                    spark, corpus, idx_root, analyzer="code",
                    docs_per_segment=4096, segments_per_group=4,
                    with_positions=True,
                )
                total = time.time() - t0
                units = IndexStorage(idx_root).completed_units()
                pos_sec = units["positions"]["wall_ms"] / 1000.0
                print(json.dumps({
                    "repeat": r,
                    "build_total_sec": round(total, 3),
                    "index_build_sec": round(total - pos_sec, 3),
                    "positions_build_sec": round(pos_sec, 3),
                    "stageA_phases": units["docs"].get("phases"),
                }), flush=True)
            finally:
                shutil.rmtree(idx_root, ignore_errors=True)

    elif what == "ops":
        qs = harness.queries()
        names = sys.argv[3].split(",") if len(sys.argv) > 3 else [
            "bm25_topk", "tf_postings", "tpch_q1", "dedup_exact",
            "minhash_signature", "ngram_tf", "emb_cosine_topk",
            "sessionize", "quality_score", "filter_gate",
            "extract_refs", "doc_rolling_fp",
        ]
        for r in range(repeats):
            out: dict[str, float] = {}
            for name in names:
                sc.setJobDescription(f"{name} noop r{r}")
                t0 = time.time()
                _noop(qs[name](spark, sf_dir))
                out[f"{name}_noop"] = round(time.time() - t0, 3)
                sc.setJobDescription(f"{name} collect r{r}")
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                out[name] = round(time.time() - t0, 3)
            print(json.dumps({"repeat": r, **out}), flush=True)

    elif what in ("serve", "queryset"):
        from rse_spark.fixtures import corpus_path, gen_query_set
        from rse_spark.index.storage import IndexStorage, build_resumable

        corpus_pq = corpus_path(sf)
        idx_root = tempfile.mkdtemp(prefix="rse_bx_srv_")
        try:
            corpus = spark.read.parquet(corpus_pq)
            build_resumable(
                spark, corpus, idx_root, analyzer="code",
                docs_per_segment=4096, segments_per_group=4,
                with_positions=True,
            )
            qset = gen_query_set(sf, n_queries=20)
            if what == "queryset":
                from rse_spark.query.engine import query_terms
                from rse_spark.query.wand import wand_search

                idx = IndexStorage(idx_root).load(spark)
                postings = idx.postings.persist()
                postings.count()
                idx.preload_terms()
                for r in range(repeats):
                    lat = []
                    for q in qset.itertuples():
                        info = idx.term_info(sorted(query_terms(q.query_text)))
                        t0 = time.time()
                        wand_search(
                            spark, postings, q.query_text,
                            n_docs=idx.n_docs, avgdl=idx.avgdl,
                            term_info=info, k=10,
                        ).collect()
                        lat.append(time.time() - t0)
                    lat.sort()
                    print(json.dumps({
                        "repeat": r,
                        "query_set_sec": round(sum(lat), 3),
                        "p50_ms": round(1000 * lat[len(lat) // 2], 1),
                        "p95_ms": round(
                            1000 * lat[max(0, int(len(lat) * .95) - 1)], 1),
                    }), flush=True)
                postings.unpersist()
            else:
                from rse_spark.query.qlang import search_ql
                from rse_spark.query.serve import DirectSearcher

                for r in range(repeats):
                    searcher = DirectSearcher(idx_root, analyzer="code")
                    clat = []
                    for q in qset.itertuples():
                        t0 = time.time()
                        searcher.search(q.query_text, k=10)
                        clat.append(time.time() - t0)
                    clat.sort()
                    searcher.warm(
                        [q.query_text for q in qset.itertuples()])
                    wlat = []
                    for q in qset.itertuples():
                        t0 = time.time()
                        searcher.search(q.query_text, k=10)
                        wlat.append(time.time() - t0)
                    wlat.sort()
                    plat = []
                    for pre in ("pa", "so", "me", "in", "co", "re",
                                "de", "st"):
                        t0 = time.time()
                        searcher.search_terms(
                            searcher.expand_prefix(pre), k=10)
                        plat.append(time.time() - t0)
                    plat.sort()
                    qlat = []
                    for q in qset.itertuples():
                        toks = q.query_text.split()
                        if len(toks) < 3:
                            continue
                        ql = f"{toks[0]} AND {toks[1]} OR {toks[2]}"
                        t0 = time.time()
                        search_ql(searcher, ql, k=10)
                        qlat.append(time.time() - t0)
                    qlat.sort()
                    print(json.dumps({
                        "repeat": r,
                        "cold_p50_ms": round(
                            1000 * clat[len(clat) // 2], 2),
                        "cold_p95_ms": round(
                            1000 * clat[max(0, int(len(clat) * .95) - 1)],
                            2),
                        "warm_p50_ms": round(
                            1000 * wlat[len(wlat) // 2], 2),
                        "warm_p95_ms": round(
                            1000 * wlat[max(0, int(len(wlat) * .95) - 1)],
                            2),
                        "prefix_p50_ms": round(
                            1000 * plat[len(plat) // 2], 2),
                        "ql_p50_ms": round(
                            1000 * qlat[len(qlat) // 2], 2) if qlat else 0,
                    }), flush=True)
        finally:
            shutil.rmtree(idx_root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
