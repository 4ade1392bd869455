"""Child process for the scaling bench: one parallelism level per JVM.

Runs the index build (to disk) + a batch query job at local[$CORES]
and prints one JSON line with wall times. Invoked by bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ.get("SCALING_CORES", "8"))
    sf = float(os.environ.get("SCALING_SF", "0.1"))
    n_queries = int(os.environ.get("SCALING_QUERIES", "200"))

    from rse_spark.fixtures import corpus_path, gen_query_set
    from rse_spark.index.storage import IndexStorage, build_resumable
    from rse_spark.query.engine import search_many
    from rse_spark.session import get_spark

    corpus_pq = corpus_path(sf)
    spark = get_spark(f"scaling-{cores}", cores=cores)
    # keep per-stage parallelism proportional to cores
    corpus = spark.read.parquet(corpus_pq)
    n_docs = corpus.count()

    idx_root = tempfile.mkdtemp(prefix=f"rse_scaling_{cores}_")
    try:
        t0 = time.time()
        store = build_resumable(
            spark, corpus, idx_root, analyzer="code",
            docs_per_segment=4096, segments_per_group=4,
        )
        build_sec = time.time() - t0
        docs_rec = store.completed_units()["docs"]
        stage_a_sec = docs_rec["wall_ms"] / 1000
        phases = docs_rec.get("phases", {})

        idx = IndexStorage(idx_root).load(spark)
        idx.preload_terms()
        postings = idx.postings.persist()
        postings.count()
        qset = gen_query_set(sf, n_queries=n_queries)
        queries = [(int(q.query_id), q.query_text) for q in qset.itertuples()]
        # warm-up: python workers + code paths, outside the timed window
        search_many(
            spark, postings, queries[:10],
            n_docs=idx.n_docs, avgdl=idx.avgdl,
            term_stats=idx.term_stats, k=10,
        ).count()
        t0 = time.time()
        n_out = search_many(
            spark, postings, queries,
            n_docs=idx.n_docs, avgdl=idx.avgdl,
            term_stats=idx.term_stats, k=10,
        ).count()
        query_sec = time.time() - t0
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)

    print(
        json.dumps(
            {
                "cores": cores,
                "sf": sf,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 3),
                "stage_a_sec": round(stage_a_sec, 3),
                "stage_a_phases": phases,
                "build_docs_per_sec": round(n_docs / build_sec, 1),
                "n_queries": n_queries,
                "query_sec": round(query_sec, 3),
                # 3 decimals: at 30 queries a 1-decimal q/sec (0.35 ->
                # "0.4") skews any efficiency ratio computed from it
                "queries_per_sec": round(n_queries / query_sec, 3),
                "result_rows": n_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
