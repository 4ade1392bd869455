"""Focused query-path bench for the r4->r5 regression investigation.

BENCH_r04.json showed query_set 17.1 -> 21.0 s and serve cold p95
74.8 -> 103.5 ms vs r3 with the engine/serve hot paths unchanged
(diff-verified); most small operators drifted +5-15% in the same run,
pointing at host throttling (this VM's documented 0.8-1.1 calibration
swing). This tool re-measures JUST the query path with the ngram_tf
playbook that settled the r3 creep: quiet host, N interleaved repeats,
cooldowns, plus a raw-CPU calibration so throttling shows up in the
output instead of being guessed at.

Builds the sf0.1 index once, then per repeat measures:
  * query_set_sec   — 20 distributed WAND queries (Spark path)
  * serve cold p50/p95 — fresh DirectSearcher per repeat
  * serve warm p50/p95 — after serve.warm()

Writes BENCH/querypath_r5.json with every repeat preserved.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def raw_cpu_mops(procs: int = 8, work: int = 4_000_000) -> float:
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [work] * procs * 2)
    return procs * 2 * work / (time.time() - t0) / 1e6


def main() -> None:
    repeats = int(os.environ.get("QP_REPEATS", "3"))
    cooldown = int(os.environ.get("QP_COOLDOWN", "30"))
    sf = 0.1

    from rse_spark.fixtures import corpus_path, gen_query_set
    from rse_spark.index.storage import IndexStorage, build_resumable
    from rse_spark.query.engine import query_terms
    from rse_spark.query.serve import DirectSearcher
    from rse_spark.query.wand import wand_search
    from rse_spark.session import get_spark

    corpus_pq = corpus_path(sf)
    spark = get_spark("rse-querypath", cores="32")
    from rse_spark.deploy import ensure_shipped

    ensure_shipped(spark)

    idx_root = tempfile.mkdtemp(prefix="rse_qp_idx_")
    out: dict = {"repeats": [], "sf": sf}
    try:
        corpus = spark.read.parquet(corpus_pq)
        t0 = time.time()
        build_resumable(
            spark, corpus, idx_root, analyzer="code",
            docs_per_segment=4096, segments_per_group=4,
            source_snapshot=corpus_pq,
        )
        out["build_sec"] = round(time.time() - t0, 3)

        idx = IndexStorage(idx_root).load(spark)
        postings = idx.postings.persist()
        postings.count()
        idx.preload_terms()
        qset = list(gen_query_set(sf, n_queries=20).itertuples())

        for r in range(repeats):
            time.sleep(cooldown)
            rec: dict = {"raw_cpu_mops": round(raw_cpu_mops(), 1)}
            lat = []
            for q in qset:
                t0 = time.time()
                info = idx.term_info(sorted(query_terms(q.query_text)))
                wand_search(
                    spark, postings, q.query_text,
                    n_docs=idx.n_docs, avgdl=idx.avgdl,
                    term_info=info, k=10,
                ).collect()
                lat.append(time.time() - t0)
            lat.sort()
            rec["query_set_sec"] = round(sum(lat), 3)
            rec["query_p50_ms"] = round(1000 * lat[len(lat) // 2], 1)
            rec["query_p95_ms"] = round(
                1000 * lat[max(0, int(len(lat) * 0.95) - 1)], 1
            )

            searcher = DirectSearcher(idx_root, analyzer="code")
            clat = []
            for q in qset:
                t0 = time.time()
                searcher.search(q.query_text, k=10)
                clat.append(time.time() - t0)
            clat.sort()
            rec["serve_cold_p50_ms"] = round(
                1000 * clat[len(clat) // 2], 2
            )
            rec["serve_cold_p95_ms"] = round(
                1000 * clat[max(0, int(len(clat) * 0.95) - 1)], 2
            )
            searcher.warm([q.query_text for q in qset])
            wlat = []
            for q in qset:
                t0 = time.time()
                searcher.search(q.query_text, k=10)
                wlat.append(time.time() - t0)
            wlat.sort()
            rec["serve_warm_p50_ms"] = round(
                1000 * wlat[len(wlat) // 2], 2
            )
            rec["serve_warm_p95_ms"] = round(
                1000 * wlat[max(0, int(len(wlat) * 0.95) - 1)], 2
            )
            out["repeats"].append(rec)
            print(json.dumps({"repeat": r, **rec}), flush=True)
        postings.unpersist()
    finally:
        import shutil

        shutil.rmtree(idx_root, ignore_errors=True)

    def best(key):
        return min(r[key] for r in out["repeats"])

    out["best"] = {
        k: best(k)
        for k in (
            "query_set_sec", "query_p50_ms", "query_p95_ms",
            "serve_cold_p95_ms", "serve_warm_p95_ms",
        )
    }
    out["reference"] = {
        "r3": {"query_set_sec": 17.11, "query_p95_ms": 1194,
               "serve_cold_p95_ms": 74.8, "serve_warm_p95_ms": 41.5},
        "r4": {"query_set_sec": 20.96, "query_p95_ms": 1665,
               "serve_cold_p95_ms": 103.5, "serve_warm_p95_ms": 52.3},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "querypath_r5.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["best"]))
    spark.stop()


if __name__ == "__main__":
    main()
