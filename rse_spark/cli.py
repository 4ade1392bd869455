"""spark-submit entry points: build / query / bench.

Run via ``spark-submit --py-files rse_spark.zip rse_spark/cli.py <cmd>``
or plain ``python -m rse_spark.cli <cmd>`` in local mode (the session
factory handles master/config either way — on a real cluster pass
--master and the configs through spark-submit and get_spark will reuse
the active session).

Commands
--------
build   --corpus <parquet> --root <dir> [--analyzer code] [--content-col content]
query   --root <dir> --q "terms..." [--k 10] [--mode or|and] [--algo wand|exact]
curate  --input <path> [--input <path> ...] --out <dir> [gate/dedup/split/chunk opts]
        the ship-a-training-dataset job: multi-format corpus tree ->
        gate -> dedup (exact + LSH near-dup) -> cap -> split -> chunk
        -> partitioned JSONL, checkpointed per stage (rerun resumes)
bench   (delegates to bench.py's main)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--root", required=True)
    b.add_argument("--analyzer", default="code")
    b.add_argument("--content-col", default="content")
    b.add_argument("--docs-per-segment", type=int, default=4096)
    b.add_argument("--segments-per-group", type=int, default=4)

    c = sub.add_parser("curate", help="build a curated JSONL dataset")
    c.add_argument("--input", action="append", required=True,
                   help="corpus path (repeatable; parquet/jsonl/csv/txt)")
    c.add_argument("--out", required=True)
    c.add_argument("--content-col", default=None)
    c.add_argument("--allow-langs", default=None,
                   help="comma-separated lang allowlist")
    c.add_argument("--min-chars", type=int, default=1)
    c.add_argument("--no-near-dup", action="store_true")
    c.add_argument("--cap-per-lang", type=int, default=None)
    c.add_argument("--train-pct", type=int, default=90)
    c.add_argument("--chunk-tokens", type=int, default=None)
    c.add_argument("--chunk-stride", type=int, default=None)

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--root", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and"])
    q.add_argument("--algo", default="wand", choices=["wand", "exact"])
    q.add_argument("--analyzer", default="code")

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from rse_spark.deploy import ensure_shipped
    from rse_spark.session import get_spark

    # get_spark reuses an active session (e.g. under pytest or inside a
    # larger driver program); only stop what this entry point created
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(f"rse-cli-{args.cmd}")
    ensure_shipped(spark)

    if args.cmd == "build":
        from rse_spark.index.storage import build_resumable

        corpus = spark.read.parquet(args.corpus)
        t0 = time.time()
        store = build_resumable(
            spark, corpus, args.root,
            analyzer=args.analyzer,
            content_col=args.content_col,
            docs_per_segment=args.docs_per_segment,
            segments_per_group=args.segments_per_group,
            source_snapshot=args.corpus,
        )
        rec = store.completed_units()["docs"]
        print(json.dumps({
            "built": args.root,
            "n_docs": rec["n_docs"],
            "wall_sec": round(time.time() - t0, 2),
            "units": len(store.completed_units()),
        }))
    elif args.cmd == "curate":
        from rse_spark.curate import curate_dataset

        t0 = time.time()
        summary = curate_dataset(
            spark, args.input, args.out,
            content_col=args.content_col,
            allow_langs=(args.allow_langs.split(",")
                         if args.allow_langs else None),
            min_chars=args.min_chars,
            near_dup=not args.no_near_dup,
            cap_per_lang=args.cap_per_lang,
            train_pct=args.train_pct,
            chunk_tokens=args.chunk_tokens,
            chunk_stride=args.chunk_stride,
        )
        summary["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(summary))
    elif args.cmd == "query":
        from rse_spark.index.storage import IndexStorage
        from rse_spark.query.engine import search
        from rse_spark.query.wand import wand_search

        idx = IndexStorage(args.root).load(spark)
        fn = wand_search if args.algo == "wand" else search
        from pyspark.sql import functions as F

        t0 = time.time()
        rows = (
            fn(
                spark, idx.postings, args.q,
                n_docs=idx.n_docs, avgdl=idx.avgdl,
                term_stats=idx.term_stats, k=args.k,
                mode=args.mode, analyzer=args.analyzer,
            )
            .join(idx.doc_map, "doc_id")
            # the join does not preserve the top-k order — restore it
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        )
        out = [
            {k: r[k] for k in r.asDict() if k != "n_terms_matched"}
            for r in rows
        ]
        print(json.dumps({
            "query": args.q, "k": args.k, "mode": args.mode,
            "latency_ms": round(1000 * (time.time() - t0), 1),
            "hits": out,
        }, default=str))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
