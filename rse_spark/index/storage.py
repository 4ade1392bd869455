"""Persistent index segments: partitioned parquet + manifest + resume.

The reference persisted state row-by-row into Postgres with upserts
(``INSERT ... ON CONFLICT`` — reference crawler/src/crawler/crawler/crawler.go:216-228)
and tracked progress in a Redis visited-set (crawler.go:147-155,202-205).
The Spark-idiomatic replacement (SURVEY.md §1.3) is batch segment
writes plus a checkpoint manifest: each completed unit of work writes
its parquet partition and then a small lineage record; a restarted
build anti-joins pending units against the manifest and recomputes
nothing that finished.

Layout under a root directory (Iceberg-shaped, plain parquet in this
sandbox — a real deployment swaps the writer for an Iceberg catalog
without touching the build logic):

    root/
      doc_map/            doc_id -> (repo, path, commit, lang, ...)
      doc_stats/          doc_id, doc_len, content_sha256
      corpus_stats/       n_docs, avgdl
      term_stats/         term, df, cf
      postings/seg_group=K/   term, bucket, segment_id, payload, block_*
      manifest/           one JSON lineage record per completed unit

The unit of resumable work is a SEGMENT GROUP — a contiguous doc_id
range covering ``segments_per_group`` segments. Stage A (ids + stats)
is itself checkpointed as unit "docs".
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rse_spark.index.build import (
    DOC_KEY,
    IndexBundle,
    assign_doc_ids,
    build_posting_lists,
    salted_term_stats,
    term_frequencies,
    tokenized,
)


@dataclass
class LoadedIndex:
    doc_map: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    postings: DataFrame
    avgdl: float
    n_docs: int


class IndexStorage:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "manifest")

    # -- manifest / lineage ------------------------------------------------

    def _manifest_path(self, unit: str) -> str:
        return os.path.join(self.manifest_dir, f"{unit}.json")

    def completed_units(self) -> dict[str, dict]:
        if not os.path.isdir(self.manifest_dir):
            return {}
        out = {}
        for fn in os.listdir(self.manifest_dir):
            if fn.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    out[rec["unit"]] = rec
        return out

    def mark_done(self, unit: str, **lineage) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        rec = {"unit": unit, "status": "done", **lineage}
        tmp = self._manifest_path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._manifest_path(unit))  # atomic commit

    def manifest(self) -> list[dict]:
        return sorted(self.completed_units().values(), key=lambda r: r["unit"])

    # -- write -------------------------------------------------------------

    def _p(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write_bundle(self, bundle: IndexBundle) -> None:
        """Non-resumable full write of an in-memory bundle."""
        bundle.doc_map.write.mode("overwrite").parquet(self._p("doc_map"))
        bundle.doc_stats.write.mode("overwrite").parquet(self._p("doc_stats"))
        bundle.corpus_stats.write.mode("overwrite").parquet(self._p("corpus_stats"))
        bundle.term_stats.write.mode("overwrite").parquet(self._p("term_stats"))
        (
            bundle.postings.withColumn(
                "seg_group", F.col("segment_id")
            )
            .repartition("seg_group")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("seg_group")
            .parquet(self._p("postings"))
        )

    # -- load --------------------------------------------------------------

    def load(self, spark: SparkSession) -> LoadedIndex:
        stats = spark.read.parquet(self._p("corpus_stats")).collect()[0]
        return LoadedIndex(
            doc_map=spark.read.parquet(self._p("doc_map")),
            doc_stats=spark.read.parquet(self._p("doc_stats")),
            term_stats=spark.read.parquet(self._p("term_stats")),
            postings=spark.read.parquet(self._p("postings")),
            avgdl=float(stats["avgdl"]),
            n_docs=int(stats["n_docs"]),
        )


def build_resumable(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    analyzer: str = "code",
    tokenize_path: str = "udf",
    docs_per_segment: int = 4096,
    segments_per_group: int = 4,
    n_buckets: int = 16,
    content_col: str = "content",
    source_snapshot: str = "",
    fail_after_units: int | None = None,
) -> IndexStorage:
    """Checkpointed index build (north_rule: resumable + lineage + metrics).

    Stage A materializes ids/stats; stage B builds posting segments one
    group at a time, committing a manifest record after each. A rerun
    with the same root skips every committed unit. ``fail_after_units``
    injects a crash after N group commits (used by the resume test).
    """
    store = IndexStorage(root)
    done = store.completed_units()

    if content_col != "content":
        corpus = corpus.withColumnRenamed(content_col, "content")

    # ---- Stage A: ids + doc stats + term stats (unit "docs") ----
    if "docs" not in done:
        t0 = time.time()
        if "doc_id" in corpus.columns:
            ids = corpus.withColumn("doc_id", F.col("doc_id").cast("long"))
        else:
            ids = assign_doc_ids(corpus)
        ids = ids.persist()
        toks = tokenized(ids, analyzer, tokenize_path)
        doc_stats = toks.select(
            "doc_id",
            F.size("tokens").cast("long").alias("doc_len"),
            F.sha2("content", 256).alias("content_sha256"),
        )
        map_cols = [c for c in (*DOC_KEY, "lang", "source") if c in ids.columns]
        ids.select("doc_id", *map_cols).write.mode("overwrite").parquet(
            store._p("doc_map")
        )
        doc_stats.write.mode("overwrite").parquet(store._p("doc_stats"))
        ds = spark.read.parquet(store._p("doc_stats"))
        row = ds.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("a")
        ).collect()[0]
        import pandas as pd

        spark.createDataFrame(
            pd.DataFrame({"n_docs": [int(row["n"])], "avgdl": [float(row["a"])]})
        ).write.mode("overwrite").parquet(store._p("corpus_stats"))

        tf = term_frequencies(toks, analyzer, tokenize_path)
        salted_term_stats(tf).write.mode("overwrite").parquet(
            store._p("term_stats")
        )
        ids.unpersist()
        store.mark_done(
            "docs",
            n_docs=int(row["n"]),
            avgdl=float(row["a"]),
            source_snapshot=source_snapshot,
            wall_ms=int(1000 * (time.time() - t0)),
        )
        done = store.completed_units()

    n_docs = done["docs"]["n_docs"]
    avgdl = done["docs"]["avgdl"]

    # ---- Stage B: posting segments, one group per unit ----
    docs_per_group = docs_per_segment * segments_per_group
    n_groups = (n_docs + docs_per_group - 1) // docs_per_group

    # re-derive (doc_id, term, tf, doc_len) lazily; each group filters its
    # doc_id range BEFORE tokenization so a group's work is proportional
    # to the group (filter pushes down to the doc_map/corpus join scan)
    if "doc_id" in corpus.columns:
        with_ids = corpus.withColumn("doc_id", F.col("doc_id").cast("long"))
    else:
        doc_map = spark.read.parquet(store._p("doc_map"))
        with_ids = corpus.join(doc_map, DOC_KEY)
    dl = spark.read.parquet(store._p("doc_stats")).select("doc_id", "doc_len")

    units_done = 0
    for g in range(n_groups):
        unit = f"group={g:06d}"
        if unit in done:
            continue
        if fail_after_units is not None and units_done >= fail_after_units:
            raise RuntimeError(f"injected failure before {unit}")
        t0 = time.time()
        lo, hi = g * docs_per_group, (g + 1) * docs_per_group
        part = with_ids.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        toks = tokenized(part, analyzer, tokenize_path)
        tf = term_frequencies(toks, analyzer, tokenize_path)
        postings = build_posting_lists(
            tf.join(dl, "doc_id"), avgdl, docs_per_segment, n_buckets
        )
        out_dir = os.path.join(store._p("postings"), f"seg_group={g}")
        postings.sortWithinPartitions("term").write.mode("overwrite").parquet(
            out_dir
        )
        # lineage: rows written + content hash of per-term df counts
        written = spark.read.parquet(out_dir)
        agg = written.agg(
            F.count("*").alias("lists"),
            F.sum("df_seg").alias("postings"),
            F.sha2(
                F.concat_ws(
                    "|", F.sort_array(F.collect_list(F.concat_ws(":", "term", "df_seg")))
                ),
                256,
            ).alias("sha"),
        ).collect()[0]
        store.mark_done(
            unit,
            seg_group=g,
            doc_lo=lo,
            doc_hi=hi,
            rows=int(agg["lists"]),
            n_postings=int(agg["postings"] or 0),
            sha=agg["sha"],
            source_snapshot=source_snapshot,
            wall_ms=int(1000 * (time.time() - t0)),
        )
        units_done += 1
    return store
