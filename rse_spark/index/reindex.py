"""Reindex: rebuild an index into a NEW root from its enriched table.

ES _reindex parity, with the two knobs that matter operationally:

* **query filter** (``ql``) — keep only documents matching a boolean
  mini-language query (the complement of ``upsert.delete_by_query``:
  instead of rewriting touched groups in place, carve the keep-set
  into a fresh index — the right tool when the delete would touch most
  of the corpus, exactly as ES recommends reindex-into-new over a
  giant _delete_by_query).
* **re-layout** — segment sizing (``docs_per_segment``,
  ``segments_per_group``) and posting bucketing (``n_buckets``) may
  change, because posting lists are REBUILT, not copied.

The source CORPUS is never read: the enriched table already carries
per-doc term/count (and position) arrays plus doc_len and metadata —
it is the system of record, the same property compaction and
streaming sidecar maintenance rely on. Statistics (df, n_docs, avgdl)
are recomputed for the destination, so BM25 over a filtered reindex
scores against the *new* corpus, which is what a standalone index
must do.

Doc ids are renumbered densely (0..n-1) preserving the source order —
offsets are per-source-group cumulative counts (driver holds only
O(#groups) numbers) plus a rank windowed WITHIN each source group, so
no global window and no driver-side id materialization; monotone
renumbering keeps (score desc, doc_id asc) tie-break order identical
to the source.

GSE has no reindex (reference crawler only ever upserts into one
Postgres schema); contract surface beyond the reference.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rse_spark.index.build import build_posting_lists, explode_tf
from rse_spark.index.storage import POSTINGS_ROW_GROUP_BYTES, IndexStorage
from rse_spark.index.upsert import _refresh_stats


def reindex(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    ql: str | None = None,
    docs_per_segment: int | None = None,
    segments_per_group: int | None = None,
    n_buckets: int | None = None,
    with_positions: bool | None = None,
    groups_per_job: int = 8,
) -> dict:
    """Rebuild ``src_root`` into ``dst_root``; returns a summary dict
    (n_docs, n_groups, layout, wall_sec)."""
    t0 = time.time()
    src = IndexStorage(src_root)
    done = src.completed_units()
    if "docs" not in done:
        raise FileNotFoundError(f"{src_root} is not a finished index")
    src_layout = done["docs"]["layout"]
    analyzer = done["docs"].get("analyzer")
    # explicit None inherits the source layout; an explicit 0/negative
    # is rejected instead of silently inheriting (an `or` fallback
    # would swallow it — round-6 advice)
    dps = (
        docs_per_segment if docs_per_segment is not None
        else src_layout["docs_per_segment"]
    )
    spg = (
        segments_per_group if segments_per_group is not None
        else src_layout["segments_per_group"]
    )
    nb = (
        n_buckets if n_buckets is not None
        else src_layout["n_buckets"]
    )
    for name, v in (
        ("docs_per_segment", dps), ("segments_per_group", spg),
        ("n_buckets", nb),
    ):
        if int(v) < 1:
            raise ValueError(f"{name} must be >= 1, got {v}")
    docs_per_group = dps * spg
    if os.path.exists(dst_root) and os.listdir(dst_root):
        raise FileExistsError(f"{dst_root} exists and is not empty")

    enriched = spark.read.parquet(src._p("enriched"))
    pos_available = "tf_positions" in enriched.columns
    if with_positions is None:
        with_positions = bool(src_layout.get("positions_in_enriched"))
        if not with_positions and os.path.isdir(src._p("positions")):
            # a legacy corpus-built sidecar exists but enriched carries
            # no position arrays: rebuilding it corpus-free is
            # impossible, and silently shipping a destination WITHOUT
            # phrase capability the source had would be a trap
            raise ValueError(
                "source has a corpus-built positional sidecar that "
                "cannot be rebuilt from enriched; pass "
                "with_positions=False to drop it deliberately, then "
                "run build_positions with the corpus on the "
                "destination"
            )
    if with_positions and not pos_available:
        raise ValueError(
            "source enriched table carries no tf_positions arrays; "
            "a positional destination needs a corpus-based "
            "build_positions instead"
        )

    # ---- doc selection + dense renumbering ----
    meta = src.docs_meta(spark).select("doc_id", "seg_group")
    if ql is not None:
        import pandas as pd

        from rse_spark.query.qlang import match_ql
        from rse_spark.query.serve import DirectSearcher

        qualified, _boosts = match_ql(
            DirectSearcher(src_root, analyzer=analyzer or "code"), ql
        )
        if len(qualified) == 0:
            raise ValueError(f"query {ql!r} matches no documents")
        keep = spark.createDataFrame(
            pd.DataFrame({"doc_id": qualified})
        )
        meta = meta.join(F.broadcast(keep), "doc_id", "left_semi")
    counts = {
        int(r["seg_group"]): int(r["n"])
        for r in meta.groupBy("seg_group")
        .agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for g in sorted(counts):
        offsets[g] = acc
        acc += counts[g]
    n_docs = acc
    off_map = F.create_map(
        *[x for g, o in sorted(offsets.items())
          for x in (F.lit(g), F.lit(o))]
    )
    rank = F.row_number().over(
        Window.partitionBy("seg_group").orderBy("doc_id")
    )
    mapping = meta.select(
        F.col("doc_id").alias("old_doc_id"),
        (
            F.element_at(off_map, F.col("seg_group").cast("int"))
            + rank - F.lit(1)
        ).cast("long").alias("new_doc_id"),
    )

    def _remap(df: DataFrame) -> DataFrame:
        return (
            df.drop("seg_group")
            .withColumnRenamed("doc_id", "old_doc_id")
            .join(mapping, "old_doc_id")
            .withColumn("doc_id", F.col("new_doc_id"))
            .drop("old_doc_id", "new_doc_id")
            .withColumn(
                "seg_group",
                (F.col("doc_id") / F.lit(docs_per_group)).cast("long"),
            )
        )

    dst = IndexStorage(dst_root)
    _remap(enriched).write.mode("overwrite").partitionBy(
        "seg_group"
    ).parquet(dst._p("enriched"))
    if os.path.isdir(src._p("docs_meta")):
        _remap(spark.read.parquet(src._p("docs_meta"))).write.mode(
            "overwrite"
        ).partitionBy("seg_group").parquet(dst._p("docs_meta"))

    # ---- postings rebuild under the destination layout ----
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    n_groups = (n_docs + docs_per_group - 1) // docs_per_group
    dst_enriched = spark.read.parquet(dst._p("enriched"))
    source_snapshot = f"reindex:{src_root}" + (
        f" ql={ql!r}" if ql else ""
    )
    from pyspark.sql import Observation

    all_groups = list(range(n_groups))
    for i in range(0, n_groups, groups_per_job):
        batch = all_groups[i: i + groups_per_job]
        tb = time.time()
        part = dst_enriched.filter(F.col("seg_group").isin(batch))
        postings = build_posting_lists(
            explode_tf(part), dps, nb
        ).withColumn(
            "seg_group", F.floor(F.col("segment_id") / spg)
        )
        obs = Observation(f"reindex_groups_{batch[0]}")
        metrics = []
        for g in batch:
            cond = F.col("seg_group") == g
            metrics += [
                F.count(F.when(cond, 1)).alias(f"lists_{g}"),
                F.sum(F.when(cond, F.col("df_seg"))).alias(f"post_{g}"),
                F.sum(
                    F.when(
                        cond,
                        F.crc32(F.concat_ws(":", "term", "df_seg")),
                    )
                ).alias(f"sha_{g}"),
            ]
        (
            postings.observe(obs, *metrics)
            .repartition("seg_group", "bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .option("parquet.block.size", str(POSTINGS_ROW_GROUP_BYTES))
            .option("parquet.page.size.row.check.min", "32")
            .partitionBy("seg_group", "bucket")
            .parquet(dst._p("postings"))
        )
        vals = obs.get
        wall = int(1000 * (time.time() - tb))
        for g in batch:
            dst.mark_done(
                f"group={g:06d}",
                seg_group=g,
                doc_lo=g * docs_per_group,
                doc_hi=(g + 1) * docs_per_group,
                rows=int(vals.get(f"lists_{g}") or 0),
                n_postings=int(vals.get(f"post_{g}") or 0),
                sha=f"crc32sum:{int(vals.get(f'sha_{g}') or 0)}",
                source_snapshot=source_snapshot,
                wall_ms=wall // max(1, len(batch)),
            )

    # ---- stats + docs record (same shape build_resumable writes) ----
    n_check, avgdl = _refresh_stats(spark, dst, nb)
    assert n_check == n_docs, (n_check, n_docs)
    dst.mark_done(
        "term_stats", source_snapshot=source_snapshot, wall_ms=0
    )
    dst.mark_done(
        "docs",
        n_docs=n_docs,
        avgdl=avgdl,
        source_snapshot=source_snapshot,
        analyzer=analyzer,
        layout={"docs_per_segment": dps,
                "segments_per_group": spg,
                "n_buckets": nb,
                "positions_in_enriched": bool(with_positions)},
    )

    if with_positions:
        from rse_spark.index.positions import build_positions

        build_positions(spark, None, dst_root, analyzer=None)

    return {
        "n_docs": n_docs,
        "n_groups": n_groups,
        "filtered": ql is not None,
        "layout": {"docs_per_segment": dps,
                   "segments_per_group": spg, "n_buckets": nb,
                   "positions": bool(with_positions)},
        "wall_sec": round(time.time() - t0, 2),
    }
