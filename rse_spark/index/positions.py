"""Optional positional sidecar index: Lucene-style token positions.

The base index stores (doc_id, tf, doc_len) per term — enough for
BM25, not for phrase matching without re-reading content. The batch
path verifies phrases against the content store (query/textmatch.py);
at serving scale that per-query content fetch is the expensive step
(bounded, but IO against the corpus). The standard fulltext answer is
a POSITIONAL index: per (term, segment) the token positions of every
occurrence, delta+varint encoded — phrase adjacency then resolves
entirely inside the index (Lucene's .pos file; GSE stored only
``frequency``, reference crawler/src/postgres/init_db.sql:10-16, so
phrases were impossible there).

Layout: ``root/positions/seg_group=K/bucket=B/*.parquet`` mirroring
the postings partitioning, rows (term, segment_id, bucket,
doc_payload, pos_payload):

* ``doc_payload`` — varint pairs ``(doc_id_gap, n_positions)`` per
  doc (gap vs previous doc in the list, first absolute);
* ``pos_payload`` — varint position deltas, doc boundaries derived
  from the ``n_positions`` counts (first position of each doc
  absolute).

Two separate streams (instead of interleaving headers with
positions) keep BOTH decode directions fully numpy-vectorized — the
interleaved form cannot be parsed without a per-doc Python walk.

Positions are indices in the ANALYZED TOKEN STREAM (Lucene
semantics). For the ``simple`` analyzer (whitespace split, no token
dropped) this equals whitespace word position, so results match the
content-verify path exactly (equivalence-tested); for splitting
analyzers (``code``) adjacency means adjacent tokens after analysis,
which is what "phrase" means in every positional fulltext engine.

Scale shape: the build is one Arrow UDF scan emitting per-(doc, term)
position arrays (cardinality == tf rows, NOT raw tokens), one shuffle
to group (term, segment), vectorized encode in applyInPandas, writes
partition-pruned like postings. Work ~ corpus tokens; no driver data.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rse_spark.index.build import DOC_KEY
from rse_spark.index.codec import varint_decode, varint_encode
from rse_spark.index.storage import IndexStorage


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def encode_position_list(
    doc_ids: np.ndarray, lens: np.ndarray, flat_pos: np.ndarray
) -> tuple[bytes, bytes]:
    """Encode one (term, segment) position list.

    ``doc_ids`` sorted ascending; ``lens[i]`` = number of positions of
    doc i; ``flat_pos`` = all positions concatenated in doc order,
    ascending within each doc."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    flat_pos = np.ascontiguousarray(flat_pos, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return b"", b""
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    if lens.sum() != len(flat_pos) or (lens <= 0).any():
        raise ValueError("lens must be positive and sum to len(flat_pos)")

    header = np.empty(2 * n, dtype=np.uint64)
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = doc_ids[0]
    if n > 1:
        gaps[1:] = np.diff(doc_ids)
    header[0::2] = gaps.astype(np.uint64)
    header[1::2] = lens.astype(np.uint64)

    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    deltas = flat_pos.copy()
    deltas[1:] -= flat_pos[:-1]
    deltas[starts] = flat_pos[starts]  # absolute at each doc start
    if (deltas < 0).any():
        raise ValueError("positions must ascend within each doc")
    return (
        varint_encode(header).tobytes(),
        varint_encode(deltas.astype(np.uint64)).tobytes(),
    )


def decode_position_list(
    doc_payload: bytes, pos_payload: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids, lens, flat_abs_positions) — all vectorized
    (segmented cumsum for the per-doc absolute positions)."""
    if not doc_payload:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    header = varint_decode(np.frombuffer(doc_payload, dtype=np.uint8))
    doc_ids = np.cumsum(header[0::2].astype(np.int64))
    lens = header[1::2].astype(np.int64)
    deltas = varint_decode(
        np.frombuffer(pos_payload, dtype=np.uint8)
    ).astype(np.int64)
    cs = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    base = cs[starts] - deltas[starts]
    flat = cs - np.repeat(base, lens)
    return doc_ids, lens, flat


# ---------------------------------------------------------------------------
# build job
# ---------------------------------------------------------------------------

_POS_ROWS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("term", T.StringType()),
    T.StructField("positions", T.ArrayType(T.IntegerType())),
])

_POS_SEG_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("segment_id", T.LongType()),
    T.StructField("bucket", T.IntegerType()),
    T.StructField("doc_payload", T.BinaryType()),
    T.StructField("pos_payload", T.BinaryType()),
])


def _attach_doc_ids(meta: DataFrame, corpus: DataFrame,
                    content_col: str) -> DataFrame:
    """(doc_id, content) by bridging the corpus to the stored doc
    metadata — same key detection as index/integrity.py:_sha_check."""
    if content_col != "content":
        corpus = corpus.withColumnRenamed(content_col, "content")
    if all(c in meta.columns for c in DOC_KEY) and all(
        c in corpus.columns for c in DOC_KEY
    ):
        key = list(DOC_KEY)
        src = corpus
    elif "src_doc_id" in meta.columns and "doc_id" in corpus.columns:
        key = ["src_doc_id"]
        src = corpus.withColumnRenamed("doc_id", "src_doc_id")
    elif "doc_id" in corpus.columns:
        key = ["doc_id"]
        return corpus.select("doc_id", "content").join(
            meta.select("doc_id"), "doc_id", "left_semi"
        )
    else:
        raise ValueError("no join key between index and corpus")
    return meta.select("doc_id", *key).join(
        src.select(*key, "content"), key, "inner"
    ).select("doc_id", "content")


def _group_dirs(path: str) -> set[int]:
    if not os.path.isdir(path):
        return set()
    return {
        int(p.split("=", 1)[1]) for p in os.listdir(path)
        if p.startswith("seg_group=")
    }


def build_positions(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    analyzer: str = "simple",
    content_col: str = "content",
    n_buckets: int | None = None,
    only_missing: bool = False,
) -> int:
    """Build the positional sidecar for an ALREADY-BUILT index at
    ``root`` (doc ids, segment layout and term buckets are read from
    its manifest, so positions land exactly where the postings
    reader's bucket pruning expects them). Committed as manifest unit
    ``positions`` — bumps the index generation like any writer.
    Returns the number of segment groups (re)built.

    ``only_missing=True`` is the STREAM-GROWN maintenance mode: only
    postings groups with no positions partition yet are tokenized and
    written (dynamic partition overwrite) — work ~ the appended
    batches, not the whole corpus. Group-rewriting writers (compact,
    delete/upsert) drop the whole sidecar instead, because their old
    positions are wrong, not merely absent; after those, a full
    rebuild is required and this function does one."""
    store = IndexStorage(root)
    done = store.completed_units()
    layout = done["docs"]["layout"]
    docs_per_segment = int(layout["docs_per_segment"])
    n_buckets = int(n_buckets or layout["n_buckets"])
    t0 = time.time()

    segments_per_group = int(layout["segments_per_group"])
    docs_per_group = docs_per_segment * segments_per_group
    meta = store.docs_meta(spark)
    if "seg_group" not in meta.columns:  # write_bundle layouts
        meta = meta.withColumn(
            "seg_group",
            (F.col("doc_id") / F.lit(docs_per_group)).cast("long"),
        )
    missing: set[int] | None = None
    if only_missing:
        missing = (
            _group_dirs(os.path.join(root, "postings"))
            - _group_dirs(os.path.join(root, "positions"))
        )
        if not missing:
            return 0
        meta = meta.filter(
            F.col("seg_group").isin([int(g) for g in missing])
        )

    pairs = _attach_doc_ids(meta, corpus, content_col)

    def _positions(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rse_spark.tokenizer import tokenize

        for pdf in batches:
            ids, terms, poss = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["content"]):
                by_term: dict[str, list[int]] = {}
                for i, tok in enumerate(tokenize(text or "", analyzer)):
                    by_term.setdefault(tok, []).append(i)
                for t, p in by_term.items():
                    ids.append(doc_id)
                    terms.append(t)
                    poss.append(p)
            yield pd.DataFrame(
                {"doc_id": ids, "term": terms, "positions": poss}
            )

    rows = pairs.mapInPandas(_positions, _POS_ROWS_SCHEMA).withColumn(
        "segment_id",
        (F.col("doc_id") / F.lit(docs_per_segment)).cast("long"),
    ).withColumn(
        "bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        pos_lists = list(pdf["positions"])
        lens = np.fromiter(map(len, pos_lists), dtype=np.int64,
                           count=len(pos_lists))
        flat = (
            np.concatenate([np.asarray(p, dtype=np.int64)
                            for p in pos_lists])
            if pos_lists else np.empty(0, dtype=np.int64)
        )
        doc_payload, pos_payload = encode_position_list(
            doc_ids, lens, flat
        )
        return pd.DataFrame({
            "term": [pdf["term"].iloc[0]],
            "segment_id": [int(pdf["segment_id"].iloc[0])],
            "bucket": [int(pdf["bucket"].iloc[0])],
            "doc_payload": [doc_payload],
            "pos_payload": [pos_payload],
        })

    pos_root = os.path.join(root, "positions")
    if only_missing:
        # append the absent groups only: dynamic partition overwrite
        # touches exactly the partitions this job writes
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
    else:
        # full (re)build: clear the directory first so group dirs from
        # a previous layout can't linger under dynamic-overwrite confs
        import shutil

        shutil.rmtree(pos_root, ignore_errors=True)
    (
        rows.groupBy("term", "segment_id", "bucket")
        .applyInPandas(_encode, _POS_SEG_SCHEMA)
        .withColumn(
            "seg_group",
            F.floor(F.col("segment_id") / F.lit(segments_per_group)),
        )
        .repartition("seg_group", "bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("seg_group", "bucket")
        .parquet(pos_root)
    )
    if missing is not None:
        # a corpus that doesn't contain the missing groups' docs
        # produces an empty write — that is NOT success; stay loud so
        # the caller doesn't believe the sidecar is current
        still = missing - _group_dirs(pos_root)
        if still:
            raise ValueError(
                f"corpus did not cover positions for groups "
                f"{sorted(still)}"
            )
    built = len(missing) if missing is not None else len(
        _group_dirs(pos_root)
    )
    store.mark_done(
        "positions",
        analyzer=analyzer,
        wall_ms=int(1000 * (time.time() - t0)),
        groups_built=int(built),
        mode="incremental" if only_missing else "full",
    )
    return int(built)


def has_positions(root: str) -> bool:
    return os.path.isdir(os.path.join(root, "positions"))
