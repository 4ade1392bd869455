"""End-to-end curated-dataset job: multi-format corpus tree in,
training-ready JSONL out.

The pipeline composes the operators that are each individually oracled
on the driver board (gate -> exact dedup -> near-dup clustering ->
stratified language cap -> deterministic split -> overlapping-window
chunking -> JSONL sink) into the single job a real user runs to ship a
training dataset — GSE's end goal (crawl -> store -> query, reference
crawler/src/crawler/crawler.go:111-228) re-expressed as corpus
curation at dataset scale.

Resume model: each stage writes its output as parquet under
``<out>/stages/<stage>/`` and then appends a manifest record
(``<out>/_manifest.jsonl``); a rerun skips every committed stage and
recomputes only from the first missing one (the index builder's
manifest pattern, storage.py:156, applied at pipeline granularity).
The crash window between a finished write and its manifest record
re-runs that one stage idempotently (mode=overwrite).

Scale notes: every stage is a bounded set of hash shuffles — the gate
predicates push to the scan; exact dedup is one groupBy on a content
hash; near-dup is the banded-LSH join with the hot-bucket cap (never
all-pairs); cap/split are window-rank/pure-hash per group; chunking is
one JVM explode. Nothing collects rows to the driver; stage outputs
are parquet so each stage restarts from columnar storage, not lineage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rse_spark.functions.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from rse_spark.functions.gate import filter_gate
from rse_spark.sources.corpus_io import read_corpus

STAGES = ("ingest", "gate", "dedup", "cap", "split", "chunk", "write")


class StageManifest:
    """Append-only JSONL ledger of completed pipeline stages."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def done(self) -> dict[str, dict]:
        recs: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        recs[rec["stage"]] = rec
        return recs

    def mark(self, stage: str, **info) -> None:
        rec = {"stage": stage, "ts": time.time(), **info}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def invalidate_from(self, stage: str) -> None:
        """Drop ``stage`` and everything downstream of it from the
        ledger (their parquet stays on disk; mode=overwrite reclaims
        it when the stage reruns)."""
        recs = self.done()
        keep = STAGES[: STAGES.index(stage)]
        with open(self.path, "w") as f:
            for s in keep:
                if s in recs:
                    f.write(json.dumps(recs[s]) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, "stages", stage)


def _ingest(spark: SparkSession, inputs: list[str],
            content_col: str | None) -> DataFrame:
    """Union a multi-format corpus tree into one normalized frame with
    a stable per-document key (md5 over source path + content — a pure
    function of the data, reproducible across runs and cluster sizes)."""
    frames = []
    for path in inputs:
        df = read_corpus(spark, path, content_col=content_col)
        if "path" not in df.columns:
            df = df.withColumn("path", F.lit(os.path.basename(path)))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    if "lang" not in out.columns:
        out = out.withColumn("lang", F.lit("und"))
    # NULL content is normalized to '' BEFORE keying: concat_ws skips
    # NULLs, so without this a null-content row would silently collide
    # with the empty-content row at the same path while carrying a NULL
    # n_chars that only min_chars>0 gates would reject. After the
    # coalesce both hash identically on purpose and n_chars=0, so the
    # gate treats them uniformly.
    out = out.withColumn(
        "content", F.coalesce(F.col("content").cast("string"), F.lit(""))
    )
    return out.withColumn(
        "doc_uid",
        F.md5(F.concat_ws("|", F.col("path").cast("string"), "content")),
    ).withColumn("n_chars", F.length("content").cast("long"))


def _near_dup_keepers(docs: DataFrame, shingle_n: int,
                      n_hashes: int = 16, bands: int = 4,
                      min_shared_bands: int = 2) -> DataFrame:
    """Drop every near-duplicate except its cluster representative
    (min doc_uid — connected_components' min-label works on strings)."""
    sh = word_shingles(docs, n=shingle_n, content_col="content",
                       id_col="doc_uid")
    sig = minhash_signatures(sh, n_hashes=n_hashes, id_col="doc_uid")
    pairs = lsh_candidate_pairs(
        sig, n_hashes=n_hashes, bands=bands, id_col="doc_uid"
    ).filter(F.col("n_shared_bands") >= min_shared_bands)
    clusters = connected_components(pairs)
    losers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias("doc_uid"))
    return docs.join(losers, "doc_uid", "left_anti")


def curate_dataset(
    spark: SparkSession,
    inputs: list[str] | str,
    out_dir: str,
    *,
    content_col: str | None = None,
    allow_langs: list[str] | None = None,
    deny_sources: list[str] | None = None,
    min_chars: int = 1,
    redact: bool = False,
    max_rep_ratio: float | None = None,
    decontaminate_against: list[str] | str | None = None,
    decon_n: int = 8,
    near_dup: bool = True,
    shingle_n: int = 3,
    min_shared_bands: int = 2,
    cap_per_lang: int | None = None,
    train_pct: int = 90,
    chunk_tokens: int | None = None,
    chunk_stride: int | None = None,
    fail_after_stages: int | None = None,
) -> dict:
    """Run (or resume) the curation pipeline; returns a summary dict.

    ``fail_after_stages`` injects a crash after N newly-completed
    stages (the resume test's kill switch, mirroring
    build_resumable's fail_after_units)."""
    if isinstance(inputs, str):
        inputs = [inputs]
    if isinstance(decontaminate_against, str):
        decontaminate_against = [decontaminate_against]
    man = StageManifest(out_dir)
    done = man.done()
    completed_now = 0

    # Resume is PARAM-AWARE: a committed stage is only reused when the
    # parameters it was built with match the current invocation; the
    # first mismatching stage and everything downstream are invalidated
    # and recomputed (a rerun with e.g. a different --min-chars must
    # never silently serve the old gate output).
    stage_params: dict[str, dict] = {
        "ingest": {"inputs": inputs, "content_col": content_col},
        "gate": {"allow_langs": allow_langs, "deny_sources": deny_sources,
                 "min_chars": min_chars, "redact": redact,
                 "max_rep_ratio": max_rep_ratio},
        "dedup": {"near_dup": near_dup, "shingle_n": shingle_n,
                  "min_shared_bands": min_shared_bands,
                  "decontaminate_against": decontaminate_against,
                  "decon_n": decon_n},
        "cap": {"cap_per_lang": cap_per_lang},
        "split": {"train_pct": train_pct},
        "chunk": {"chunk_tokens": chunk_tokens,
                  "chunk_stride": (chunk_stride or chunk_tokens)
                  if chunk_tokens is not None else None},
    }
    for s in STAGES:
        if s in done and s in stage_params:
            stored = {k: done[s].get(k) for k in stage_params[s]}
            if stored != stage_params[s]:
                man.invalidate_from(s)
                done = man.done()
                break

    def _maybe_fail() -> None:
        nonlocal completed_now
        completed_now += 1
        if fail_after_stages is not None and completed_now >= fail_after_stages:
            raise RuntimeError(
                f"injected failure after {completed_now} stages"
            )

    def _run(stage: str, fn) -> DataFrame:
        nonlocal done
        path = man.stage_path(stage)
        if stage in done:
            return spark.read.parquet(path)
        df = fn()
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        man.mark(stage, rows=out.count(), **stage_params.get(stage, {}))
        done = man.done()
        _maybe_fail()
        return out

    docs = _run("ingest", lambda: _ingest(spark, inputs, content_col))

    def _gate():
        out = filter_gate(
            docs, allow_langs=allow_langs, deny_sources=deny_sources,
            min_chars=min_chars, content_col="content",
        )
        if redact:
            from rse_spark.functions.cleaning import redact_pii

            out = redact_pii(out, content_col="content")
        if max_rep_ratio is not None:
            # Gopher-style repetition filter: drop docs whose duplicate
            # 3-gram fraction exceeds the threshold
            from rse_spark.functions.cleaning import repetition_ratio

            spam = repetition_ratio(
                out, n=3, content_col="content", id_col="doc_uid"
            ).filter(F.col("rep_ratio") > max_rep_ratio).select("doc_uid")
            out = out.join(spam, "doc_uid", "left_anti")
        return out

    gated = _run("gate", _gate)

    def _dedup():
        keepers = gated.groupBy(F.md5("content").alias("_fp")).agg(
            F.min("doc_uid").alias("doc_uid")
        )
        # two ingested rows can share a doc_uid (same path + content —
        # true duplicates); keep exactly one per uid, deterministically.
        # The sort key is a 32-char hash of the full row — same total
        # order properties as sorting the row JSON itself, but the
        # window sorts a fixed-width key instead of serializing whole
        # documents through the sort payload.
        one = Window.partitionBy("doc_uid").orderBy(
            F.asc(F.md5(
                F.to_json(F.struct(*[F.col(c) for c in gated.columns]))
            ))
        )
        out = (
            gated.join(keepers.select("doc_uid"), "doc_uid", "left_semi")
            .withColumn("_rn", F.row_number().over(one))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if near_dup:
            out = _near_dup_keepers(
                out, shingle_n, min_shared_bands=min_shared_bands
            )
        if decontaminate_against:
            # eval-set decontamination rides the dedup stage: it is the
            # same shingle -> overlap -> drop family, applied against an
            # EXTERNAL held-out set instead of the corpus itself
            from rse_spark.functions.cleaning import decontaminate

            evals = None
            for p in decontaminate_against:
                e = read_corpus(spark, p, content_col=content_col)
                evals = e if evals is None else evals.unionByName(
                    e, allowMissingColumns=True
                )
            evals = evals.withColumn(
                "content",
                F.coalesce(F.col("content").cast("string"), F.lit("")),
            )
            out = decontaminate(
                out, evals, n=decon_n,
                content_col="content", id_col="doc_uid",
            )
        return out

    deduped = _run("dedup", _dedup)

    def _cap():
        if cap_per_lang is None:
            return deduped
        w = Window.partitionBy("lang").orderBy(
            F.asc(F.md5("doc_uid")), F.asc("doc_uid")
        )
        return (
            deduped.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cap_per_lang)
            .drop("_rk")
        )

    capped = _run("cap", _cap)

    def _split():
        return capped.withColumn(
            "split",
            F.when(
                F.conv(F.substring(F.md5("doc_uid"), 1, 4), 16, 10)
                .cast("long") % 100 < train_pct,
                F.lit("train"),
            ).otherwise(F.lit("val")),
        )

    split = _run("split", _split)

    def _chunk():
        if chunk_tokens is None:
            return split.withColumn("chunk_id", F.lit(0)).withColumn(
                "n_tokens", F.size(F.split("content", " ")).cast("long")
            )
        stride = chunk_stride or chunk_tokens
        d = split.withColumn("_sp", F.split("content", " "))
        chunks = d.select(
            *[c for c in d.columns if c not in ("_sp", "content")],
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_sp), {stride}),"
                    f" s -> struct(cast((s - 1) div {stride} as int)"
                    "  AS cid,"
                    f" concat_ws(' ', slice(_sp, s, {chunk_tokens})) AS txt))"
                )
            ).alias("_c"),
        )
        return chunks.select(
            *[c for c in chunks.columns if c != "_c"],
            F.col("_c.cid").alias("chunk_id"),
            F.col("_c.txt").alias("content"),
        ).withColumn(
            "n_tokens", F.size(F.split("content", " ")).cast("long")
        )

    chunked = _run("chunk", _chunk)

    dataset = os.path.join(out_dir, "dataset")
    if "write" not in done:
        (
            chunked.write.mode("overwrite")
            .partitionBy("split")
            .json(dataset)
        )
        n = spark.read.json(dataset).count()
        man.mark("write", rows=n, dataset=dataset)
        done = man.done()
        _maybe_fail()
    return {
        "out_dir": out_dir,
        "dataset": os.path.join(out_dir, "dataset"),
        "stages": {s: done[s].get("rows") for s in STAGES if s in done},
        "n_rows": done["write"]["rows"] if "write" in done else None,
    }
