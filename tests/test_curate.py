"""End-to-end curated-dataset job (round-2 VERDICT item 8): a
multi-format corpus tree through gate -> dedup -> cap -> split ->
chunk -> JSONL, with per-stage checkpoint/resume after a kill."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.curate import StageManifest, curate_dataset


@pytest.fixture(scope="module")
def corpus_tree(tmp_path_factory):
    """parquet + JSONL + raw-text inputs with planted duplicates."""
    root = tmp_path_factory.mktemp("curate_src")

    def body(i: int) -> str:
        # per-doc-unique token stream: docs share NO shingles, so the
        # only near-dup pair is the planted one
        return " ".join(f"w{i}x{j}" for j in range(34))

    rows = []
    for i in range(40):
        rows.append({
            "doc_id": i,
            "text": f"doc{i} {body(i)} tail{i}",
            "lang": "en" if i % 4 else "de",
        })
    # exact duplicate pair (same content, different id)
    rows[7]["text"] = rows[3]["text"]
    # near-duplicate of doc 5 (only the trailing token changed)
    near = rows[5]["text"].replace("tail5", "tailnear")
    pd.DataFrame(rows).to_parquet(root / "docs.parquet")

    with open(root / "extra.jsonl", "w") as f:
        f.write(json.dumps({"text": near, "lang": "en"}) + "\n")
        f.write(json.dumps(
            {"text": "short", "lang": "en"}) + "\n")  # gated: too short
        f.write(json.dumps(
            {"text": f"freshdoc {body(901)} ending901", "lang": "fr"})
            + "\n")
    txtdir = root / "raw"
    txtdir.mkdir()
    (txtdir / "a.txt").write_text(f"rawdoc {body(902)} ending902")
    return str(root)


def test_curate_end_to_end(spark, corpus_tree, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate_out"))
    summary = curate_dataset(
        spark,
        [f"{corpus_tree}/docs.parquet", f"{corpus_tree}/extra.jsonl",
         f"{corpus_tree}/raw"],
        out,
        content_col="text",
        min_chars=50,
        near_dup=True,
        min_shared_bands=1,
        cap_per_lang=100,
        train_pct=75,
        chunk_tokens=16,
        chunk_stride=12,
    )
    stages = summary["stages"]
    assert stages["ingest"] == 44  # 40 parquet + 3 jsonl + 1 txt
    assert stages["gate"] == 43    # "short" dropped
    # exact dup (1) and near-dup (1) each lose one member
    assert stages["dedup"] == 41
    ds = spark.read.json(os.path.join(out, "dataset"))
    assert summary["n_rows"] == ds.count()
    # chunking: every doc yields >= 2 overlapping chunks (bodies are
    # ~35 tokens, window 16 stride 12)
    per_doc = ds.groupBy("doc_uid").count().agg(F.min("count")).first()[0]
    assert per_doc >= 2
    # split partitions exist and are a function of doc_uid only
    splits = {r["split"] for r in ds.select("split").distinct().collect()}
    assert splits <= {"train", "val"} and "train" in splits
    one = ds.groupBy("doc_uid").agg(
        F.countDistinct("split").alias("n")
    ).agg(F.max("n")).first()[0]
    assert one == 1
    # chunk token bound respected
    assert ds.agg(F.max("n_tokens")).first()[0] <= 16


def test_curate_resume_after_kill(spark, corpus_tree, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate_resume"))
    kwargs = dict(
        content_col="text", min_chars=50, near_dup=False,
        train_pct=75, chunk_tokens=16, chunk_stride=12,
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        curate_dataset(
            spark, [f"{corpus_tree}/docs.parquet"], out,
            fail_after_stages=3, **kwargs,
        )
    man = StageManifest(out)
    first = man.done()
    assert set(first) == {"ingest", "gate", "dedup"}
    t_ingest = first["ingest"]["ts"]

    summary = curate_dataset(
        spark, [f"{corpus_tree}/docs.parquet"], out, **kwargs,
    )
    second = man.done()
    # completed stages were NOT recomputed (same manifest record)
    assert second["ingest"]["ts"] == t_ingest
    assert set(second) == {"ingest", "gate", "dedup", "cap", "split",
                           "chunk", "write"}
    ds = spark.read.json(summary["dataset"])
    assert ds.count() == summary["n_rows"] > 0


def test_curate_resume_invalidates_on_param_change(
    spark, corpus_tree, tmp_path_factory
):
    """Rerunning into the same --out with different stage parameters
    must NOT silently reuse stale outputs: the first stage whose params
    changed (and everything downstream) is recomputed."""
    out = str(tmp_path_factory.mktemp("curate_params"))
    base = dict(content_col="text", near_dup=False, train_pct=75,
                min_chars=50)
    curate_dataset(spark, [f"{corpus_tree}/docs.parquet"], out, **base)
    man = StageManifest(out)
    first = man.done()
    n_gate_first = first["gate"]["rows"]
    t_ingest = first["ingest"]["ts"]

    # tighter gate: only the 'de' docs (10 of 40) pass
    summary = curate_dataset(
        spark, [f"{corpus_tree}/docs.parquet"], out,
        allow_langs=["de"], **base,
    )
    second = man.done()
    # ingest params unchanged -> reused; gate and downstream recomputed
    assert second["ingest"]["ts"] == t_ingest
    assert second["gate"]["ts"] > first["gate"]["ts"]
    assert second["gate"]["rows"] == 10 != n_gate_first
    assert second["gate"]["allow_langs"] == ["de"]
    assert summary["n_rows"] > 0
    ds = spark.read.json(summary["dataset"])
    assert ds.select("lang").distinct().collect()[0]["lang"] == "de"

    # identical rerun -> everything reused, nothing recomputed
    curate_dataset(
        spark, [f"{corpus_tree}/docs.parquet"], out,
        allow_langs=["de"], **base,
    )
    assert man.done()["gate"]["ts"] == second["gate"]["ts"]


def test_curate_null_content_keys(spark, tmp_path_factory):
    """NULL content is coalesced to '' before keying: n_chars is 0 (not
    NULL) so a min_chars gate drops it deliberately, and the doc_uid is
    well-defined."""
    root = tmp_path_factory.mktemp("curate_null")
    pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["real document with enough characters to pass the gate",
                 None, ""],
        "lang": ["en", "en", "en"],
    }).to_parquet(root / "docs.parquet")
    out = str(tmp_path_factory.mktemp("curate_null_out"))
    summary = curate_dataset(
        spark, [str(root / "docs.parquet")], out,
        content_col="text", min_chars=10, near_dup=False,
    )
    # null-content and empty-content rows both gated out by min_chars;
    # they are exact duplicates of each other by design (same uid rule)
    assert summary["stages"]["gate"] == 1
    assert summary["n_rows"] >= 1


def test_curate_cleaning_stages(spark, tmp_path_factory):
    """redact + repetition filter + eval-set decontamination inside the
    pipeline: PII never reaches the dataset, repetitive docs and eval
    overlaps are dropped."""
    root = tmp_path_factory.mktemp("curate_clean_src")
    rows = [{"doc_id": i,
             "text": f"doc{i} " + " ".join(f"w{i}x{j}" for j in range(30)),
             "lang": "en"} for i in range(10)]
    rows[3]["text"] += " reach me at bob@corp.example.com or 10.1.2.3"
    rows[5]["text"] = "spam spam spam " * 10          # rep_ratio ~ 1
    rows[7]["text"] = "the secret eval answer sequence is here " + \
        rows[7]["text"]
    pd.DataFrame(rows).to_parquet(root / "docs.parquet")
    pd.DataFrame([{
        "text": "benchmark: the secret eval answer sequence is what"
    }]).to_parquet(root / "eval.parquet")

    out = str(tmp_path_factory.mktemp("curate_clean_out"))
    summary = curate_dataset(
        spark, [str(root / "docs.parquet")], out,
        content_col="text", min_chars=10, near_dup=False,
        redact=True, max_rep_ratio=0.5,
        decontaminate_against=str(root / "eval.parquet"), decon_n=5,
    )
    # doc 5 (repetitive) dropped at gate; doc 7 (eval overlap) at dedup
    assert summary["stages"]["gate"] == 9
    assert summary["stages"]["dedup"] == 8
    ds = spark.read.json(summary["dataset"])
    assert ds.count() == 8
    texts = [r["content"] for r in ds.collect()]
    joined = " ".join(texts)
    assert "bob@corp.example.com" not in joined
    assert "10.1.2.3" not in joined
    assert "[PII]" in joined
    assert not any("secret eval answer" in t for t in texts)


def test_curate_cli(corpus_tree, tmp_path_factory, capsys):
    from rse_spark.cli import main

    out = str(tmp_path_factory.mktemp("curate_cli"))
    rc = main([
        "curate", "--input", f"{corpus_tree}/docs.parquet",
        "--out", out, "--content-col", "text",
        "--allow-langs", "en", "--min-chars", "50",
        "--no-near-dup", "--chunk-tokens", "16",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    assert summary["n_rows"] > 0
    assert os.path.isdir(os.path.join(out, "dataset"))
