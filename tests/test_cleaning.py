"""Corpus-cleaning operators (functions/cleaning.py): decontamination,
PII redaction, repetition ratio — planted-case semantics + plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.functions.cleaning import (
    contaminated_ids,
    decontaminate,
    redact_pii,
    repetition_ratio,
)


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox jumps over the lazy dog today",
            "completely unrelated content about spark partitions here",
            "prefix words then the quick brown fox jumps over suffix",
            "short doc",
        ],
    }))


def test_decontaminate_flags_overlap(spark, train):
    evals = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["benchmark asks the quick brown fox jumps over what"],
    }))
    bad = sorted(
        r["doc_id"] for r in contaminated_ids(train, evals, n=5).collect()
    )
    # docs 0 and 2 share the 5-gram "the quick brown fox jumps"
    assert bad == [0, 2]
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, evals, n=5).collect()
    )
    assert kept == [1, 3]
    # n larger than any shared run -> nothing flagged
    assert contaminated_ids(train, evals, n=9).count() == 0


def test_redact_pii_patterns(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0],
        "text": ["mail a.user+tag@sub.example.org or 192.168.001.12 "
                 "or 555-123-4567 but keep version 1.2 and year 2024"],
    }))
    out = redact_pii(docs).collect()[0]["text"]
    assert "example.org" not in out and "@" not in out
    assert "192.168" not in out
    assert "555-123-4567" not in out
    assert out.count("[PII]") == 3
    # non-PII numerics survive
    assert "1.2" in out and "2024" in out


def test_redact_pii_ssn_and_card(spark):
    """Round-5 extended set: SSN (dashed 3-2-4) and credit card
    (grouped 4x4 or bare 15-16 digits), with the documented
    false-positive boundary held by FP-prone probe strings."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0],
        "text": ["ssn 078-05-1120 card 4111-1111-1111-1111 "
                 "spaced 4111 1111 1111 1111 pan 4111111111111111 "
                 "amex 371449635398431 end"],
    }))
    out = redact_pii(docs).collect()[0]["text"]
    assert "078-05-1120" not in out
    assert "4111" not in out and "3714" not in out
    assert out.count("[PII]") == 5


def test_redact_pii_false_positive_boundary(spark):
    """Strings that look numeric but are NOT in the documented match
    set must survive: dates (4-2-2), 9/13/14-digit ids, >16-digit
    hashes, semver, years."""
    keep = ("date 2024-01-02 order 12345678901234 id 123456789 "
            "hash 12345678901234567890 isbn 9781234567890 v2.14.3")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": [keep],
    }))
    out = redact_pii(docs).collect()[0]["text"]
    assert out == keep
    assert "[PII]" not in out


def test_repetition_ratio_values(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "a b c a b c a b c",   # 7 shingles, 3 distinct -> 4/7
            "all tokens unique in this sentence",
            "x y",                 # shorter than n -> 0 over 0
        ],
    }))
    got = {
        r["doc_id"]: (r["n_shingles"], round(r["rep_ratio"], 6))
        for r in repetition_ratio(docs, n=3).collect()
    }
    assert got[0] == (7, round(1 - 3 / 7, 6))
    assert got[1] == (4, 0.0)
    assert got[2] == (0, 0.0)


@pytest.mark.parametrize("seed", range(3))
def test_repetition_ratio_matches_reference(spark, seed):
    """Property check: the JVM expression equals a plain-Python
    reference over random token streams (incl. empty/short docs)."""
    import random

    rng = random.Random(seed)
    texts = []
    for _ in range(30):
        n_tok = rng.randint(0, 12)
        texts.append(" ".join(
            rng.choice("a b c d".split()) for _ in range(n_tok)
        ))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
    }))
    got = {
        r["doc_id"]: (r["n_shingles"], round(r["rep_ratio"], 9))
        for r in repetition_ratio(docs, n=3).collect()
    }
    for i, t in enumerate(texts):
        sp = t.split(" ")
        sh = [" ".join(sp[j:j + 3]) for j in range(len(sp) - 2)] \
            if len(sp) >= 3 else []
        want = (len(sh),
                round(1 - len(set(sh)) / len(sh), 9) if sh else 0.0)
        assert got[i] == want, (i, t)


def test_cleaning_stays_jvm(spark, train):
    """No Python UDFs in any cleaning plan (hot-path rule)."""
    evals = train.limit(1)
    for df in (
        redact_pii(train),
        repetition_ratio(train),
        decontaminate(train, evals, n=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
