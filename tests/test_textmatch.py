"""Phrase / prefix / facet query surfaces (query/textmatch.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.query.textmatch import (
    expand_prefix,
    facet_counts,
    phrase_match,
)


@pytest.fixture(scope="module")
def pdocs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "merge sort beats bubble sort",
            "sort merge join shuffles both sides",
            "merge sort merge sort merge",      # overlapping occurrences
            "merge",                             # shorter than the phrase
            "no match here at all",
        ],
        "lang": ["en", "en", "de", "de", "en"],
    }))


def test_phrase_match_counts(spark, pdocs):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(pdocs, "merge sort").collect()
    }
    # doc 2: "merge sort merge sort merge" has 2 adjacent occurrences
    assert got == {0: 1, 2: 2}
    # order matters: "sort merge" is a different phrase
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(pdocs, "sort merge").collect()
    }
    assert got2 == {1: 1, 2: 2}


def test_phrase_match_candidate_pruning(spark, pdocs):
    cands = spark.createDataFrame(pd.DataFrame({"doc_id": [2, 4]}))
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(pdocs, "merge sort",
                              candidates=cands).collect()
    }
    assert got == {2: 2}  # doc 0 matches but was not a candidate


def test_phrase_single_token_and_empty(spark, pdocs):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(pdocs, "merge").collect()
    }
    assert got == {0: 1, 1: 1, 2: 3, 3: 1}
    with pytest.raises(ValueError):
        phrase_match(pdocs, "")


def test_phrase_match_metachar_tokens(spark, pdocs):
    """Phrase tokens are bound as literals, never parsed as SQL: quotes,
    backslashes and expression metacharacters match verbatim (this is
    the path a user-facing search box feeds)."""
    tricky = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [
            "don't panic it's fine",
            r"c:\windows\system32 path",
            "a || b , element_at(sp, x) -- y",
        ],
    }))
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(tricky, "don't panic").collect()
    }
    assert got == {10: 1}
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(tricky, r"c:\windows\system32 path").collect()
    }
    assert got2 == {11: 1}
    got3 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(tricky, "|| b , element_at(sp,").collect()
    }
    assert got3 == {12: 1}
    # a metachar phrase that appears nowhere matches nothing (and does
    # not blow up the parser)
    assert phrase_match(tricky, "'; drop table docs --").count() == 0


def test_phrase_verify_stays_jvm(spark, pdocs):
    plan = phrase_match(pdocs, "merge sort")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_expand_prefix_and_index_parity(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = toks.select("term").distinct()
    terms = expand_prefix(vocab, "s")
    assert terms == sorted(terms)
    assert all(t.startswith("s") for t in terms)
    # cap respected
    assert len(expand_prefix(vocab, "", max_terms=3)) == 3


def test_facet_counts(spark, pdocs):
    cands = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 2]}))
    got = {
        r["lang"]: r["n_docs"]
        for r in facet_counts(cands, pdocs, ["lang"]).collect()
    }
    assert got == {"en": 2, "de": 1}


def test_expand_regex_declarative(spark):
    """Declarative regex expansion (rlike, full-match anchored) agrees
    with the serving tier's Python-re expansion on the same vocab."""
    import re

    from rse_spark.query.textmatch import expand_regex

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    pattern = "(s|t)[a-z]+"
    terms = expand_regex(vocab, pattern)
    assert terms == sorted(terms) and terms
    rx = re.compile(pattern)
    assert all(rx.fullmatch(t) for t in terms)
    # full-match semantics: a term equal to a strict superstring of a
    # match must not appear unless it itself full-matches
    all_terms = [r["term"] for r in vocab.collect()]
    expect = sorted(t for t in all_terms if rx.fullmatch(t))[:64]
    assert terms == expect
    assert len(expand_regex(vocab, ".*", max_terms=3)) == 3
