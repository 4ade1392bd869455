"""Tokenizer unit tests, incl. GSE-parity cases (FIXTURES.md §4).

GSE semantics mirrored: whitespace split + lowercase + Porter stem
(reference crawler/src/api/main.go:121-129); code-aware extensions per
BASELINE.json north_star.
"""

from __future__ import annotations

import pandas as pd
import pytest

from rse_spark.tokenizer import (
    porter_stem,
    split_code,
    split_simple,
    tokenize,
    tokens_col,
)


@pytest.mark.parametrize(
    "word,stem",
    [
        ("running", "run"),
        ("runs", "run"),
        ("run", "run"),
        ("parse", "pars"),
        ("response", "respons"),
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("rational", "ration"),
        ("hopping", "hop"),
        ("hoped", "hope"),
        ("filing", "file"),
        ("sensibility", "sensibl"),
        ("adjustment", "adjust"),
        ("controlling", "control"),
        ("probate", "probat"),
        ("cement", "cement"),
        ("roll", "roll"),
        ("sky", "sky"),
        ("go", "go"),
        ("agreed", "agre"),
        ("feed", "feed"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("generalization", "gener"),
    ],
)
def test_porter_cases(word, stem):
    assert porter_stem(word) == stem


def test_gse_parity_stem_family():
    # FIXTURES.md §4: "Running runs RUN" all stem to run
    assert tokenize("Running runs RUN", "code") == ["run", "run", "run"]


def test_code_split_camel_acronym():
    assert split_code("parseHTTPResponse") == ["parse", "http", "response"]
    assert tokenize("parseHTTPResponse", "code") == ["pars", "http", "respons"]


def test_code_split_snake():
    assert split_code("snake_case_name") == ["snake", "case", "name"]
    assert tokenize("snake_case_name", "code") == ["snake", "case", "name"]


def test_code_split_digits_and_pascal():
    assert split_code("Response2XML utf8Name") == [
        "response", "2", "xml", "utf", "8", "name",
    ]


def test_simple_split():
    assert split_simple("  The  Quick brown\tFox\n") == [
        "the", "quick", "brown", "fox",
    ]


def test_tokenize_query_index_identical():
    text = "BuildIndexer build_indexer buildIndexer"
    assert len(set(map(tuple, [tokenize(text, "code")]))) == 1
    toks = tokenize(text, "code")
    assert toks[0:2] == toks[2:4] == toks[4:6]


def test_jvm_split_equivalence(spark):
    """tokens_col('code_nostem') must equal split_code exactly."""
    texts = [
        "parseHTTPResponse2xml snake_case_name Response2XML",
        "def buildIndex(self, x): return x.fooBar_baz + 42",
        "func (c *Crawler) extractLinks(base *url.URL) []string {}",
        "UPPER lower miXeD    punct!!!:::;;; [a](b){c}",
        "",
        "___",
        "a1b2C3",
    ]
    pdf = pd.DataFrame({"content": texts})
    sdf = spark.createDataFrame(pdf)
    got = [
        r["toks"]
        for r in sdf.select(
            tokens_col("content", "code_nostem").alias("toks")
        ).collect()
    ]
    want = [split_code(t) for t in texts]
    assert got == want


def test_jvm_simple_equivalence(spark):
    texts = ["the quick Brown fox", "a  b", "x"]
    sdf = spark.createDataFrame(pd.DataFrame({"content": texts}))
    got = [
        r["toks"]
        for r in sdf.select(
            tokens_col("content", "simple").alias("toks")
        ).collect()
    ]
    assert got == [split_simple(t) for t in texts]
