"""Tokenization — the canonical analyzer shared by index and query sides.

The reference (GSE) tokenizes only on the query side: whitespace split,
lowercase, Porter stem (crawler/src/api/main.go:121-129, using
reiver/go-porterstemmer). Its indexer never tokenized anything (the
``keywords`` table stays empty — see SURVEY.md caveat). This module
implements the *intended* semantics once, used identically on both
sides, extended to be code-aware per the driver contract
(BASELINE.json:6): split on camelCase / snake_case / letter-digit
boundaries, lowercase, Porter stem.

Analyzers
---------
``code``    camel/snake/digit-aware split + lowercase + Porter stem.
``code_nostem``  same split, no stemming (pure JVM expressions — zero
            Python in the hot path; stems can then be applied via a
            distinct-term dictionary join, see index/build.py).
``simple``  lowercase + whitespace split (SQL-oracle-parity analyzer —
            exactly expressible in DuckDB for the driver's correctness
            harness).

Python appears only in Arrow-batched pandas UDFs; stem results are
memoized (token frequencies are Zipf-ish so the hit rate is high).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Porter stemmer — classic algorithm (Porter, 1980), public domain spec.
# Matches the behavior GSE relied on via reiver/go-porterstemmer
# (api/go.mod:8): running->run, parse->pars, response->respons.
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _form(stem: str) -> str:
    out: list[str] = []
    for i in range(len(stem)):
        c = "c" if _is_cons(stem, i) else "v"
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def _measure(stem: str) -> int:
    return _form(stem).count("vc")


def _has_vowel(stem: str) -> bool:
    return "v" in _form(stem)


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase word with the classic Porter algorithm."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# Memo cache for stems — token streams are Zipf-distributed so this is hot.
_STEM_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _STEM_CACHE.get(word)
    if s is None:
        s = porter_stem(word)
        _STEM_CACHE[word] = s
    return s


# ---------------------------------------------------------------------------
# Splitting
# ---------------------------------------------------------------------------

# Code-aware token regex: camelCase boundaries, acronym runs, digit runs.
# "parseHTTPResponse2xml" -> [parse, HTTP, Response, 2, xml];
# underscores / punctuation are separators for free.
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z]+|[A-Z]+|[0-9]+")
_WS_RE = re.compile(r"\s+")

# Word-level memoization for the `code` analyzer: text is first cut
# into maximal alphanumeric runs ("words"), and each word's full
# split+lower+stem result is cached. _CAMEL_RE can never match across
# a non-alphanumeric character, so per-word findall concatenated in
# word order is EXACTLY findall over the whole text (equivalence
# asserted in tests); identifiers in code are Zipf-distributed, so the
# hit rate is high and the regex + stem run O(|word vocab|) times
# instead of O(tokens) — measured 1.9x on the sf0.1 code corpus.
_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_WORD_CACHE: dict[str, tuple[str, ...]] = {}
_WORD_CACHE_MAX = 1 << 20  # safety bound per worker process


def _word_tokens(word: str) -> tuple[str, ...]:
    ts = _WORD_CACHE.get(word)
    if ts is None:
        ts = tuple(stem_cached(m.lower()) for m in _CAMEL_RE.findall(word))
        if len(_WORD_CACHE) < _WORD_CACHE_MAX:
            _WORD_CACHE[word] = ts
    return ts


def split_code(text: str) -> list[str]:
    """Code-aware split: identifiers broken at camel/snake/digit seams."""
    return [t.lower() for t in _CAMEL_RE.findall(text)]


def split_simple(text: str) -> list[str]:
    """GSE-parity split: whitespace fields, lowercased (api/main.go:123-124)."""
    return [t for t in _WS_RE.split(text.lower()) if t]


def tokenize(text: str, analyzer: str = "code") -> list[str]:
    """The canonical tokenizer. MUST be identical on index + query sides."""
    if analyzer == "code":
        out: list[str] = []
        for w in _WORD_RE.findall(text):
            out.extend(_word_tokens(w))
        return out
    if analyzer == "code_nostem":
        return split_code(text)
    if analyzer == "simple":
        return split_simple(text)
    raise ValueError(f"unknown analyzer: {analyzer}")


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def tokens_udf(analyzer: str = "code"):
    """Arrow-vectorized pandas UDF: content -> array<string> of terms."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(lambda x: tokenize(x, analyzer) if x is not None else [])

    return _tok


def tf_arrays_udf(analyzer: str = "code", with_positions: bool = False):
    """Arrow UDF: content -> struct(terms: array, tfs: array, doc_len
    [, poss: array<array<int>>]).

    Term frequencies are counted PER DOCUMENT inside the UDF (a natural
    map-side combiner): the downstream (doc_id, term, tf) rows come from
    a shuffle-free explode of the paired arrays, instead of exploding
    10-100x more raw token rows and paying a (doc_id, token) groupBy
    shuffle. At 100 TB this removes the largest shuffle of the build.
    Paired arrays (not a map column) — Arrow/parquet encode them ~35%
    faster and dictionary-compress the term array.

    ``with_positions=True`` additionally emits, aligned with ``terms``,
    each term's token positions in the analyzed stream (Lucene
    semantics; ``tfs[i] == len(poss[i])`` by construction). This is the
    single-scan feed for the positional sidecar (index/positions.py):
    the corpus is tokenized exactly ONCE for postings AND positions —
    the standalone sidecar build used to re-tokenize everything, which
    at 100 TB doubles the most expensive phase of the pipeline."""
    fields = [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("doc_len", T.IntegerType()),
    ]
    if with_positions:
        fields.append(
            T.StructField("poss", T.ArrayType(T.ArrayType(T.IntegerType())))
        )
    out_type = T.StructType(fields)

    @F.pandas_udf(out_type)
    def _tf(s: pd.Series) -> pd.DataFrame:
        from collections import Counter

        terms: list[list[str]] = []
        tfs: list[list[int]] = []
        lens: list[int] = []
        poss: list[list[list[int]]] = []
        if with_positions and analyzer == "code":
            # fused single pass: word-cached split+stem feeds the
            # position grouping directly — no intermediate token list
            # (saves ~25% of the UDF over tokenize-then-group; r6
            # docs_per_sec regression item)
            for x in s:
                by: dict[str, list[int]] = {}
                i = 0
                if x is not None:
                    for w in _WORD_RE.findall(x):
                        for t in _word_tokens(w):
                            by.setdefault(t, []).append(i)
                            i += 1
                terms.append(list(by.keys()))
                tfs.append([len(v) for v in by.values()])
                poss.append(list(by.values()))
                lens.append(i)
        else:
            for x in s:
                toks = tokenize(x, analyzer) if x is not None else []
                if with_positions:
                    by = {}
                    for i, t in enumerate(toks):
                        by.setdefault(t, []).append(i)
                    terms.append(list(by.keys()))
                    tfs.append([len(v) for v in by.values()])
                    poss.append(list(by.values()))
                else:
                    c = Counter(toks)
                    terms.append(list(c.keys()))
                    tfs.append(list(c.values()))
                lens.append(len(toks))
        out = {"terms": terms, "tfs": tfs, "doc_len": lens}
        if with_positions:
            out["poss"] = poss
        return pd.DataFrame(out)

    return _tf


@F.pandas_udf(T.StringType())
def stem_term_udf(s: pd.Series) -> pd.Series:
    """Vectorized Porter stem of already-lowercased terms.

    Used to stem a *distinct-term dictionary* (|vocab| rows), so the
    Python cost is O(vocab) not O(tokens) — the scale-path alternative
    to stemming inside the tokenizer UDF.
    """
    return s.map(stem_cached)


def tokens_col(col: Column | str, analyzer: str = "simple") -> Column:
    """Pure-JVM tokenization expression (whole-stage-codegen friendly).

    ``simple``      -> split(lower(x), '\\s+')     (GSE query tokenizer, no stem)
    ``code_nostem`` -> camel/snake/digit-aware split, no stem. Combine
                       with :func:`stem_term_udf` over the distinct-term
                       dictionary for fully-JVM hot-path + O(vocab) Python.

    The regex pipeline is test-proven equivalent to :func:`split_code`.
    """
    c = F.col(col) if isinstance(col, str) else col
    if analyzer == "simple":
        toks = F.split(F.lower(c), r"\s+")
    elif analyzer == "code_nostem":
        x = F.regexp_replace(c, r"([A-Z]+)([A-Z][a-z0-9])", r"$1 $2")
        x = F.regexp_replace(x, r"([a-z0-9])([A-Z])", r"$1 $2")
        x = F.regexp_replace(x, r"([A-Za-z])([0-9])", r"$1 $2")
        x = F.regexp_replace(x, r"([0-9])([A-Za-z])", r"$1 $2")
        toks = F.split(F.lower(x), r"[^a-z0-9]+")
    else:
        raise ValueError(f"tokens_col supports simple/code_nostem, got {analyzer}")
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_many(texts: Iterable[str], analyzer: str = "code") -> list[list[str]]:
    """Driver-side helper (query parsing, oracles)."""
    return [tokenize(t, analyzer) for t in texts]
