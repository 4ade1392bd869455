"""Corpus-cleaning operators a training-data pipeline runs at scale:
eval-set decontamination, PII redaction, repetition scoring.

All three are standard LLM-data practice (decontamination and
repetition filtering follow the published Gopher/MassiveText rules,
Rae et al. 2021, §A1.1; PII scrubbing is table stakes) and all three
stay entirely inside JVM expressions — no Python in the hot path.

Scale shapes:

* decontamination: shingle both sides, hash-join on the shingle, one
  distinct semi-join — never a cross join. The eval side is tiny by
  construction (benchmarks), so Spark broadcasts it; the corpus side
  streams. Work ~ corpus tokens.
* redaction: chained ``regexp_replace`` inside whole-stage codegen —
  one projection, no shuffle.
* repetition ratio: per-row array expressions (no explode, no
  shuffle); the duplicate-n-gram fraction is computed from the doc's
  own shingle multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rse_spark.functions.dedup import word_shingles

# patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB), so the oracle can replay them verbatim: no lookarounds, no
# backreferences. Checksum guards (Luhn for cards, SSN area rules) are
# not regex-expressible, so the bounded-FP variants are used and the
# false-positive surface is DOCUMENTED per pattern:
#   credit_card — 4x4 digit groups (space/dash separated) or a bare
#     15-16 digit run. FP: any isolated 15-16 digit integer (random
#     ids of exactly that width) redacts; 13-14 digit numbers,
#     timestamps (<=14 digits) and longer hashes do not match.
#   ssn — dashed 3-2-4 form only. Bare 9-digit runs are deliberately
#     NOT matched (too many legitimate ids); FP: any dashed 3-2-4
#     number (not a date: dates are 4-2-2).
PII_PATTERNS: dict[str, str] = {
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{15,16}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(docs: DataFrame, content_col: str = "text",
               patterns: dict[str, str] | None = None,
               token: str = "[PII]") -> DataFrame:
    """Replace every PII match with ``token`` — a chained
    ``regexp_replace`` projection (whole-stage codegen, no shuffle).
    Patterns apply in sorted-name order so engine and oracle agree."""
    pats = patterns or PII_PATTERNS
    col = F.col(content_col)
    for name in sorted(pats):
        col = F.regexp_replace(col, pats[name], token)
    return docs.withColumn(content_col, col)


def repetition_ratio(docs: DataFrame, n: int = 3,
                     content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, n_shingles, rep_ratio): fraction of duplicate word
    ``n``-grams per document — the Gopher-style repetition signal
    (docs repeating themselves are boilerplate/spam candidates).
    rep_ratio = 1 - distinct/total over the doc's own n-grams; docs
    shorter than ``n`` tokens score 0.0 over 0 shingles. Pure per-row
    array math — no explode, no shuffle."""
    sp = F.split(F.col(content_col), " ")
    parts = [f"sp[i{'+' + str(j) if j else ''}]" for j in range(n)]
    shingles = F.when(
        F.size("sp") >= n,
        F.expr(
            f"transform(sequence(0, size(sp)-{n}), i -> "
            f"concat_ws(' ', {', '.join(parts)}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.withColumn("sp", sp)
        .withColumn("_sh", shingles)
        .select(
            id_col,
            F.size("_sh").cast("long").alias("n_shingles"),
            F.when(
                F.size("_sh") > 0,
                1.0 - F.size(F.array_distinct("_sh")) / F.size("_sh"),
            ).otherwise(F.lit(0.0)).alias("rep_ratio"),
        )
    )


def contaminated_ids(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                     content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """doc ids sharing at least one word ``n``-gram with the eval set
    (the overlap rule used to decontaminate training corpora against
    benchmarks). Shingle both sides -> hash semi-join on the shingle;
    the eval side is benchmark-sized and broadcasts."""
    train_sh = word_shingles(docs, n=n, content_col=content_col,
                             id_col=id_col)
    if id_col not in eval_docs.columns:
        # only the eval SHINGLES matter; a constant id satisfies the
        # shingler's shape without requiring the eval set to be keyed
        eval_docs = eval_docs.withColumn(id_col, F.lit(0))
    eval_sh = word_shingles(eval_docs, n=n, content_col=content_col,
                            id_col=id_col).select("shingle").distinct()
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select(id_col).distinct()
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  content_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop every training doc that shares an ``n``-gram with the eval
    set — one anti-join against :func:`contaminated_ids`."""
    bad = contaminated_ids(docs, eval_docs, n=n,
                           content_col=content_col, id_col=id_col)
    return docs.join(bad, id_col, "left_anti")
