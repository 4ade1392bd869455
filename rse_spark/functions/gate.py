"""Ingestion gate: declarative allow/deny predicates (S6 parity).

GSE consults robots.txt before fetching (reference
crawler/src/crawler/crawler/crawler.go:351-383) — an allow/deny gate
between discovery and processing. The corpus-pipeline analogue is a
named filter operator whose predicates are plain Catalyst expressions,
so they PUSH DOWN to the parquet scan (PushedFilters) instead of
filtering after a full read — at 100 TB the gate is the difference
between scanning an allowlisted slice and scanning everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_gate(
    docs: DataFrame,
    allow_langs: list[str] | None = None,
    deny_sources: list[str] | None = None,
    min_chars: int | None = None,
    content_col: str = "text",
) -> DataFrame:
    """Keep documents passing every configured predicate.

    All predicates are scan-pushable column expressions (lang/source
    equality lists, length threshold on the stored n_chars when
    present, else computed)."""
    out = docs
    if allow_langs:
        out = out.filter(F.col("lang").isin(list(allow_langs)))
    if deny_sources:
        out = out.filter(~F.col("source").isin(list(deny_sources)))
    if min_chars is not None:
        length = (
            F.col("n_chars") if "n_chars" in docs.columns
            else F.length(content_col)
        )
        out = out.filter(length >= min_chars)
    return out
