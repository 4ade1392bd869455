"""Reference extraction from content -> link-graph edges (E3-E5 parity).

GSE extracts ``<a href>`` targets from fetched HTML bodies
(reference crawler/src/crawler/crawler/crawler.go:294-324), resolves
relative URLs against the page (crawler.go:326-332) and validates the
result (crawler.go:334-349). Round 1's link-graph operators consumed
edges that were GIVEN; this module builds them FROM the corpus:

    extract   candidate reference tokens out of content (JVM regex —
              regexp_extract_all, whole-stage codegen)
    resolve   candidates joined against a document-key dictionary (the
              URL-normalization analogue; one hash join)
    validate  drop self-references and unresolvable candidates (the
              join is inner, so unresolvable candidates vanish; the
              src != dst filter kills self-links)

Scale: extraction is a map-side regex; resolution is a join on the
candidate token — the dictionary side is |docs| rows (broadcastable at
moderate scale, hash join beyond); output edges feed backlink_counts /
gse_link_rank / pagerank (linkrank.py) unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_REF_PATTERN = r"[a-z][a-z0-9_.-]{2,}"


def extract_refs(
    docs: DataFrame,
    pattern: str = DEFAULT_REF_PATTERN,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(src, ref): every candidate reference token per document.

    ``pattern`` is the reference shape — import paths for code, handles
    for social text, the href analogue here. JVM regex, no Python."""
    return docs.select(
        F.col(id_col).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(content_col), F.lit(pattern), F.lit(0))
        ).alias("ref"),
    )


def title_dictionary(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(ref, dst): resolvable targets keyed by their title token (the
    first content token). When several docs claim the same title the
    smallest doc_id wins — deterministic, like URL canonicalization
    picking one canonical page."""
    return (
        docs.select(
            F.col(id_col).alias("dst"),
            F.split(F.col(content_col), " ").getItem(0).alias("ref"),
        )
        .groupBy("ref")
        .agg(F.min("dst").alias("dst"))
    )


def doc_link_edges(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (src, dst) edges: doc src mentions doc dst's title token.

    The full extract -> resolve -> validate pipeline over the corpus
    itself; output feeds linkrank.backlink_counts / pagerank directly."""
    refs = docs.select(
        F.col(id_col).alias("src"),
        F.explode(F.split(F.col(content_col), " ")).alias("ref"),
    ).distinct()
    dictionary = title_dictionary(docs, content_col, id_col)
    return (
        refs.join(dictionary, "ref")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
