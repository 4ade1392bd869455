"""Phrase, prefix, and facet query surfaces over the corpus/index.

GSE's API matches single keywords only (reference
crawler/src/api/main.go:121-159 tokenizes the query and ORs the terms);
a fulltext engine needs the next tier of query semantics:

* phrase match  — exact token adjacency ("merge sort" as a unit, not
  two independent terms);
* prefix match  — dictionary expansion (``sor*`` -> sort, sorted, ...)
  feeding the standard BM25 scorer;
* facet counts  — per-dimension candidate histograms (the result-page
  sidebar).

Scale shapes:

* phrase: at index scale candidates come FIRST from the conjunctive
  postings intersection (wand.intersect_and_lists / bm25 AND — every
  phrase doc contains every phrase term), and only candidates are
  re-verified; the verify itself is one JVM expression over token
  positions (sequence + filter inside whole-stage codegen, no UDF, no
  shuffle beyond the semi-join).
* prefix: expansion runs on the TERM DICTIONARY (|vocab| rows, not the
  corpus) — a metadata lookup, exactly how Lucene walks its term dict;
  the expanded term set then rides the normal scorer.
* facets: one hash aggregate over the candidate set.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def phrase_match(docs: DataFrame, phrase: str, content_col: str = "text",
                 id_col: str = "doc_id",
                 candidates: DataFrame | None = None) -> DataFrame:
    """(id, n_occurrences) for documents containing ``phrase`` as
    adjacent tokens (whitespace analyzer). ``candidates`` (a DataFrame
    of ids, e.g. from the postings AND-intersection) bounds the verify
    scan — at web scale ALWAYS pass it; the phrase check then touches
    only docs already known to contain every term."""
    words = phrase.split()
    n = len(words)
    if n == 0:
        raise ValueError("empty phrase")
    if candidates is not None:
        docs = docs.join(candidates.select(id_col), id_col, "left_semi")

    # Adjacency predicate built entirely in the DataFrame DSL: phrase
    # tokens enter the plan as bound literals (F.lit), never as
    # interpolated SQL text — a token containing quotes, backslashes or
    # expression metacharacters is matched verbatim, not parsed.
    sp = F.col("sp")

    def _match_at(i: Column) -> Column:
        return reduce(
            Column.__and__,
            (
                F.element_at(sp, (i + F.lit(j)).cast("int")) == F.lit(w)
                for j, w in enumerate(words)
            ),
        )

    starts = F.sequence(F.lit(1), F.size(sp) - F.lit(n - 1))
    occurrences = F.when(
        F.size(sp) >= F.lit(n), F.size(F.filter(starts, _match_at))
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("sp", F.split(content_col, " "))
        .withColumn("n_occurrences", occurrences.cast("long"))
        .filter(F.col("n_occurrences") > 0)
        .select(id_col, "n_occurrences")
    )


def phrase_match_positions(docs: DataFrame, phrase: str,
                           content_col: str = "text",
                           id_col: str = "doc_id",
                           candidates: DataFrame | None = None
                           ) -> DataFrame:
    """(id, n_occurrences) via POSITIONAL JOIN — the relational form
    of a positional-index phrase query (index/positions.py is the
    serving-tier artifact of the same idea): posexplode the token
    stream once, filter each phrase word to its (id, position) set,
    then equi-join on (id, position - offset). Occurrence count =
    surviving rows of the n-way join.

    Same semantics and results as :func:`phrase_match` (equivalence-
    tested); different scale shape — work is ~sum of the phrase
    words' posting sizes (each join input is a filtered token set,
    hash-joined on narrow keys), instead of a verify scan over every
    candidate's full content. The right plan when the phrase words
    are selective and content rows are wide."""
    words = phrase.split()
    if not words:
        raise ValueError("empty phrase")
    if candidates is not None:
        docs = docs.join(candidates.select(id_col), id_col, "left_semi")
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.col(content_col), " ")).alias(
            "pos", "tok"
        ),
    )
    acc = (
        toks.filter(F.col("tok") == F.lit(words[0]))
        .select(id_col, "pos")
    )
    for j, w in enumerate(words[1:], 1):
        nxt = toks.filter(F.col("tok") == F.lit(w)).select(
            id_col, (F.col("pos") - F.lit(j)).alias("pos")
        )
        acc = acc.join(nxt, [id_col, "pos"])
    return acc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_occurrences")
    )


def phrase_match_batch(docs: DataFrame, phrases: list[str],
                       content_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(phrase_id, id, n_occurrences) for a SET of phrases in ONE job —
    the cluster-serving shape for phrase workloads: a Spark job's fixed
    cost (~1 s in local mode) amortizes over the whole query set
    instead of being paid per phrase (round-5 VERDICT item 6).

    One posexplode of the token stream, hash-joined against the tiny
    broadcast (phrase_id, offset, term, plen) table; a start position
    ``pos - offset`` holds a full occurrence of a phrase when all
    ``plen`` of its offsets joined there (rows are unique per
    (phrase, doc, start, offset), so a plain count suffices). Work ~
    the sum of the phrase words' token frequencies — the positional-
    join bound — independent of the number of phrases sharing words
    (shared words are scanned once)."""
    if not phrases:
        raise ValueError("empty phrase set")
    spark = docs.sparkSession
    qrows = []
    for pid, ph in enumerate(phrases):
        words = ph.split()
        if not words:
            raise ValueError(f"empty phrase at position {pid}")
        for off, w in enumerate(words):
            qrows.append((pid, off, w, len(words)))
    qdf = spark.createDataFrame(
        qrows, "phrase_id int, off int, tok string, plen int"
    )
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.col(content_col), " ")).alias(
            "pos", "tok"
        ),
    )
    return phrase_batch_counts(toks, qdf, id_col)


def phrase_batch_counts(toks: DataFrame, qdf: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Shared chain-verification algebra of the batch phrase paths:
    ``toks`` is any (id, pos, tok) occurrence table — posexploded
    content (phrase_match_batch) or decoded positional-sidecar rows
    (index.positions.phrase_batch_index) — and ``qdf`` the broadcast
    (phrase_id, off, tok, plen) phrase table."""
    j = toks.join(F.broadcast(qdf), "tok").select(
        "phrase_id", id_col,
        (F.col("pos") - F.col("off")).alias("start"),
        "plen",
    )
    occ = j.groupBy("phrase_id", id_col, "start").agg(
        F.count("*").alias("_nm"), F.max("plen").alias("_plen")
    )
    return (
        occ.filter(F.col("_nm") == F.col("_plen"))
        .groupBy("phrase_id", id_col)
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )


def proximity_match(docs: DataFrame, first: str, second: str,
                    max_dist: int, content_col: str = "text",
                    id_col: str = "doc_id",
                    candidates: DataFrame | None = None,
                    ordered: bool = True) -> DataFrame:
    """(id, n_pairs) — ordered proximity: occurrences of ``first``
    followed by ``second`` within ``max_dist`` tokens (1 = adjacent,
    i.e. the 2-word phrase). n_pairs counts qualifying (pos_first,
    pos_second) pairs. The Lucene NEAR/slop primitive, expressed as a
    positional join with a range predicate: equi-join on the doc,
    range condition on the position gap — work ~ the two words'
    posting sizes (the serving twin is
    DirectSearcher.near_search_positions over the positional
    sidecar).

    ``ordered=False`` is Lucene SpanNearQuery's inOrder=false: the
    pair qualifies whichever word comes first (|gap| <= max_dist) —
    the same join with the range predicate on the absolute gap."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if candidates is not None:
        docs = docs.join(candidates.select(id_col), id_col, "left_semi")
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.col(content_col), " ")).alias(
            "pos", "tok"
        ),
    )
    a = toks.filter(F.col("tok") == F.lit(first)).select(
        id_col, F.col("pos").alias("_pa")
    )
    b = toks.filter(F.col("tok") == F.lit(second)).select(
        id_col, F.col("pos").alias("_pb")
    )
    gap = (
        (F.col("_pb") - F.col("_pa"))
        if ordered
        else F.abs(F.col("_pb") - F.col("_pa"))
    )
    return (
        a.join(b, id_col)
        .filter((gap >= 1) & (gap <= max_dist))
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def expand_prefix(term_dict: DataFrame, prefix: str,
                  max_terms: int = 64) -> list[str]:
    """Dictionary expansion: all indexed terms starting with ``prefix``
    (deterministic order, capped like Lucene's rewrite limit). Runs on
    the term-stats table — |vocab| rows, never the corpus."""
    rows = (
        term_dict.filter(F.col("term").startswith(prefix))
        .select("term").distinct().orderBy("term").limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def expand_regex(term_dict: DataFrame, pattern: str,
                 max_terms: int = 64) -> list[str]:
    """Dictionary expansion for a regex atom: all indexed terms the
    pattern FULLY matches (Lucene RegexpQuery semantics — ``rlike``
    anchored with ``^(?:…)$``), deterministic order, capped like the
    prefix rewrite limit. Runs on the term-stats table — |vocab| rows,
    never the corpus; the serving twin is
    ``DirectSearcher.expand_regex`` (which additionally range-
    restricts by the pattern's literal prefix)."""
    rows = (
        term_dict.filter(F.col("term").rlike(f"^(?:{pattern})$"))
        .select("term").distinct().orderBy("term").limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery pattern -> portable regex: ``*`` matches
    any run of characters, ``?`` exactly one; everything else is
    literal (escaped). The output uses only ``.`` / ``.*`` / escaped
    literals, so Python ``re``, Java ``rlike``, and DuckDB
    ``regexp_full_match`` agree on it — one translation shared by the
    declarative path, the serving tier, and the oracle. Raises
    ValueError for an empty or wildcard-free pattern (an exact term is
    a term query, not a wildcard query)."""
    import re as _re

    if not pattern:
        raise ValueError("empty wildcard pattern")
    if "*" not in pattern and "?" not in pattern:
        raise ValueError(
            "pattern has no wildcard; use a plain term query"
        )
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def expand_fuzzy(term_dict: DataFrame, term: str, max_edits: int = 2,
                 max_terms: int = 64) -> list[str]:
    """Dictionary expansion for a fuzzy atom: all indexed terms within
    ``max_edits`` classic Levenshtein edits of ``term`` (Lucene
    FuzzyQuery semantics, same distance ceiling of 2), capped
    closest-first — ``ORDER BY distance, term LIMIT n`` — so the cap
    keeps the best rewrites, deterministic across tiers. Runs on the
    term-stats table (|vocab| rows, never the corpus) with
    ``F.levenshtein`` JVM-side; the serving twin is
    ``DirectSearcher.expand_fuzzy`` (length-banded candidates + banded
    DP), the oracle shape is DuckDB ``levenshtein`` — all three are
    classic (no-transposition) edit distance."""
    if max_edits < 0 or max_edits > 2:
        raise ValueError(f"fuzzy distance {max_edits} out of range (0..2)")
    rows = (
        term_dict.select("term").distinct()
        .withColumn("_d", F.levenshtein(F.col("term"), F.lit(term)))
        .filter(F.col("_d") <= max_edits)
        .orderBy("_d", "term").limit(max_terms)
        .select("term").collect()
    )
    return [r["term"] for r in rows]


def facet_counts(candidates: DataFrame, docs: DataFrame,
                 facet_cols: list[str],
                 id_col: str = "doc_id") -> DataFrame:
    """Per-facet-value document counts over a candidate set — one
    semi-join + one hash aggregate."""
    joined = docs.join(candidates.select(id_col), id_col, "left_semi")
    return joined.groupBy(*facet_cols).agg(
        F.count("*").cast("long").alias("n_docs")
    )
