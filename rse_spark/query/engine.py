"""BM25 query execution over the compressed index.

GSE's query path (reference crawler/src/api/main.go:48-119) was:
tokenize -> one SQL join for candidates (OR semantics, main.go:131-159)
-> N+1 per-candidate queries -> qtf*tf dot-product score (no idf, no
length norm, main.go:85-95) -> full sort, no limit (main.go:113-118).

This engine keeps the same surface (multi-term query -> ranked docs)
but executes Spark-first with proper BM25 (k1=1.2, b=0.75 per
BASELINE.json:6):

1. tokenize the query driver-side with the SAME analyzer as the index;
2. filter the postings table on term IN (...) AND bucket IN (...) —
   both predicates push down to parquet (partition pruning on bucket,
   row-group min/max + dictionary on term);
3. decode only the matched posting lists (Arrow UDF) -> explode to
   (term, doc_id, tf, dl) — doc_len rides inside the posting payload so
   scoring needs NO doc_stats join;
4. BM25 as pure column expressions (whole-stage codegen);
5. groupBy(doc_id) -> sum score [+ AND semantics via term-count];
6. orderBy(score desc, doc_id asc).limit(k) — Spark plans
   TakeOrderedAndProject: per-partition heaps + driver merge, never a
   full sort (GSE sorted everything, main.go:113-116).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rse_spark.index.codec import B, K1, decode_postings
from rse_spark.tokenizer import tokenize

DECODED_SCHEMA = "term string, doc_id long, tf long, dl long"


def idf(df: int, n_docs: int) -> float:
    """BM25+ idf: ln((N - df + 0.5)/(df + 0.5) + 1) — always positive."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def query_terms(qtext: str, analyzer: str = "code") -> dict[str, int]:
    """Query text -> {term: qtf}. GSE's extractKeywords analogue
    (api/main.go:121-129) using the shared tokenizer."""
    return dict(Counter(tokenize(qtext, analyzer)))


def decode_matched(postings: DataFrame) -> DataFrame:
    """Decode (already term-filtered) posting lists into flat rows."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for term, payload in zip(pdf["term"], pdf["payload"]):
                doc_ids, tfs, dls = decode_postings(bytes(payload))
                out.append(
                    pd.DataFrame(
                        {"term": term, "doc_id": doc_ids, "tf": tfs, "dl": dls}
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"term": [], "doc_id": [], "tf": [], "dl": []}
            )

    return postings.select("term", "payload").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


def bm25_score_col(avgdl: float, k1: float = K1, b: float = B):
    """BM25 per-posting score as a JVM column expression.

    Expects columns: tf, dl, idf, qtf."""
    tf = F.col("tf").cast("double")
    norm = tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
    )
    return F.col("qtf") * F.col("idf") * norm


def lookup_term_info(
    terms: list[str], term_stats: DataFrame
) -> dict[str, tuple[int, int]]:
    """term -> (df, bucket) from the term dictionary: ONE tiny collect —
    the analogue of GSE's keywords_word_idx B-tree probe (init_db.sql:30)."""
    cols = ["term", "df"] + (
        ["bucket"] if "bucket" in term_stats.columns else []
    )
    rows = term_stats.filter(F.col("term").isin(terms)).select(*cols).collect()
    return {
        r["term"]: (int(r["df"]), int(r["bucket"]) if "bucket" in cols else -1)
        for r in rows
    }


def _match_postings(
    postings: DataFrame, terms: list[str], term_info: dict | None
) -> DataFrame:
    """Filter the postings table: term IN (...) always; bucket IN (...)
    additionally when the dictionary gave us buckets — on bucket-
    partitioned storage that's directory-level partition pruning."""
    matched = postings.filter(F.col("term").isin(terms))
    if (
        term_info
        and "bucket" in postings.columns
        and all(b >= 0 for _, b in term_info.values())
    ):
        buckets = sorted({b for _, b in term_info.values()})
        matched = matched.filter(F.col("bucket").isin(buckets))
    return matched


def search(
    spark: SparkSession,
    postings: DataFrame,
    qtext: str,
    *,
    n_docs: int,
    avgdl: float,
    term_stats: DataFrame | None = None,
    term_info: dict[str, tuple[int, int]] | None = None,
    k: int = 10,
    mode: str = "or",
    analyzer: str = "code",
) -> DataFrame:
    """Top-k BM25 search. Returns (doc_id, score, n_terms_matched).

    ``mode='or'`` reproduces GSE's disjunctive candidate semantics
    (DISTINCT over ANY-term matches, api/main.go:138-144); ``'and'``
    keeps only docs matching every distinct query term (posting-list
    intersection via term-count — no pairwise intersect op needed).

    ``term_info`` (term -> (df, bucket)) skips the dictionary lookup
    job entirely (preloaded/cached driver-side dictionary): the whole
    query is then ONE Spark job.
    """
    qtf = query_terms(qtext, analyzer)
    if not qtf:
        return spark.createDataFrame(
            [], "doc_id long, score double, n_terms_matched int"
        )
    terms = sorted(qtf)

    if term_info is None and term_stats is not None:
        term_info = lookup_term_info(terms, term_stats)
    matched = _match_postings(postings, terms, term_info)
    if term_info is not None:
        dfs = {t: df for t, (df, _) in term_info.items()}
    else:
        df_rows = (
            matched.groupBy("term").agg(F.sum("df_seg").alias("df")).collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in df_rows}

    weights = pd.DataFrame(
        {
            "term": terms,
            "qtf": [float(qtf[t]) for t in terms],
            "idf": [idf(dfs.get(t, 0), n_docs) for t in terms],
        }
    )
    w_df = F.broadcast(spark.createDataFrame(weights))

    flat = decode_matched(matched)
    scored = flat.join(w_df, "term").withColumn(
        "contrib", bm25_score_col(avgdl)
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count("*").cast("int").alias("n_terms_matched"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_terms_matched") == len(terms))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_many(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    *,
    n_docs: int,
    avgdl: float,
    term_stats: DataFrame | None = None,
    term_info: dict[str, tuple[int, int]] | None = None,
    k: int = 10,
    mode: str = "or",
    analyzer: str = "code",
) -> DataFrame:
    """Batch top-k for a whole query set in ONE Spark job.

    Sequential per-query jobs pay Spark's fixed scheduling + Python
    worker cost per query; a serving cluster amortizes it by joining the
    posting rows against a broadcast (query_id, term, qtf, idf) table
    and ranking per query with a window. Returns
    (query_id, rank, doc_id, score, n_terms_matched).
    """
    from pyspark.sql import Window

    per_q: dict[int, dict[str, int]] = {
        qid: query_terms(text, analyzer) for qid, text in queries
    }
    all_terms = sorted({t for qt in per_q.values() for t in qt})
    if not all_terms:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, doc_id long, score double,"
            " n_terms_matched int",
        )
    if term_info is None and term_stats is not None:
        term_info = lookup_term_info(all_terms, term_stats)
    matched = _match_postings(postings, all_terms, term_info)
    if term_info is not None:
        dfs = {t: df for t, (df, _) in term_info.items()}
    else:
        dfs = {
            r["term"]: int(r["df"])
            for r in matched.groupBy("term")
            .agg(F.sum("df_seg").alias("df"))
            .collect()
        }

    rows = [
        {
            "query_id": qid,
            "term": t,
            "qtf": float(q),
            "idf": idf(dfs.get(t, 0), n_docs),
            "n_q_terms": len(qt),
        }
        for qid, qt in per_q.items()
        for t, q in qt.items()
    ]
    w_df = F.broadcast(spark.createDataFrame(pd.DataFrame(rows)))

    flat = decode_matched(matched)
    scored = flat.join(w_df, "term").withColumn(
        "contrib", bm25_score_col(avgdl)
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count("*").cast("int").alias("n_terms_matched"),
        F.first("n_q_terms").alias("n_q_terms"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_terms_matched") == F.col("n_q_terms"))
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "n_terms_matched")
    )


def search_bundle(spark: SparkSession, bundle, qtext: str, **kw) -> DataFrame:
    """Convenience: search over an in-memory IndexBundle."""
    return search(
        spark,
        bundle.postings,
        qtext,
        n_docs=bundle.n_docs,
        avgdl=bundle.avgdl,
        term_stats=bundle.term_stats,
        **kw,
    )
