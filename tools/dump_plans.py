"""Dump formatted physical plans for the engine's key paths -> PLANS.md.

The point: show (not claim) that filters push down to parquet
(PushedFilters), posting buckets partition-prune, the tiny query-term
table broadcasts, BM25 arithmetic stays inside WholeStageCodegen, and
top-k plans as TakeOrderedAndProject rather than a full sort.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cap_explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from rse_spark import harness
    from rse_spark.fixtures import corpus_path
    from rse_spark.index.storage import IndexStorage, build_resumable
    from rse_spark.query.engine import query_terms, search
    from rse_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plans", cores=8)
    sections: list[tuple[str, str]] = []

    # 1. BM25 search over the persisted index (bucket pruning + term pushdown)
    root = tempfile.mkdtemp(prefix="plans_idx_")
    corpus = spark.read.parquet(corpus_path(0.01))
    build_resumable(spark, corpus, root, analyzer="code")
    idx = IndexStorage(root).load(spark)
    idx.preload_terms()
    info = idx.term_info(sorted(query_terms("parseConfig merge_sort return")))
    plan = cap_explain(
        search(
            spark, idx.postings, "parseConfig merge_sort return",
            n_docs=idx.n_docs, avgdl=idx.avgdl, term_info=info, k=10,
        )
    )
    sections.append((
        "BM25 top-k over persisted postings",
        "Expect: PartitionFilters on bucket (directory pruning), "
        "PushedFilters on term, TakeOrderedAndProject(limit=10).\n\n" + plan,
    ))

    # 2. Candidate retrieval (driver harness) — pushdown + codegen
    sections.append((
        "bm25_topk harness query (single declarative DAG)",
        "Note: the BroadcastNestedLoopJoin Cross below is the intended "
        "broadcast of the ONE-ROW corpus-stats aggregate onto every "
        "scored row (a scalar join, not a data cartesian).\n\n"
        + cap_explain(harness.q_bm25_topk(spark, sf_dir)),
    ))

    # 3. Broadcast join
    sections.append((
        "order_customer_join (broadcast hint)",
        cap_explain(harness.q_order_customer_join(spark, sf_dir)),
    ))

    # 4. tpch_q1 — pushed filter + partial/final agg
    sections.append((
        "tpch_q1 (filter pushdown + two-phase agg)",
        cap_explain(harness.q_tpch_q1(spark, sf_dir)),
    ))

    # 5. filter gate — every predicate must reach the parquet scan
    sections.append((
        "filter_gate (scan-pushed allow/deny predicates)",
        "Expect: PushedFilters carrying lang/source/n_chars predicates.\n\n"
        + cap_explain(harness.q_filter_gate(spark, sf_dir)),
    ))

    # 6. as-of join — one shuffle on the key, window, no join explosion
    sections.append((
        "asof_attribution (union + single-key window point-in-time join)",
        "Expect: ONE Exchange hashpartitioning(user_id), Window, "
        "no BroadcastNestedLoop/Cartesian anywhere.\n\n"
        + cap_explain(harness.q_asof_attribution(spark, sf_dir)),
    ))

    # 7. range join — equi key + range predicate (never cartesian)
    sections.append((
        "range_join (hash join on key + range residual)",
        "Expect: SortMergeJoin/ShuffledHashJoin on user_id with the ts "
        "range as a join condition residual — no cartesian.\n\n"
        + cap_explain(harness.q_range_join(spark, sf_dir)),
    ))

    # 8. extract_refs — map-side regex + hash join on the candidate token
    sections.append((
        "extract_refs (extract -> resolve dictionary join)",
        cap_explain(harness.q_extract_refs(spark, sf_dir)),
    ))

    # 9. tfidf — the full-vocabulary df table must NOT carry a broadcast
    # hint (round-2 VERDICT item 4): AQE may still broadcast the SMALL
    # filtered-docs side at runtime, which is the correct direction
    sections.append((
        "tfidf_top_terms (no forced broadcast of the vocab df table)",
        "Expect: the term join planned as SortMergeJoin/ShuffledHashJoin "
        "(or AQE broadcasting the small FILTERED side); the only "
        "BroadcastExchange built eagerly is the 1-row n_docs aggregate.\n\n"
        + cap_explain(harness.q_tfidf_top_terms(spark, sf_dir)),
    ))

    # 10. positional join phrase — filtered token sets hash-joined on
    # narrow (doc, pos) keys; occurrence count as a hash aggregate
    sections.append((
        "phrase_pos_search (positional join, no content verify scan)",
        "Expect: each phrase word a filtered projection of the "
        "posexploded token stream, equi-joined on (doc_id, pos - "
        "offset) — hash joins on narrow keys, then one hash "
        "aggregate. No full-content adjacency scan.\n\n"
        + cap_explain(harness.q_phrase_pos_search(spark, sf_dir)),
    ))

    # 11. proximity — same join shape with a range predicate on the
    # position gap (never a cartesian product)
    sections.append((
        "proximity_search (positional join + range predicate)",
        "Expect: equi-join on doc_id with the gap range as a join "
        "filter/post-filter — never BroadcastNestedLoopJoin over the "
        "corpus.\n\n"
        + cap_explain(harness.q_proximity_search(spark, sf_dir)),
    ))

    # 12. batch phrase — ONE job for a phrase set: single posexplode,
    # broadcast of the tiny (phrase, offset, term) table, two hash
    # aggregates (per-start offset count, then per-doc occurrence count)
    sections.append((
        "phrase_batch (one job for a phrase set)",
        "Expect: one posexplode of the token stream, "
        "BroadcastHashJoin against the phrase table (a few rows), "
        "then partial+final hash aggregates. The job count is 1 for "
        "the whole set — the per-phrase fixed cost is gone.\n\n"
        + cap_explain(harness.q_phrase_batch(spark, sf_dir)),
    ))

    # 13. batch phrase over the positional SIDECAR — scan pruned to the
    # query terms' bucket partitions with the term filter pushed down;
    # no corpus access at all
    from rse_spark.index.positions import build_positions, phrase_batch_index

    build_positions(spark, corpus, root, analyzer="code",
                    content_col="content")
    sections.append((
        "phrase_batch_index (sidecar scan, bucket-pruned)",
        "Expect: parquet scan of positions/ with PartitionFilters on "
        "bucket and PushedFilters on term — only the query terms' "
        "lists are read and varint-decoded; then the same broadcast "
        "chain verification as phrase_batch.\n\n"
        + cap_explain(phrase_batch_index(
            spark, root, ["merge join", "the data"]
        )),
    ))

    # 14. metadata-filtered BM25 — the filter is a semi-join that must
    # not disturb the scoring aggregates (stats stay corpus-wide)
    sections.append((
        "meta_bm25 (metadata semi-join restriction)",
        "Expect: the BM25 plan unchanged, plus one LeftSemi join "
        "against the (doc_id) projection of the lang-filtered "
        "documents scan (filter pushed to that scan); AQE free to "
        "broadcast the filtered side.\n\n"
        + cap_explain(harness.q_meta_bm25(spark, sf_dir)),
    ))

    # 15. SynonymQuery — group-blended scoring: the tiny term->group
    # map and the per-group blended df must broadcast; the only big
    # shuffles are the tf/dl aggregations every BM25 variant shares
    sections.append((
        "synonym_bm25 (SynonymQuery group blending)",
        "Expect: BroadcastHashJoin of the token stream against the "
        "term->group VALUES relation and against the per-group "
        "blended-df aggregate (both a handful of rows); "
        "partial+final hash aggregates for group tf; "
        "TakeOrderedAndProject(10). No extra corpus scans beyond "
        "the shared tf/dl passes.\n\n"
        + cap_explain(harness.q_synonym_bm25(spark, sf_dir)),
    ))

    # 16. spell suggestion — vocab x probes: length band BEFORE the
    # Levenshtein, probes broadcast, final window over a tiny set
    sections.append((
        "spell_suggest (did-you-mean over the term dictionary)",
        "Expect: the distinct-term aggregate (|vocab| rows) "
        "BroadcastHashJoin'd with the 3-row probe table, the length "
        "band as a cheap filter ahead of the levenshtein() "
        "projection, and a per-word window over the few surviving "
        "candidates — never a corpus-sized shuffle.\n\n"
        + cap_explain(harness.q_spell_suggest(spark, sf_dir)),
    ))

    # 17. MoreLikeThis — the 10-term selection is a tiny broadcast
    # back into the standard BM25 chain
    sections.append((
        "mlt_bm25 (MoreLikeThis term selection + BM25)",
        "Expect: the source doc's rows filtered out of the tf "
        "aggregate, joined with the corpus-wide df aggregate, "
        "top-10 by tf x idf via TakeOrderedAndProject, then "
        "broadcast back into the same scoring plan bm25_topk uses.\n\n"
        + cap_explain(harness.q_mlt_bm25(spark, sf_dir)),
    ))

    # 18. Window rescoring — the expensive phrase join is bounded by
    # the 50-row window, not the corpus
    sections.append((
        "rescore_bm25 (ES rescore: window-bounded phrase re-rank)",
        "Expect: the BM25 window as a TakeOrderedAndProject(50) "
        "broadcast into a left_semi restriction of the positional "
        "phrase join — the second query's scan cost is bounded by "
        "the window ids, then one more TakeOrderedAndProject(10) on "
        "the adjusted score. No global sort anywhere.\n\n"
        + cap_explain(harness.q_rescore_bm25(spark, sf_dir)),
    ))

    # 19. Cursor pagination — page 2 as a predicate, not an offset
    sections.append((
        "search_after (cursor pagination, page 2)",
        "Expect: page 1's tail row as a 1-row broadcast "
        "(BroadcastNestedLoopJoin against the scored aggregate is "
        "intended — the cursor is ONE row), the strictly-after "
        "compare as a post-join Filter, and the page itself a "
        "TakeOrderedAndProject(10) — deep paging never builds a "
        "k*N heap or global sort.\n\n"
        + cap_explain(harness.q_search_after(spark, sf_dir)),
    ))

    # 20. Histogram aggregation — tiny bucket key space
    sections.append((
        "hist_dlen (ES histogram agg over the match set)",
        "Expect: presence candidates as a left_semi join, the bucket "
        "key a scan-side Project (floor-divide), and ONE partial+"
        "final HashAggregate pair on |max_dlen / interval| keys — "
        "the exchange moves bucket counts, never docs.\n\n"
        + cap_explain(harness.q_hist_dlen(spark, sf_dir)),
    ))

    # 21. Field-sorted search — no scoring work at all
    sections.append((
        "sort_by_field (ES sort: attribute ranking)",
        "Expect: qualification as a left_semi join on the candidate "
        "ids and the page a TakeOrderedAndProject(10) on "
        "(dl DESC, doc_id ASC) — zero BM25 math, no global sort.\n\n"
        + cap_explain(harness.q_sort_by_field(spark, sf_dir)),
    ))

    # 22. Terms + stats sub-aggregation
    sections.append((
        "facet_stats (ES terms agg + stats sub-agg)",
        "Expect: the match set semi-joined to the metadata lookup, "
        "then ONE partial+final HashAggregate keyed by the facet "
        "value (group count = field cardinality, tiny) computing "
        "count/avg/min/max together — one scan, one shuffle of "
        "group-sized partials.\n\n"
        + cap_explain(harness.q_facet_stats(spark, sf_dir)),
    ))

    # 23. Wildcard expansion rides the regex machinery
    sections.append((
        "wildcard_bm25 (WildcardQuery via portable regex)",
        "Expect: identical shape to regex_bm25 — the vocab-bounded "
        "distinct-term aggregate filtered by the translated pattern "
        "(rlike), capped, broadcast back into the standard scoring "
        "chain.\n\n"
        + cap_explain(harness.q_wildcard_bm25(spark, sf_dir)),
    ))

    # 24. DisjunctionMax — same plan as bm25_topk, different aggregate
    sections.append((
        "dismax_bm25 (DisjunctionMax: max + tiebreak in ONE agg)",
        "Expect: identical shape to bm25_topk — the max and sum land "
        "in the SAME partial+final HashAggregate pair (no second "
        "pass, no window), then TakeOrderedAndProject(10).\n\n"
        + cap_explain(harness.q_dismax_bm25(spark, sf_dir)),
    ))

    # 25. Grouped top hits — one window shuffle on the group key
    sections.append((
        "top_hits (ES top_hits: best N per group)",
        "Expect: one Exchange on the group key feeding a Window "
        "(row_number) whose rank filter prunes before the final "
        "order — group-local work, no global sort of the match "
        "set.\n\n"
        + cap_explain(harness.q_top_hits(spark, sf_dir)),
    ))

    # 26. Percolation — broadcast rules, one token-stream scan
    sections.append((
        "percolate (reversed search: corpus vs stored rules)",
        "Expect: the distinct token stream BroadcastHashJoin'd with "
        "the literal rule table (rules are small by definition), ONE "
        "partial+final HashAggregate on (rule, doc) with the "
        "min_match coverage filter after it — adding rules never "
        "adds corpus scans.\n\n"
        + cap_explain(harness.q_percolate(spark, sf_dir)),
    ))

    # 27. Phrase-prefix — positional join, last step against the
    # capped expansion
    sections.append((
        "phrase_prefix (match_phrase_prefix: positional join + "
        "expansion tail)",
        "Expect: the phrase chain's equi-joins on (doc, pos-offset) "
        "with the LAST join input the broadcast-capped prefix "
        "expansion semi-joined to the token stream — work scales "
        "with the words' position-list sizes plus the expansion, "
        "never candidate content.\n\n"
        + cap_explain(harness.q_phrase_prefix(spark, sf_dir)),
    ))

    sections.append((
        "hybrid_rrf (RRF fusion of BM25 and embedding-cosine top-20)",
        "Expect: two independent TakeOrderedAndProject(limit=20) "
        "candidate branches (the BM25 agg and the broadcast-qv cosine "
        "scan); the rank windows and the full-outer fuse run on 20-row "
        "inputs, so the single-partition Window warning is benign by "
        "construction — the expensive work never sees a global sort.\n\n"
        + cap_explain(harness.q_hybrid_rrf(spark, sf_dir)),
    ))

    sections.append((
        "function_score (field_value_factor ln1p shaping)",
        "Expect: the shaping join lands AFTER the score aggregation "
        "on the already-reduced per-doc set (AQE free to broadcast "
        "the 2-column documents projection), then "
        "TakeOrderedAndProject on the shaped score.\n\n"
        + cap_explain(harness.q_function_score(spark, sf_dir)),
    ))

    sections.append((
        "highlight (snippet extraction on the top-k page)",
        "Expect: content (the wide text column) is joined ONLY to the "
        "10 surviving hits — the snippet substring never touches "
        "non-page rows; locate/substring stay in WholeStageCodegen.\n\n"
        + cap_explain(harness.q_highlight(spark, sf_dir)),
    ))

    sections.append((
        "matrix_stats (covariance/correlation matrix agg)",
        "Expect: ONE two-phase hash aggregate (partial corr/covar "
        "moments map-side, merge on the group key) — no second pass "
        "over the fact table for the cross-moments.\n\n"
        + cap_explain(harness.q_matrix_stats(spark, sf_dir)),
    ))

    sections.append((
        "composite_agg (cursor-paged multi-source terms buckets)",
        "Expect: the after-cursor tuple inequality evaluated on the "
        "aggregated buckets, page cut as TakeOrderedAndProject "
        "(size 5) — one shuffle total, no global sort of all "
        "buckets.\n\n"
        + cap_explain(harness.q_composite_agg(spark, sf_dir)),
    ))

    sections.append((
        "events_derivative + moving_avg (pipeline aggs over the "
        "hourly histogram)",
        "Expect: histogram as a two-phase agg, then ONE window "
        "exchange partitioned by event_type serving the lag/frame "
        "function — the derivative and trailing mean never repartition "
        "twice.\n\n"
        + cap_explain(harness.q_events_derivative(spark, sf_dir))
        + "\n--- moving_avg ---\n\n"
        + cap_explain(harness.q_moving_avg(spark, sf_dir)),
    ))

    sections.append((
        "rank_eval (ES _rank_eval: batch scoring + per-query metrics)",
        "Expect: ONE scoring aggregation for the whole query batch "
        "(the query-term table broadcast onto tf), one window "
        "exchange partitioned by query_id for ranks, and a final "
        "per-query agg — evaluation cost is the batch search itself, "
        "never a per-query loop.\n\n"
        + cap_explain(harness.q_rank_eval(spark, sf_dir)),
    ))

    sections.append((
        "filters_agg (named overlapping buckets, one scan)",
        "Expect: a single scan feeding conditional aggregates (one "
        "row), then a Generate/stack unpivot — bucket count never "
        "multiplies the number of passes.\n\n"
        + cap_explain(harness.q_filters_agg(spark, sf_dir)),
    ))

    out = ["# PLANS — physical plans of the key paths\n"]
    out.append(
        "Generated by tools/dump_plans.py (`df.explain('formatted')`).\n"
    )
    for title, body in sections:
        out.append(f"\n## {title}\n\n```\n{body}\n```\n")
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"),
        "w",
    ) as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
