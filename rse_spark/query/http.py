"""HTTP search endpoint over the serving tier (R9 parity).

GSE registers ``GET /search`` returning a JSON result page
(reference crawler/src/api/main.go:207-240, CompletePage main.go:34-46)
with 400 on a missing/empty query (main.go:210-214). Same surface here,
stdlib ``ThreadingHTTPServer`` wrapping DirectSearcher (query/serve.py:
pyarrow + numpy over the index segment files — ~25ms p50, no Spark job
per request). Serving-tier position: one stateless replica per process
over shared segment storage; scale out horizontally behind any LB.

Beyond GSE's single surface, ``?phrase=`` (adjacency-verified phrase
match against the content store) and ``?prefix=`` (term-dictionary
expansion feeding the BM25 scorer) expose the textmatch query semantics
(query/textmatch.py) at the same endpoint, ``?ql=`` accepts the flat
boolean mini-language (query/qlang.py: OR of AND-clauses with quoted
phrases, ``"…"~N`` slop, ``tok*`` prefixes and ``-atom`` negation),
``?near=w1,w2&dist=N`` runs ordered proximity on the positional
sidecar, ``?pos=1`` forces phrase resolution through it (automatic
when no content store is mounted), and ``?snippets=1`` adds a highlighted
content-store preview per hit (the result-page surface GSE's
CompletePage implied, main.go:34-46).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from rse_spark.query.serve import DirectSearcher


def _make_handler(searcher: DirectSearcher, corpus_path: str | None = None,
                  content_col: str = "text", id_col: str = "doc_id",
                  key_col: str | None = None, vstore=None):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 — http.server API
            # one JSON 500 instead of a dropped connection on any
            # unexpected failure (e.g. a misconfigured content store)
            try:
                self._route()
            except BrokenPipeError:
                pass
            except Exception:  # noqa: BLE001
                # generic body only: exception text can leak paths /
                # internals to an untrusted client; details go to the
                # server-side log
                import logging

                logging.getLogger("rse_spark.http").exception(
                    "unhandled error serving %s", self.path
                )
                try:
                    self._json(500, {"error": "internal server error"})
                except Exception:  # noqa: BLE001 — client already gone
                    pass

        def _route(self) -> None:
            u = urlparse(self.path)
            if u.path == "/healthz":
                # liveness: the dictionary is loaded and non-trivial
                self._json(200, {"ok": True, "n_docs": searcher.n_docs})
                return
            if u.path == "/stats":
                self._json(200, {
                    "n_docs": searcher.n_docs,
                    "avgdl": round(searcher.avgdl, 6),
                    "vocab_size": len(searcher.term_dict),
                    "cached_buckets": len(searcher._bucket_tables),
                    "cached_bucket_bytes": searcher.cached_bucket_bytes,
                    "max_bucket_bytes": searcher.max_bucket_bytes,
                    "phrase_enabled": corpus_path is not None,
                    "index_generation": searcher.generation,
                    "result_cache": searcher.result_cache_stats,
                    "vectors": (
                        {
                            "n": len(vstore), "dim": vstore.dim,
                            "lsh_bits": getattr(
                                vstore, "_lsh_bits", None
                            ),
                        }
                        if vstore is not None else None
                    ),
                })
                return
            if u.path == "/suggest":
                # did-you-mean: per analyzed token, its index df and
                # the closest attested terms (distance asc, df desc)
                from rse_spark.query.engine import query_terms

                qs = parse_qs(u.query)
                q = (qs.get("q") or [""])[0]
                toks = query_terms(q, searcher.analyzer)
                if not toks:
                    self._json(400, {"error": "q required"})
                    return
                try:
                    n = int((qs.get("n") or ["5"])[0])
                except ValueError:
                    self._json(400, {"error": "n must be an int"})
                    return
                out = []
                for t in sorted(toks):
                    info = searcher.term_dict.get(t)
                    out.append({
                        "term": t,
                        "df": int(info[0]) if info else 0,
                        "suggestions": [
                            {"term": s, "distance": d, "df": df}
                            for s, d, df in searcher.suggest(t, n=n)
                        ],
                    })
                self._json(200, {"query": q, "terms": out})
                return
            if u.path == "/docvec":
                # Lucene TermVectors: one doc's stored term vector
                qs = parse_qs(u.query)
                try:
                    did = int((qs.get("id") or [""])[0])
                except ValueError:
                    self._json(400, {"error": "id needs a doc_id"})
                    return
                try:
                    self._json(200, searcher.term_vector(did))
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                return
            if u.path == "/count":
                # ES _count: total hits, no scoring, no page
                qs = parse_qs(u.query)
                q = (qs.get("q") or [""])[0]
                if not q.strip():
                    self._json(400, {"error": "q required"})
                    return
                mode = (qs.get("mode") or ["or"])[0]
                if mode not in ("or", "and"):
                    self._json(400, {"error": "mode must be or|and"})
                    return
                self._json(200, {
                    "query": q, "mode": mode,
                    "count": searcher.count(q, mode=mode),
                })
                return
            if u.path == "/sigterms":
                # significant terms of the query's match set (ES
                # significant_terms, JLH) — an analytics page, not a
                # ranking page
                qs = parse_qs(u.query)
                q = (qs.get("q") or [""])[0]
                if not q.strip():
                    self._json(400, {"error": "q required"})
                    return
                try:
                    top = int((qs.get("top") or ["15"])[0])
                except ValueError:
                    self._json(400, {"error": "top must be an int"})
                    return
                try:
                    rows = searcher.significant_terms(q, top=top)
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "query": q,
                    "terms": [
                        {
                            "term": t, "fg_df": f, "bg_df": bg,
                            "score": round(s, 6),
                        }
                        for t, f, bg, s in rows
                    ],
                })
                return
            if u.path == "/terms":
                # ES _terms_enum: attested vocabulary terms matching a
                # prefix, with their df — dictionary-only autocomplete,
                # no posting list is ever decoded
                qs = parse_qs(u.query)
                prefix = (qs.get("prefix") or [""])[0].strip()
                if not prefix:
                    self._json(400, {"error": "prefix required"})
                    return
                try:
                    n = int((qs.get("n") or ["20"])[0])
                except ValueError:
                    self._json(400, {"error": "n must be an int"})
                    return
                terms = searcher.expand_prefix(prefix, max_terms=n)
                self._json(200, {
                    "prefix": prefix,
                    "terms": [
                        {
                            "term": t,
                            "df": int(
                                searcher.term_dict.get(t, (0, 0))[0]
                            ),
                        }
                        for t in terms
                    ],
                })
                return
            if u.path != "/search":
                self._json(404, {"error": "not found"})
                return
            qs = parse_qs(u.query)
            q = (qs.get("q") or [""])[0]
            phrase = (qs.get("phrase") or [""])[0]
            prefix = (qs.get("prefix") or [""])[0]
            ql = (qs.get("ql") or [""])[0]
            near = (qs.get("near") or [""])[0]
            mlt = (qs.get("mlt") or [""])[0]
            syn = (qs.get("syn") or [""])[0]
            wildcard = (qs.get("wildcard") or [""])[0]
            span_first = (qs.get("span_first") or [""])[0]
            phrase_prefix = (qs.get("phrase_prefix") or [""])[0]
            given = [p for p in (q, phrase, prefix, ql, near, mlt,
                                 syn, wildcard, span_first,
                                 phrase_prefix)
                     if p.strip()]
            if len(given) != 1:
                # GSE: empty query -> http.Error 400 (main.go:210-214);
                # exactly one selector must be present
                self._json(400, {
                    "error": "exactly one of q, phrase, prefix, ql, "
                             "near, mlt, syn, wildcard, span_first, "
                             "phrase_prefix required"
                })
                return
            try:
                k = int((qs.get("k") or ["10"])[0])
                mode = (qs.get("mode") or ["or"])[0]
                if mode not in ("or", "and"):
                    raise ValueError(mode)
            except ValueError:
                self._json(400, {"error": "bad k/mode parameter"})
                return
            want_snippets = (qs.get("snippets") or ["0"])[0] not in (
                "0", "", "false",
            )
            # ?fvf=ln1p_dlen — function_score field_value_factor,
            # honored by the plain-q and ql paths (an unknown factor
            # name is rejected by the searcher: ValueError -> 400)
            fvf = (qs.get("fvf") or [""])[0].strip() or None
            if want_snippets and corpus_path is None:
                self._json(400, {
                    "error": "snippets need a content store "
                             "(server started without one)"
                })
                return
            if ql.strip():
                from rse_spark.query.qlang import (
                    search_ql,
                    search_ql_collapse,
                    search_ql_facets,
                    search_ql_hist,
                )

                # ?facets=lang,repo — per-field value counts over the
                # full qualifying set (faceted navigation); ql-only:
                # the other selectors don't materialize their match
                # set
                facet_fields = [
                    f for f in (qs.get("facets") or [""])[0]
                    .replace(",", " ").split() if f
                ]
                collapse = (qs.get("collapse") or [""])[0].strip()
                hist = (qs.get("hist") or [""])[0].strip()
                stats = (qs.get("stats") or [""])[0].strip()
                if sum(bool(x) for x in
                       (collapse, facet_fields, hist, stats)) > 1:
                    self._json(400, {
                        "error": "collapse, facets, hist, and stats "
                                 "are separate views; request one at "
                                 "a time"
                    })
                    return
                interval = 0
                if hist:
                    # ?hist=doc_len&interval=50 — ES histogram agg
                    # over the full qualifying set
                    try:
                        interval = int(
                            (qs.get("interval") or ["0"])[0]
                        )
                    except ValueError:
                        interval = 0
                extra = None
                try:
                    if collapse:
                        try:
                            per_group = int(
                                (qs.get("per_group") or ["1"])[0]
                            )
                        except ValueError:
                            per_group = 0  # -> ValueError below
                        hits = search_ql_collapse(
                            searcher, ql, collapse, k=k,
                            per_group=per_group,
                            corpus_path=corpus_path,
                            content_col=content_col, id_col=id_col,
                            key_col=key_col,
                        )
                    elif stats:
                        # ?stats=lang:doc_len — ES terms agg + stats
                        # sub-agg over the full qualifying set
                        if ":" not in stats:
                            raise ValueError(
                                "stats must be facet_field:value_field"
                            )
                        sfield, vfield = stats.split(":", 1)
                        from rse_spark.query.qlang import match_ql

                        qualified, boosts = match_ql(
                            searcher, ql, corpus_path=corpus_path,
                            content_col=content_col, id_col=id_col,
                            key_col=key_col,
                        )
                        rows = searcher.facet_stats(
                            qualified, sfield, vfield
                        )
                        hits = searcher.search_terms(
                            sorted(boosts), k=k, mode="or",
                            within=qualified, boosts=boosts,
                        ) if len(qualified) else []
                        extra = {"stats": {
                            "field": sfield, "value_field": vfield,
                            "groups": [
                                {
                                    "value": v, "n_docs": int(n),
                                    "avg": round(float(m), 6),
                                    "min": float(lo),
                                    "max": float(hi),
                                }
                                for v, n, m, lo, hi in rows
                            ],
                        }}
                    elif hist:
                        hits, buckets = search_ql_hist(
                            searcher, ql, hist, interval, k=k,
                            corpus_path=corpus_path,
                            content_col=content_col, id_col=id_col,
                            key_col=key_col,
                        )
                        extra = {
                            "hist": {
                                "field": hist, "interval": interval,
                                "buckets": [
                                    {"key": int(b), "n_docs": int(n)}
                                    for b, n in buckets
                                ],
                            }
                        }
                    elif facet_fields:
                        hits, facets = search_ql_facets(
                            searcher, ql, facet_fields, k=k,
                            corpus_path=corpus_path,
                            content_col=content_col, id_col=id_col,
                            key_col=key_col,
                        )
                        extra = {"facets": {
                            f: [
                                {"value": v, "n_docs": int(n)}
                                for v, n in vals
                            ]
                            for f, vals in facets.items()
                        }}
                    else:
                        hits = search_ql(
                            searcher, ql, k=k, corpus_path=corpus_path,
                            content_col=content_col, id_col=id_col,
                            key_col=key_col, fvf=fvf,
                        )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._page(ql, k, "ql", hits, extra=extra,
                           snippet_q=ql.replace('"', " ").replace(
                               " AND ", " ").replace(" OR ", " ")
                           if want_snippets else None)
                return
            if near.strip():
                parts = [w for w in near.replace(",", " ").split() if w]
                try:
                    dist = int((qs.get("dist") or ["3"])[0])
                    if len(parts) != 2 or dist < 1:
                        raise ValueError
                except ValueError:
                    self._json(400, {
                        "error": "near needs two words (near=w1,w2) "
                                 "and dist >= 1"
                    })
                    return
                # &ordered=0 -> SpanNearQuery inOrder=false
                in_order = (qs.get("ordered") or ["1"])[0] not in (
                    "0", "false",
                )
                try:
                    hits = searcher.near_search_positions(
                        parts[0], parts[1], dist, k=k,
                        ordered=in_order,
                    )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "near": parts, "dist": dist, "k": k,
                    "ordered": in_order,
                    "n_results": len(hits),
                    "results": [
                        {"doc_id": int(d), "n_pairs": int(n)}
                        for d, n in hits
                    ],
                })
                return
            if syn.strip():
                # ?syn=join|merge,table — Lucene SynonymQuery: comma-
                # separated groups, |-separated surface forms; each
                # group scores as one blended pseudo-term. Members are
                # analyzed, so stemming variants land on index terms.
                from rse_spark.query.engine import query_terms

                groups = []
                for gtxt in syn.split(","):
                    terms = sorted({
                        t
                        for part in gtxt.split("|")
                        for t in query_terms(part, searcher.analyzer)
                    })
                    if terms:
                        groups.append(terms)
                if not groups:
                    self._json(400, {
                        "error": "syn has no indexable terms"
                    })
                    return
                hits = searcher.search_synonym_groups(
                    groups, k=k, mode=mode
                )
                self._page(syn, k, mode, hits,
                           extra={"groups": groups},
                           snippet_q=" ".join(
                               t for g in groups for t in g
                           ) if want_snippets else None)
                return
            if mlt.strip():
                # ?mlt=<doc_id> — Lucene MoreLikeThis: docs similar
                # to the given one, ranked by BM25 over its strongest
                # tf-idf terms (the selection is returned so the page
                # is explainable)
                try:
                    src = int(mlt)
                except ValueError:
                    self._json(400, {"error": "mlt needs a doc_id"})
                    return
                try:
                    hits, terms = searcher.more_like_this(src, k=k)
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._page(f"mlt:{src}", k, "mlt", hits,
                           extra={"mlt_terms": terms},
                           snippet_q=" ".join(terms) if want_snippets
                           else None)
                return
            if phrase.strip():
                use_pos = (qs.get("pos") or ["0"])[0] not in (
                    "0", "", "false",
                )
                self._phrase(phrase, k, use_pos)
                return
            if prefix.strip():
                terms = searcher.expand_prefix(prefix.strip())
                hits = searcher.search_terms(terms, k=k, mode="or")
                self._page(prefix, k, "or", hits,
                           extra={"expanded_terms": terms},
                           snippet_q=" ".join(terms) if want_snippets
                           else None)
                return
            if span_first.strip():
                # ?span_first=word&end=N — Lucene SpanFirstQuery:
                # the word within the first N token positions
                try:
                    end = int((qs.get("end") or ["10"])[0])
                except ValueError:
                    self._json(400, {"error": "end must be an int"})
                    return
                try:
                    hits2 = searcher.span_first_search(
                        span_first.strip(), end, k=k
                    )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "span_first": span_first.strip(), "end": end,
                    "k": k, "n_results": len(hits2),
                    "results": [
                        {"doc_id": int(d), "n_occurrences": int(n)}
                        for d, n in hits2
                    ],
                })
                return
            if phrase_prefix.strip():
                # ?phrase_prefix=merge+jo — ES match_phrase_prefix
                # (search-as-you-type) over the positional sidecar
                try:
                    hits2 = searcher.phrase_prefix_search(
                        phrase_prefix, k=k
                    )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "phrase_prefix": phrase_prefix, "k": k,
                    "n_results": len(hits2),
                    "results": [
                        {"doc_id": int(d), "n_occurrences": int(n)}
                        for d, n in hits2
                    ],
                })
                return
            if wildcard.strip():
                # ?wildcard=s?a* — Lucene WildcardQuery: capped
                # dictionary expansion via the portable regex
                # translation, then the standard or-mode scorer
                try:
                    terms = searcher.expand_wildcard(wildcard.strip())
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                hits = (
                    searcher.search_terms(terms, k=k, mode="or")
                    if terms else []
                )
                self._page(wildcard, k, "or", hits,
                           extra={"expanded_terms": terms},
                           snippet_q=" ".join(terms) if want_snippets
                           else None)
                return
            sort_field = (qs.get("sort") or [""])[0].strip()
            if sort_field:
                # ?q=...&sort=doc_len[&order=asc|desc] — ES sort:
                # rank by an attribute instead of relevance
                order = (qs.get("order") or ["desc"])[0]
                if order not in ("asc", "desc"):
                    self._json(400, {
                        "error": "order must be asc or desc"
                    })
                    return
                try:
                    rows = searcher.search_sorted(
                        q, sort_field, k=k, mode=mode,
                        ascending=(order == "asc"),
                    )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "q": q, "sort": sort_field, "order": order,
                    "k": k, "mode": mode, "n_results": len(rows),
                    "results": [
                        {"doc_id": int(d), "value": v}
                        for d, v in rows
                    ],
                })
                return
            knn_raw = (qs.get("knn") or [""])[0]
            if knn_raw.strip():
                # ?q=...&knn=<vec_id> — ES 8.x hybrid search+knn with
                # RRF: BM25 candidates from the index, cosine
                # candidates from the configured vector table, fused
                # by rank (see DirectSearcher.search_hybrid_rrf)
                if vstore is None:
                    self._json(400, {
                        "error": "hybrid search not enabled "
                                 "(no vector table configured)"
                    })
                    return
                try:
                    knn_id = int(knn_raw)
                except ValueError:
                    self._json(400, {"error": "knn needs a vec_id"})
                    return
                # ?knn_hamming=R — use the vector store's LSH cells
                # (approximate scale path) with probe radius R;
                # requires the server to have built them
                # (vector_lsh_bits). RuntimeError -> 400 below.
                ham_raw = (qs.get("knn_hamming") or [""])[0]
                lsh_hamming = None
                if ham_raw.strip():
                    try:
                        lsh_hamming = int(ham_raw)
                    except ValueError:
                        self._json(400, {
                            "error": "knn_hamming must be an int"
                        })
                        return
                try:
                    fused = searcher.search_hybrid_rrf(
                        q, vstore, query_id=knn_id, k=k,
                        key_col=key_col, lsh_hamming=lsh_hamming,
                    )
                except (ValueError, KeyError, RuntimeError) as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "query": q, "knn": knn_id, "k": k,
                    "mode": "hybrid_rrf",
                    "n_results": len(fused),
                    "results": [
                        {
                            "id": d, "rrf_score": round(s, 6),
                            "text_rank": tr, "vec_rank": vr,
                        }
                        for d, s, tr, vr in fused
                    ],
                })
                return
            dismax_raw = (qs.get("dismax") or [""])[0]
            if dismax_raw.strip():
                # ?q=...&dismax=T — Lucene DisjunctionMaxQuery with
                # tiebreak T in [0,1]
                try:
                    tie = float(dismax_raw)
                except ValueError:
                    self._json(400, {
                        "error": "dismax must be a float tiebreak"
                    })
                    return
                try:
                    hits = searcher.search_dismax(q, k=k, tiebreak=tie)
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._page(q, k, f"dismax:{tie:g}", hits,
                           snippet_q=q if want_snippets else None)
                return
            rescore = (qs.get("rescore") or [""])[0]
            if rescore.strip():
                # ?q=...&rescore=<phrase>[&rescore_w=W&window=N] —
                # Elasticsearch rescore: only the top-`window` BM25
                # hits pay for the exact-phrase count, then re-rank by
                # score + W * n_occurrences (score_mode=total)
                try:
                    window = int((qs.get("window") or ["50"])[0])
                    weight = float(
                        (qs.get("rescore_w") or ["2.0"])[0]
                    )
                except ValueError:
                    self._json(400, {
                        "error": "window must be an int and "
                                 "rescore_w a float"
                    })
                    return
                try:
                    hits4 = searcher.search_rescored(
                        q, rescore.strip(), k=k, window=window,
                        weight=weight, mode=mode,
                    )
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "q": q, "rescore": rescore.strip(), "k": k,
                    "window": window, "rescore_w": weight,
                    "n_results": len(hits4),
                    "results": [
                        {
                            "doc_id": int(d),
                            "score": round(float(s), 6),
                            "n_terms_matched": int(m),
                            "n_occurrences": int(n),
                        }
                        for d, s, m, n in hits4
                    ],
                })
                return
            msm_raw = (qs.get("msm") or [""])[0]
            min_match = None
            if msm_raw.strip():
                # ?msm=N — ES minimum_should_match: docs must match
                # at least N distinct query terms (or-mode only; and
                # IS msm=all)
                try:
                    min_match = int(msm_raw)
                except ValueError:
                    self._json(400, {"error": "msm must be an int"})
                    return
            after = None
            after_raw = (qs.get("after") or [""])[0]
            if after_raw.strip():
                # ?after=<score>,<doc_id> — ES search_after deep
                # pagination: the previous page's last sort key
                # (served full-precision as next_after); strictly-
                # after docs qualify, so page N costs one scoring
                # pass, not a k*N heap
                try:
                    sa, da = after_raw.split(",")
                    after = (float(sa), int(da))
                except ValueError:
                    self._json(400, {
                        "error": "after must be score,doc_id"
                    })
                    return
            try:
                hits = searcher.search(q, k=k, mode=mode,
                                       min_match=min_match,
                                       after=after, fvf=fvf)
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            cursor_extra = (
                {"next_after": [float(hits[-1][1]), int(hits[-1][0])]}
                if hits else {}
            )
            if (qs.get("explain") or ["0"])[0] not in ("0", "", "false"):
                # ?explain=1 — Lucene explain parity: each hit carries
                # its full per-term BM25 breakdown (one posting probe
                # per (term, hit) against already-cached buckets)
                self._page(q, k, mode, hits,
                           extra={"explanations": [
                               searcher.explain(q, d, fvf=fvf)
                               for d, _s, _m in hits
                           ], **cursor_extra},
                           snippet_q=q if want_snippets else None)
                return
            self._page(q, k, mode, hits,
                       extra=cursor_extra or None,
                       snippet_q=q if want_snippets else None)

        def _phrase(self, phrase: str, k: int,
                    use_pos: bool = False) -> None:
            import os as _os

            from rse_spark.query.engine import query_terms

            if not query_terms(phrase, searcher.analyzer):
                self._json(400, {
                    "error": "phrase has no indexable terms"
                })
                return
            has_pos = _os.path.isdir(
                _os.path.join(searcher.root, "positions")
            )
            if use_pos and not has_pos:
                self._json(400, {
                    "error": "index has no positional sidecar"
                })
                return
            # positional sidecar when forced (?pos=1) or when it is
            # the only phrase-capable surface (no content store)
            if has_pos and (use_pos or corpus_path is None):
                hits = searcher.phrase_search_positions(phrase, k=k)
                algo = "positions"
            elif corpus_path is not None:
                hits = searcher.phrase_search(
                    phrase, corpus_path, k=k,
                    content_col=content_col, id_col=id_col,
                    key_col=key_col,
                )
                algo = "content_verify"
            else:
                self._json(400, {
                    "error": "phrase search not enabled (no content "
                             "store and no positional sidecar)"
                })
                return
            self._json(200, {
                "phrase": phrase,
                "k": k,
                "algo": algo,
                "n_results": len(hits),
                "results": [
                    {"doc_id": int(d), "n_occurrences": int(n)}
                    for d, n in hits
                ],
            })

        def _page(self, q: str, k: int, mode: str, hits,
                  extra: dict | None = None,
                  snippet_q: str | None = None) -> None:
            snips = (
                searcher.snippets(
                    hits, snippet_q, corpus_path,
                    content_col=content_col, id_col=id_col,
                    key_col=key_col,
                )
                if snippet_q is not None and hits
                else {}
            )
            page = {
                "query": q,
                "k": k,
                "mode": mode,
                "n_results": len(hits),
                "results": [
                    {
                        "doc_id": int(h[0]),
                        "score": round(float(h[1]), 6),
                        "n_terms_matched": int(h[2]),
                        # collapse hits carry the group value 4th
                        **(
                            {"group": h[3]} if len(h) > 3 else {}
                        ),
                        **(
                            {"snippet": snips[int(h[0])]}
                            if int(h[0]) in snips else {}
                        ),
                    }
                    for h in hits
                ],
            }
            if extra:
                page.update(extra)
            self._json(200, page)

        def log_message(self, *args) -> None:  # quiet test output
            pass

    return Handler


class SearchServer:
    """Lifecycle wrapper: start()/stop() around ThreadingHTTPServer."""

    def __init__(self, index_root: str, analyzer: str = "code",
                 host: str = "127.0.0.1", port: int = 0,
                 corpus_path: str | None = None,
                 content_col: str = "text", id_col: str = "doc_id",
                 key_col: str | None = None,
                 max_vocab_in_memory: int = 10_000_000,
                 result_cache: int = 0,
                 vectors_path: str | None = None,
                 vector_id_col: str = "vec_id",
                 vector_col: str = "embedding",
                 vector_lsh_bits: int | None = None):
        """``corpus_path`` (parquet content store with ``id_col`` +
        ``content_col``) enables ``?phrase=`` adjacency verification;
        without it phrase requests get a 400. ``key_col`` maps index
        doc ids to corpus ids through the doc metadata when the index
        assigned its own (see DirectSearcher.phrase_search).
        ``vectors_path`` (parquet embeddings table) enables hybrid
        lexical+semantic pages (``?q=...&knn=<vec_id>`` — RRF fusion,
        see DirectSearcher.search_hybrid_rrf); without it knn requests
        get a 400."""
        self.searcher = DirectSearcher(
            index_root, analyzer=analyzer,
            max_vocab_in_memory=max_vocab_in_memory,
        )
        self.vstore = None
        if vectors_path is not None:
            from rse_spark.query.vectors import VectorStore

            self.vstore = VectorStore(
                vectors_path, id_col=vector_id_col, vec_col=vector_col
            )
            if vector_lsh_bits is not None:
                # enables ?knn_hamming= (the approximate scale path)
                self.vstore.build_lsh(n_bits=vector_lsh_bits)
        # ES shard-request-cache analog, opt-in (entries, 0 = off):
        # identical result pages are served from memory until the
        # next writer commit invalidates them (generation stamp)
        self.searcher.max_result_cache = result_cache
        self.httpd = ThreadingHTTPServer(
            (host, port),
            _make_handler(self.searcher, corpus_path=corpus_path,
                          content_col=content_col, id_col=id_col,
                          key_col=key_col, vstore=self.vstore),
        )
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self.httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
