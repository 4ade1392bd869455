"""extract_refs edge pipeline (E3-E5), filter_gate pushdown (S6), and
the HTTP /search endpoint (R9)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from rse_spark.functions.gate import filter_gate
from rse_spark.functions.refs import doc_link_edges, extract_refs

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_extract_refs_pattern(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["import foo.bar then baz", "no3 refs x y"],
    }))
    refs = extract_refs(docs, pattern=r"[a-z]+\.[a-z]+").collect()
    assert [(r["src"], r["ref"]) for r in refs] == [(1, "foo.bar")]


def test_doc_link_edges_semantics(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha one two",        # title: alpha
            "beta alpha alpha",     # title: beta; mentions alpha -> 0
            "gamma beta",           # title: gamma; mentions beta -> 1
            "alpha gamma",          # duplicate title alpha: doc 0 wins;
                                    # mentions gamma -> 2 (self-ref to
                                    # alpha -> 0 kept: src != dst)
        ],
    }))
    edges = sorted(
        (r["src"], r["dst"]) for r in doc_link_edges(docs).collect()
    )
    assert edges == [(1, 0), (2, 1), (3, 0), (3, 2)]
    # feeds the link-graph rankers directly
    from rse_spark.functions.linkrank import backlink_counts

    bl = {r["dst"]: r["n_backlinks"]
          for r in backlink_counts(doc_link_edges(docs)).collect()}
    assert bl == {0: 2, 1: 1, 2: 1}


def test_filter_gate_pushdown(spark, tmp_path_factory):
    # own parquet copy: other tests persist DataFrames over the shared
    # sf0.001 path, and Spark's cache manager substitutes the cached
    # relation into any later plan over the same source — hiding the
    # FileScan whose PushedFilters this test asserts on
    path = str(tmp_path_factory.mktemp("gate")) + "/docs.parquet"
    spark.read.parquet(DOCS).write.parquet(path)
    docs = spark.read.parquet(path)
    out = filter_gate(docs, allow_langs=["en"], deny_sources=["src0"],
                      min_chars=100)
    rows = out.select("lang", "source", "n_chars").collect()
    assert rows, "gate should keep something at sf0.001"
    assert all(
        r["lang"] == "en" and r["source"] != "src0" and r["n_chars"] >= 100
        for r in rows
    )
    # predicates must reach the scan (PushedFilters), not a post-filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(lang)" in plan or "In(lang" in plan


@pytest.fixture(scope="module")
def http_index(spark, tmp_path_factory):
    from rse_spark.streaming.stream_index import append_batch

    root = str(tmp_path_factory.mktemp("http_idx"))
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 200)
    append_batch(spark, docs, root, analyzer="simple", content_col="text")
    return root


def test_http_search_endpoint(http_index):
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        url = f"{srv.address}/search?q=spark+join&k=5"
        with urllib.request.urlopen(url, timeout=10) as resp:
            assert resp.status == 200
            body = json.load(resp)
        assert body["n_results"] == 5
        assert body["results"] == sorted(
            body["results"],
            key=lambda r: (-r["score"], r["doc_id"]),
        )
        # identical to the serving tier it wraps
        direct = srv.searcher.search("spark join", k=5)
        assert [r["doc_id"] for r in body["results"]] == [
            d for d, _, _ in direct
        ]
        # GSE parity: empty query -> 400 (api/main.go:210-214)
        try:
            urllib.request.urlopen(f"{srv.address}/search?q=", timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown path -> 404
        try:
            urllib.request.urlopen(f"{srv.address}/nope", timeout=10)
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_http_phrase_and_prefix_endpoints(spark, http_index):
    """?phrase= verifies adjacency against the content store and must
    equal the Spark textmatch path; ?prefix= expands on the term
    dictionary and scores with BM25; both are concurrency-safe."""
    import urllib.parse
    from concurrent.futures import ThreadPoolExecutor

    from rse_spark.query.http import SearchServer
    from rse_spark.query.textmatch import phrase_match

    srv = SearchServer(
        http_index, analyzer="simple",
        corpus_path=DOCS, key_col="src_doc_id",
    ).start()
    try:
        # pick a phrase guaranteed present: first two tokens of doc 3
        text3 = spark.read.parquet(DOCS).filter(
            F.col("doc_id") == 3
        ).collect()[0]["text"]
        phrase = " ".join(text3.split()[:2])
        url = (f"{srv.address}/search?phrase="
               f"{urllib.parse.quote(phrase)}&k=200")
        with urllib.request.urlopen(url, timeout=30) as resp:
            body = json.load(resp)
        assert body["n_results"] >= 1
        # Spark-path parity, mapped through src_doc_id -> corpus ids
        meta = spark.read.parquet(f"{http_index}/enriched").select(
            "doc_id", "src_doc_id"
        )
        ph = phrase_match(
            spark.read.parquet(DOCS).filter(F.col("doc_id") < 200),
            phrase, content_col="text",
        ).withColumnRenamed("doc_id", "corpus_id")
        spark_hits = ph.join(
            meta, ph.corpus_id == meta.src_doc_id
        ).select(meta["doc_id"], "n_occurrences").collect()
        want = sorted(
            (-int(r["n_occurrences"]), int(r["doc_id"])) for r in spark_hits
        )
        got = sorted(
            (-r["n_occurrences"], r["doc_id"]) for r in body["results"]
        )
        assert got == want
        # prefix: expanded terms all share the prefix; results ranked
        with urllib.request.urlopen(
            f"{srv.address}/search?prefix=sp&k=5", timeout=30
        ) as resp:
            pbody = json.load(resp)
        assert pbody["expanded_terms"]
        assert all(t.startswith("sp") for t in pbody["expanded_terms"])
        assert pbody["n_results"] >= 1
        direct = srv.searcher.search_terms(
            srv.searcher.expand_prefix("sp"), k=5
        )
        assert [r["doc_id"] for r in pbody["results"]] == [
            d for d, _, _ in direct
        ]
        # two selectors -> 400
        try:
            urllib.request.urlopen(
                srv.address + "/search?q=a&phrase=b", timeout=10
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # phrase absent from the corpus -> clean empty page (the simple
        # analyzer indexes '||' as a term, so this is a 200, not a 400)
        with urllib.request.urlopen(
            srv.address + "/search?phrase=%7C%7C", timeout=10
        ) as resp:
            assert json.load(resp)["n_results"] == 0
        # concurrency: phrase + prefix + plain interleaved
        urls = [
            url,
            f"{srv.address}/search?prefix=sp&k=5",
            f"{srv.address}/search?q=spark+join&k=5",
        ] * 6

        def fetch(u):
            with urllib.request.urlopen(u, timeout=30) as r:
                return json.load(r)

        with ThreadPoolExecutor(max_workers=6) as pool:
            for out in pool.map(fetch, urls):
                assert out["n_results"] >= 1
    finally:
        srv.stop()


def test_http_internal_error_returns_500_json(http_index):
    """A misconfigured server (e.g. bad key_col/content store) returns
    a JSON 500 instead of dropping the connection."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(
        http_index, analyzer="simple",
        corpus_path="/nonexistent/corpus.parquet", key_col="src_doc_id",
    ).start()
    try:
        urllib.request.urlopen(
            f"{srv.address}/search?phrase=spark+join", timeout=30
        )
        raise AssertionError("expected HTTP 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.load(e)
    finally:
        srv.stop()


def test_http_health_and_stats(http_index):
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/healthz", timeout=10
        ) as r:
            h = json.load(r)
        assert h["ok"] and h["n_docs"] == 200
        # a search warms the bucket cache; stats reflect it
        urllib.request.urlopen(
            f"{srv.address}/search?q=spark&k=3", timeout=30
        ).read()
        with urllib.request.urlopen(f"{srv.address}/stats", timeout=10) as r:
            s = json.load(r)
        assert s["n_docs"] == 200 and s["vocab_size"] > 0
        assert s["cached_buckets"] >= 1 and s["cached_bucket_bytes"] > 0
        assert s["phrase_enabled"] is False
    finally:
        srv.stop()


def test_http_snippets(http_index):
    """?snippets=1 returns a highlighted window from the content store
    for each hit; servers without a content store refuse it."""
    import re

    from rse_spark.query.http import SearchServer

    srv = SearchServer(
        http_index, analyzer="simple",
        corpus_path=DOCS, key_col="src_doc_id",
    ).start()
    try:
        url = f"{srv.address}/search?q=spark+join&k=5&snippets=1"
        with urllib.request.urlopen(url, timeout=30) as resp:
            body = json.load(resp)
        assert body["n_results"] == 5
        for res in body["results"]:
            snip = res["snippet"]
            marked = re.findall(r"\*\*(\S+)\*\*", snip)
            assert marked, snip
            assert any(
                m.lower() in ("spark", "join") for m in marked
            ), snip
            # bounded window, not the whole document
            assert len(snip.split()) <= 20
    finally:
        srv.stop()
    bare = SearchServer(http_index, analyzer="simple").start()
    try:
        urllib.request.urlopen(
            f"{bare.address}/search?q=spark&snippets=1", timeout=10
        )
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    finally:
        bare.stop()


def test_cli_serve_smoke(http_index, capsys):
    """`rse serve` runs the HTTP tier WITHOUT a Spark session."""
    from rse_spark.cli import main

    rc = main(["serve", "--root", http_index, "--analyzer", "simple",
               "--max-bucket-mb", "64", "--smoke"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["serving"].startswith("http://")


def test_http_search_under_concurrency(http_index):
    """N threads x M queries against a COLD searcher: every response
    must equal the single-threaded answer (first-touch bucket loads
    race from many threads at once)."""
    from concurrent.futures import ThreadPoolExecutor

    from rse_spark.query.http import SearchServer

    queries = ["spark join", "index build", "query plan", "hash group",
               "stream state", "parquet scan", "filter push", "sort merge"]
    # reference answers from a dedicated warm searcher
    from rse_spark.query.serve import DirectSearcher

    ref = DirectSearcher(http_index, analyzer="simple")
    expected = {q: [d for d, _, _ in ref.search(q, k=5)] for q in queries}

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        def fetch(q):
            url = f"{srv.address}/search?q={q.replace(' ', '+')}&k=5"
            with urllib.request.urlopen(url, timeout=30) as resp:
                return q, [r["doc_id"] for r in json.load(resp)["results"]]

        with ThreadPoolExecutor(max_workers=8) as pool:
            for q, got in pool.map(fetch, queries * 4):
                assert got == expected[q], q
    finally:
        srv.stop()


def test_bucket_loads_do_not_serialize(http_index):
    """Holding one bucket's load lock must NOT block a different
    bucket's first touch (the round-2 global _load_lock would
    deadlock this test)."""
    import threading

    from rse_spark.query.serve import DirectSearcher

    s = DirectSearcher(http_index, analyzer="simple")
    buckets = sorted({b for _, b in s.term_dict.values()})
    assert len(buckets) >= 2, "fixture should span multiple buckets"
    b_held, b_free = buckets[0], buckets[1]
    term_free = next(t for t, (_, b) in s.term_dict.items() if b == b_free)

    done = threading.Event()
    with s._bucket_lock(b_held):  # simulate an in-flight load of b_held
        t = threading.Thread(
            target=lambda: (s._bucket_rows(b_free, term_free), done.set())
        )
        t.start()
        assert done.wait(timeout=20), (
            "loading bucket %s blocked behind bucket %s's lock"
            % (b_free, b_held)
        )
        t.join()


def test_http_more_like_this(http_index):
    """?mlt=<doc_id> answers with the serving tier's more_like_this
    page (selected terms included for explainability, source doc
    never in the results); bad ids are 400s, and mlt is exclusive
    with the other selectors."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?mlt=3&k=5", timeout=10
        ) as resp:
            assert resp.status == 200
            body = json.load(resp)
        assert body["mode"] == "mlt"
        assert body["mlt_terms"]
        assert all(r["doc_id"] != 3 for r in body["results"])
        hits, terms = srv.searcher.more_like_this(3, k=5)
        assert body["mlt_terms"] == terms
        assert [r["doc_id"] for r in body["results"]] == [
            d for d, _s, _m in hits
        ]

        for bad in ("mlt=abc", "mlt=999999999", "mlt=3&q=spark"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(
                    f"{srv.address}/search?{bad}", timeout=10
                )
            assert ei.value.code == 400
    finally:
        srv.stop()


def test_http_explain_and_suggest(http_index):
    """?explain=1 attaches the per-term BM25 breakdown to each hit
    (contributions summing to the hit score); /suggest serves
    did-you-mean pages and 400s an empty query."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&k=3&explain=1",
            timeout=10,
        ) as resp:
            body = json.load(resp)
        assert len(body["explanations"]) == len(body["results"]) == 3
        for r, ex in zip(body["results"], body["explanations"]):
            assert ex["doc_id"] == r["doc_id"]
            total = sum(t["contribution"] for t in ex["terms"])
            assert abs(total - r["score"]) < 1e-5  # score rounded 6dp
            assert ex["n_terms_matched"] == r["n_terms_matched"]

        with urllib.request.urlopen(
            f"{srv.address}/suggest?q=sprak", timeout=10
        ) as resp:
            body = json.load(resp)
        (row,) = body["terms"]
        assert row["term"] == "sprak" and row["df"] == 0
        subs = row["suggestions"]
        assert subs == [
            {"term": s, "distance": d, "df": df}
            for s, d, df in srv.searcher.suggest("sprak")
        ]
        assert any(s["term"] == "spark" for s in subs)

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{srv.address}/suggest?q=",
                                   timeout=10)
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_http_synonym_query(http_index):
    """?syn=a|b,c serves SynonymQuery pages: blended groups echoed
    back, results identical to the serving-tier call."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?syn=join%7Cmerge,table&k=5",
            timeout=10,
        ) as resp:
            body = json.load(resp)
        assert body["groups"] == [["join", "merge"], ["table"]]
        hits = srv.searcher.search_synonym_groups(
            [["join", "merge"], ["table"]], k=5
        )
        assert [(r["doc_id"], r["n_terms_matched"])
                for r in body["results"]] == [
            (d, m) for d, _s, m in hits
        ]

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"{srv.address}/search?syn=%7C,", timeout=10
            )
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_http_sigterms(http_index):
    """/sigterms serves the significant-terms analytics page; empty
    query is a 400."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/sigterms?q=spark&top=5", timeout=10
        ) as resp:
            body = json.load(resp)
        rows = srv.searcher.significant_terms("spark", top=5)
        assert body["terms"] == [
            {"term": t, "fg_df": f, "bg_df": b, "score": round(s, 6)}
            for t, f, b, s in rows
        ]
        assert len(body["terms"]) == 5

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{srv.address}/sigterms?q=",
                                   timeout=10)
        assert ei.value.code == 400
    finally:
        srv.stop()


def test_http_docvec_and_count(http_index):
    """/docvec serves one doc's stored term vector; /count serves
    scoring-free total hits that agree with a full search page."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/docvec?id=3", timeout=10
        ) as resp:
            body = json.load(resp)
        tv = srv.searcher.term_vector(3)
        assert body["doc_id"] == 3
        assert body["doc_len"] == tv["doc_len"]
        assert [tuple(x) for x in body["terms"]] == tv["terms"]

        with urllib.request.urlopen(
            f"{srv.address}/count?q=spark+join", timeout=10
        ) as resp:
            body = json.load(resp)
        assert body["count"] == srv.searcher.count("spark join")
        assert body["count"] > 0

        for bad in ("/docvec?id=abc", "/docvec?id=999999999",
                    "/count?q=", "/count?q=x&mode=nope"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(srv.address + bad, timeout=10)
            assert ei.value.code == 400
    finally:
        srv.stop()



def test_http_min_match(http_index):
    """?msm=N filters hits to >= N distinct matched terms; bad values
    are 400s."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join+filter&k=10&msm=2",
            timeout=30,
        ) as r:
            body = json.load(r)
        direct = srv.searcher.search(
            "spark join filter", k=10, min_match=2
        )
        assert [h["doc_id"] for h in body["results"]] == [
            d for d, _s, _m in direct
        ]
        assert all(h["n_terms_matched"] >= 2 for h in body["results"])
        for bad in ("msm=abc", "msm=0", "msm=9", "msm=2&mode=and"):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?q=spark+join+filter&{bad}",
                    timeout=30,
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_http_search_after(http_index):
    """?after=score,doc_id pages by cursor; next_after chains pages
    with full-precision sort keys."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&k=5", timeout=30
        ) as r:
            p1 = json.load(r)
        sa, da = p1["next_after"]
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&k=5&after={sa!r},{da}",
            timeout=30,
        ) as r:
            p2 = json.load(r)
        direct = srv.searcher.search("spark join", k=10)
        got = [h["doc_id"] for h in p1["results"] + p2["results"]]
        assert got == [d for d, _s, _m in direct]
        assert not set(h["doc_id"] for h in p1["results"]) & set(
            h["doc_id"] for h in p2["results"]
        )
        try:
            urllib.request.urlopen(
                f"{srv.address}/search?q=spark&after=oops", timeout=30
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_http_wildcard(http_index):
    """?wildcard= expands via the portable translation and scores like
    search_terms over the expansion; ql wildcard atoms agree."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?wildcard=s%3Fa*&k=5", timeout=30
        ) as r:
            body = json.load(r)
        terms = srv.searcher.expand_wildcard("s?a*")
        assert body["expanded_terms"] == terms and len(terms) >= 2
        direct = srv.searcher.search_terms(terms, k=5, mode="or")
        assert [h["doc_id"] for h in body["results"]] == [
            d for d, _s, _m in direct
        ]
        # ql mid-string wildcard atom resolves the same expansion
        with urllib.request.urlopen(
            f"{srv.address}/search?ql=s%3Fa*&k=5", timeout=30
        ) as r:
            ql_body = json.load(r)
        assert [h["doc_id"] for h in ql_body["results"]] == [
            h["doc_id"] for h in body["results"]
        ]
        # wildcard-free pattern -> 400
        try:
            urllib.request.urlopen(
                f"{srv.address}/search?wildcard=plain", timeout=30
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_http_ql_hist(http_index):
    """?ql=&hist=doc_len&interval=N returns histogram buckets over the
    full qualifying set alongside the page."""
    from rse_spark.query.http import SearchServer
    from rse_spark.query.qlang import match_ql

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?ql=spark&hist=doc_len&interval=16",
            timeout=30,
        ) as r:
            body = json.load(r)
        qualified, _b = match_ql(srv.searcher, "spark")
        direct = srv.searcher.histogram(qualified, "doc_len", 16)
        assert [
            (b["key"], b["n_docs"])
            for b in body["hist"]["buckets"]
        ] == [(b, n) for b, n in direct]
        assert sum(
            b["n_docs"] for b in body["hist"]["buckets"]
        ) == len(qualified)
        # bad interval and conflicting views -> 400
        for bad in (
            "ql=spark&hist=doc_len",
            "ql=spark&hist=doc_len&interval=0",
            "ql=spark&hist=doc_len&interval=16&facets=lang",
        ):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?{bad}", timeout=30
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_http_sort(http_index):
    """?q=&sort=field orders by attribute instead of relevance."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark&sort=doc_len&k=5",
            timeout=30,
        ) as r:
            body = json.load(r)
        direct = srv.searcher.search_sorted("spark", "doc_len", k=5)
        assert [(h["doc_id"], h["value"]) for h in body["results"]] \
            == [(d, v) for d, v in direct]
        vals = [h["value"] for h in body["results"]]
        assert vals == sorted(vals, reverse=True)
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark&sort=doc_len&order=asc&k=5",
            timeout=30,
        ) as r:
            asc = json.load(r)["results"]
        assert [h["value"] for h in asc] == sorted(
            h["value"] for h in asc
        )
        for bad in ("sort=doc_len&order=sideways", "sort=nope"):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?q=spark&{bad}", timeout=30
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_http_ql_stats(http_index):
    """?ql=&stats=facet:value returns per-group numeric stats over the
    full qualifying set."""
    from rse_spark.query.http import SearchServer
    from rse_spark.query.qlang import match_ql

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?ql=spark&stats=lang:doc_len",
            timeout=30,
        ) as r:
            body = json.load(r)
        qualified, _b = match_ql(srv.searcher, "spark")
        direct = srv.searcher.facet_stats(
            qualified, "lang", "doc_len"
        )
        assert [
            (g["value"], g["n_docs"], g["min"], g["max"])
            for g in body["stats"]["groups"]
        ] == [(v, n, lo, hi) for v, n, _m, lo, hi in direct]
        assert sum(
            g["n_docs"] for g in body["stats"]["groups"]
        ) == len(qualified)
        for bad in ("stats=lang", "stats=lang:nope",
                    "stats=lang:doc_len&facets=lang"):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?ql=spark&{bad}", timeout=30
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_http_dismax(http_index):
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&dismax=0.3&k=5",
            timeout=30,
        ) as r:
            body = json.load(r)
        direct = srv.searcher.search_dismax(
            "spark join", k=5, tiebreak=0.3
        )
        assert [h["doc_id"] for h in body["results"]] == [
            d for d, _s, _m in direct
        ]
        assert body["mode"] == "dismax:0.3"
        for bad in ("dismax=abc", "dismax=1.5"):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?q=spark&{bad}", timeout=30
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()


def test_http_terms_enum_and_fvf(http_index):
    """/terms = ES _terms_enum (dictionary-only prefix autocomplete
    with df); ?fvf= shapes the ranking server-side and rejects unknown
    factor names with a 400."""
    from rse_spark.query.http import SearchServer

    srv = SearchServer(http_index, analyzer="simple").start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/terms?prefix=s&n=10", timeout=10
        ) as r:
            body = json.load(r)
        assert 0 < len(body["terms"]) <= 10
        assert all(t["term"].startswith("s") for t in body["terms"])
        assert all(t["df"] >= 1 for t in body["terms"])
        assert [t["term"] for t in body["terms"]] == sorted(
            t["term"] for t in body["terms"]
        )
        # df must agree with what /count reports for the same term
        probe = body["terms"][0]["term"]
        with urllib.request.urlopen(
            f"{srv.address}/count?q={probe}", timeout=30
        ) as r:
            assert json.load(r)["count"] == body["terms"][0]["df"]
        try:
            urllib.request.urlopen(
                f"{srv.address}/terms?prefix=", timeout=10
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # fvf: same doc set as the unshaped query, shaped scores
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&k=5&fvf=ln1p_dlen",
            timeout=30,
        ) as r:
            shaped = json.load(r)["results"]
        direct = srv.searcher.search("spark join", k=5, fvf="ln1p_dlen")
        assert [h["doc_id"] for h in shaped] == [d for d, _, _ in direct]
        try:
            urllib.request.urlopen(
                f"{srv.address}/search?q=spark&fvf=nope", timeout=30
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
