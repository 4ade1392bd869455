"""Hybrid lexical+semantic serving: VectorStore + RRF fusion.

The serving twin of harness.q_hybrid_rrf: BM25 candidates from the
posting index, cosine candidates from an embeddings table, fused by
Reciprocal Rank Fusion — covering the id-space bridge (index-internal
ids -> source ids via docs_meta) and the HTTP ?q=&knn= page.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from rse_spark.query.vectors import VectorStore, rrf_fuse

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def vstore():
    return VectorStore(EMB)


@pytest.fixture(scope="module")
def hybrid_root(spark, tmp_path_factory):
    from rse_spark.streaming.stream_index import append_batch

    root = str(tmp_path_factory.mktemp("hybrid_idx"))
    docs = spark.read.parquet(DOCS)
    append_batch(spark, docs, root, analyzer="simple",
                 content_col="text")
    return root


def _brute_cosine(qv, exclude=()):
    import pyarrow.parquet as pq

    t = pq.read_table(EMB)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.asarray(qv, dtype=np.float64)
    cos = (mat @ q) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
    )
    pairs = [
        (int(i), float(c)) for i, c in zip(ids, cos)
        if int(i) not in exclude
    ]
    pairs.sort(key=lambda p: (-p[1], p[0]))
    return pairs


def test_vector_store_topk_exact(vstore):
    qv = vstore.vector(0)
    got = vstore.topk(qv, k=10, exclude={0})
    want = _brute_cosine(qv, exclude={0})[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, c1), (_, c2) in zip(got, want):
        assert abs(c1 - c2) < 1e-9
    # k >= n returns everything but the excluded id, still ordered
    all_hits = vstore.topk(qv, k=10_000, exclude={0})
    assert len(all_hits) == len(vstore) - 1


def test_vector_store_validation(tmp_path, vstore):
    import pyarrow as pa
    import pyarrow.parquet as pq

    with pytest.raises(KeyError):
        vstore.vector(10_000_000)
    # zero query vector matches nothing rather than dividing by zero
    assert vstore.topk(np.zeros(vstore.dim)) == []
    dup = tmp_path / "dup.parquet"
    pq.write_table(
        pa.table({"vec_id": [1, 1], "embedding": [[1.0], [2.0]]}), dup
    )
    with pytest.raises(ValueError, match="duplicate"):
        VectorStore(str(dup))
    with pytest.raises(FileNotFoundError):
        VectorStore(str(tmp_path / "missing.parquet"))


def test_rrf_fuse_algebra():
    fused = rrf_fuse([[1, 2, 3], [2, 9]], k=10)
    by_id = {d: (s, r) for d, s, r in fused}
    # doc 2 appears in both lists: rank 2 and rank 1
    assert abs(by_id[2][0] - (1 / 62 + 1 / 61)) < 1e-12
    assert by_id[2][1] == [2, 1]
    assert by_id[9][1] == [0, 2]
    # both-list doc outranks any single-list doc here
    assert fused[0][0] == 2


def test_search_hybrid_rrf_matches_manual(hybrid_root, vstore):
    import pyarrow.dataset as pads

    from rse_spark.query.serve import DirectSearcher

    s = DirectSearcher(hybrid_root, analyzer="simple")
    q = "spark join filter"
    n = 20
    # manual expectation: text hits mapped to source ids via an
    # INDEPENDENT docs_meta read, vectors brute-forced from parquet
    hits = s.search(q, k=n)
    meta = pads.dataset(
        f"{hybrid_root}/enriched", format="parquet", partitioning="hive"
    ).to_table(columns=["doc_id", "src_doc_id"])
    m = dict(zip(meta["doc_id"].to_pylist(),
                 meta["src_doc_id"].to_pylist()))
    text_ids = [int(m[d]) for d, *_ in hits]
    qv = vstore.vector(0)
    vec_ids = [d for d, _ in _brute_cosine(qv, exclude={0})[:n]]
    want = rrf_fuse([text_ids, vec_ids], k=10)
    got = s.search_hybrid_rrf(
        q, vstore, query_id=0, k=10, n_candidates=n,
        key_col="src_doc_id",
    )
    assert [(d, tr, vr) for d, _s, tr, vr in got] == [
        (d, r[0], r[1]) for d, _s, r in want
    ]
    for (_, s1, _, _), (_, s2, _) in zip(got, want):
        assert abs(s1 - s2) < 1e-12
    # the fused page must actually mix modalities at this corpus size
    assert any(tr == 0 for _, _, tr, _ in got) or any(
        vr == 0 for _, _, _, vr in got
    )
    with pytest.raises(ValueError, match="query_vec"):
        s.search_hybrid_rrf(q, vstore, k=10)
    with pytest.raises(ValueError, match="n_candidates"):
        s.search_hybrid_rrf(q, vstore, query_id=0, n_candidates=0)


def test_http_hybrid_knn(hybrid_root):
    from rse_spark.query.http import SearchServer

    srv = SearchServer(
        hybrid_root, analyzer="simple", vectors_path=EMB,
        key_col="src_doc_id",
    ).start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&knn=0&k=5", timeout=30
        ) as r:
            body = json.load(r)
        assert body["mode"] == "hybrid_rrf" and body["n_results"] == 5
        direct = srv.searcher.search_hybrid_rrf(
            "spark join", srv.vstore, query_id=0, k=5,
            key_col="src_doc_id",
        )
        assert [h["id"] for h in body["results"]] == [
            d for d, *_ in direct
        ]
        for bad in ("knn=notanint", "knn=99999999"):
            try:
                urllib.request.urlopen(
                    f"{srv.address}/search?q=spark&{bad}", timeout=30
                )
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.stop()
    # without a vector table the same request is a clean 400
    srv2 = SearchServer(hybrid_root, analyzer="simple").start()
    try:
        try:
            urllib.request.urlopen(
                f"{srv2.address}/search?q=spark&knn=0", timeout=30
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv2.stop()


def test_cli_serve_smoke_with_vectors(hybrid_root):
    """cli serve --vectors-path wires the hybrid page end-to-end
    (smoke: start, resolve, stop)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "rse_spark.cli", "serve",
         "--root", hybrid_root, "--analyzer", "simple",
         "--vectors-path", EMB, "--key-col", "src_doc_id",
         "--smoke"],
        capture_output=True, text=True, check=True, timeout=120,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["serving"].startswith("http://")


def test_vector_store_lsh_modes(vstore, tmp_path):
    """topk_lsh: probing every cell (hamming = n_bits) is EXACTLY the
    brute-force answer on any data; on clustered data (where LSH is
    meaningful) a radius-1 probe keeps high recall at a fraction of
    the scan. The sf0.001 fixture's vectors are i.i.d. random — the
    adversarial case for any LSH — so recall there is only
    sanity-checked loosely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vstore.build_lsh(n_bits=6, seed=42)
    qv = vstore.vector(3)
    exact = vstore.topk(qv, k=10, exclude={3})
    # full probe == exact (same tie-break contract), on ANY data
    assert vstore.topk_lsh(qv, k=10, hamming=6, exclude={3}) == exact
    # returned cosines are always TRUE cosines (scoring is exact,
    # only the candidate set is approximate)
    truth = dict(exact)
    for d, c in vstore.topk_lsh(qv, k=10, hamming=2, exclude={3}):
        if d in truth:
            assert abs(c - truth[d]) < 1e-12

    # clustered data: 4 centroids + small noise -> radius-1 recall
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((4, 32)) * 3.0
    vecs = np.concatenate([
        cents[i % 4] + rng.standard_normal(32) * 0.2
        for i in range(200)
    ]).reshape(200, 32)
    path = tmp_path / "clustered.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(range(200), type=pa.int64()),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
    }), path)
    cv = VectorStore(str(path))
    cv.build_lsh(n_bits=6, seed=42)
    hits, total = 0, 0
    for probe in (0, 4, 8, 12):
        q = cv.vector(probe)
        ex = {d for d, _ in cv.topk(q, k=10, exclude={probe})}
        ap = cv.topk_lsh(q, k=10, hamming=1, exclude={probe})
        hits += sum(1 for d, _ in ap if d in ex)
        total += 10
    assert hits / total >= 0.8, f"clustered recall@10 = {hits}/{total}"

    with pytest.raises(RuntimeError, match="build_lsh"):
        VectorStore(EMB).topk_lsh(qv)
    with pytest.raises(ValueError, match="n_bits"):
        vstore.build_lsh(n_bits=0)


def test_hybrid_lsh_mode(hybrid_root, vstore):
    """lsh_hamming threads the approximate vector path into the
    hybrid fuse: a full-radius probe reproduces the exact hybrid page
    bit-for-bit; without built cells the request fails loudly."""
    from rse_spark.query.http import SearchServer
    from rse_spark.query.serve import DirectSearcher

    s = DirectSearcher(hybrid_root, analyzer="simple")
    vstore.build_lsh(n_bits=6, seed=42)
    exact = s.search_hybrid_rrf(
        "spark join", vstore, query_id=0, k=10, key_col="src_doc_id"
    )
    full = s.search_hybrid_rrf(
        "spark join", vstore, query_id=0, k=10, key_col="src_doc_id",
        lsh_hamming=6,
    )
    assert full == exact
    fresh = VectorStore(EMB)
    with pytest.raises(RuntimeError, match="build_lsh"):
        s.search_hybrid_rrf(
            "spark join", fresh, query_id=0, lsh_hamming=1,
        )
    # HTTP: server with cells answers ?knn_hamming=; without -> 400
    srv = SearchServer(
        hybrid_root, analyzer="simple", vectors_path=EMB,
        key_col="src_doc_id", vector_lsh_bits=6,
    ).start()
    try:
        with urllib.request.urlopen(
            f"{srv.address}/search?q=spark+join&knn=0&knn_hamming=6"
            f"&k=10", timeout=30,
        ) as r:
            body = json.load(r)
        assert [h["id"] for h in body["results"]] == \
            [d for d, *_ in exact]
    finally:
        srv.stop()
    srv2 = SearchServer(
        hybrid_root, analyzer="simple", vectors_path=EMB,
        key_col="src_doc_id",
    ).start()
    try:
        try:
            urllib.request.urlopen(
                f"{srv2.address}/search?q=spark&knn=0&knn_hamming=1",
                timeout=30,
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # /stats reports the mounted vector table (no LSH cells here)
        with urllib.request.urlopen(
            f"{srv2.address}/stats", timeout=10
        ) as r:
            vec = json.load(r)["vectors"]
        assert vec["n"] > 0 and vec["dim"] == 64
        assert vec["lsh_bits"] is None
    finally:
        srv2.stop()
