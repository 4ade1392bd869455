"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline, all-JVM expressions
  (zip_with dot product inside whole-stage codegen, TakeOrdered k).
* LSH-bucketed ANN — random-hyperplane signatures with DETERMINISTIC
  md5-derived planes (no RNG state to ship); candidates come only from
  matching buckets (multi-probe over Hamming-1 neighbors optional), then
  exact cosine re-rank. The scale path: bucketing is one shuffle, query
  probes are partition-pruned lookups.
* cosine near-dup pairs: same buckets, pair join within buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB = "embedding"
DOUBLED = "transform({c}, x -> cast(x as double))"


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)"


def _norm2(a: str) -> str:
    return f"aggregate({a}, 0D, (s, x) -> s + x * x)"


def with_unit_vec(emb: DataFrame, emb_col: str = EMB) -> DataFrame:
    """Add v = l2-normalized double vector (cosine becomes a dot)."""
    d = DOUBLED.format(c=emb_col)
    return emb.withColumn(
        "v", F.expr(f"transform({d}, x -> x / sqrt({_norm2(d)}))")
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", emb_col: str = EMB) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    qlit = "array(" + ", ".join(f"{float(x)}D" for x in query_vec) + ")"
    d = DOUBLED.format(c=emb_col)
    cos = (
        f"{_dot(d, qlit)} / (sqrt({_norm2(d)}) * sqrt({_norm2(qlit)}))"
    )
    return (
        emb.withColumn("cosine", F.expr(cos))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) =
    (md5-nibble-sum of 'p:d') centered to zero mean. Reproducible across
    engines and runs with no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0xFFFFFFFF) - 0.5)
        planes.append(row)
    return planes


def lsh_signatures(emb: DataFrame, n_planes: int = 4, n_tables: int = 16,
                   id_col: str = "vec_id", emb_col: str = EMB) -> DataFrame:
    """(id, table, sig): standard multi-table hyperplane LSH — L
    independent tables of b sign bits each. One JVM projection computes
    all L*b dot products; output is L rows per vector."""
    first = emb.select(F.size(emb_col).alias("n")).first()
    dim = int(first["n"])
    planes = hyperplanes(n_tables * n_planes, dim)
    d = DOUBLED.format(c=emb_col)
    sig_cols = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            plit = "array(" + ", ".join(
                f"{x}D" for x in planes[t * n_planes + p]
            ) + ")"
            bits.append(f"CASE WHEN {_dot(d, plit)} > 0 THEN '1' ELSE '0' END")
        sig_cols.append(
            f"struct({t} AS table, concat({', '.join(bits)}) AS sig)"
        )
    return emb.select(
        id_col,
        F.explode(F.expr("array(" + ", ".join(sig_cols) + ")")).alias("ts"),
    ).select(id_col, F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))


def _query_sigs(query_vec: list[float], n_planes: int, n_tables: int) -> list[tuple[int, str]]:
    planes = hyperplanes(n_tables * n_planes, len(query_vec))

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    out = []
    for t in range(n_tables):
        sig = "".join(
            "1" if dot(planes[t * n_planes + p], query_vec) > 0 else "0"
            for p in range(n_planes)
        )
        out.append((t, sig))
    return out


def lsh_ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 4, n_tables: int = 16,
                 id_col: str = "vec_id", emb_col: str = EMB) -> DataFrame:
    """ANN top-k: candidates = union of the query's bucket across the L
    tables, then exact cosine re-rank inside the candidate set.

    Returns (id, cosine). Recall < 1 by design; tested against the
    brute-force baseline for recall@k. At scale the signatures table is
    bucketed storage and each probe is a partition-pruned lookup."""
    sigs = lsh_signatures(emb, n_planes, n_tables, id_col, emb_col)
    probes = _query_sigs(query_vec, n_planes, n_tables)
    spark = emb.sparkSession
    probe_df = F.broadcast(
        spark.createDataFrame(probes, "table int, sig string")
    )
    cands = emb.join(
        sigs.join(probe_df, ["table", "sig"], "left_semi")
        .select(id_col)
        .distinct(),
        id_col,
        "left_semi",
    )
    return cosine_topk(cands, query_vec, k, id_col, emb_col)


def kmeans_core(x, n_clusters: int = 16, iters: int = 8) -> list[list[float]]:
    """Lloyd's k-means on an (n, dim) float64 array — the deterministic
    numpy quantizer-training kernel shared by the Spark operator and the
    DuckDB oracle generator (identical input -> bit-identical
    centroids). Rows are l2-normalized first; init is the deterministic
    every-(n/k)-th-sample spread."""
    import numpy as np

    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    step = max(1, len(x) // n_clusters)
    c = x[::step][:n_clusters].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return [list(map(float, row)) for row in c]


def kmeans_centroids(emb: DataFrame, n_clusters: int = 16, iters: int = 8,
                     sample_n: int = 4096, id_col: str = "vec_id",
                     emb_col: str = EMB) -> list[list[float]]:
    """Train the IVF coarse quantizer: Lloyd's k-means over a
    deterministic sample (first ``sample_n`` ids), numpy on the driver.

    The centroid table is k x dim — kilobytes — so training on a sample
    and broadcasting is the standard IVF recipe; only the ASSIGNMENT
    pass (ivf_assign) touches the full table, distributed."""
    import numpy as np

    rows = (
        emb.orderBy(id_col).limit(sample_n).select(emb_col).collect()
    )
    x = np.asarray([list(map(float, r[0])) for r in rows], dtype=np.float64)
    return kmeans_core(x, n_clusters=n_clusters, iters=iters)


def ivf_probes(centroids: list[list[float]], query_vec: list[float],
               nprobe: int) -> list[int]:
    """The ``nprobe`` centroid ids nearest the (normalized) query —
    shared by ivf_ann_topk and the oracle generator."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    c = np.asarray(centroids)
    order = np.argsort(((c - q[None, :]) ** 2).sum(axis=1))
    return [int(i) for i in order[:nprobe]]


def _sq_dist(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " 0D, (s, v) -> s + v)"
    )


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", emb_col: str = EMB) -> DataFrame:
    """+ cluster column: argmin centroid distance as one JVM expression
    (array of (dist, cid) structs, array_sort, take [0]) over the
    l2-normalized vector — whole-stage codegen, no Python."""
    unit = with_unit_vec(emb, emb_col)
    cells = []
    for cid, cvec in enumerate(centroids):
        clit = "array(" + ", ".join(f"{x}D" for x in cvec) + ")"
        cells.append(
            f"struct({_sq_dist('v', clit)} AS d, {cid} AS cid)"
        )
    return unit.withColumn(
        "cluster",
        F.expr(f"array_sort(array({', '.join(cells)}))[0].cid"),
    ).drop("v")


def ivf_ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_clusters: int = 16, nprobe: int = 4,
                 centroids: list[list[float]] | None = None,
                 id_col: str = "vec_id", emb_col: str = EMB) -> DataFrame:
    """IVF ANN: candidates = vectors assigned to the query's ``nprobe``
    nearest centroids, exact cosine re-rank inside them. nprobe ==
    n_clusters degrades to exact search (recall 1.0) — the standard
    recall/latency dial. At scale the assignment table is written
    partitioned by cluster, so a probe is a partition-pruned scan."""
    if centroids is None:
        centroids = kmeans_centroids(
            emb, n_clusters=n_clusters, id_col=id_col, emb_col=emb_col
        )
    probe = ivf_probes(centroids, query_vec, nprobe)
    assigned = ivf_assign(emb, centroids, id_col, emb_col)
    cands = assigned.filter(F.col("cluster").isin(probe)).drop("cluster")
    return cosine_topk(cands, query_vec, k, id_col, emb_col)


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                         n_planes: int = 6, n_tables: int = 8,
                         id_col: str = "vec_id", emb_col: str = EMB,
                         max_bucket: int = 1000) -> DataFrame:
    """(id_a, id_b, cosine >= threshold): embedding near-dup pairs via
    LSH buckets — exact cosine computed only inside (table, sig)
    buckets; a near-dup pair (cosine ~1) lands in the same bucket of
    virtually every table."""
    from pyspark.sql import Window

    unit = with_unit_vec(emb, emb_col)
    sigs = lsh_signatures(
        emb, n_planes=n_planes, n_tables=n_tables,
        id_col=id_col, emb_col=emb_col,
    )
    bucketed = unit.join(sigs, id_col).withColumn(
        "n", F.count("*").over(Window.partitionBy("table", "sig"))
    ).filter(F.col("n") <= max_bucket)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), "table", "sig"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "table", "sig"
    )
    return (
        a.join(b, ["table", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", F.expr(_dot("va", "vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
