"""Deduplication operators for large-scale corpus curation.

All are pure DataFrame compositions (JVM-side, shuffle-conscious):

* exact:       one groupBy on a content hash — no pairwise compares.
* MinHash+LSH: shingle -> md5 minhash signatures -> band buckets ->
               candidate pairs only within equal band hashes (the
               classic sub-quadratic near-dup join).
* SimHash:     64-bit sign-of-weighted-bit-sums fingerprint; near-dups
               share the fingerprint (or differ in few bits).
* n-gram Jaccard: exact pair similarity, restricted to pairs that share
               at least one shingle (join on shingle, never a cross
               join).

Scale notes: every self-join here joins on a HASH key (shingle, band
hash, fingerprint), so co-occurrence is bounded by bucket size, not
corpus size; a 'the quick brown'-like hot shingle is capped with a
frequency filter before the join (stop-shingle removal), the standard
guard against quadratic blowup in LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(fp, n_dups, keeper_doc_id): hash-groupBy exact dedup."""
    return docs.groupBy(F.md5(content_col).alias("fp")).agg(
        F.count("*").alias("n_dups"),
        F.min(id_col).alias("keeper_doc_id"),
    )


def word_shingles(docs: DataFrame, n: int = 3, content_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct word n-grams per doc — all JVM."""
    sp = F.split(F.col(content_col), " ")
    parts = [f"sp[i{'+' + str(j) if j else ''}]" for j in range(n)]
    expr = (
        f"transform(sequence(0, size(sp)-{n}), i -> "
        f"concat_ws(' ', {', '.join(parts)}))"
    )
    return (
        docs.withColumn("sp", sp)
        .select(
            id_col,
            F.explode(
                F.when(F.size("sp") >= n, F.expr(expr)).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(shingled: DataFrame, n_hashes: int = 16,
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, seed, minhash): md5(seed:shingle) min per seed.

    md5 is deterministic across engines (same values in the DuckDB
    oracle) and uniform enough for LSH purposes."""
    return (
        shingled.select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
            "shingle",
        )
        .withColumn(
            "h",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), "shingle")),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 16,
                        bands: int = 4, id_col: str = "doc_id",
                        max_bucket: int = 200) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands): docs sharing >=1 LSH band bucket.

    rows_per_band = n_hashes/bands; band hash = md5 over the band's
    minhashes in seed order. Buckets larger than ``max_bucket`` are
    dropped (hot-bucket guard — at web scale a boilerplate band bucket
    can hold millions of docs and would otherwise explode the
    self-join quadratically)."""
    rows_per_band = n_hashes // bands
    banded = (
        signatures.withColumn(
            "band", (F.col("seed") / rows_per_band).cast("int")
        )
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", F.col("seed").cast("string"), "minhash")
                        )
                    ),
                )
            ).alias("band_hash")
        )
    )
    sized = banded.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band", "band_hash")),
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select(
        F.col(id_col).alias("doc_a"), "band", "band_hash"
    )
    b = sized.select(
        F.col(id_col).alias("doc_b"), "band", "band_hash"
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        content_col: str = "text",
                        id_col: str = "doc_id",
                        max_shingle_df: int = 1000) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact n-gram Jaccard over pairs sharing
    a shingle. Hot shingles (df > max_shingle_df) are excluded from the
    pair-generating join (they contribute ~0 discrimination and O(df^2)
    pairs) but kept in the per-doc sizes, making the estimate
    conservative-exact for rare-shingle pairs."""
    sh = word_shingles(docs, n, content_col, id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    hot = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_shingle_df)
        .select("shingle")
    )
    cold = sh.join(hot, "shingle", "left_anti")
    a = cold.select(F.col(id_col).alias("doc_a"), "shingle")
    b = cold.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")  # unrounded: callers that
        # ORDER BY jaccard must sort the exact value (rounding first can
        # flip ties at a top-k boundary); round only in final output
    )


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-dup pair
    edges — the dedup CLUSTERING step (candidate pairs -> groups, keep
    one representative per group). cluster_id = min doc_id in the
    component.

    Min-label propagation to fixpoint: each round every node takes the
    min of its own and its neighbors' labels (one join + one groupBy on
    the symmetrized edges — the standard large-scale CC loop), followed
    by one pointer-jumping step (label <- label(label)) that halves
    min-path lengths, so convergence is O(log diameter) rounds instead
    of O(diameter) — a chain of 10^6 near-dups converges in ~20 rounds,
    not 10^6. localCheckpoint per round keeps lineage flat; the loop
    exits on the first round with zero changes and RAISES if max_iter
    rounds pass without convergence (a silent exit would return wrong
    cluster_ids)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
            .withColumnRenamed("a", "node")
        )
        new_labels = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("label"),
                F.coalesce("nbr_min", F.col("label")),
            ).alias("label"),
        )
        # pointer jumping: follow one extra hop through the label's own
        # label (labels are always node ids, so the self-join hits)
        ptr = new_labels.select(
            F.col("node").alias("label"), F.col("label").alias("ll")
        )
        new_labels = (
            new_labels.join(ptr, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("ll", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old"), "node"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components: {changed} labels still changing "
            f"after {max_iter} rounds — raise max_iter (components with "
            f"min-path > 2^{max_iter} hops cannot exist in practice; "
            f"this indicates a bug or pathological input)"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _nibble_bits(hash_col: str, n_bits: int):
    """SQL expr: bit i (0-based, MSB-first per nibble) of a hex digest."""
    return (
        f"transform(sequence(0, {n_bits - 1}), i -> "
        f"shiftright("
        f"  position(substring({hash_col}, cast(i/4 as int)+1, 1) IN '0123456789abcdef') - 1,"
        f"  3 - cast(i % 4 as int)) & 1)"
    )


def simhash(docs: DataFrame, n_bits: int = 48, content_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash_bits array<int>, simhash string): tf-weighted
    sign-sum SimHash over md5 token hashes — pure JVM expressions.

    n_bits <= 60 so downstream packing fits a signed long; bit i comes
    from nibble i/4 of the token's md5 hex."""
    toks = docs.select(
        id_col, F.explode(F.split(content_col, " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    with_bits = tf.withColumn("h", F.md5("term")).withColumn(
        "bits", F.expr(_nibble_bits("h", n_bits))
    )
    # per bit: sum tf*(2b-1); sign -> bit
    exploded = with_bits.select(
        id_col,
        "tf",
        F.posexplode("bits").alias("bit_pos", "bit"),
    )
    sums = exploded.groupBy(id_col, "bit_pos").agg(
        F.sum(F.col("tf") * (2 * F.col("bit") - 1)).alias("s")
    )
    return (
        sums.withColumn("b", (F.col("s") > 0).cast("int"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("bit_pos", "b"))
                ),
                lambda x: x["b"],
            ).alias("simhash_bits")
        )
        .withColumn(
            "simhash",
            F.concat_ws("", F.transform("simhash_bits", lambda b: b.cast("string"))),
        )
    )
