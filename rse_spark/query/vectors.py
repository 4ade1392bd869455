"""In-memory dense-vector store for the serving replica.

The serving tier's half of hybrid (lexical + semantic) retrieval: one
float64 matrix loaded from a parquet embeddings table, rows
L2-normalized once at load so cosine top-k is a single matvec.
Brute-force exact search is the right primitive at the REPLICA level —
a per-shard slice of up to a few million small vectors is one
cache-friendly BLAS call — while the cluster-scale candidate pruning
stays in the declarative ANN paths (harness.q_ann_lsh_topk /
q_ann_ivf_topk: LSH band buckets and IVF cells built as Spark jobs),
mirroring how the posting index pairs a Spark build with a pyarrow
serving replica.

Reference parity: GSE has no vector search (crawler/src/api/main.go
ranks by keyword count + backlinks only); this is part of the
LLM-pipeline surface the contract adds on top, the serving twin of
harness.q_hybrid_rrf.
"""

from __future__ import annotations

import os


class VectorStore:
    """Exact cosine top-k over an embeddings parquet table.

    ``path`` may be a single parquet file or a directory of parts; the
    id column must be unique. Vectors are stored L2-normalized in one
    contiguous float64 matrix, so a query costs one matvec + one
    kth-partition — no Python loop touches the vectors.
    """

    def __init__(self, path: str, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import numpy as np
        import pyarrow.dataset as pads

        if not os.path.exists(path):
            raise FileNotFoundError(path)
        tbl = pads.dataset(path, format="parquet").to_table(
            columns=[id_col, vec_col]
        )
        ids = tbl[id_col].to_numpy()
        # zero-copy load: a (fixed-size) list column is one contiguous
        # values buffer + offsets, so a uniform-width table reshapes
        # into the matrix without touching Python per row (the old
        # to_pylist() row loop dominated replica startup at 500k+
        # vectors). Ragged/nully input falls back to the row loop,
        # which raises the same loud error as before.
        import pyarrow as pa

        col = tbl[vec_col].combine_chunks()
        mat = None
        if pa.types.is_fixed_size_list(col.type) and col.null_count == 0:
            width = col.type.list_size
            flat = col.values.to_numpy(zero_copy_only=False)
            mat = np.asarray(flat, dtype=np.float64).reshape(
                len(col), width
            )
        elif (
            (pa.types.is_list(col.type) or pa.types.is_large_list(col.type))
            and col.null_count == 0
        ):
            offs = col.offsets.to_numpy()
            widths = np.diff(offs)
            if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
                flat = col.values.to_numpy(zero_copy_only=False)
                mat = np.asarray(
                    flat[offs[0]:offs[-1]], dtype=np.float64
                ).reshape(len(col), int(widths[0]))
        if mat is None:
            # fixed-width stack; ragged input raises loudly here rather
            # than producing an object array that silently kills the BLAS
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in col.to_pylist()]
            )
            if mat.ndim != 2:
                raise ValueError(
                    f"embeddings in {path} are not fixed-width "
                    f"(got shape {mat.shape})"
                )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors score 0 against all
        self.ids = np.asarray(ids, dtype=np.int64)
        if len(np.unique(self.ids)) != len(self.ids):
            raise ValueError(f"duplicate {id_col} in {path}")
        self.matrix = mat / norms[:, None]
        self._row_of = {int(i): r for r, i in enumerate(self.ids)}
        self.dim = mat.shape[1]

    def __len__(self) -> int:
        return len(self.ids)

    def vector(self, vid: int):
        """The stored (normalized) vector for one id."""
        row = self._row_of.get(int(vid))
        if row is None:
            raise KeyError(f"unknown vector id {vid}")
        return self.matrix[row]

    def topk(self, qv, k: int = 10, exclude: "set[int] | None" = None):
        """[(id, cosine)] exact top-k by cosine, ties broken by id
        asc — the same (score desc, id asc) contract as the posting
        searcher, so fused ranks are deterministic."""
        import numpy as np

        q = np.asarray(qv, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn == 0.0:
            return []
        sims = self.matrix @ (q / qn)
        if exclude:
            mask = np.isin(self.ids, np.fromiter(
                (int(e) for e in exclude), dtype=np.int64,
            ))
            sims = np.where(mask, -np.inf, sims)
        n = len(sims)
        if k < n:
            kth = np.partition(sims, n - k)[n - k]
            cand = np.nonzero(sims >= kth)[0]
        else:
            cand = np.arange(n)
        order = sorted(
            cand.tolist(), key=lambda r: (-sims[r], self.ids[r])
        )[:k]
        return [
            (int(self.ids[r]), float(sims[r]))
            for r in order
            if sims[r] != -np.inf
        ]


    def build_lsh(self, n_bits: int = 8, seed: int = 42) -> None:
        """Partition the store into 2^n_bits sign-LSH cells (seeded
        random hyperplanes) — the replica's approximate scale path.

        Brute-force topk reads the whole matrix every query; fine to a
        few million rows, not beyond. With cells, a query probes only
        the buckets whose signature is within a Hamming radius of the
        query's, cutting the scanned fraction to roughly
        (1 + n_bits + ...) / 2^n_bits while keeping recall high for
        cosine neighbors (nearby vectors agree on most hyperplane
        signs). Deterministic: same seed -> same cells -> same
        results. Caveat shared by every LSH: i.i.d.-uniform vectors
        (no cluster structure) are the adversarial case — neighbors
        are barely nearer than strangers, so small probe radii lose
        recall; real embedding spaces are clustered, which is what
        the radius dial is for. The cluster-scale pre-filter
        (sharding the vector table itself) stays in the declarative
        ANN jobs (harness.q_ann_lsh_topk / q_ann_ivf_topk)."""
        import numpy as np

        if not 1 <= n_bits <= 24:
            raise ValueError("n_bits must be in [1, 24]")
        rng = np.random.default_rng(seed)
        self._lsh_planes = rng.standard_normal((self.dim, n_bits))
        bits = (self.matrix @ self._lsh_planes) >= 0.0
        self._lsh_codes = bits @ (1 << np.arange(n_bits))
        # rows grouped by cell: one argsort, then per-cell slices
        order = np.argsort(self._lsh_codes, kind="stable")
        codes_sorted = self._lsh_codes[order]
        starts = np.searchsorted(
            codes_sorted, np.arange(1 << n_bits), side="left"
        )
        ends = np.searchsorted(
            codes_sorted, np.arange(1 << n_bits), side="right"
        )
        self._lsh_cells = [
            order[s:e] for s, e in zip(starts, ends)
        ]
        self._lsh_bits = n_bits

    def topk_lsh(self, qv, k: int = 10, hamming: int = 1,
                 exclude: "set[int] | None" = None):
        """Approximate cosine top-k: exact scoring restricted to the
        cells within ``hamming`` bits of the query's LSH signature.
        ``hamming`` is the recall dial — n_bits (probe everything)
        makes it EXACTLY topk(). Requires build_lsh()."""
        import numpy as np

        if not hasattr(self, "_lsh_planes"):
            raise RuntimeError("call build_lsh() first")
        q = np.asarray(qv, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn == 0.0:
            return []
        qbits = (q @ self._lsh_planes) >= 0.0
        qcode = int(qbits @ (1 << np.arange(self._lsh_bits)))
        n_cells = 1 << self._lsh_bits
        pop = np.zeros(n_cells, dtype=np.int64)
        x = np.arange(n_cells) ^ qcode
        while x.any():
            pop += x & 1
            x >>= 1
        probe = np.nonzero(pop <= hamming)[0]
        rows = np.concatenate(
            [self._lsh_cells[c] for c in probe]
        ) if len(probe) else np.empty(0, dtype=np.int64)
        if not len(rows):
            return []
        sims = self.matrix[rows] @ (q / qn)
        ids = self.ids[rows]
        if exclude:
            mask = ~np.isin(ids, np.fromiter(
                (int(e) for e in exclude), dtype=np.int64,
            ))
            ids, sims = ids[mask], sims[mask]
        if not len(ids):
            return []
        if k < len(sims):
            kth = np.partition(sims, len(sims) - k)[len(sims) - k]
            cand = np.nonzero(sims >= kth)[0]
        else:
            cand = np.arange(len(sims))
        order = sorted(
            cand.tolist(), key=lambda r: (-sims[r], ids[r])
        )[:k]
        return [(int(ids[r]), float(sims[r])) for r in order]


RRF_K = 60  # ES 8.x rank_constant default


def rrf_fuse(ranked_lists, k: int = 10, rrf_k: int = RRF_K):
    """Reciprocal Rank Fusion over any number of ranked id lists:
    score(id) = sum over lists of 1/(rrf_k + rank). Pure rank algebra —
    no score calibration across modalities — identical to
    harness.q_hybrid_rrf's fuse. Returns
    [(id, rrf_score, [rank_or_0 per list])]."""
    scores: dict[int, float] = {}
    ranks: dict[int, list[int]] = {}
    n_lists = len(ranked_lists)
    for li, lst in enumerate(ranked_lists):
        for rank, did in enumerate(lst, start=1):
            did = int(did)
            scores[did] = scores.get(did, 0.0) + 1.0 / (rrf_k + rank)
            ranks.setdefault(did, [0] * n_lists)[li] = rank
    fused = sorted(scores, key=lambda d: (-scores[d], d))[:k]
    return [(d, scores[d], ranks[d]) for d in fused]
