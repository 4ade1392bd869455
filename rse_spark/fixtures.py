"""Deterministic synthetic code corpus + reference query set.

The engine's primary input is an Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint) — the
Spark analogue of GSE's ``pages`` table (reference
crawler/src/postgres/init_db.sql:1-8). The sandbox has no live corpus,
so this module synthesizes one deterministically (seeded numpy PCG64,
no wall-clock, no network) per FIXTURES.md §1-2:

* identifiers mix camelCase / snake_case / plain words;
* token frequencies are Zipf-distributed so stop-word-like hot terms
  exist (skew-handling tests per BASELINE.json north_rule);
* doc length ~ lognormal clipped to [20, 2000] tokens;
* the query set mixes raw identifiers, split-needed forms, hot terms
  and absent terms (zero-hit path) — the analogue of GSE's ``q``
  parameter (crawler/src/api/main.go:209).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42

_LANGS = ["py", "go", "java", "rs", "js", "md"]
_LANG_W = [0.3, 0.15, 0.2, 0.1, 0.15, 0.1]

_KEYWORDS = [
    "def", "return", "func", "class", "import", "for", "while", "if",
    "else", "var", "let", "const", "struct", "impl", "match", "pub",
    "static", "void", "int", "string", "self", "this", "new", "nil",
    "true", "false", "err", "error", "print", "len",
]

_ROOTS = [
    "parse", "build", "index", "query", "token", "merge", "score", "rank",
    "fetch", "cache", "batch", "shard", "split", "count", "write", "read",
    "load", "store", "hash", "sort", "scan", "join", "group", "filter",
    "map", "reduce", "emit", "flush", "close", "open", "init", "config",
    "handle", "serve", "route", "crawl", "link", "page", "term", "doc",
    "list", "node", "tree", "heap", "queue", "stack", "block", "chunk",
    "frame", "field", "value", "key", "meta", "stat", "util", "test",
]
_SUFFIXES = ["er", "ing", "ed", "s", "ation", "or", ""]


def _build_vocab(rng: np.random.Generator, size: int = 4000) -> list[str]:
    """Deterministic identifier vocabulary (camel + snake + plain)."""
    vocab: list[str] = list(_KEYWORDS)
    seen = set(vocab)
    while len(vocab) < size:
        style = rng.integers(0, 4)
        parts = [
            _ROOTS[rng.integers(0, len(_ROOTS))]
            + _SUFFIXES[rng.integers(0, len(_SUFFIXES))]
            for _ in range(int(rng.integers(1, 4)))
        ]
        if style == 0:  # camelCase
            w = parts[0] + "".join(p.capitalize() for p in parts[1:])
        elif style == 1:  # snake_case
            w = "_".join(parts)
        elif style == 2:  # PascalCase
            w = "".join(p.capitalize() for p in parts)
        else:  # plain
            w = parts[0]
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def gen_code_corpus(sf: float = 0.001, seed: int = SEED) -> pd.DataFrame:
    """Synthesize the (repo, path, commit, lang, content) corpus at ``sf``.

    n_docs = round(500_000 * sf): 500 @ sf0.001, 5_000 @ sf0.01,
    50_000 @ sf0.1 (FIXTURES.md §1).
    """
    n_docs = max(10, int(round(500_000 * sf)))
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.asarray(_build_vocab(rng), dtype=object)

    # Zipf-ish rank weights over the vocab (s ~ 1.07, like natural text).
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.07
    probs /= probs.sum()

    lengths = np.clip(
        rng.lognormal(mean=4.6, sigma=0.8, size=n_docs), 20, 2000
    ).astype(np.int64)
    total = int(lengths.sum())
    stream = rng.choice(len(vocab), size=total, p=probs)
    words = vocab[stream]

    offsets = np.concatenate(([0], np.cumsum(lengths)))
    contents = [
        " ".join(words[offsets[i]: offsets[i + 1]]) for i in range(n_docs)
    ]

    idx = np.arange(n_docs)
    repos = [f"org{i % 7}/repo{i % 97}" for i in idx]
    langs = rng.choice(_LANGS, size=n_docs, p=_LANG_W)
    paths = [
        f"src/{_ROOTS[i % len(_ROOTS)]}/{_ROOTS[(i * 7 + 3) % len(_ROOTS)]}{i}.{langs[i]}"
        for i in idx
    ]
    commits = [
        hashlib.sha1(f"{seed}:{repos[i]}:{paths[i]}".encode()).hexdigest()
        for i in idx
    ]
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def gen_query_set(sf: float = 0.001, n_queries: int = 50, seed: int = SEED) -> pd.DataFrame:
    """The reference query set (FIXTURES.md §2): 1-5 terms per query."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    vocab = _build_vocab(np.random.Generator(np.random.PCG64(seed)))
    hot = _KEYWORDS[:10]
    absent = ["zzzmissingterm", "qqqnotfound", "unseenXyzzy"]
    rows = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        terms = []
        for _ in range(n_terms):
            bucket = rng.random()
            if bucket < 0.15:
                terms.append(hot[rng.integers(0, len(hot))])
            elif bucket < 0.22:
                terms.append(absent[rng.integers(0, len(absent))])
            else:
                terms.append(vocab[rng.integers(0, len(vocab))])
        rows.append({"query_id": qid, "query_text": " ".join(terms), "k": 10})
    return pd.DataFrame(rows)


_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache", "corpus")


def corpus_path(sf: float, seed: int = SEED) -> str:
    """Materialize (once) and return the parquet path for the corpus at sf.

    Large scale factors are generated in chunks (bounded memory) and
    written as multiple row groups so Spark gets parallel input splits.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR, f"code_files_sf{sf}_seed{seed}.parquet")
    if os.path.exists(path):
        return path
    chunk_sf = 0.05  # 25k docs per chunk
    if sf <= chunk_sf:
        gen_code_corpus(sf, seed).to_parquet(path, index=False, row_group_size=8192)
        return path
    n_chunks = int(round(sf / chunk_sf))
    tmp = path + ".tmp"
    writer = None
    try:
        for i in range(n_chunks):
            pdf = gen_code_corpus(chunk_sf, seed + 1000 * i)
            # re-key repo/path so chunks don't collide on (repo,path,commit)
            pdf["path"] = [f"c{i}/{p}" for p in pdf["path"]]
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            if writer is None:
                writer = pq.ParquetWriter(tmp, table.schema)
            writer.write_table(table, row_group_size=8192)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, path)
    return path


def load_corpus(spark: SparkSession, sf: float, seed: int = SEED) -> DataFrame:
    """Spark DataFrame of the synthetic corpus (cached parquet-backed)."""
    return spark.read.parquet(corpus_path(sf, seed))
