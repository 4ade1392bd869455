"""Independent brute-force BM25 oracle (pure pandas — no Spark).

Used by the golden/parity tests (SURVEY.md §5.2): same tokenizer SPEC,
completely independent retrieval + scoring code path. Rank-identity is
asserted with deterministic tie-breaks (score desc, doc_id asc).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from rse_spark.index.codec import B, K1
from rse_spark.tokenizer import tokenize


def bm25_oracle(
    docs: pd.DataFrame,
    qtext: str,
    k: int = 10,
    mode: str = "or",
    analyzer: str = "code",
    content_col: str = "content",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> pd.DataFrame:
    """Exhaustive BM25 over a pandas corpus -> top-k (doc_id, score)."""
    toks = {
        int(r[id_col]): tokenize(r[content_col], analyzer)
        for _, r in docs.iterrows()
    }
    n_docs = len(toks)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / max(1, n_docs)
    tfs = {d: Counter(t) for d, t in toks.items()}

    qtf = Counter(tokenize(qtext, analyzer))
    if not qtf:
        return pd.DataFrame({"doc_id": [], "score": []})

    dfs = {t: sum(1 for d in tfs if t in tfs[d]) for t in qtf}
    rows = []
    for d in tfs:
        score, matched = 0.0, 0
        for t, q in qtf.items():
            tf = tfs[d].get(t, 0)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
            score += q * idf * norm
        if matched == 0:
            continue
        if mode == "and" and matched < len(qtf):
            continue
        rows.append((d, score, matched))
    out = pd.DataFrame(rows, columns=["doc_id", "score", "n_terms_matched"])
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(k)
    return out.reset_index(drop=True)
