"""Mini query language over the serving tier: OR of AND-clauses with
phrases and prefixes.

GSE's API accepted a bag of words and OR'd them (reference
crawler/src/api/main.go:121-159). A usable engine needs the next tier
— without inventing a full boolean algebra, this is the flat grammar
Lucene's SimpleQueryParser popularized, nesting-free by design:

    error AND handler OR panic        ->  (error ∧ handler) ∨ panic
    "merge sort" AND stable           ->  adjacency ∧ term
    pars* AND config                  ->  (any pars… term) ∧ config
    spark join                        ->  spark ∨ join   (GSE default)

Semantics: the query is a disjunction of clauses; ``AND`` chains the
adjacent atoms into one clause; bare atoms are their own clause.
Atoms: ``"…"`` quoted phrase (exact whitespace adjacency, verified
against the content store), ``tok*`` dictionary-expanded prefix,
anything else a term (analyzed). A document QUALIFIES if any clause
holds; qualifying docs are ranked by BM25 over every scoring term the
query mentions (phrase/prefix atoms contribute their analyzed /
expanded terms), so ranking stays consistent with the plain search
paths.

Evaluation is driver-side numpy over the same decoded postings the
exact search path uses — presence sets per atom, set algebra per
clause, one BM25 scoring pass restricted to qualifying docs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rse_spark.query.engine import query_terms


@dataclass
class Clause:
    terms: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)

    def atoms(self) -> int:
        return len(self.terms) + len(self.prefixes) + len(self.phrases)


def _tokenize(q: str) -> list[str]:
    """Split on whitespace, keeping double-quoted spans as one token
    (quotes retained for classification)."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        if q[i] == '"':
            j = q.find('"', i + 1)
            j = n if j < 0 else j
            out.append(q[i:j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace():
                j += 1
            out.append(q[i:j])
            i = j
    return out


def parse_ql(q: str) -> list[Clause]:
    """Parse into OR-of-AND clauses. ``AND`` merges the next atom into
    the current clause; ``OR`` (and plain adjacency) separates
    clauses. Raises ValueError on an empty/operator-only query."""
    clauses: list[Clause] = []
    cur: Clause | None = None
    pending_and = False
    for tok in _tokenize(q):
        if tok == "AND":
            pending_and = True
            continue
        if tok == "OR":
            pending_and = False
            continue
        if not (pending_and and cur is not None):
            cur = Clause()
            clauses.append(cur)
        pending_and = False
        if tok.startswith('"'):
            phrase = tok.strip('"').strip()
            if phrase:
                cur.phrases.append(phrase)
        elif tok.endswith("*") and len(tok) > 1:
            cur.prefixes.append(tok[:-1])
        else:
            cur.terms.append(tok)
    clauses = [c for c in clauses if c.atoms()]
    if not clauses:
        raise ValueError("empty query")
    return clauses


def search_ql(searcher, q: str, k: int = 10,
              corpus_path: str | None = None,
              content_col: str = "text", id_col: str = "doc_id",
              key_col: str | None = None,
              max_prefix_terms: int = 64):
    """Top-k for a mini-language query over a DirectSearcher.
    Returns [(doc_id, score, n_terms_matched)] like search().

    Raises ValueError for an empty query, or for a phrase atom when no
    ``corpus_path`` content store is available (adjacency cannot be
    verified from the tf-only postings)."""
    clauses = parse_ql(q)
    if any(c.phrases for c in clauses) and corpus_path is None:
        raise ValueError("phrase atoms need a content store")

    def term_docs(t: str) -> set[int]:
        """Docs containing the ANALYZED form(s) of one query token —
        conjunction over its subtokens (camelCase splits, etc.)."""
        subs = sorted(query_terms(t, searcher.analyzer))
        if not subs:
            return set()
        acc: set[int] | None = None
        for s in subs:
            docs = {
                d for d, _sc, _m in searcher.search_terms(
                    [s], k=searcher.n_docs
                )
            }
            acc = docs if acc is None else acc & docs
        return acc or set()

    def prefix_docs(p: str) -> tuple[set[int], list[str]]:
        terms = searcher.expand_prefix(p, max_terms=max_prefix_terms)
        hit: set[int] = set()
        for t in terms:
            hit |= {
                d for d, _sc, _m in searcher.search_terms(
                    [t], k=searcher.n_docs
                )
            }
        return hit, terms

    scoring_terms: list[str] = []
    qualified: set[int] = set()
    for c in clauses:
        clause_sets: list[set[int]] = []
        for t in c.terms:
            scoring_terms.extend(query_terms(t, searcher.analyzer))
            clause_sets.append(term_docs(t))
        for p in c.prefixes:
            docs, terms = prefix_docs(p)
            scoring_terms.extend(terms)
            clause_sets.append(docs)
        for ph in c.phrases:
            scoring_terms.extend(query_terms(ph, searcher.analyzer))
            clause_sets.append({
                d for d, _n in searcher.phrase_search(
                    ph, corpus_path, k=searcher.n_docs,
                    content_col=content_col, id_col=id_col,
                    key_col=key_col,
                )
            })
        if clause_sets:
            hit = set.intersection(*clause_sets)
            qualified |= hit
    if not qualified:
        return []
    scored = searcher.search_terms(
        sorted(set(scoring_terms)), k=searcher.n_docs, mode="or"
    )
    out = [(d, s, m) for d, s, m in scored if d in qualified]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]
