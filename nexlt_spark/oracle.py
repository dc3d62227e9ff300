"""Pure-Python BM25 oracle — ground truth for rank-identity tests.

Independent of Spark: builds an in-memory inverted index from the same
rows, shares the tokenizer (nexlt_spark.analysis.tokenize) and the scalar
BM25 math (nexlt_spark.scoring) with the engine, and answers the frozen
reference query shapes (FIXTURES.md §3). pytest asserts the engine's
(doc_id, score) top-k lists are rank-identical to this oracle
(BASELINE.json north_rule).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

from nexlt_spark.analysis import tokenize
from nexlt_spark.query.model import Query, QueryFilters
from nexlt_spark.scoring import contribution, idf


class OracleIndex:
    def __init__(self, docs: Iterable[dict], analyzer: str = "standard"):
        """docs: dicts with doc_id, text (+ optional role/tool/ts/conv_id)."""
        self.analyzer = analyzer
        self.docs: Dict[int, dict] = {}
        self.tokens: Dict[int, List[str]] = {}
        self.dl: Dict[int, int] = {}
        self.postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        for d in docs:
            did = int(d["doc_id"])
            self.docs[did] = d
            toks = tokenize(d.get("text"), analyzer)
            self.tokens[did] = toks
            self.dl[did] = len(toks)
            for t, tf in Counter(toks).items():
                self.postings[t][did] = tf
        self.n_docs = len(self.docs)
        self.total_tokens = sum(self.dl.values())
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    # -- filters ---------------------------------------------------------
    def _passes(self, d: dict, f: QueryFilters, exists: bool) -> bool:
        if f.roles and d.get("role") not in f.roles:
            return False
        if f.tools and d.get("tool") not in f.tools:
            return False
        if f.conv_ids and d.get("conv_id") not in f.conv_ids:
            return False
        ts = d.get("ts")
        if f.ts_from is not None and not (ts is not None and str(ts) >= f.ts_from):
            return False
        if f.ts_to is not None and not (ts is not None and str(ts) < f.ts_to):
            return False
        if exists and not d.get("text"):
            return False
        return True

    def _filtered_ids(self, f: QueryFilters, exists: bool) -> set:
        if f.is_empty() and not exists:
            return set(self.docs)
        return {i for i, d in self.docs.items() if self._passes(d, f, exists)}

    def _phrase_ids(self, phrase: str, within: set, slop: int = 0) -> set:
        """slop=0: adjacent subsequence. slop>0: ordered window — the
        phrase tokens appear in order, anchored at a start occurrence of
        the first token, inside a window of len(pt)+slop positions (the
        greedy leftmost subsequence check inside the bounded window is
        exact — a deliberately different construction from the engine's
        greedy-minimal-end chain, so the two validate each other)."""
        pt = tokenize(phrase, self.analyzer)
        if not pt:
            return within
        m = len(pt)

        def window_match(toks, s) -> bool:
            j = 0
            for tok in toks[s : s + m + slop]:
                if tok == pt[j]:
                    j += 1
                    if j == m:
                        return True
            return False

        out = set()
        for i in within:
            toks = self.tokens[i]
            if any(
                toks[s] == pt[0] and window_match(toks, s)
                for s in range(len(toks) - m + 1)
            ):
                out.add(i)
        return out

    # -- scoring ---------------------------------------------------------
    def score(
        self,
        terms: List[str],
        mode: str,
        candidates: Optional[set] = None,
        boosts: Optional[Dict[str, float]] = None,
    ) -> Dict[int, float]:
        qterms = sorted(set(terms))
        present = [t for t in qterms if t in self.postings]
        if not present or (mode == "and" and len(present) < len(qterms)):
            return {}
        idfs = {t: idf(self.n_docs, self.df(t)) for t in present}
        if boosts:
            # same driver-side float multiply as the engine (exact.py /
            # ranged.py) — boosted rank identity is bit-exact
            idfs = {t: v * boosts.get(t, 1.0) for t, v in idfs.items()}
        per_doc: Dict[int, list] = defaultdict(list)
        for t in present:
            for did, tf in self.postings[t].items():
                if candidates is not None and did not in candidates:
                    continue
                per_doc[did].append((t, contribution(idfs[t], float(tf), float(self.dl[did]), self.avgdl)))
        out = {}
        for did, contribs in per_doc.items():
            if mode == "and" and len(contribs) < len(present):
                continue
            acc = 0.0
            for _, c in sorted(contribs, key=lambda x: x[0]):  # term-sorted fold
                acc += c
            out[did] = acc
        return out

    def _not_ids(self, not_terms: Optional[List[str]]) -> set:
        """doc_ids matching ANY prohibited term (SO3 NOT) — to exclude."""
        out: set = set()
        for r in not_terms or []:
            for t in tokenize(r, self.analyzer):
                out.update(self.postings.get(t, {}))
        return out

    # -- full query surface ----------------------------------------------
    def topk(self, q: Query) -> List[Tuple[int, float]]:
        """Relevance top-k [(doc_id, score)] with (score desc, doc_id asc)."""
        terms: List[str] = []
        for r in q.terms:
            terms.extend(tokenize(r, self.analyzer))
        mode = q.mode
        cands = self._filtered_ids(q.filters, q.exists) - self._not_ids(q.not_terms)
        if q.phrase:
            for t in tokenize(q.phrase, self.analyzer):
                if t not in terms:
                    terms.append(t)
            mode = "and"
            cands = self._phrase_ids(q.phrase, cands, q.phrase_slop)
        eff = None
        if q.boosts:
            eff = {}
            for raw, b in q.boosts.items():
                for tok in tokenize(raw, self.analyzer):
                    eff[tok] = eff.get(tok, 1.0) * b
        scored = self.score(terms, mode, cands, boosts=eff)
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[q.start : q.start + q.k]

    def num_found(self, q: Query) -> int:
        cands = self._filtered_ids(q.filters, q.exists) - self._not_ids(q.not_terms)
        if q.terms:
            terms = []
            for r in q.terms:
                terms.extend(tokenize(r, self.analyzer))
            return len(self.score(terms, q.mode, cands))
        return len(cands)

    def sorted_query(self, q: Query) -> List[int]:
        """Non-relevance sorted doc_id list (engine compared on doc_id)."""
        cands = self._filtered_ids(q.filters, q.exists) - self._not_ids(q.not_terms)
        if q.terms:
            terms = []
            for r in q.terms:
                terms.extend(tokenize(r, self.analyzer))
            cands = set(self.score(terms, q.mode, cands))
        if q.phrase:
            cands = self._phrase_ids(q.phrase, cands, q.phrase_slop)
        rows = [self.docs[i] for i in cands]

        def key(d):
            ks = []
            for c, direction in q.sort or []:
                v = d.get(c) if c != "text_lc" else (d.get("text") or "").lower()
                ks.append(_Rev(v) if direction == "desc" else v)
            if not any(c == "text_lc" for c, _ in (q.sort or [])):
                ks.append((d.get("text") or "").lower())
            ks.append(int(d["doc_id"]))
            return tuple(ks)

        rows.sort(key=key)
        return [int(d["doc_id"]) for d in rows[q.start : q.start + q.k]]


class _Rev:
    """Reverse-order wrapper for mixed-direction sort keys."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v
