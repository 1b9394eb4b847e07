"""Pure-Python BM25 oracle (independent of the Spark engine).

Pins the Tantivy 0.19 formula (k1=1.2, b=0.75) in float32 arithmetic —
Tantivy scores in f32 — as the rank-identity reference (SURVEY.md §5.2:
the live Rust engine cannot run in this sandbox, so this pinned scorer
plus the ported fixture assertions stand in as the oracle).
"""

from __future__ import annotations

import math

import numpy as np

from toshi_spark.analyzer import tokenize

K1 = 1.2
B = 0.75


def quantize_fieldnorm(n: int) -> int:
    """Independent re-implementation of the SmallFloat-byte4 fieldnorm
    quantization (double-entry bookkeeping vs toshi_spark.index.fieldnorm):
    exact below 24, floor to 4 significant bits of (n - 24) above."""
    if n < 24:
        return n
    y = n - 24
    if y < 8:
        return n
    shift = y.bit_length() - 4
    return 24 + ((y >> shift) << shift)


class OracleIndex:
    def __init__(self, docs: dict[int, str], quantize: bool = False):
        self.doclens: dict[int, int] = {}
        self.postings: dict[str, dict[int, list[int]]] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text)
            self.doclens[doc_id] = len(toks)
            for term, pos in toks:
                self.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        self.n = len(docs)
        # avgdl from EXACT lengths even in quantized mode (Tantivy
        # derives it from segment token totals, not stored norms)
        self.avgdl = (
            sum(self.doclens.values()) / self.n if self.n else 0.0
        )
        if quantize:
            self.doclens = {
                d: quantize_fieldnorm(v) for d, v in self.doclens.items()
            }

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score_term(self, term: str, tf_mode: str = "full") -> dict[int, float]:
        """doc_id -> f32 BM25 for a single term."""
        out: dict[int, float] = {}
        idf = np.float32(self.idf(term))
        for doc_id, positions in self.postings.get(term, {}).items():
            tf = np.float32(1.0 if tf_mode == "basic" else len(positions))
            dl = np.float32(self.doclens[doc_id])
            denom = tf + np.float32(K1) * (
                np.float32(1 - B) + np.float32(B) * dl / np.float32(self.avgdl)
            )
            out[doc_id] = float(idf * tf * np.float32(K1 + 1) / denom)
        return out

    def topk_terms(
        self, terms: list[str], k: int, tf_mode: str = "full"
    ) -> list[tuple[int, float]]:
        """Union-of-terms (OR) BM25 top-k; ties broken by doc_id asc."""
        acc: dict[int, float] = {}
        for t in terms:
            for d, s in self.score_term(t, tf_mode).items():
                acc[d] = float(np.float32(acc.get(d, 0.0) + np.float32(s)))
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (0 if ca == cb else 1))
        prev = cur
    return prev[len(b)]


class OracleEngine:
    """Full-DSL oracle over OracleIndex + a numeric column.

    Mirrors the engine's pinned semantics: term=basic-tf BM25,
    phrase=idf-sum × tfnorm(phrase freq), fuzzy/regex/range/all=1.0,
    bool=sum with must intersection / should union / must_not anti.
    All score accumulation in f32.
    """

    def __init__(self, docs: dict[int, str], numeric: dict[int, int]):
        self.ix = OracleIndex(docs)
        self.numeric = numeric

    def _scores(self, node: dict) -> dict[int, float]:
        if "term" in node:
            ((_f, v),) = node["term"].items()
            return self.ix.score_term(v, tf_mode="basic")
        if "phrase" in node:
            ((_f, tp),) = node["phrase"].items()
            terms = tp["terms"]
            idf_sum = np.float32(sum(np.float32(self.ix.idf(t)) for t in terms))
            legs = [self.ix.postings.get(t, {}) for t in terms]
            docs = set(legs[0])
            for leg in legs[1:]:
                docs &= set(leg)
            out = {}
            for d in docs:
                anchors = legs[0][d]
                tf = sum(
                    1 for p in anchors
                    if all((p + i) in legs[i][d] for i in range(1, len(terms)))
                )
                if tf:
                    dl = np.float32(self.ix.doclens[d])
                    denom = np.float32(tf) + np.float32(K1) * (
                        np.float32(1 - B)
                        + np.float32(B) * dl / np.float32(self.ix.avgdl)
                    )
                    out[d] = float(
                        idf_sum * np.float32(tf) * np.float32(K1 + 1) / denom
                    )
            return out
        if "fuzzy" in node:
            ((_f, ft),) = node["fuzzy"].items()
            hits = set()
            for t, posting in self.ix.postings.items():
                if abs(len(t) - len(ft["value"])) <= ft.get("distance", 0) and \
                        _levenshtein(t, ft["value"]) <= ft.get("distance", 0):
                    hits |= set(posting)
            return {d: 1.0 for d in hits}
        if "regex" in node:
            import re as _re
            ((_f, pat),) = node["regex"].items()
            rx = _re.compile(f"^(?:{pat})$")
            hits = set()
            for t, posting in self.ix.postings.items():
                if rx.match(t):
                    hits |= set(posting)
            return {d: 1.0 for d in hits}
        if "range" in node:
            ((_f, b),) = node["range"].items()
            lo, lo_inc = (b.get("gt"), False) if b.get("gt") is not None else (
                b.get("gte"), True)
            hi, hi_inc = (b.get("lt"), False) if b.get("lt") is not None else (
                b.get("lte"), True)
            out = {}
            for d, v in self.numeric.items():
                if lo is not None and (v < lo or (v == lo and not lo_inc)):
                    continue
                if hi is not None and (v > hi or (v == hi and not hi_inc)):
                    continue
                out[d] = 1.0
            return out
        if "bool" in node:
            bq = node["bool"]
            musts = [self._scores(c) for c in bq.get("must", [])]
            shoulds = [self._scores(c) for c in bq.get("should", [])]
            must_nots = [self._scores(c) for c in bq.get("must_not", [])]
            base: dict[int, float] | None = None
            if musts:
                docs = set(musts[0])
                for m in musts[1:]:
                    docs &= set(m)
                base = {
                    d: float(np.float32(sum(np.float32(m[d]) for m in musts)))
                    for d in docs
                }
            if shoulds:
                s_sum: dict[int, float] = {}
                for s in shoulds:
                    for d, v in s.items():
                        s_sum[d] = float(np.float32(s_sum.get(d, 0.0))
                                         + np.float32(v))
                if base is None:
                    base = s_sum
                else:
                    for d in base:
                        if d in s_sum:
                            base[d] = float(np.float32(base[d])
                                            + np.float32(s_sum[d]))
            if base is None:
                return {}
            excluded = set()
            for mn in must_nots:
                excluded |= set(mn)
            return {d: v for d, v in base.items() if d not in excluded}
        if node == {"all": True} or node is None:
            return {d: 1.0 for d in self.ix.doclens}
        raise ValueError(f"oracle: unsupported node {node}")

    def topk(self, query: dict, k: int) -> list[tuple[int, float]]:
        scores = self._scores(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
