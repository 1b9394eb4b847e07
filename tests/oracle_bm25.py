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


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        self.doclens: dict[int, int] = {}
        self.postings: dict[str, dict[int, list[int]]] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text)
            self.doclens[doc_id] = len(toks)
            for term, pos in toks:
                self.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        self.n = len(docs)
        self.avgdl = (
            sum(self.doclens.values()) / self.n if self.n else 0.0
        )

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
