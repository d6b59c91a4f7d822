"""Pure-Python oracle: naive inverted index + brute-force search/scoring.

Plays the role of the reference's expected-index golden model
(`tests::index_segment` / `assert_index`, /root/reference/tests/index/
assert_format.hpp:155,255-268): build the index a second, trivially-simple
way and compare term-by-term, posting-by-posting.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np


class OracleIndex:
    def __init__(self, analyzer):
        self.analyzer = analyzer
        # term -> list[(doc_id, freq, positions)]
        self.postings: dict[str, list] = defaultdict(list)
        self.doc_len: list[int] = []   # doc_id-1 -> len
        self.keys: list[str] = []

    def add(self, key: str, text: str) -> int:
        toks = self.analyzer.tokens(text)
        doc_id = len(self.doc_len) + 1
        per_term: dict[str, list[int]] = defaultdict(list)
        for pos, t in enumerate(toks):
            per_term[t].append(pos)
        for t, positions in per_term.items():
            self.postings[t].append((doc_id, len(positions), positions))
        self.doc_len.append(len(toks))
        self.keys.append(key)
        return doc_id

    @property
    def num_docs(self):
        return len(self.doc_len)

    @property
    def avgdl(self):
        return sum(self.doc_len) / max(1, self.num_docs)

    def df(self, term):
        return len(self.postings.get(term, ()))

    def sorted_terms(self):
        return sorted(self.postings)

    # ----- float32 BM25 exactly as the reference computes it -----
    def bm25_scores(self, term: str, k: float = 1.2, b: float = 0.75,
                    boost: float = 1.0) -> dict[int, float]:
        """doc_id -> float32 score, reference arithmetic
        (/root/reference/core/search/bm25.cpp:283-315,460-560)."""
        f32 = np.float32
        N = self.num_docs
        df = self.df(term)
        idf = f32(math.log1p((N - df + 0.5) / (df + 0.5)))
        c0 = f32(boost) * (f32(k) + f32(1)) * idf
        out = {}
        if b == 0.0:
            for doc, freq, _ in self.postings.get(term, ()):
                tf = f32(freq)
                out[doc] = float(c0 - c0 / (f32(1) + tf / f32(k)))
            return out
        kb = f32(k) * f32(b)
        norm_const = f32(k) - kb
        total_tokens = sum(self.doc_len)
        avg_dl = f32(total_tokens) / f32(N) if total_tokens and N else None
        norm_length = kb / avg_dl if avg_dl is not None else kb
        max_dl = max(self.doc_len, default=0)
        if max_dl < 256:  # Norm2Tiny path: norm_cache[256]
            cache = np.array([np.float32(1) / (norm_const + norm_length * np.float32(i))
                              for i in range(256)], dtype=np.float32)
            for doc, freq, _ in self.postings.get(term, ()):
                inv_c1 = cache[self.doc_len[doc - 1] & 0xFF]
                tf = f32(freq)
                out[doc] = float(c0 - c0 / (f32(1) + tf * inv_c1))
        else:
            for doc, freq, _ in self.postings.get(term, ()):
                c1 = norm_const + norm_length * f32(self.doc_len[doc - 1])
                tf = f32(freq)
                out[doc] = float(c0 - c0 * c1 / (c1 + tf))
        return out

    def top_k(self, terms: list[str], k: int = 10, mode: str = "or",
              bm25_k: float = 1.2, bm25_b: float = 0.75):
        """Brute-force union/intersection scored top-k; tie-break doc order."""
        acc: dict[int, float] = defaultdict(float)
        seen: dict[int, int] = defaultdict(int)
        for t in terms:
            for doc, s in self.bm25_scores(t, bm25_k, bm25_b).items():
                acc[doc] = float(np.float32(acc[doc]) + np.float32(s))
                seen[doc] += 1
        if mode == "and":
            acc = {d: s for d, s in acc.items() if seen[d] == len(terms)}
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
