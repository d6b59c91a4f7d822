"""Scorers: BM25 (reference-exact float32 arithmetic), TF-IDF, boost.

BM25 reproduces the reference formula and evaluation order bit-for-bit
(/root/reference/core/search/bm25.cpp:283-315 for the published formula,
:330-460 for the score kernels, :474-530 for stat collection):

    idf         = log1p((N - df + 0.5) / (df + 0.5))          # float64 -> f32
    c0          = boost * (k + 1) * idf                        # f32
    b == 0 (BM15):       score = c0 - c0 / (1 + tf / k)
    norms fit 1 byte:    score = c0 - c0 / (1 + tf * cache[dl])
        with cache[i] = 1 / (norm_const + norm_length * i), i in [0, 256)
    general:             c1 = norm_const + norm_length * dl
                         score = c0 - c0 * c1 / (c1 + tf)
    norm_const  = k - k*b;  norm_length = (k*b) / avgdl
    avgdl       = total_field_tokens / docs_with_field         # f32 division

``dtype`` may be float64 for the DuckDB-oracle query path (same formulas,
double arithmetic, so ANSI-SQL ``ln``/arithmetic reproduces it).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class FieldStats:
    """Global (cross-segment summed) field stats — the `field_collector`
    aggregate (reference bm25.cpp:209-243)."""
    docs_with_field: int   # N
    total_tokens: int      # sum of doc lens (total_term_freq of the field)


def _check_boost(boost: float) -> float:
    """WAND block-max pruning assumes scores are monotone in the block
    upper bound, which a NEGATIVE boost inverts (score(max_freq, dl=0)
    becomes the block MINIMUM) — mode='top' would silently drop docs
    that beat the threshold.  Rejected engine-wide; documented deviation
    from the reference, which leaves negative boosts undefined."""
    if boost < 0:
        raise ValueError(f"negative boost {boost} is unsupported "
                         "(breaks block-max top-k pruning)")
    return boost


class PreparedBM25:
    """Per-(query term-set) prepared stats; score() is vectorized per segment."""

    def __init__(self, k: float, b: float, idf: float, stats: FieldStats,
                 boost: float = 1.0, dtype=np.float32):
        f = dtype
        self.dtype = dtype
        self.k, self.b = k, b
        self.idf = f(idf)
        self.c0 = f(boost) * (f(k) + f(1)) * f(idf)
        if b == 0.0:
            self.norm_const = f(k)
            self.norm_length = f(0)
            self.cache = None
            return
        kb = f(k) * f(b)
        self.norm_const = f(k) - kb
        if stats.total_tokens and stats.docs_with_field:
            avg_dl = f(stats.total_tokens) / f(stats.docs_with_field)
            self.norm_length = kb / avg_dl
        else:
            self.norm_length = kb
        i = np.arange(256, dtype=dtype)
        with np.errstate(divide="ignore"):  # b=1 -> norm_const=0 -> cache[0]=inf,
            # matching the reference's 1/(0 + 0*0) (bm25.cpp:519)
            self.cache = (f(1) / (self.norm_const + self.norm_length * i)).astype(dtype)

    def score(self, freqs: np.ndarray, doc_lens: np.ndarray, tiny: bool) -> np.ndarray:
        f = self.dtype
        tf = freqs.astype(f)
        c0 = self.c0
        if self.b == 0.0:
            return c0 - c0 / (f(1) + tf / self.norm_const)
        if tiny:
            inv_c1 = self.cache[doc_lens & 0xFF]
            return c0 - c0 / (f(1) + tf * inv_c1)
        c1 = self.norm_const + self.norm_length * doc_lens.astype(f)
        return c0 - c0 * c1 / (c1 + tf)

    def key(self) -> tuple:
        """Constants that fully determine score(freq, doc_len=0) — the
        block-ub cache key.  Stable across queries for a static index
        (same term -> same df -> same idf) + fixed scorer config."""
        return ("bm25", float(self.c0), float(self.norm_const),
                float(self.norm_length), self.b == 0.0)


class BM25:
    """k=1.2, b=0.75 default; b=1 -> BM11, b=0 -> BM15 (bm25.hpp:36-44)."""

    name = "bm25"

    def __init__(self, k: float = 1.2, b: float = 0.75, dtype=np.float32):
        self.k, self.b = float(k), float(b)
        self.dtype = dtype

    def idf(self, docs_with_field: int, docs_with_term: int) -> float:
        return math.log1p((docs_with_field - docs_with_term + 0.5)
                          / (docs_with_term + 0.5))

    def prepare(self, stats: FieldStats, df: int, boost: float = 1.0,
                idf_override: float | None = None) -> PreparedBM25:
        idf = self.idf(stats.docs_with_field, df) if idf_override is None else idf_override
        return PreparedBM25(self.k, self.b, idf, stats, _check_boost(boost),
                            self.dtype)


class PreparedTFIDF:
    def __init__(self, idf: float, boost: float, with_norms: bool, dtype):
        self.dtype = dtype
        self.num = dtype(boost) * dtype(idf)
        self.with_norms = with_norms

    def score(self, freqs: np.ndarray, doc_lens: np.ndarray, tiny: bool) -> np.ndarray:
        f = self.dtype
        s = np.sqrt(freqs.astype(f)) * self.num
        if self.with_norms:
            s = s / np.sqrt(np.maximum(doc_lens, 1).astype(f))
        return s

    def key(self) -> tuple:
        return ("tfidf", float(self.num), self.with_norms)


class TFIDF:
    """sqrt(tf) * (log((N+1)/(df+1)) + 1), optional 1/sqrt(|d|) norm
    (reference tfidf.cpp:44,330-384)."""

    name = "tfidf"

    def __init__(self, with_norms: bool = False, dtype=np.float32):
        self.with_norms = with_norms
        self.dtype = dtype
        self.k = self.b = 0.0  # unused

    def idf(self, docs_with_field: int, docs_with_term: int) -> float:
        return math.log((docs_with_field + 1) / (docs_with_term + 1)) + 1.0

    def prepare(self, stats: FieldStats, df: int, boost: float = 1.0,
                idf_override: float | None = None) -> PreparedTFIDF:
        idf = self.idf(stats.docs_with_field, df) if idf_override is None else idf_override
        return PreparedTFIDF(idf, _check_boost(boost), self.with_norms,
                             self.dtype)


class PreparedBoost:
    def __init__(self, boost, dtype):
        self.boost = dtype(boost)
        self.dtype = dtype

    def score(self, freqs, doc_lens, tiny):
        return np.full(len(freqs), self.boost, dtype=self.dtype)

    def key(self):
        return ("boost", float(self.boost))


class BoostScore:
    """Constant boost scorer (reference boost_sort.cpp)."""

    name = "boostscore"

    def __init__(self, dtype=np.float32):
        self.dtype = dtype

    def idf(self, n, d):
        return 1.0

    def prepare(self, stats, df, boost: float = 1.0, idf_override=None):
        return PreparedBoost(_check_boost(boost), self.dtype)


_SCORERS = {"bm25": BM25, "tfidf": TFIDF, "boostscore": BoostScore}


def get_scorer(name: str, **opts):
    """Scorer registry (reference core/search/scorers.cpp)."""
    try:
        return _SCORERS[name](**opts)
    except KeyError:
        raise KeyError(f"unknown scorer {name!r}; known: {sorted(_SCORERS)}") from None
