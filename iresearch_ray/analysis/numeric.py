"""Numeric indexing: precision-granularity terms + range cover.

Mirrors the reference's numeric_token_stream (core/analysis/
token_streams.hpp:126-160, PRECISION_STEP_DEF=16): a numeric value is
indexed as one term per precision level, each level right-shifting the
(sign-offset) value by ``level * step`` bits.  A granular range query then
covers [lo, hi] with boundary scans at level 0 plus coarse-level interior
scans (core/search/granular_range_filter.cpp) — touching far fewer
dictionary terms than a flat range.

Term format (lexicographic order == numeric order within one level):
    "{level:02d}:{offset_value >> (level*step):016x}"
with offset_value = value + 2^63 (maps int64 to unsigned order).
"""

from __future__ import annotations

import numpy as np

PRECISION_STEP_DEF = 16
_OFFSET = 1 << 63
_LEVELS = 64


def encode_term(value: int, level: int, step: int = PRECISION_STEP_DEF) -> str:
    u = (int(value) + _OFFSET) >> (level * step)
    return f"{level:02d}:{u:016x}"


class NumericAnalyzer:
    """Analyzer emitting granularity terms for int64 values."""

    name = "numeric"

    def __init__(self, step: int = PRECISION_STEP_DEF):
        if not 0 < step <= 64:
            raise ValueError("bad precision step")
        self.step = step
        self.n_levels = (_LEVELS + step - 1) // step

    def tokens(self, value) -> list[str]:
        if value is None:
            return []
        v = int(value)
        return [encode_term(v, lvl, self.step) for lvl in range(self.n_levels)]

    def tokenize_batch(self, values):
        flat: list[str] = []
        values = list(values)
        counts = np.empty(len(values), dtype=np.int64)
        for i, v in enumerate(values):
            t = self.tokens(v)
            counts[i] = len(t)
            flat.extend(t)
        return flat, counts

    def config(self) -> dict:
        return {"name": self.name, "step": self.step}


def granular_cover(lo: int, hi: int, step: int = PRECISION_STEP_DEF
                   ) -> list[tuple[int, int, int]]:
    """Cover the inclusive value range [lo, hi] with per-level sub-ranges.

    Returns [(level, u_lo, u_hi)] of INCLUSIVE shifted-unsigned ranges such
    that a value matches iff exactly one of its level terms falls in the
    corresponding range — the classic trie range decomposition.
    """
    if lo > hi:
        return []
    u_lo = lo + _OFFSET
    u_hi = hi + _OFFSET
    out: list[tuple[int, int, int]] = []
    level = 0
    while u_lo <= u_hi:
        width = 1 << step
        lo_rem = u_lo & (width - 1)
        hi_rem = u_hi & (width - 1)
        next_lo = (u_lo >> step) + (1 if lo_rem != 0 else 0)
        next_hi = (u_hi >> step) - (1 if hi_rem != width - 1 else 0)
        if next_lo > next_hi or (level + 1) * step >= _LEVELS:
            out.append((level, u_lo, u_hi))  # final level covers rest flat
            break
        if lo_rem != 0:
            out.append((level, u_lo, ((u_lo >> step) << step) + width - 1))
        if hi_rem != width - 1:
            out.append((level, (u_hi >> step) << step, u_hi))
        u_lo, u_hi = next_lo, next_hi
        level += 1
    return out


def cover_term_ranges(lo: int, hi: int, step: int = PRECISION_STEP_DEF
                      ) -> list[tuple[str, str]]:
    """Inclusive [term_lo, term_hi] dictionary ranges covering [lo, hi].

    ``granular_cover`` yields bounds already expressed in each level's
    shifted units (the same units ``encode_term`` writes at that level).
    """
    ranges = []
    for level, u_lo, u_hi in granular_cover(lo, hi, step):
        ranges.append((f"{level:02d}:{u_lo:016x}",
                       f"{level:02d}:{u_hi:016x}"))
    return ranges


from iresearch_ray.analysis.tokenizers import register_analyzer

register_analyzer("numeric", lambda **o: NumericAnalyzer(**o))
