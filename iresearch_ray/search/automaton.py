"""Dictionary-scan helpers: wildcard patterns and vectorized Levenshtein.

The reference compiles wildcard / fuzzy filters to automata intersected
with the FST term dictionary (core/search/wildcard_filter.cpp:166,
levenshtein_filter.cpp).  Over a sorted in-memory dictionary the same
result comes from (a) bounding the scan by the pattern's literal prefix
and (b) matching the bounded slice — regex for wildcards, a banded DP
across the whole candidate array for edit distance.
"""

from __future__ import annotations

import re

import numpy as np


def wildcard_literal_prefix(pattern: str, any_char: str = "_", any_str: str = "%") -> str:
    out = []
    esc = False
    for ch in pattern:
        if esc:
            out.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
        elif ch in (any_char, any_str):
            break
        else:
            out.append(ch)
    return "".join(out)


def wildcard_to_regex(pattern: str, any_char: str = "_", any_str: str = "%") -> re.Pattern:
    out = []
    esc = False
    for ch in pattern:
        if esc:
            out.append(re.escape(ch))
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == any_char:
            out.append(".")
        elif ch == any_str:
            out.append(".*")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out) + r"\Z", re.DOTALL)


def match_wildcard(terms: np.ndarray, pattern: str) -> np.ndarray:
    """Indices of `terms` (sorted object array) matching the %/_ pattern."""
    from iresearch_ray.index.segment import prefix_upper_bound

    prefix = wildcard_literal_prefix(pattern)
    lo = int(np.searchsorted(terms, prefix, side="left")) if prefix else 0
    ub = prefix_upper_bound(prefix) if prefix else None
    hi = (len(terms) if ub is None
          else int(np.searchsorted(terms, ub, side="left")))
    rx = wildcard_to_regex(pattern)
    m = rx.match
    return np.array([i for i in range(lo, hi) if m(terms[i])], dtype=np.int64)


def levenshtein_from_matrix(mat: np.ndarray, lens: np.ndarray, probe: str,
                            max_d: int) -> np.ndarray:
    """Edit distances from a prebuilt (char_matrix, lens) dictionary view —
    the zero-Python-per-term fast path (matrix cached per segment reader).
    Rows longer than len(probe)+max_d must be prefiltered by the caller."""
    n = len(lens)
    big = max_d + 1
    if n == 0:
        return np.empty(0, dtype=np.int64)
    width = int(lens.max())
    mat = mat[:, :width].astype(np.int64, copy=False)
    pch = np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = len(pch)
    out = np.full(n, big, dtype=np.int64)
    # counting prefilter: d(s,t) >= max(|s|,|t|) - (chars of t drawn from
    # s's alphabet) — one vectorized membership pass kills most of the
    # length-feasible dictionary before any DP row is computed
    member = np.zeros(n, dtype=np.int64)
    for c in np.unique(pch):  # probe alphabet is tiny: direct compares
        member += (mat == c).sum(axis=1)  # beat np.isin's sort-based path
    keep = np.maximum(lens, m) - member <= max_d
    if not keep.any():
        return out
    alive_idx = np.flatnonzero(keep)
    mat = mat[alive_idx]
    prev = np.broadcast_to(np.arange(width + 1, dtype=np.int64),
                           (len(alive_idx), width + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub_cost = (mat != pch[i - 1]).astype(np.int64)
        for j in range(1, width + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1])
        prev = cur
        # Ukkonen cutoff: DP values never decrease along any path, so a
        # row whose minimum already exceeds max_d can never come back —
        # compact the candidate set (most of the dictionary dies within
        # the first few probe chars, shrinking every later vector op)
        if i < m:
            alive = prev.min(axis=1) <= max_d
            if not alive.all():
                if not alive.any():
                    return out
                prev = prev[alive]
                mat = mat[alive]
                alive_idx = alive_idx[alive]
    d = prev[np.arange(len(alive_idx)), lens[alive_idx]]
    out[alive_idx] = np.minimum(d, big)
    return out


def levenshtein_distances(terms: list[str] | np.ndarray, probe: str,
                          max_d: int) -> np.ndarray:
    """Edit distance of every term to `probe`, vectorized across terms.

    Classic DP where the inner loop runs over probe characters and each DP
    cell is a numpy vector across candidate terms; candidates longer than
    len(probe)+max_d are prefiltered.  Returns distances (values > max_d
    are clipped to max_d + 1).
    """
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    max_len = int(lens.max())
    big = max_d + 1
    dist = np.full(n, big, dtype=np.int64)
    feasible = np.abs(lens - len(probe)) <= max_d
    if not feasible.any():
        return dist
    idx = np.flatnonzero(feasible)
    cand = [terms[i] for i in idx]
    clens = lens[idx]
    width = int(clens.max()) if len(cand) else 0
    # char matrix: cand x width (0-padded)
    mat = np.zeros((len(cand), width), dtype=np.int64)
    for r, t in enumerate(cand):
        mat[r, :len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    pch = np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = len(pch)
    # DP over probe prefix: prev[r, j] = dist(probe[:i], cand[r][:j])
    prev = np.broadcast_to(np.arange(width + 1, dtype=np.int64), (len(cand), width + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub_cost = (mat != pch[i - 1]).astype(np.int64)  # cand x width
        for j in range(1, width + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1])
        prev = cur
    d = prev[np.arange(len(cand)), clens]
    dist[idx] = np.minimum(d, big)
    return dist


def match_fuzzy(terms: np.ndarray, probe: str, max_d: int,
                prefix_len: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(indices, distances) of terms with edit distance <= max_d to probe.

    ``prefix_len`` pins the first characters exactly (reference fuzzy option)
    and bounds the dictionary scan.
    """
    if prefix_len:
        from iresearch_ray.index.segment import prefix_upper_bound

        prefix = probe[:prefix_len]
        lo = int(np.searchsorted(terms, prefix, side="left"))
        ub = prefix_upper_bound(prefix)
        hi = (len(terms) if ub is None
              else int(np.searchsorted(terms, ub, side="left")))
    else:
        lo, hi = 0, len(terms)
    window = terms[lo:hi]
    d = levenshtein_distances(window, probe, max_d)
    keep = d <= max_d
    return np.flatnonzero(keep) + lo, d[keep]
