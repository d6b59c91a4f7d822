"""Pluggable per-document feature writers (reference Norm / Norm2,
core/index/norm.hpp:75-119; feature writers are registered per field and
flushed into segment columns by segment_writer).

A feature writer maps the per-doc token counts of a segment to one stored
docmap column.  Two built-ins mirror the reference:

- ``norm2``: the document length itself (uint; Norm2Encoding picks the
  narrowest int width in the reference — Parquet's dictionary/bit-packing
  does the same job here).  This is what BM25 consumes; ``doc_len`` is
  ALWAYS stored in the docmap, so norm2 needs no extra column.
- ``norm``: the legacy float norm ``1/sqrt(len)`` (norm.hpp legacy Norm),
  stored as float32 — what TF-IDF ``with_norms`` multiplies by.

``register_norm_feature`` accepts any callable ``doc_len(int64[]) ->
ndarray`` so custom per-doc features (e.g. field boosts) ride the same
column path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

_NORM_FEATURES: dict[str, Callable[[np.ndarray], np.ndarray]] = {}


def register_norm_feature(name: str,
                          fn: Callable[[np.ndarray], np.ndarray]) -> None:
    _NORM_FEATURES[name] = fn


def get_norm_feature(name: str) -> Callable[[np.ndarray], np.ndarray]:
    try:
        return _NORM_FEATURES[name]
    except KeyError:
        raise KeyError(f"unknown norm feature {name!r}; "
                       f"known: {sorted(_NORM_FEATURES)}") from None


def known_norm_features() -> list[str]:
    return sorted(_NORM_FEATURES)


register_norm_feature(
    "norm2", lambda doc_len: doc_len.astype(np.int64, copy=False))
register_norm_feature(
    "norm", lambda doc_len: (np.float32(1)
                             / np.sqrt(np.maximum(doc_len, 1).astype(np.float32))))
