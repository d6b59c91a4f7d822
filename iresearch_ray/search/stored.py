"""Stored-field (columnstore) query helpers: sorted-index early
termination and filtered aggregation.

- ``topk_by_sorted_field``: on an index built with ``sort_by=<field>``
  (docs physically ordered per segment), the per-segment top-k is its
  FIRST/LAST k docs — no scoring, no scan; segments merge by stored
  value.  This is the point of the reference's sorted index (comparer +
  doc-id remap at flush: core/index/comparer.hpp:31-44): early
  termination for queries ordered by the sort field.
- ``aggregate_stored``: fold a stored column over a filter's matches
  (columnstore read at materialization, like the reference's column
  value readers) — count/sum/avg/min/max, vectorized per segment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def topk_by_sorted_field(reader, field: str, k: int = 10,
                         descending: bool = False) -> pd.DataFrame:
    """Top-k docs by the segment sort field: O(k) per segment."""
    parts = []
    for seg in reader.segments:
        lineage = seg.reader.meta.get("lineage", {})
        sb = lineage.get("sort_by")
        if not sb or sb[0] != field:
            raise ValueError(
                f"segment {seg.id} not sorted by {field!r} (lineage {sb})")
        built_desc = bool(sb[1])
        col = seg.reader.column(field)
        if col is None:
            raise ValueError(f"{field!r} not stored in segment {seg.id}")
        n = seg.reader.num_docs
        n_masked = len(seg.mask) if seg.mask is not None else 0
        take = min(k + n_masked, n)  # over-take so masked rows can't starve k
        if descending == built_desc:   # wanted order = physical order
            local = np.arange(1, take + 1, dtype=np.int64)
        else:                          # physical order reversed
            local = np.arange(n, n - take, -1, dtype=np.int64)
        vals = col.take(local - 1).to_pandas().to_numpy()
        mask = seg.mask
        if mask is not None and len(mask):
            keep = ~np.isin(local, mask)
            local, vals = local[keep], vals[keep]
        parts.append(pd.DataFrame({
            "doc": local + seg.base,
            "key": seg.reader.keys[local - 1],
            field: vals,
        }))
    out = pd.concat(parts, ignore_index=True)
    out = out.sort_values([field, "doc"],
                          ascending=[not descending, True]).head(k)
    return out.reset_index(drop=True)


_AGGS = {
    "count": len,
    "sum": np.sum,
    "avg": np.mean,
    "min": np.min,
    "max": np.max,
}


def aggregate_stored(reader, flt, column: str, aggs=("count", "sum", "avg"),
                     scorer=None) -> dict:
    """Aggregate a stored column over the docs matching ``flt``.

    Partial per segment (count/sum/min/max fold exactly; avg derives from
    the global count+sum) — the same partial+final shape the distributed
    path would ship between nodes.
    """
    from iresearch_ray.search.scorers import BM25

    prep = flt.prepare(reader, scorer or BM25())
    n_total = 0
    s_total = 0.0
    mn, mx = np.inf, -np.inf
    for seg in reader.segments:
        docs, _ = seg.apply_mask(*prep.execute(seg))
        if not len(docs):
            continue
        col = seg.reader.column(column)
        if col is None:
            raise ValueError(f"{column!r} not stored in segment {seg.id}")
        taken = col.take(docs - 1)
        valid = ~np.asarray(taken.is_null())
        vals = taken.to_numpy(zero_copy_only=False).astype(np.float64)[valid]
        if not len(vals):
            continue  # docs lacking the field don't count (null = absent)
        n_total += len(vals)
        s_total += float(vals.sum())
        mn = min(mn, float(vals.min()))
        mx = max(mx, float(vals.max()))
    out = {}
    for a in aggs:
        if a == "count":
            out["count"] = n_total
        elif a == "sum":
            out["sum"] = s_total
        elif a == "avg":
            out["avg"] = (s_total / n_total) if n_total else None
        elif a == "min":
            out["min"] = mn if n_total else None
        elif a == "max":
            out["max"] = mx if n_total else None
        else:
            raise ValueError(f"unknown agg {a!r}")
    return out


def facets(reader, flt, column: str, top_n: int | None = None,
           scorer=None) -> pd.DataFrame:
    """Facet counts: distinct stored-column values over the docs matching
    ``flt`` -> DataFrame(value, n_docs), descending by count then value
    (search-engine faceting on the columnstore; per-segment partial
    counts fold like the distributed aggregate shape)."""
    from collections import Counter

    from iresearch_ray.search.scorers import BM25

    prep = flt.prepare(reader, scorer or BM25())
    counts: Counter = Counter()
    for seg in reader.segments:
        docs, _ = seg.apply_mask(*prep.execute(seg))
        if not len(docs):
            continue
        col = seg.reader.column(column)
        if col is None:
            raise ValueError(f"{column!r} not stored in segment {seg.id}")
        taken = col.take(docs - 1)
        vc = taken.drop_null().value_counts()
        for v, n in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            counts[v] += n
    out = pd.DataFrame(sorted(counts.items(),
                              key=lambda kv: (-kv[1], str(kv[0]))),
                       columns=["value", "n_docs"])
    return out.head(top_n) if top_n else out
