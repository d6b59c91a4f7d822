"""Multi-field indexes: one aligned sub-index per field.

The reference indexes several fields per document (the benchmark corpus
is title+date+body, utils/index-put.cpp:145-232) with per-(segment,field)
statistics (field_meta core/index/field_meta.hpp; per-field collectors
core/search/bm25.cpp:209-243).  Ray-Data-first shape: each field builds
its own segment set under ``<index_dir>/field=<name>/`` from the SAME
deterministic segment specs — so segment ids, doc ids, and doc keys align
across fields — and a root manifest binds them.  Per-field BM25 stats
(N_field, avgdl) fall out naturally, exactly like the reference's
field-scoped collectors.

Cross-field boolean queries work because doc ids align: wrap leaves in
``Fielded(field, filter)`` and search with ``MultiFieldSearcher``.
Constraint: deletes must go through the root (all fields) or doc ids
desynchronize — ``delete_by_filter`` on a single sub-index is unsupported.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from iresearch_ray.index.build import build_index
from iresearch_ray.search.executor import IndexReader, IndexSearcher
from iresearch_ray.search.filters import Filter, Prepared

ROOT_META = "multifield.json"


def build_multifield(paths, index_dir: str, fields: dict[str, dict],
                     key_column: str = "url", target_docs: int = 50_000,
                     **kw) -> dict:
    """``fields``: field name -> {"analyzer": ..., "analyzer_opts": {...},
    "store_columns": (...)}.  Returns the root manifest."""
    sub_manifests = {}
    for fname, cfg in fields.items():
        sub = os.path.join(index_dir, f"field={fname}")
        man = build_index(paths, sub,
                          analyzer=cfg.get("analyzer", "unicode"),
                          analyzer_opts=cfg.get("analyzer_opts"),
                          text_column=cfg.get("column", fname),
                          key_column=key_column, target_docs=target_docs,
                          store_columns=tuple(cfg.get("store_columns", ())),
                          **kw)
        sub_manifests[fname] = {"generation": man["generation"],
                                "num_docs": man["num_docs"]}
    root = {"fields": {f: {"dir": f"field={f}", **m}
                       for f, m in sub_manifests.items()}}
    num_docs = {m["num_docs"] for m in sub_manifests.values()}
    assert len(num_docs) == 1, "field sub-indexes must align"
    root["num_docs"] = num_docs.pop()
    tmp = os.path.join(index_dir, "." + ROOT_META)
    with open(tmp, "w") as f:
        json.dump(root, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, ROOT_META))
    return root


class Fielded(Filter):
    """Route a filter to a named field's sub-index (the reference's
    per-filter ``field()`` option, e.g. by_term::field)."""

    def __init__(self, field: str, inner: Filter):
        self.field = field
        self.inner = inner

    def terms_needed(self):
        return self.inner.terms_needed()

    def prepare(self, reader, scorer, df_map=None):
        if not isinstance(reader, MultiFieldReader):
            raise TypeError("Fielded requires a MultiFieldReader")
        sub = reader.field(self.field)
        return _FieldBound(self.inner.prepare(sub, scorer, df_map),
                           {s.id: s for s in sub.segments})


class _FieldBound(Prepared):
    """Execute against the SAME-ID segment of this field's sub-index
    (segment ids align across fields by construction)."""

    def __init__(self, prep, segs_by_id):
        self.prep = prep
        self.segs_by_id = segs_by_id

    def route(self, seg):
        """(inner prepared, this field's same-id segment view) — lets the
        executor's WAND kernels prune field-bound terms with the FIELD's
        skip/block-max metadata instead of falling back to a full scan."""
        return self.prep, self.segs_by_id.get(seg.id)

    def execute(self, seg):
        mine = self.segs_by_id.get(seg.id)
        if mine is None:
            import numpy as _np

            return (_np.empty(0, dtype=_np.int64),
                    _np.empty(0, dtype=_np.float32))
        return self.prep.execute(mine)


class MultiFieldReader:
    """Root reader: per-field IndexReaders with aligned segments."""

    def __init__(self, index_dir: str, default_field: str | None = None):
        with open(os.path.join(index_dir, ROOT_META)) as f:
            self.meta = json.load(f)
        self.readers = {
            fname: IndexReader(os.path.join(index_dir, info["dir"]),
                               info.get("generation"))
            for fname, info in self.meta["fields"].items()
        }
        self.fields = sorted(self.readers)
        self.default_field = default_field or self.fields[0]
        base = self.readers[self.default_field]
        ids = {tuple(s.id for s in r.segments) for r in self.readers.values()}
        if len(ids) != 1:
            raise ValueError("field sub-indexes have diverged segments")
        # composite filters (And/Or/Not) iterate THESE segments; Fielded
        # leaves re-route to their own field's same-id segment
        self.segments = base.segments
        self.stats = base.stats

    def field(self, name: str) -> IndexReader:
        return self.readers[name]

    @property
    def num_docs(self) -> int:
        return self.meta["num_docs"]

    def key_of(self, global_doc: int) -> str:
        return self.readers[self.default_field].key_of(global_doc)


class MultiFieldSearcher(IndexSearcher):
    """Top-k over a multi-field index: plain filters hit the default
    field; ``Fielded``-wrapped leaves route anywhere; boolean composites
    mix fields freely (aligned doc ids make set ops valid)."""

    def __init__(self, reader: MultiFieldReader, scorer=None):
        super().__init__(reader, scorer)

    def search(self, flt, k: int = 10, mode: str = "all") -> pd.DataFrame:
        if not isinstance(flt, Fielded) and not _has_fielded(flt):
            flt = Fielded(self.reader.default_field, flt)
        # mode='top': _FieldBound.route hands the executor's WAND kernels
        # the field's own aligned segment + block-max metadata, so
        # field-bound terms and cross-field unions prune like plain ones
        return super().search(flt, k=k, mode=mode)


def _has_fielded(flt) -> bool:
    if isinstance(flt, Fielded):
        return True
    for attr in ("children", "filters", "parts"):
        kids = getattr(flt, attr, None)
        if isinstance(kids, (list, tuple)):
            if any(isinstance(c, Filter) and _has_fielded(c) for c in kids):
                return True
    for attr in ("positive", "negative", "parent", "child", "inner"):
        kid = getattr(flt, attr, None)
        if isinstance(kid, Filter) and _has_fielded(kid):
            return True
    return False
