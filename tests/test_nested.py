"""Parent/child block join (reference ByNestedFilter, nested_filter.cpp):
children indexed immediately before their parent; child matches resolve to
the nearest following parent with score merge + min_children."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.search import (
    BM25,
    AllFilter,
    IndexReader,
    IndexSearcher,
    NestedFilter,
    TermFilter,
)

BLOCK = 4  # 3 children + 1 parent
N_BLOCKS = 30


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("nested")
    rows = []
    for b in range(N_BLOCKS):
        for c in range(BLOCK - 1):
            # child c of block b; some children carry the probe term
            probe = " probe" if (b + c) % 3 == 0 else ""
            rows.append((f"u{b:03d}c{c}", f"child text{probe} w{b % 5}"))
        rows.append((f"u{b:03d}p", "parentmark header"))
    t = pa.table({"url": [r[0] for r in rows], "text": [r[1] for r in rows]})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=BLOCK * 10)
    index_dir = str(base / "idx")
    # blocks never straddle segments: target_docs is a multiple of BLOCK
    build_index(path, index_dir, analyzer="ascii", target_docs=BLOCK * 10)
    return IndexReader(index_dir)


def _expected(merge, min_children=1):
    """Brute-force: block b matches if enough children contain 'probe'."""
    out = {}
    for b in range(N_BLOCKS):
        hits = [c for c in range(BLOCK - 1) if (b + c) % 3 == 0]
        if len(hits) >= min_children:
            out[b] = len(hits)
    return out


def test_nested_any_and_counts(built):
    s = IndexSearcher(built, BM25())
    res = s.search(NestedFilter(TermFilter("parentmark"), TermFilter("probe"),
                                merge="none", boost=1.0), k=200)
    exp = _expected("none")
    assert len(res) == len(exp)
    assert all(k.endswith("p") for k in res["key"])
    assert sorted(int(k[1:4]) for k in res["key"]) == sorted(exp)


def test_nested_min_children(built):
    s = IndexSearcher(built, BM25())
    res = s.search(NestedFilter(TermFilter("parentmark"), TermFilter("probe"),
                                merge="none", min_children=2), k=200)
    exp = _expected("none", min_children=2)
    assert sorted(int(k[1:4]) for k in res["key"]) == sorted(exp)


@pytest.mark.parametrize("merge", ["sum", "avg", "max", "min"])
def test_nested_score_merge(built, merge):
    scorer = BM25()
    s = IndexSearcher(built, scorer)
    # child scores from the engine itself
    child_prep = TermFilter("probe").prepare(built, scorer)
    child_by_parent = {}
    for seg in built.segments:
        docs, scores = child_prep.execute(seg)
        for d, sc in zip(docs, scores):
            parent_local = ((d - 1) // BLOCK + 1) * BLOCK
            child_by_parent.setdefault(seg.base + parent_local, []).append(float(sc))
    res = s.search(NestedFilter(TermFilter("parentmark"), TermFilter("probe"),
                                merge=merge), k=200)
    fn = {"sum": sum, "avg": lambda v: sum(v) / len(v),
          "max": max, "min": min}[merge]
    exp = {d: fn(v) for d, v in child_by_parent.items()}
    got = dict(zip((int(d) for d in res["doc"]), res["score"]))
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-6)


def test_nested_parent_not_own_child(built):
    # child filter that also matches parents must not self-join
    s = IndexSearcher(built, BM25())
    res = s.search(NestedFilter(TermFilter("parentmark"), AllFilter(),
                                merge="none"), k=200)
    # every block's parent has BLOCK-1 matching children
    assert len(res) == N_BLOCKS
