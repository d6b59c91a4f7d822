"""Sorted-index early-termination top-k + filtered stored-column
aggregation (reference sorted index comparer.hpp; columnstore readers)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.index.delete import delete_by_filter
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.search.stored import aggregate_stored, topk_by_sorted_field

N = 300


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("storedq")
    rng = np.random.default_rng(21)
    score = rng.permutation(N).astype(np.int64)
    t = pa.table({
        "url": [f"u{i:04d}" for i in range(N)],
        "text": [f"w{i % 6} common text" for i in range(N)],
        "rank_score": score,
    })
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=75)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="ascii", target_docs=100,
                sort_by="rank_score", store_columns=("rank_score",))
    return idx, score


def test_sorted_topk(built):
    idx, score = built
    r = IndexReader(idx)
    top = topk_by_sorted_field(r, "rank_score", k=7, descending=True)
    want = np.sort(score)[::-1][:7]
    assert list(top["rank_score"]) == list(want)
    bottom = topk_by_sorted_field(r, "rank_score", k=7)
    assert list(bottom["rank_score"]) == list(np.sort(score)[:7])


def test_sorted_topk_respects_mask(built):
    idx, score = built
    # mask the global maximum's doc, top-1 must shift
    top1 = topk_by_sorted_field(IndexReader(idx), "rank_score", k=1,
                                descending=True)
    key = top1["key"].iloc[0]
    i = int(key[1:])
    delete_by_filter(idx, TermFilter(f"w{i % 6}"))  # masks that doc (+others)
    r2 = IndexReader(idx)
    top = topk_by_sorted_field(r2, "rank_score", k=5, descending=True)
    masked_mod = i % 6
    assert all(int(k[1:]) % 6 != masked_mod for k in top["key"])
    survivors = sorted((s for j, s in enumerate(score) if j % 6 != masked_mod),
                       reverse=True)[:5]
    assert list(top["rank_score"]) == survivors


def test_aggregate_stored(built, tmp_path_factory):
    # fresh unmasked index for clean expectations
    base = tmp_path_factory.mktemp("agg")
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, size=N).astype(np.int64)
    t = pa.table({
        "url": [f"u{i:04d}" for i in range(N)],
        "text": [f"w{i % 6} filler" for i in range(N)],
        "v": vals,
    })
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=75)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="ascii", target_docs=100,
                store_columns=("v",))
    r = IndexReader(idx)
    out = aggregate_stored(r, TermFilter("w2"), "v",
                           aggs=("count", "sum", "avg", "min", "max"))
    sel = vals[np.arange(N) % 6 == 2]
    assert out["count"] == len(sel)
    assert out["sum"] == float(sel.sum())
    assert out["avg"] == pytest.approx(sel.mean())
    assert out["min"] == float(sel.min()) and out["max"] == float(sel.max())


def test_facets(built):
    idx, _ = built
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.search.stored import facets

    # reuse the sorted fixture's index? it stores rank_score only; build a
    # small faceted one
    r = IndexReader(idx)
    out = facets(r, TermFilter("common"), "rank_score", top_n=3)
    assert list(out.columns) == ["value", "n_docs"]
    assert len(out) == 3 and (out["n_docs"] == 1).all()  # scores unique
