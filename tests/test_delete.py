"""Document deletes: per-segment doc masks (MVCC), masked reads, and
physical purge at consolidation (reference document_mask path,
core/formats/formats_10.cpp:3546; removals core/index/index_writer.hpp:252-295;
merge purge core/index/merge_writer.cpp:207-307)."""

import numpy as np
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.index.delete import delete_by_filter
from iresearch_ray.index.merge import consolidate
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.search.filters import OrFilter
from iresearch_ray.sources.pages import write_pages

N_DOCS = 400


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("delete")
    pages = str(base / "pages.parquet")
    write_pages(pages, N_DOCS, row_group_size=50)
    index_dir = str(base / "index")
    man = build_index(pages, index_dir, analyzer="ascii", target_docs=100)
    return index_dir, man


def _search(index_dir, flt, generation=None, k=50):
    r = IndexReader(index_dir, generation)
    return IndexSearcher(r, BM25()).search(flt, k=k)


def test_delete_masks_matches_and_mvcc(built):
    index_dir, man = built
    before = _search(index_dir, TermFilter("mterm"))
    assert len(before) > 0
    man2 = delete_by_filter(index_dir, TermFilter("mterm"))
    assert man2["generation"] == man["generation"] + 1
    assert man2["total_deleted"] >= len(before)

    after = _search(index_dir, TermFilter("mterm"), man2["generation"])
    assert len(after) == 0
    # old generation unaffected (MVCC snapshot)
    old = _search(index_dir, TermFilter("mterm"), man["generation"])
    assert list(old["doc"]) == list(before["doc"])


def test_masked_docs_dropped_from_other_queries_scores_stable(built):
    index_dir, _ = built
    # stats keep counting masked docs until merge -> surviving docs keep
    # their exact scores (reference: document_mask applied at read only)
    gen1 = 1
    before = _search(index_dir, TermFilter("hterm"), gen1, k=N_DOCS)
    cur = _search(index_dir, TermFilter("hterm"), k=N_DOCS)
    deleted_docs = set(before["doc"]) - set(cur["doc"])
    # some hterm docs also contained mterm and were masked
    surviving = before[~before["doc"].isin(deleted_docs)]
    assert list(cur["doc"]) == list(surviving["doc"])
    assert np.array_equal(cur["score"].to_numpy(), surviving["score"].to_numpy())


def test_consolidate_purges_masked_docs(built):
    index_dir, man = built
    pre = IndexReader(index_dir)
    n_masked = sum(len(s.mask) for s in pre.segments if s.mask is not None)
    assert n_masked > 0
    hterm_before = _search(index_dir, TermFilter("hterm"), k=N_DOCS)

    man3 = consolidate(index_dir, target_docs=N_DOCS)
    assert man3["num_docs"] == man["num_docs"] - n_masked
    r = IndexReader(index_dir, man3["generation"])
    assert all(s.mask is None for s in r.segments)
    assert not any(e.get("docmask") for e in man3["segments"])

    # mterm fully purged: term gone from every merged dictionary
    assert r.df("mterm") == 0
    assert len(_search(index_dir, TermFilter("mterm"), man3["generation"])) == 0
    # same surviving docs match hterm (global ids shift after remap, keys don't)
    hterm_after = _search(index_dir, TermFilter("hterm"),
                          man3["generation"], k=N_DOCS)
    assert sorted(hterm_after["key"]) == sorted(hterm_before["key"])


def test_delete_union_accumulates(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("delete2")
    pages = str(base / "pages.parquet")
    write_pages(pages, 200, row_group_size=50)
    index_dir = str(base / "index")
    build_index(pages, index_dir, analyzer="ascii", target_docs=100)
    m1 = delete_by_filter(index_dir, TermFilter("mterm"))
    m2 = delete_by_filter(index_dir, TermFilter("lterm"))
    assert m2["generation"] == m1["generation"] + 1
    assert m2["total_deleted"] >= m1["total_deleted"]
    both = _search(index_dir, OrFilter([TermFilter("mterm"),
                                        TermFilter("lterm")]))
    assert len(both) == 0
