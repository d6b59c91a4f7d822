"""Concurrent MVCC stress: reads pinned to a generation stay identical
while deletes / consolidations / incremental commits land concurrently
(the reference's multi-thread insert/commit/consolidate profile tests,
tests/index/index_profile_tests.cpp — ours exercises the manifest-level
MVCC the same way)."""

import threading

import numpy as np
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.index.delete import delete_by_filter
from iresearch_ray.index.merge import consolidate
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.sources.pages import write_pages


def test_concurrent_readers_vs_writers(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("conc")
    p1, p2 = str(base / "a.parquet"), str(base / "b.parquet")
    write_pages(p1, 300, row_group_size=50)
    write_pages(p2, 100, row_group_size=50, seed=9)
    idx = str(base / "idx")
    man1 = build_index(p1, idx, analyzer="ascii", target_docs=100)
    gen1 = man1["generation"]

    baseline = IndexSearcher(IndexReader(idx, gen1), BM25()).search(
        TermFilter("hterm"), k=500)

    errors: list[Exception] = []
    stop = threading.Event()

    def reader_loop():
        # a long-lived reader pinned to gen1 must see identical results
        # regardless of what writers commit
        try:
            r = IndexReader(idx, gen1)
            s = IndexSearcher(r, BM25())
            while not stop.is_set():
                res = s.search(TermFilter("hterm"), k=500)
                assert list(res["doc"]) == list(baseline["doc"])
                assert np.array_equal(res["score"].to_numpy(),
                                      baseline["score"].to_numpy())
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader_loop) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        man2 = delete_by_filter(idx, TermFilter("mterm"))   # gen2
        consolidate(idx, target_docs=400)                   # gen3 (purges)
        build_index([p1, p2], idx, analyzer="ascii",        # gen4 (append)
                    target_docs=100)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors[0]

    # newest generation reflects every writer: appended docs present AND
    # the delete survives the later commits (no resurrection)
    r = IndexReader(idx)
    assert r.manifest["generation"] == gen1 + 3
    # consolidation physically purged the masked docs, then 100 appended
    assert r.num_docs == 300 - man2["total_deleted"] + 100
    s = IndexSearcher(r, BM25())
    assert len(s.search(TermFilter("hterm"), k=500)) > len(baseline)
    mterm_now = s.search(TermFilter("mterm"), k=500)
    # only the seed-9 appended file may contribute mterm docs
    assert all(int(k.rsplit("/", 1)[1]) >= 300 or True for k in mterm_now["key"])
    from iresearch_ray.sources.pages import synthesize_pages
    t2 = synthesize_pages(100, seed=9)
    appended_urls = set(t2["url"].to_pylist())
    assert set(mterm_now["key"]) <= appended_urls
