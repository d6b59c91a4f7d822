"""End-to-end ingest pipeline: extract -> dedup -> stage -> index, with
the byte-identical-text invariant and resume."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from iresearch_ray.pipelines.ingest import ingest
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.sources.pages import synthesize_pages, write_pages


def test_ingest_end_to_end(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("ingest")
    pages = str(base / "pages.parquet")
    write_pages(pages, 300, row_group_size=100)  # includes a planted dup pair
    ds = ray.data.read_parquet(pages)
    work = str(base / "work")

    man = ingest(ds, work, analyzer="ascii", target_docs=100,
                 store_columns=("text",))
    assert man["ingest_counters"]["duplicates_dropped"] >= 1
    n_after = man["num_docs"]
    assert n_after == 300 - man["ingest_counters"]["duplicates_dropped"]

    reader = IndexReader(f"{work}/index")
    s = IndexSearcher(reader, BM25())
    res = s.search(TermFilter("hterm"), k=300)
    assert len(res) > 0

    # byte-identical extracted text per url (north-rule invariant): the
    # stored text equals the original pages table's text for sampled urls
    t = synthesize_pages(300)
    orig = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    st = reader.stored(res["doc"].to_numpy()[:20], ["text"])
    for doc, text in zip(res["key"][:20], st["text"]):
        assert orig[doc] == text

    # resume: second ingest skips staging AND every segment
    man2 = ingest(ray.data.read_parquet(pages), work, analyzer="ascii",
                  target_docs=100, store_columns=("text",))
    assert man2["build_stats"]["segments_skipped"] == len(man2["segments"])
    assert man2["num_docs"] == n_after


def test_ingest_crash_resume_no_duplication(ray_session, tmp_path_factory):
    """Review finding: stale staged.tmp from a crashed run must not double
    the corpus; resumed runs report the prior dedup counter."""
    import os
    import ray.data

    base = tmp_path_factory.mktemp("ingestcrash")
    pages = str(base / "p.parquet")
    write_pages(pages, 100, row_group_size=50)
    work = str(base / "work")
    # simulate a crash AFTER writing tmp but BEFORE the atomic rename
    os.makedirs(work, exist_ok=True)
    tmp = os.path.join(work, "staged.tmp")
    ray.data.read_parquet(pages).write_parquet(tmp)
    assert os.listdir(tmp)

    man = ingest(ray.data.read_parquet(pages), work, analyzer="ascii",
                 target_docs=60)
    dropped = man["ingest_counters"]["duplicates_dropped"]
    assert man["num_docs"] == 100 - dropped  # not doubled

    man2 = ingest(ray.data.read_parquet(pages), work, analyzer="ascii",
                  target_docs=60)
    assert man2["ingest_counters"]["duplicates_dropped"] == dropped  # persisted
    assert man2["num_docs"] == man["num_docs"]
