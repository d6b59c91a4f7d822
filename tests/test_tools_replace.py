"""replace_by_filter (update-as-replace) + dump/convert utilities
(reference index_writer replace semantics index_writer.hpp:278-295;
utils/index-dump.cpp; utils/index-convert.cpp)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.index.delete import replace_by_filter
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.sources.pages import write_pages
from iresearch_ray.tools import convert_index, dump_index


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("toolsrep")
    pages = str(base / "pages.parquet")
    write_pages(pages, 300, row_group_size=50)
    index_dir = str(base / "idx")
    man = build_index(pages, index_dir, analyzer="ascii", target_docs=100)
    return base, pages, index_dir, man


def test_replace_by_filter(built):
    base, pages, index_dir, man = built
    old_matches = IndexSearcher(IndexReader(index_dir), BM25()).search(
        TermFilter("mterm"), k=500)
    n_old = len(old_matches)
    assert n_old > 0
    # replacements: new docs that all contain the replacement marker
    repl = pa.table({
        "url": [f"https://r/{i}" for i in range(5)],
        "text": [f"replacement doc mterm fresh{i}" for i in range(5)],
    })
    repl_path = str(base / "repl.parquet")
    pq.write_table(repl, repl_path)
    man2 = replace_by_filter(index_dir, TermFilter("mterm"), repl_path,
                             analyzer="ascii", target_docs=100)
    assert man2["generation"] == man["generation"] + 1
    assert man2["total_deleted"] >= n_old
    r = IndexReader(index_dir)
    res = IndexSearcher(r, BM25()).search(TermFilter("mterm"), k=500)
    # ONLY the replacements match now
    assert sorted(res["key"]) == [f"https://r/{i}" for i in range(5)]
    # old generation: pre-replace view (MVCC)
    res_old = IndexSearcher(IndexReader(index_dir, man["generation"]),
                            BM25()).search(TermFilter("mterm"), k=500)
    assert list(res_old["doc"]) == list(old_matches["doc"])


def test_dump(built):
    _, _, index_dir, _ = built
    buf = io.StringIO()
    dump_index(index_dir, term="hterm", out=buf)
    s = buf.getvalue()
    assert "generation" in s and "'hterm' df=" in s
    buf2 = io.StringIO()
    dump_index(index_dir, limit=3, out=buf2)
    assert "more terms" in buf2.getvalue()


def test_convert_rank_identical(built, tmp_path_factory):
    _, _, index_dir, _ = built
    dst = str(tmp_path_factory.mktemp("converted") / "idx2")
    man_src = IndexReader(index_dir).manifest
    man2 = convert_index(index_dir, dst, target_docs=10_000)
    assert len(man2["segments"]) == 1  # repacked into one
    # purges masks: converted index has fewer docs than pre-replace total
    r2 = IndexReader(dst)
    before = IndexSearcher(IndexReader(index_dir), BM25()).search(
        TermFilter("hterm"), k=500)
    after = IndexSearcher(r2, BM25()).search(TermFilter("hterm"), k=500)
    assert sorted(after["key"]) == sorted(before["key"])


def test_tools_cli(built, capsys):
    from iresearch_ray.tools import main

    _, _, index_dir, _ = built
    assert main(["dump", "--index", index_dir, "--limit", "2"]) == 0
    assert "segment" in capsys.readouterr().out


def test_purge_unreferenced(ray_session, tmp_path_factory):
    import os

    from iresearch_ray.index.delete import delete_by_filter
    from iresearch_ray.index.merge import consolidate
    from iresearch_ray.tools import purge_unreferenced

    base = tmp_path_factory.mktemp("purge")
    pages = str(base / "p.parquet")
    write_pages(pages, 200, row_group_size=50)
    idx = str(base / "idx")
    man1 = build_index(pages, idx, analyzer="ascii", target_docs=100)  # gen1
    delete_by_filter(idx, TermFilter("mterm"))                         # gen2
    man3 = consolidate(idx, target_docs=300)                           # gen3
    before = IndexSearcher(IndexReader(idx), BM25()).search(
        TermFilter("hterm"), k=300)

    removed = purge_unreferenced(idx, keep_generations=1)
    # old segments + old manifests + superseded masks gone
    assert set(removed["segments"]) == {s["segment_id"]
                                        for s in man1["segments"]}
    assert sorted(removed["manifests"]) == ["index_1.json", "index_2.json"]
    # current generation unaffected
    after = IndexSearcher(IndexReader(idx), BM25()).search(
        TermFilter("hterm"), k=300)
    assert list(before["doc"]) == list(after["doc"])
    assert len(IndexSearcher(IndexReader(idx), BM25()).search(
        TermFilter("mterm"), k=10)) == 0
    # old generation really is gone
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        IndexReader(idx, man1["generation"])


def test_format_registry_and_convert(ray_session, tmp_path):
    """Multi-version format registry: build in 1_1 (lz4 postings), convert
    to 1_2 (snappy) — artifacts re-encode, queries stay rank-identical
    (the reference's formats::get-driven index-convert)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.formats import get_format, known_formats
    from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
    from iresearch_ray.tools import convert_index

    assert "1_0" in known_formats()
    assert get_format(1) == get_format("1_0")  # legacy int tag
    with pytest.raises(KeyError):
        get_format("9_9")

    t = pa.table({"url": [f"u{i}" for i in range(120)],
                  "text": [f"alpha beta row{i % 7}" for i in range(120)]})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=40)

    idx1 = str(tmp_path / "idx_1_1")
    build_index(p, idx1, analyzer="ascii", target_docs=60, index_format="1_1")
    seg = sorted(d for d in __import__("os").listdir(idx1) if d.startswith("seg-"))[0]
    meta_terms = pq.ParquetFile(f"{idx1}/{seg}/terms.parquet").metadata
    assert meta_terms.row_group(0).column(0).compression == "LZ4"

    idx2 = str(tmp_path / "idx_1_2")
    convert_index(idx1, idx2, target_docs=200, index_format="1_2")
    seg2 = sorted(d for d in __import__("os").listdir(idx2) if d.startswith("seg-c"))[0]
    meta2 = pq.ParquetFile(f"{idx2}/{seg2}/terms.parquet").metadata
    assert meta2.row_group(0).column(0).compression == "SNAPPY"

    r1 = IndexSearcher(IndexReader(idx1), BM25()).search(TermFilter("row3"), k=50)
    r2 = IndexSearcher(IndexReader(idx2), BM25()).search(TermFilter("row3"), k=50)
    assert list(r1["key"]) == list(r2["key"])
    assert np.array_equal(r1["score"].to_numpy(), r2["score"].to_numpy())

    with pytest.raises(KeyError):
        build_index(p, str(tmp_path / "bad"), index_format="nope")
