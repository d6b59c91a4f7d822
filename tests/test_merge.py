"""Consolidation: merged index must answer rank-identically (reference
merge_writer semantics) + resume/lineage checkpointing (FIXTURES.md F6)."""

import json
import os

import numpy as np
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.index import manifest as manifest_mod
from iresearch_ray.index.merge import consolidate, plan_consolidation
from iresearch_ray.index.segment import META_FILE
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, OrFilter, PhraseFilter, TermFilter
from iresearch_ray.sources.pages import write_pages

N_DOCS = 600


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    pages = str(base / "pages.parquet")
    write_pages(pages, N_DOCS, row_group_size=50)
    index_dir = str(base / "index")
    man = build_index(pages, index_dir, analyzer="ascii", target_docs=100)
    assert len(man["segments"]) == 6
    return pages, index_dir, man


def _results(index_dir, flt, generation=None, k=20):
    r = IndexReader(index_dir, generation)
    return IndexSearcher(r, BM25()).search(flt, k=k)


def test_consolidate_rank_identical(built):
    _, index_dir, man = built
    queries = [TermFilter("hterm"), TermFilter("mterm"),
               OrFilter([TermFilter("hterm"), TermFilter("lterm")]),
               PhraseFilter(["ref", "name"])]
    before = [_results(index_dir, q, man["generation"]) for q in queries]
    man2 = consolidate(index_dir, target_docs=300)
    assert man2["generation"] == man["generation"] + 1
    assert len(man2["segments"]) < len(man["segments"])
    assert man2["num_docs"] == man["num_docs"]
    after = [_results(index_dir, q, man2["generation"]) for q in queries]
    for b, a in zip(before, after):
        assert list(b["doc"]) == list(a["doc"])
        assert np.array_equal(b["score"].to_numpy(), a["score"].to_numpy())
        assert list(b["key"]) == list(a["key"])


def test_old_generation_still_readable(built):
    _, index_dir, man = built
    r_old = IndexReader(index_dir, man["generation"])
    assert r_old.num_docs == N_DOCS


def test_merged_dictionary_totals(built):
    _, index_dir, _ = built
    man2 = manifest_mod.load(index_dir)
    r = IndexReader(index_dir, man2["generation"])
    assert r.df("hterm") > 0
    r1 = IndexReader(index_dir, 1)
    for t in ("hterm", "mterm", "ref", "abcd"):
        assert r.df(t) == r1.df(t)


def test_plan_consolidation_adjacency():
    segs = [{"segment_id": f"s{i}", "num_docs": 100} for i in range(5)]
    runs = plan_consolidation(segs, target_docs=250)
    assert runs == [["s0", "s1"], ["s2", "s3"]] or runs == [["s0", "s1"], ["s2", "s3"], ["s4"]][:2]
    # singleton tail never merges alone
    assert all(len(r) >= 2 for r in runs)


def test_resume_skips_done_segments(built, ray_session):
    pages, index_dir, man = built
    # delete ONE segment dir; rebuild must reprocess only that one (F6)
    victim = man["segments"][2]["segment_id"]
    import shutil
    shutil.rmtree(os.path.join(index_dir, victim))
    man3 = build_index(pages, index_dir, analyzer="ascii", target_docs=100)
    bs = man3["build_stats"]
    assert bs["segments_built"] == 1
    assert bs["segments_skipped"] == 5
    with open(os.path.join(index_dir, victim, META_FILE)) as f:
        meta = json.load(f)
    assert meta["counters"]["docs_tokenized"] == meta["num_docs"]
    # rebuilt index answers identically to generation 1
    a = _results(index_dir, TermFilter("hterm"), generation=1)
    b = _results(index_dir, TermFilter("hterm"), generation=man3["generation"])
    assert list(a["doc"]) == list(b["doc"])
    assert np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_analyzer_change_invalidates_resume(built, ray_session):
    pages, index_dir, _ = built
    man = build_index(pages, index_dir, analyzer="unicode", target_docs=100)
    assert man["build_stats"]["segments_built"] == 6  # different lineage hash


def test_incremental_commit_appends_segments(ray_session, tmp_path_factory):
    """Reference multi-commit semantics (index_writer commit generations):
    appending a new input file builds ONLY its segments and commits a new
    generation; existing segments resume-skip (no re-tokenization)."""
    from iresearch_ray.search import TermFilter as TF

    base = tmp_path_factory.mktemp("incr")
    p1, p2 = str(base / "a.parquet"), str(base / "b.parquet")
    write_pages(p1, 200, row_group_size=50)
    write_pages(p2, 100, row_group_size=50, seed=7)
    index_dir = str(base / "idx")

    man1 = build_index(p1, index_dir, analyzer="ascii", target_docs=100)
    n1 = len(man1["segments"])
    hits1 = len(_results(index_dir, TF("hterm"), k=500))

    man2 = build_index([p1, p2], index_dir, analyzer="ascii", target_docs=100)
    assert man2["generation"] == man1["generation"] + 1
    assert man2["build_stats"]["segments_skipped"] == n1  # old: untouched
    assert man2["build_stats"]["segments_built"] == len(man2["segments"]) - n1
    assert man2["num_docs"] == 300

    hits2 = len(_results(index_dir, TF("hterm"), k=500))
    assert hits2 > hits1
    # old generation still serves the pre-append view (MVCC)
    assert len(_results(index_dir, TF("hterm"), man1["generation"], k=500)) == hits1


def test_carry_forward_masks_and_merges(ray_session, tmp_path_factory):
    """A later build commit must not lose prior state (reference
    index_writer commits are append-only): doc masks survive, consolidated
    segments stay consolidated, replacement segments stay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.delete import delete_by_filter, replace_by_filter
    from iresearch_ray.search import TermFilter as TF

    base = tmp_path_factory.mktemp("carry")
    p1, p2 = str(base / "a.parquet"), str(base / "b.parquet")
    write_pages(p1, 200, row_group_size=50)
    write_pages(p2, 100, row_group_size=50, seed=11)
    idx = str(base / "idx")
    build_index(p1, idx, analyzer="ascii", target_docs=100)          # gen1
    delete_by_filter(idx, TF("mterm"))                               # gen2
    man3 = consolidate(idx, target_docs=400)                         # gen3
    repl = pa.table({"url": ["https://r/1"], "text": ["only replacement mterm"]})
    pq.write_table(repl, str(base / "r.parquet"))
    replace_by_filter(idx, TF("lterm"), str(base / "r.parquet"),
                      analyzer="ascii")                              # gen4

    man5 = build_index([p1, p2], idx, analyzer="ascii", target_docs=100)  # gen5
    ids = [e["segment_id"] for e in man5["segments"]]
    # consolidated segment survived (original constituents not resurrected)
    assert any(i.startswith("seg-m") for i in ids)
    assert not any(i in ("seg-00000", "seg-00001") for i in ids)
    # replacement segment survived
    assert any(i.startswith("seg-r") for i in ids)

    r = IndexReader(idx)
    s = IndexSearcher(r, BM25())
    # original mterm docs were purged at consolidation; the replacement doc
    # and the appended seed-11 docs are the only mterm matches now
    from iresearch_ray.sources.pages import synthesize_pages
    appended = set(synthesize_pages(100, seed=11)["url"].to_pylist())
    got = set(s.search(TF("mterm"), k=500)["key"])
    assert "https://r/1" in got
    assert got - {"https://r/1"} <= appended
    # lterm mask (gen4) survived on the consolidated segment
    lterm_hits = set(s.search(TF("lterm"), k=500)["key"])
    assert lterm_hits <= appended


def test_carry_forward_two_level_consolidation(ray_session, tmp_path_factory):
    """Finding from review: a resumed no-op build after a SECOND
    consolidation must keep the second-level merged segment (transitive
    source_leaves lineage), not resurrect constituents."""
    from iresearch_ray.index.delete import delete_by_filter
    from iresearch_ray.search import TermFilter as TF

    base = tmp_path_factory.mktemp("carry2")
    p1, p2 = str(base / "a.parquet"), str(base / "b.parquet")
    write_pages(p1, 200, row_group_size=50)
    write_pages(p2, 100, row_group_size=50, seed=13)
    idx = str(base / "idx")
    build_index(p1, idx, analyzer="ascii", target_docs=50)     # 4 segs
    consolidate(idx, target_docs=200)                          # m1
    delete_by_filter(idx, TF("mterm"))
    build_index([p1, p2], idx, analyzer="ascii", target_docs=50)  # + b segs
    man = consolidate(idx, target_docs=400)                    # m2 over all
    assert len(man["segments"]) == 1
    m2 = man["segments"][0]["segment_id"]
    deleted_before = IndexSearcher(IndexReader(idx), BM25()).search(
        TF("mterm"), k=500)

    # resubmit the same (no-op) build: manifest must still be [m2]
    man2 = build_index([p1, p2], idx, analyzer="ascii", target_docs=50)
    assert [e["segment_id"] for e in man2["segments"]] == [m2]
    assert man2["num_docs"] == man["num_docs"]
    after = IndexSearcher(IndexReader(idx), BM25()).search(TF("mterm"), k=500)
    assert list(after["doc"]) == list(deleted_before["doc"])


def test_merge_preserves_format_and_norm_feature(ray_session, tmp_path):
    """Review findings: consolidation must keep the operator's storage
    format (not silently re-encode in 1_0) and recompute stored
    norm-feature columns instead of dropping them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.merge import consolidate
    from iresearch_ray.search import IndexReader

    t = pa.table({"url": [f"u{i}" for i in range(60)],
                  "text": [f"alpha beta row{i % 5}" for i in range(60)]})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=20)
    idx = str(tmp_path / "idx")
    build_index(p, idx, analyzer="ascii", target_docs=20,
                index_format="1_1", norm_feature="norm")
    man = consolidate(idx, 1000)
    merged = [s["segment_id"] for s in man["segments"]
              if s["segment_id"].startswith("seg-m")]
    assert merged
    seg_dir = f"{idx}/{merged[0]}"
    md = pq.ParquetFile(f"{seg_dir}/terms.parquet").metadata
    assert md.row_group(0).column(0).compression == "LZ4"  # format kept
    r = IndexReader(idx)
    for sv in r.segments:
        stored = sv.reader.norms("norm")
        assert stored is not None
        dl = sv.reader.doc_len
        assert np.array_equal(
            stored,
            np.float32(1) / np.sqrt(np.maximum(dl, 1).astype(np.float32)))


def test_mixed_feature_merge_roundtrip(ray_session, tmp_path):
    """VERDICT r3 item 6: segments with DIFFERENT feature sets merge like
    the reference (merge_writer.cpp:1116-1174 accepts any combination).
    A source lacking a stream contributes empty entries — zero-width
    offsets / zero-byte payloads — and heterogeneous norm features merge
    as the union, each recomputed from merged doc_len."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray import FORMAT_VERSION
    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.features import register_norm_feature
    from iresearch_ray.index.merge import merge_segment_tables
    from iresearch_ray.index.segment import SegmentReader, write_segment_dir
    from iresearch_ray.search import IndexReader

    def _invlen(dl):
        return 1.0 / np.maximum(dl, 1)

    # registered on the driver for the merge; build ships (name, fn) so
    # worker processes register it too
    register_norm_feature("invlen2_test", _invlen)

    def mk(name, texts, **kw):
        t = pa.table({"url": [f"{name}{i}" for i in range(len(texts))],
                      "text": texts})
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, p)
        idx = str(tmp_path / f"{name}_idx")
        build_index(p, idx, target_docs=100, **kw)
        return IndexReader(idx).segments[0].reader

    r_offs = mk("offs", ["alpha beta alpha", "gamma alpha"],
                analyzer="ascii", index_features=("pos", "offs"),
                norm_feature=("invlen2_test", _invlen))
    r_pay = mk("pay", ["alpha|P0 delta|D0"], analyzer="payload-delimiter",
               index_features=("pos", "pay"))
    r_plain = mk("plain", ["alpha epsilon"], analyzer="ascii",
                 norm_feature="norm")

    terms_tbl, docmap, stats, columns_tbl = merge_segment_tables(
        [r_offs, r_pay, r_plain])
    # union of streams present
    assert "offs_start_blob" in terms_tbl.column_names
    assert "pay_blob" in terms_tbl.column_names
    out_dir = str(tmp_path / "merged_idx")
    meta = {"format_version": FORMAT_VERSION, "segment_id": "seg-m0000",
            **stats}
    write_segment_dir(out_dir, "seg-m0000", terms_tbl, docmap, meta,
                      columns_tbl)
    seg = SegmentReader(f"{out_dir}/seg-m0000")

    # 'alpha' lives in all three sources: docs 1,2 (offs), 3 (pay), 4 (plain)
    i = seg.lookup("alpha")
    docs, freqs, starts, ends, run_offs = seg.postings_offsets(i)
    assert list(docs) == [1, 2, 3, 4]
    by_doc = {int(d): list(zip(starts[run_offs[j]:run_offs[j + 1]],
                               ends[run_offs[j]:run_offs[j + 1]]))
              for j, d in enumerate(docs)}
    assert by_doc[1] == [(0, 5), (11, 16)]  # real spans from the offs source
    assert by_doc[2] == [(6, 11)]
    assert by_doc[3] == [(0, 0)]            # synthesized empty: pay source
    assert by_doc[4] == [(0, 0)]            # synthesized empty: plain source
    docs_p, _, pays, run_p = seg.postings_payloads(i)
    assert list(docs_p) == [1, 2, 3, 4]
    pay_by_doc = {int(d): list(pays[run_p[j]:run_p[j + 1]])
                  for j, d in enumerate(docs_p)}
    assert pay_by_doc[3] == [b"P0"]          # verbatim from the pay source
    assert pay_by_doc[1] == [b"", b""]       # synthesized empty elsewhere
    assert pay_by_doc[4] == [b""]
    # payload term from the pay source survives untouched
    j = seg.lookup("delta")
    _, _, pays_d, _ = seg.postings_payloads(j)
    assert list(pays_d) == [b"D0"]

    # heterogeneous norm features: union, each recomputed over merged lens
    assert stats["norm_features"] == ["invlen2_test", "norm"]
    dl = seg.doc_len
    assert np.allclose(seg.norms("invlen2_test"), 1.0 / np.maximum(dl, 1))
    assert np.allclose(
        seg.norms("norm"),
        np.float32(1) / np.sqrt(np.maximum(dl, 1).astype(np.float32)))

    # RE-merge the heterogeneous merged segment: its meta records the norm
    # union only under the plural 'norm_features' key (singular is ambiguous
    # there), and a later tier consolidation must still carry both features —
    # this used to silently drop every norm column
    r_more = mk("more", ["alpha zeta eta"], analyzer="ascii",
                norm_feature="norm")
    terms2, docmap2, stats2, cols2 = merge_segment_tables([seg, r_more])
    assert stats2["norm_features"] == ["invlen2_test", "norm"]
    out2 = str(tmp_path / "merged_idx2")
    write_segment_dir(out2, "seg-m0001", terms2, docmap2,
                      {"format_version": FORMAT_VERSION,
                       "segment_id": "seg-m0001", **stats2}, cols2)
    seg2 = SegmentReader(f"{out2}/seg-m0001")
    dl2 = seg2.doc_len
    assert len(dl2) == 5
    assert np.allclose(seg2.norms("invlen2_test"), 1.0 / np.maximum(dl2, 1))
    assert np.allclose(
        seg2.norms("norm"),
        np.float32(1) / np.sqrt(np.maximum(dl2, 1).astype(np.float32)))
