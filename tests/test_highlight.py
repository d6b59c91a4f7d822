"""Highlight spans/snippets for top-k docs via columnstore re-tokenize
(deviation from the reference's stored OFFS feature, documented in
search/highlight.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.index.build import build_index
from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter
from iresearch_ray.search.highlight import highlight, highlight_snippets


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("hl")
    texts = ["The Probe term appears here, then probe again later.",
             "no match at all in this one",
             "probe at the very start",
             "UPPERCASE PROBE ONLY"]
    t = pa.table({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
    path = str(base / "p.parquet")
    pq.write_table(t, path)
    index_dir = str(base / "idx")
    build_index(path, index_dir, analyzer="ascii", target_docs=100,
                store_columns=("text",))
    return IndexReader(index_dir), texts


def test_highlight_spans_match_source(built):
    reader, texts = built
    res = IndexSearcher(reader, BM25()).search(TermFilter("probe"), k=10)
    spans = highlight(reader, res["doc"].to_numpy(), ["probe"],
                      get_analyzer("ascii"))
    assert len(spans) == 4  # doc0 has two occurrences
    for _, r in spans.iterrows():
        src = texts[int(r["doc"]) - 1]
        assert src[r["start"]:r["end"]].lower() == "probe"


def test_highlight_snippets(built):
    reader, texts = built
    res = IndexSearcher(reader, BM25()).search(TermFilter("probe"), k=10)
    sn = highlight_snippets(reader, res["doc"].to_numpy(), ["probe"],
                            get_analyzer("ascii"), context=5)
    assert len(sn) == 3
    assert all("<em>" in s for s in sn["snippet"])
    # case preserved from the ORIGINAL text
    up = sn[sn["doc"] == 4]["snippet"].iloc[0]
    assert "<em>PROBE</em>" in up


def test_highlight_requires_offset_analyzer(built):
    reader, _ = built
    with pytest.raises(TypeError):
        highlight(reader, np.array([1]), ["x"], object())


@pytest.fixture(scope="module")
def built_offs(ray_session, tmp_path_factory):
    """Index built WITH the OFFS feature (stored per-posting offsets)."""
    base = tmp_path_factory.mktemp("hl_offs")
    rng = np.random.default_rng(3)
    words = ["probe", "alpha", "beta", "gamma", "filler", "words"]
    texts = ["The Probe term appears here, then probe again later.",
             "no match at all in this one",
             "probe at the very start",
             "UPPERCASE PROBE ONLY"]
    texts += [" ".join(rng.choice(words, size=rng.integers(3, 12)))
              for _ in range(200)]
    t = pa.table({"url": [f"u{i:03d}" for i in range(len(texts))],
                  "text": texts})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=64)
    index_dir = str(base / "idx")
    build_index(path, index_dir, analyzer="ascii", target_docs=100,
                store_columns=("text",), index_features=("pos", "offs"))
    return IndexReader(index_dir), texts


def test_offsets_roundtrip(built_offs):
    """Stored offsets decode to exactly the analyzer's spans."""
    reader, texts = built_offs
    ana = get_analyzer("ascii")
    seg = reader.segments[0]
    assert seg.reader.has_offsets
    i = seg.reader.lookup("probe")
    docs, freqs, starts, ends, run_offs = seg.reader.postings_offsets(i)
    for j, d in enumerate(docs):
        src = texts[int(d + seg.base) - 1]
        toks, ts, te = ana.tokens_with_offsets(src)
        want = [(s, e) for t_, s, e in zip(toks, ts, te) if t_ == "probe"]
        got = list(zip(starts[run_offs[j]:run_offs[j + 1]],
                       ends[run_offs[j]:run_offs[j + 1]]))
        assert got == want, (d, got, want)


def test_highlight_indexed_equals_retokenize(built_offs):
    """Index-backed highlight (no re-tokenization) must equal the
    stored-text re-tokenize path span for span."""
    import pandas as pd

    from iresearch_ray.search.highlight import highlight_indexed

    reader, texts = built_offs
    res = IndexSearcher(reader, BM25()).search(TermFilter("probe"), k=50)
    docs = res["doc"].to_numpy()
    a = highlight_indexed(reader, docs, ["probe", "alpha"])
    b = highlight(reader, docs, ["probe", "alpha"], get_analyzer("ascii"))
    b = b.sort_values(["doc", "start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["doc", "term", "start", "end"]].astype({"doc": np.int64}),
        b[["doc", "term", "start", "end"]].astype({"doc": np.int64}))
    # spans index the original text
    for _, r in a.iterrows():
        assert texts[int(r["doc"]) - 1][r["start"]:r["end"]].lower() == r["term"]


def test_highlight_snippets_indexed_equals_retokenize(built_offs):
    """indexed=True snippets (OFFS postings, no re-tokenization) must be
    byte-identical to the analyzer path, and indexed=False must demand
    an analyzer."""
    import pandas as pd

    from iresearch_ray.search.highlight import highlight_snippets

    reader, texts = built_offs
    res = IndexSearcher(reader, BM25()).search(TermFilter("probe"), k=50)
    docs = res["doc"].to_numpy()
    a = highlight_snippets(reader, docs, ["probe"], indexed=True, context=7)
    b = highlight_snippets(reader, docs, ["probe"], get_analyzer("ascii"),
                           context=7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) and all("<em>" in s for s in a["snippet"])
    with pytest.raises(TypeError):
        highlight_snippets(reader, docs, ["probe"])


def test_offs_feature_guards(built, built_offs, tmp_path):
    """Plain indexes reject postings_offsets; offs needs an offset-capable
    analyzer.  Mixed offs/non-offs segment sets MERGE (round-4, matching
    merge_writer.cpp:1116-1174): the merged segment declares offs and the
    offs-less source's occurrences read back as zero-width [0, 0)."""
    from iresearch_ray.index.merge import merge_segment_tables

    plain_reader, _ = built
    with pytest.raises(ValueError):
        plain_reader.segments[0].reader.postings_offsets(0)
    offs_reader, _ = built_offs
    terms_tbl, _, stats, _ = merge_segment_tables(
        [plain_reader.segments[0].reader, offs_reader.segments[0].reader])
    assert "offs_start_blob" in terms_tbl.column_names
    assert stats["num_docs"] == (plain_reader.segments[0].reader.num_docs
                                 + offs_reader.segments[0].reader.num_docs)
    from iresearch_ray.index.build import BuildSegmentTask
    with pytest.raises(ValueError):
        BuildSegmentTask(str(tmp_path / "x"), "keyword", {}, "text", "url",
                         index_features=("pos", "offs"))


def test_offs_consolidation_roundtrip(ray_session, tmp_path):
    """Consolidating OFFS segments carries the offset streams through the
    k-way merge (reference merge_writer.cpp:1116-1174 merges every index
    feature): highlight_indexed spans and ranks are identical before and
    after, on fewer segments."""
    import pandas as pd

    from iresearch_ray.index.merge import consolidate
    from iresearch_ray.search.highlight import highlight_indexed

    rng = np.random.default_rng(11)
    words = ["probe", "alpha", "beta", "gamma", "filler"]
    texts = ["The Probe term appears here, then probe again later.",
             "probe at the very start"]
    texts += [" ".join(rng.choice(words, size=rng.integers(3, 12)))
              for _ in range(120)]
    t = pa.table({"url": [f"u{i:03d}" for i in range(len(texts))],
                  "text": texts})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=16)
    idx = str(tmp_path / "idx")
    build_index(p, idx, analyzer="ascii", target_docs=20,
                store_columns=("text",), index_features=("pos", "offs"))
    before = IndexReader(idx)
    n_before = len(before.segments)
    assert n_before > 1
    res_b = IndexSearcher(before, BM25()).search(TermFilter("probe"), k=200)
    spans_b = highlight_indexed(before, res_b["doc"].to_numpy(),
                                ["probe", "alpha"])
    consolidate(idx, 10_000)
    after = IndexReader(idx)
    assert len(after.segments) < n_before
    assert all(s.reader.has_offsets for s in after.segments)
    assert all("offs" in s.reader.meta["index_features"]
               for s in after.segments)
    res_a = IndexSearcher(after, BM25()).search(TermFilter("probe"), k=200)
    pd.testing.assert_frame_equal(
        res_b.sort_values("key").reset_index(drop=True)[["key", "score"]],
        res_a.sort_values("key").reset_index(drop=True)[["key", "score"]])
    spans_a = highlight_indexed(after, res_a["doc"].to_numpy(),
                                ["probe", "alpha"])
    key = ["doc", "term", "start", "end"]
    pd.testing.assert_frame_equal(
        spans_b[key].sort_values(key).reset_index(drop=True),
        spans_a[key].sort_values(key).reset_index(drop=True))
    # merged offsets still index the ORIGINAL text
    for _, r in spans_a.iterrows():
        assert texts[int(r["doc"]) - 1][r["start"]:r["end"]].lower() == r["term"]


def test_offs_consolidation_with_deletes(ray_session, tmp_path):
    """Masked docs purge during an OFFS merge: their offset runs vanish
    with their postings, survivors' spans still index the original text."""
    from iresearch_ray.index.delete import delete_by_filter
    from iresearch_ray.index.merge import consolidate

    texts = ["probe alpha probe", "drop me probe", "alpha then probe end",
             "drop probe too", "probe"]
    t = pa.table({"url": [f"u{i}" for i in range(len(texts))],
                  "text": texts})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=2)
    idx = str(tmp_path / "idx")
    build_index(p, idx, analyzer="ascii", target_docs=2,
                store_columns=("text",), index_features=("pos", "offs"))
    delete_by_filter(idx, TermFilter("drop"))
    consolidate(idx, 10_000)
    reader = IndexReader(idx)
    assert len(reader.segments) == 1
    res = IndexSearcher(reader, BM25()).search(TermFilter("probe"), k=10)
    assert sorted(res["key"]) == ["u0", "u2", "u4"]
    ana = get_analyzer("ascii")
    survivors = [s for i, s in enumerate(texts) if i not in (1, 3)]
    seg = reader.segments[0].reader
    i = seg.lookup("probe")
    docs, freqs, starts, ends, run_offs = seg.postings_offsets(i)
    assert sorted(docs.tolist()) == [1, 2, 3]  # densely remapped
    for j, d in enumerate(docs):
        src = survivors[int(d) - 1]
        toks, ts, te = ana.tokens_with_offsets(src)
        want = [(s, e) for t_, s, e in zip(toks, ts, te) if t_ == "probe"]
        got = list(zip(starts[run_offs[j]:run_offs[j + 1]],
                       ends[run_offs[j]:run_offs[j + 1]]))
        assert got == want


def test_payloads_roundtrip(ray_session, tmp_path):
    """PAY feature: per-occurrence payload bytes round-trip through the
    index (reference .pay stream, formats_10.cpp:345-353; payload token
    attribute carried by the delimited stream)."""
    from iresearch_ray.analysis.tokenizers import PayloadDelimiterAnalyzer
    from iresearch_ray.index.build import BuildSegmentTask

    texts = ["alpha|A1 beta|B1 alpha|A2",
             "beta gamma|G0",
             "alpha|A3 alpha"]
    t = pa.table({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=1)  # >1 segment so consolidate runs
    idx = str(tmp_path / "idx")
    build_index(p, idx, analyzer="payload-delimiter", target_docs=2,
                index_features=("pos", "pay"))
    reader = IndexReader(idx)
    assert all(s.reader.has_payloads for s in reader.segments)
    ana = PayloadDelimiterAnalyzer()
    # expected payloads per (term, global doc), position order
    want: dict = {}
    for d, text in enumerate(texts, start=1):
        toks, pays = ana.tokens_with_payloads(text)
        for tm, pl in zip(toks, pays):
            want.setdefault(tm, {}).setdefault(d, []).append(pl)
    got: dict = {}
    for sv in reader.segments:
        seg = sv.reader
        for term in want:
            i = seg.lookup(term)
            if i < 0:
                continue
            docs, freqs, pays, run_offs = seg.postings_payloads(i)
            for j, d in enumerate(docs):
                got.setdefault(term, {})[int(d + sv.base)] = \
                    list(pays[run_offs[j]:run_offs[j + 1]])
    assert got == want
    # guards: plain index rejects payload decode; pay needs the protocol;
    # offs+pay combination rejected
    with pytest.raises(ValueError):
        BuildSegmentTask(idx, "ascii", {}, "text", "url",
                         index_features=("pos", "pay"))
    with pytest.raises(ValueError):
        BuildSegmentTask(idx, "payload-delimiter", {}, "text", "url",
                         index_features=("pos", "pay", "offs"))
    # consolidation carries the payload stream through the merge: the
    # exact per-occurrence bytes survive on the merged segment
    from iresearch_ray.index.merge import consolidate
    consolidate(idx, 10_000)
    merged = IndexReader(idx)
    assert len(merged.segments) == 1
    assert merged.segments[0].reader.has_payloads
    got2: dict = {}
    for sv in merged.segments:
        seg = sv.reader
        for term in want:
            i = seg.lookup(term)
            if i < 0:
                continue
            docs, freqs, pays, run_offs = seg.postings_payloads(i)
            for j, d in enumerate(docs):
                got2.setdefault(term, {})[int(d + sv.base)] = \
                    list(pays[run_offs[j]:run_offs[j + 1]])
    assert got2 == want
    # payload-bearing index still answers plain queries (both generations)
    for rd in (reader, merged):
        hits = IndexSearcher(rd, BM25()).search(TermFilter("alpha"), k=10)
        assert sorted(hits["key"]) == ["u0", "u2"]


def test_payloads_preserve_case_and_config(ray_session, tmp_path):
    """Review findings: payload bytes must round-trip VERBATIM (only the
    term is case-folded), and analyzer_from_config must rebuild the
    payload analyzer's options."""
    from iresearch_ray.analysis.tokenizers import (
        PayloadDelimiterAnalyzer,
        analyzer_from_config,
    )

    ana = PayloadDelimiterAnalyzer()
    toks, pays = ana.tokens_with_payloads("Doc|QWxhZGRpbg== Word|MiXeD")
    assert toks == ["doc", "word"]          # terms folded
    assert pays == [b"QWxhZGRpbg==", b"MiXeD"]  # payloads verbatim

    custom = PayloadDelimiterAnalyzer(payload_delimiter=":", lowercase=False)
    rebuilt = analyzer_from_config(custom.config())
    assert rebuilt.config() == custom.config()
    assert rebuilt.tokens_with_payloads("A:p1 B") == (["A", "B"],
                                                      [b"p1", b""])
