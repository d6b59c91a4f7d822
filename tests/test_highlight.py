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
