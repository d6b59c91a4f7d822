"""Typed token-stream analyzers (boolean / collation / keyword) through
REAL index builds — closes the loop beyond golden-token tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.search import (
    BM25, BoostScore, IndexReader, IndexSearcher, PrefixFilter, RangeFilter,
    TermFilter,
)


def test_boolean_index(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("boolidx")
    flags = [i % 3 == 0 for i in range(90)]
    t = pa.table({"id": [str(i) for i in range(90)],
                  "active": pa.array(flags)})
    path = str(base / "p.parquet")
    pq.write_table(t, path)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="boolean", text_column="active",
                key_column="id", target_docs=50)
    s = IndexSearcher(IndexReader(idx), BoostScore())
    res = s.search(TermFilter("$true"), k=100)
    assert sorted(int(k) for k in res["key"]) == [i for i in range(90)
                                                 if i % 3 == 0]
    res_f = s.search(TermFilter("$false"), k=100)
    assert len(res_f) == 90 - len(res)


def test_collation_index_accent_insensitive_range(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("collidx")
    names = ["Árbol", "apple", "Ćevap", "banana", "Über", "zebra"]
    t = pa.table({"id": [str(i) for i in range(len(names))],
                  "name": names})
    path = str(base / "p.parquet")
    pq.write_table(t, path)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="collation", text_column="name",
                key_column="id", target_docs=10)
    r = IndexReader(idx)
    s = IndexSearcher(r, BoostScore())
    # range [a, c) in COLLATED space: includes Árbol (arbol), apple, banana
    res = s.search(RangeFilter("a", "c"), k=10)
    got = {names[int(k)] for k in res["key"]}
    assert got == {"Árbol", "apple", "banana"}
    # prefix over collation keys: 'u' catches Über (uber)
    res_u = s.search(PrefixFilter("u"), k=10)
    assert {names[int(k)] for k in res_u["key"]} == {"Über"}


def test_keyword_index_nul_distinct_terms(ray_session, tmp_path_factory):
    """Keyword fields index raw string values; two values differing only
    past an embedded NUL must stay distinct dictionary terms (the
    pandas-factorize hashtable collapses them — inversion now routes
    through the NUL-safe Arrow factorize)."""
    base = tmp_path_factory.mktemp("nulidx")
    vals = ["a\x00b", "a\x00c", "a\x00b", "plain"]
    t = pa.table({"id": [str(i) for i in range(len(vals))],
                  "tag": vals})
    path = str(base / "p.parquet")
    pq.write_table(t, path)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="keyword", text_column="tag",
                key_column="id", target_docs=50)
    s = IndexSearcher(IndexReader(idx), BoostScore())
    assert sorted(s.search(TermFilter("a\x00b"), k=10)["key"]) == ["0", "2"]
    assert sorted(s.search(TermFilter("a\x00c"), k=10)["key"]) == ["1"]
    assert sorted(s.search(TermFilter("plain"), k=10)["key"]) == ["3"]
