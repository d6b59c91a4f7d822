"""Stored-field columnstore + by_column_existence + by_ngram_similarity
(reference columnstore formats_10.cpp; column_existence_filter.cpp;
ngram_similarity_filter.cpp LCS-with-positional-chaining semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.analysis import NgramAnalyzer
from iresearch_ray.index.build import build_index
from iresearch_ray.index.merge import consolidate
from iresearch_ray.search import (
    BM25,
    ColumnExistenceFilter,
    IndexReader,
    IndexSearcher,
    NgramSimilarityFilter,
)

N = 120


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("cols")
    langs = [("en" if i % 3 == 0 else None) for i in range(N)]
    texts = [f"alpha beta w{i % 5} gamma" for i in range(N)]
    t = pa.table({
        "url": [f"u{i:03d}" for i in range(N)],
        "text": texts,
        "lang": pa.array(langs, type=pa.string()),
        "n": pa.array(list(range(N)), type=pa.int64()),
    })
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=30)
    index_dir = str(base / "idx")
    man = build_index(path, index_dir, analyzer="ascii", target_docs=60,
                      store_columns=("lang", "n"))
    return index_dir, man


def test_column_existence_and_stored_retrieval(built):
    index_dir, _ = built
    r = IndexReader(index_dir)
    s = IndexSearcher(r, BM25())
    res = s.search(ColumnExistenceFilter("lang", boost=2.0), k=N)
    assert len(res) == sum(1 for i in range(N) if i % 3 == 0)
    assert (res["score"] == np.float32(2.0)).all()
    # stored round-trip, global ids span segments
    st = r.stored(res["doc"].to_numpy(), ["lang", "n"])
    assert (st["lang"] == "en").all()
    assert sorted(st["n"]) == [i for i in range(N) if i % 3 == 0]
    # missing column -> no matches
    assert len(s.search(ColumnExistenceFilter("nope"), k=5)) == 0


def test_columns_survive_consolidation(built):
    index_dir, man = built
    man2 = consolidate(index_dir, target_docs=N)
    assert man2["generation"] == man["generation"] + 1
    r = IndexReader(index_dir, man2["generation"])
    assert len(r.segments) == 1
    res = IndexSearcher(r, BM25()).search(ColumnExistenceFilter("lang"), k=N)
    assert len(res) == sum(1 for i in range(N) if i % 3 == 0)
    st = r.stored(res["doc"].to_numpy(), ["n"])
    assert sorted(st["n"]) == [i for i in range(N) if i % 3 == 0]


def _lcs(a: list, b: list) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a)):
        for j in range(len(b)):
            dp[i + 1][j + 1] = (dp[i][j] + 1 if a[i] == b[j]
                                else max(dp[i][j + 1], dp[i + 1][j]))
    return dp[-1][-1]


def test_ngram_similarity_vs_bruteforce_lcs(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("ngramsim")
    rng = np.random.default_rng(7)
    words = ["abcdef", "abcxef", "zzzzzz", "abdcfe", "fedcba", "abcdff"]
    texts = [" ".join(rng.choice(words, size=3)) for _ in range(80)]
    t = pa.table({"url": [f"u{i}" for i in range(80)], "text": texts})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=20)
    index_dir = str(base / "idx")

    ng = NgramAnalyzer(min_gram=2, max_gram=2)
    build_index(path, index_dir, analyzer="ngram",
                analyzer_opts={"min_gram": 2, "max_gram": 2}, target_docs=40)
    r = IndexReader(index_dir)
    s = IndexSearcher(r, BM25())

    query = "abcdef"
    qgrams = ng.tokens(query)
    for threshold in (0.5, 0.8, 1.0):
        res = s.search(NgramSimilarityFilter(qgrams, threshold), k=200)
        got = {r.key_of(int(d)): float(sc)
               for d, sc in zip(res["doc"], res["score"])}
        want = {}
        for i, txt in enumerate(texts):
            dgrams = ng.tokens(txt)
            chain = _lcs(qgrams, dgrams)
            ratio = chain / len(qgrams)
            if ratio >= threshold:
                want[f"u{i}"] = ratio
        assert set(got) == set(want), threshold
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-6)


def test_ngram_similarity_validation():
    with pytest.raises(ValueError):
        NgramSimilarityFilter([])
    with pytest.raises(ValueError):
        NgramSimilarityFilter(["ab"], threshold=0.0)
