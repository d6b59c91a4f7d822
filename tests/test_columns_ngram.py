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


def test_ngram_lis_kernels_identical(ray_session, tmp_path_factory):
    """The bitmask patience-DP LIS (picked for segments with >=128
    candidate docs) and the classic bisect LIS (small-segment path) must
    rank identically: run one corpus large enough to engage the bitmask
    kernel, then force the classic branch and compare exactly."""
    import iresearch_ray.search.filters as F

    base = tmp_path_factory.mktemp("ngramkern")
    rng = np.random.default_rng(11)
    words = ["abcdef", "abcxef", "abdcfe", "fedcba", "abcdff", "xbcdef"]
    n = 400  # single segment of ~400 candidates > the 128 crossover
    texts = [" ".join(rng.choice(words, size=4)) for _ in range(n)]
    t = pa.table({"url": [f"u{i}" for i in range(n)], "text": texts})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=200)
    index_dir = str(base / "idx")
    build_index(path, index_dir, analyzer="ngram",
                analyzer_opts={"min_gram": 2, "max_gram": 2}, target_docs=n)
    s = IndexSearcher(IndexReader(index_dir), BM25())
    ng = NgramAnalyzer(min_gram=2, max_gram=2)
    qgrams = ng.tokens("abcdef")

    import inspect
    import textwrap

    src = inspect.getsource(F._PreparedNgramSim.execute)
    assert "if self.m <= 63 and len(starts) >= 128:" in src
    classic_src = src.replace("if self.m <= 63 and len(starts) >= 128:",
                              "if False:")
    ns = dict(F.__dict__)
    exec(textwrap.dedent(classic_src), ns)
    orig = F._PreparedNgramSim.execute
    try:
        for threshold in (0.4, 0.7, 1.0):
            flt = NgramSimilarityFilter(qgrams, threshold)
            res_fast = s.search(flt, k=n)
            F._PreparedNgramSim.execute = ns["execute"]
            res_slow = s.search(flt, k=n)
            F._PreparedNgramSim.execute = orig
            assert list(res_fast["doc"]) == list(res_slow["doc"]), threshold
            assert np.array_equal(res_fast["score"].to_numpy(),
                                  res_slow["score"].to_numpy())
        assert len(res_fast) > 128  # the bitmask branch actually engaged
    finally:
        F._PreparedNgramSim.execute = orig
