"""Multi-field indexes: aligned per-field sub-indexes, per-field stats,
cross-field boolean queries (reference multi-field docs,
utils/index-put.cpp:145-232; per-field collectors bm25.cpp:209-243)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.index.multifield import (
    Fielded,
    MultiFieldReader,
    MultiFieldSearcher,
    build_multifield,
)
from iresearch_ray.search import AndFilter, BM25, PhraseFilter, TermFilter

N = 240


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("mf")
    titles = [f"title{'x' if i % 2 else 'y'} common" for i in range(N)]
    bodies = [f"body text row{i % 4} shared" for i in range(N)]
    t = pa.table({"url": [f"u{i:04d}" for i in range(N)],
                  "title": titles, "body": bodies})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=60)
    index_dir = str(base / "idx")
    root = build_multifield(path, index_dir, fields={
        "title": {"analyzer": "ascii"},
        "body": {"analyzer": "ascii"},
    }, target_docs=120)
    assert root["num_docs"] == N
    return index_dir, titles, bodies


def test_default_field_and_routing(built):
    index_dir, titles, bodies = built
    r = MultiFieldReader(index_dir, default_field="body")
    s = MultiFieldSearcher(r, BM25())
    res = s.search(TermFilter("row1"), k=N)
    assert len(res) == sum(1 for i in range(N) if i % 4 == 1)
    res_t = s.search(Fielded("title", TermFilter("titlex")), k=N)
    assert len(res_t) == sum(1 for i in range(N) if i % 2 == 1)
    # term present only in the OTHER field does not leak
    assert len(s.search(TermFilter("titlex"), k=N)) == 0


def test_cross_field_boolean(built):
    index_dir, _, _ = built
    r = MultiFieldReader(index_dir, default_field="body")
    s = MultiFieldSearcher(r, BM25())
    flt = AndFilter([Fielded("title", TermFilter("titlex")),
                     Fielded("body", TermFilter("row1"))])
    res = s.search(flt, k=N)
    want = [i for i in range(N) if i % 2 == 1 and i % 4 == 1]
    assert sorted(int(k[1:]) for k in res["key"]) == want


def test_per_field_stats_differ(built):
    index_dir, _, _ = built
    r = MultiFieldReader(index_dir)
    assert r.field("title").stats.total_tokens != r.field("body").stats.total_tokens
    # scores computed with the FIELD's own avgdl: title idf/avgdl
    s = MultiFieldSearcher(r, BM25())
    res = s.search(Fielded("title", TermFilter("common")), k=5)
    scorer = BM25()
    tr = r.field("title")
    sp = scorer.prepare(tr.stats, tr.df("common"))
    dl = np.array([2] * len(res))  # every title has 2 tokens
    assert np.allclose(res["score"], sp.score(np.ones(len(res)), dl, True))


def test_phrase_in_field(built):
    index_dir, _, _ = built
    r = MultiFieldReader(index_dir, default_field="title")
    s = MultiFieldSearcher(r, BM25())
    res = s.search(Fielded("body", PhraseFilter(["body", "text"])), k=N)
    assert len(res) == N


@pytest.fixture(scope="module")
def built_large(ray_session, tmp_path_factory):
    """Corpus sized so head terms span >8 posting blocks per segment —
    the threshold below which WAND falls back to full decode."""
    base = tmp_path_factory.mktemp("mf_wand")
    rng = np.random.default_rng(7)
    n = 4000
    t_words = ["alpha", "beta", "gamma", "delta"]
    b_words = ["red", "green", "blue", "cyan"]
    titles, bodies = [], []
    for i in range(n):
        tw = [w for w, p in zip(t_words, (0.7, 0.4, 0.1, 0.02))
              if rng.random() < p]
        bw = [w for w, p in zip(b_words, (0.8, 0.3, 0.08, 0.02))
              if rng.random() < p]
        titles.append(" ".join(tw * (1 + int(rng.integers(0, 3)))) or "pad")
        bodies.append(" ".join(bw * (1 + int(rng.integers(0, 3)))) or "pad")
    t = pa.table({"url": [f"u{i:05d}" for i in range(n)],
                  "title": titles, "body": bodies})
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=500)
    index_dir = str(base / "idx")
    build_multifield(path, index_dir, fields={
        "title": {"analyzer": "ascii"},
        "body": {"analyzer": "ascii"},
    }, target_docs=2000)
    return index_dir


def test_multifield_wand_equals_all_fuzz(built_large):
    """mode='top' must return the same top-k as mode='all' for
    field-routed terms and cross-field unions: _FieldBound.route hands
    WAND the field's own block-max metadata (previously unpruned)."""
    from iresearch_ray.search import OrFilter

    r = MultiFieldReader(built_large, default_field="body")
    s = MultiFieldSearcher(r, BM25())
    rng = np.random.default_rng(11)
    t_words = ["alpha", "beta", "gamma", "delta"]
    b_words = ["red", "green", "blue", "cyan"]

    cases = []
    for w in t_words:
        cases.append(lambda w=w: Fielded("title", TermFilter(w)))
    for w in b_words:
        cases.append(lambda w=w: TermFilter(w))  # default field
    for _ in range(12):
        kids = []
        for w in rng.choice(t_words, size=rng.integers(1, 3), replace=False):
            kids.append(Fielded("title", TermFilter(str(w))))
        for w in rng.choice(b_words, size=rng.integers(1, 3), replace=False):
            kids.append(Fielded("body", TermFilter(str(w))))
        mm = int(rng.integers(1, len(kids) + 1))
        cases.append(lambda kids=kids, mm=mm: OrFilter(list(kids), min_match=mm))

    for make in cases:
        a = s.search(make(), k=10, mode="all")
        t_ = s.search(make(), k=10, mode="top")
        assert list(a["doc"]) == list(t_["doc"])
        assert np.array_equal(a["score"].to_numpy(), t_["score"].to_numpy())


def test_multifield_distributed_equals_local(built_large):
    """MultiFieldDistributedSearcher must rank exactly like the local
    MultiFieldSearcher: field-prefixed df collect gives every actor the
    same global per-field stats (terms, expansions, variadic phrases)."""
    from iresearch_ray.index.multifield import MultiFieldDistributedSearcher
    from iresearch_ray.search import OrFilter, PhraseFilter, PrefixFilter

    local = MultiFieldSearcher(
        MultiFieldReader(built_large, default_field="body"), BM25())
    dist = MultiFieldDistributedSearcher(built_large, num_groups=2,
                                         default_field="body")
    try:
        cases = [
            lambda: TermFilter("red"),                       # default field
            lambda: Fielded("title", TermFilter("alpha")),
            lambda: AndFilter([Fielded("title", TermFilter("alpha")),
                               Fielded("body", TermFilter("green"))]),
            lambda: OrFilter([Fielded("title", TermFilter("beta")),
                              Fielded("body", TermFilter("blue"))]),
            lambda: Fielded("title", PrefixFilter("alp")),
            lambda: OrFilter([Fielded("title", PrefixFilter("alp")),
                              Fielded("body", PrefixFilter("gr"))]),
            lambda: Fielded("title", PhraseFilter([{"prefix": "alp"},
                                                   "beta"])),
        ]
        for make in cases:
            a = dist.search(make(), k=12)
            b = local.search(make(), k=12)
            assert list(a["doc"]) == list(b["doc"]), make()
            assert list(a["key"]) == list(b["key"])
            assert np.allclose(a["score"].to_numpy(),
                               b["score"].to_numpy(), rtol=0, atol=0)
        # WAND mode matches the full scan
        for make in cases[:4]:
            t_ = dist.search(make(), k=10, mode="top")
            b = local.search(make(), k=10, mode="all")
            assert list(t_["doc"]) == list(b["doc"])
            assert np.array_equal(t_["score"].to_numpy(),
                                  b["score"].to_numpy())
    finally:
        dist.close()


def test_more_like_this_on_multifield(built):
    """more_like_this runs against a MultiFieldSearcher (MultiFieldReader
    now exposes default-field df; review finding, round 5)."""
    from iresearch_ray.search.executor import more_like_this

    index_dir, titles, bodies = built
    r = MultiFieldReader(index_dir, default_field="body")
    s = MultiFieldSearcher(r, BM25())
    out = more_like_this(s, "body text row1 shared", n_terms=3, k=5)
    assert list(out.columns) == ["doc", "key", "score"]
    assert len(out) > 0
