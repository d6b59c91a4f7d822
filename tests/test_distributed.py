"""Distributed (actor-pool) search must equal the local searcher."""

import numpy as np
import pytest

from iresearch_ray.index.build import build_index
from iresearch_ray.search import (
    BM25,
    AndFilter,
    FuzzyFilter,
    IndexReader,
    IndexSearcher,
    OrFilter,
    PhraseFilter,
    PrefixFilter,
    TermFilter,
)
from iresearch_ray.search.distributed import DistributedSearcher
from iresearch_ray.sources.pages import write_pages


@pytest.fixture(scope="module")
def dist(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("dist")
    pages = str(base / "pages.parquet")
    write_pages(pages, 600, row_group_size=75)
    index_dir = str(base / "index")
    build_index(pages, index_dir, analyzer="ascii", target_docs=150)
    d = DistributedSearcher(index_dir, num_groups=3)
    local = IndexSearcher(IndexReader(index_dir), BM25())
    yield d, local
    d.close()


@pytest.mark.parametrize("name,make", [
    ("term", lambda: TermFilter("hterm")),
    ("and", lambda: AndFilter([TermFilter("hterm"), TermFilter("mterm")])),
    ("or_mm", lambda: OrFilter([TermFilter("hterm"), TermFilter("mterm"),
                                TermFilter("lterm")], min_match=2)),
    ("phrase", lambda: PhraseFilter(["ref", "name"])),
    ("prefix", lambda: PrefixFilter("abcd")),
    ("fuzzy", lambda: FuzzyFilter("fuzzy", max_distance=1)),
    # variadic phrase parts need their own df collect round: without it
    # each actor sums part dfs over its own segment group only, and the
    # same doc scores differently depending on which group holds it
    ("var_phrase_prefix", lambda: PhraseFilter([{"prefix": "re"}, "name"])),
    ("var_phrase_any", lambda: PhraseFilter([{"any": ["ref", "the"]},
                                             {"wildcard": "nam%"}])),
])
def test_distributed_equals_local(dist, name, make):
    d, local = dist
    a = d.search(make(), k=15)
    b = local.search(make(), k=15)
    assert list(a["doc"]) == list(b["doc"]), name
    assert list(a["key"]) == list(b["key"]), name
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                       rtol=0, atol=0), name  # exact: expansions collect
    # global dfs via the extra round, same as local prepare


def test_distributed_wand_equals_all(dist):
    """Two-wave threshold-shared WAND returns the same top-k as full scan."""
    searcher, driver_results = dist
    from iresearch_ray.search import TermFilter

    for term in ("hterm", "mterm"):
        a = searcher.search(TermFilter(term), k=10, mode="all")
        t = searcher.search(TermFilter(term), k=10, mode="top")
        assert list(a["doc"]) == list(t["doc"])
        assert np.array_equal(a["score"].to_numpy(), t["score"].to_numpy())


def test_distributed_wand_union_equals_all(dist):
    searcher, _ = dist
    from iresearch_ray.search import OrFilter, TermFilter

    flt = lambda: OrFilter([TermFilter("hterm"), TermFilter("mterm"),
                            TermFilter("lterm")], min_match=2)
    a = searcher.search(flt(), k=10, mode="all")
    t = searcher.search(flt(), k=10, mode="top")
    assert list(a["doc"]) == list(t["doc"])
    assert np.array_equal(a["score"].to_numpy(), t["score"].to_numpy())


def test_actor_crash_recovery(dist):
    """A killed segment-group actor restarts (immutable artifacts + plain
    ctor args) and the next query still answers identically."""
    import ray

    searcher, local = dist
    from iresearch_ray.search import TermFilter

    before = searcher.search(TermFilter("hterm"), k=10)
    ray.kill(searcher.actors[0], no_restart=False)
    after = searcher.search(TermFilter("hterm"), k=10)
    assert list(before["doc"]) == list(after["doc"])
    assert np.array_equal(before["score"].to_numpy(),
                          after["score"].to_numpy())


def test_distributed_nested_expansion_scores(dist):
    """Review finding: an expansion filter nested in a composite must get
    GLOBAL dfs (previously scored zero in distributed mode)."""
    searcher, local = dist
    from iresearch_ray.search import OrFilter, PrefixFilter, TermFilter

    flt = lambda: OrFilter([PrefixFilter("abcd"), TermFilter("lterm")])
    a = searcher.search(flt(), k=15)
    b = local.search(flt(), k=15)
    assert len(a) > 0 and a["score"].max() > 0  # expansion contributes
    assert list(a["doc"]) == list(b["doc"])
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                       rtol=0, atol=0)


def test_distributed_shared_part_df_not_double_counted(dist):
    """Review finding: the same variadic part (or a term matched by two
    overlapping expansions) appearing in TWO nodes of one query tree must
    not be summed twice into the global df map."""
    searcher, local = dist

    cases = [
        OrFilter([PhraseFilter([{"prefix": "re"}, "name"]),
                  PhraseFilter([{"prefix": "re"}, "ref"])]),
        OrFilter([PrefixFilter("abcd"), PrefixFilter("abcd")]),
    ]
    for flt in cases:
        a = searcher.search(flt, k=15)
        b = local.search(flt, k=15)
        assert list(a["doc"]) == list(b["doc"])
        assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                           rtol=0, atol=0)


def test_distributed_scored_terms_limit_isolated(dist):
    """Review finding (confirmed repro): sibling exact terms / other
    nodes' df_map entries must NOT enter an expansion's scored_terms_limit
    cut — a high-df sibling evicted real matched terms so they scored 0.
    Node-namespaced df keys keep each expansion's candidate set its own."""
    searcher, local = dist

    # Or puts the high-df exact term's bare key into the shared df_map;
    # pre-fix the expansion adopted it into its 1-slot scored cut and the
    # genuinely matched prefix term scored 0
    flt = lambda: OrFilter([TermFilter("hterm"),
                            PrefixFilter("abcd", scored_terms_limit=1)])
    a = searcher.search(flt(), k=25)
    b = local.search(flt(), k=25)
    assert list(a["doc"]) == list(b["doc"])
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                       rtol=0, atol=0)
    pa_ = searcher.search(PrefixFilter("abcd", scored_terms_limit=1), k=25)
    pb_ = local.search(PrefixFilter("abcd", scored_terms_limit=1), k=25)
    assert list(pa_["doc"]) == list(pb_["doc"])
    assert np.allclose(pa_["score"].to_numpy(), pb_["score"].to_numpy(),
                       rtol=0, atol=0)
    assert (pa_["score"].to_numpy() > 0).any()


def test_negative_boost_rejected(dist):
    """Negative boosts invert the WAND block upper bound (mode='top'
    would silently drop winners); rejected loudly engine-wide."""
    d, local = dist[0], dist[1]
    with pytest.raises(ValueError, match="negative boost"):
        local.search(TermFilter("the", boost=-1.0), k=5)
    with pytest.raises(Exception, match="negative boost"):
        d.search(TermFilter("the", boost=-2.0), k=5)


def test_distributed_empty_index(ray_session, tmp_path):
    """Zero segments -> empty frame, matching the local searcher (was a
    np.concatenate ValueError; review finding, round 5)."""
    import json
    import os

    idx = str(tmp_path / "empty_idx")
    os.makedirs(idx)
    with open(os.path.join(idx, "index_1.json"), "w") as f:
        json.dump({"format_version": 1, "generation": 1, "num_docs": 0,
                   "sum_doc_len": 0, "segments": [],
                   "build_stats": {}}, f)
    d = DistributedSearcher(idx)
    out = d.search(TermFilter("anything"), k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc", "key", "score"]


def test_group_result_bounded_to_k(dist):
    """execute_topk returns at most k rows per GROUP (the wire-traffic
    bound distributed.py documents), and the merge stays exact."""
    d, local = dist[0], dist[1]
    flt = TermFilter("the")
    got = d.search(flt, k=7)
    want = local.search(flt, k=7)
    assert got["key"].tolist() == want["key"].tolist()
    import ray as _ray

    from iresearch_ray.search.distributed_core import collect_df_map
    df_map = collect_df_map(d.actors, flt)
    for a in d.actors:
        r = _ray.get(a.execute_topk.remote(flt, d.scorer, df_map, 7, "all"))
        assert len(r[0]) <= 7
