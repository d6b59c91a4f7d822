"""Query-string parser -> filter tree; end-to-end through the searcher."""

import numpy as np
import pytest

from iresearch_ray.search import (
    AndFilter, FuzzyFilter, NotFilter, OrFilter, PhraseFilter, PrefixFilter,
    RangeFilter, SamePositionFilter, TermFilter, WildcardFilter,
)
from iresearch_ray.search.query_parser import parse_query


def test_parse_shapes():
    assert isinstance(parse_query("hello"), TermFilter)
    q = parse_query("hello world")
    assert isinstance(q, AndFilter) and len(q.children) == 2
    assert isinstance(parse_query('"ref name"'), PhraseFilter)
    assert isinstance(parse_query('"a b"~same'), SamePositionFilter)
    assert isinstance(parse_query("pre*"), PrefixFilter)
    assert isinstance(parse_query("mi*dle"), WildcardFilter)
    f = parse_query("fuzzy~2")
    assert isinstance(f, FuzzyFilter) and f.max_distance == 2
    r = parse_query("[aaa TO bbb]")
    assert isinstance(r, RangeFilter) and r.lo == "aaa" and r.hi == "bbb"
    assert parse_query("[* TO zzz]").lo is None
    o = parse_query("a OR b OR c")
    assert isinstance(o, OrFilter) and len(o.children) == 3
    n = parse_query("good -bad")
    assert isinstance(n, NotFilter)
    assert isinstance(n.positive, TermFilter) and n.positive.term == "good"
    assert n.negative.term == "bad"
    mixed = parse_query('x y OR "p q" -z')
    assert isinstance(mixed, OrFilter) and len(mixed.children) == 2
    b = parse_query("hello^2.5")
    assert b.boost == 2.5


def test_parse_errors():
    for bad in ("", "OR a", "a OR", "-only", '""', "[a TO]"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parser_end_to_end(ray_session, tmp_path_factory):
    from iresearch_ray.index.build import build_index
    from iresearch_ray.search import BM25, IndexReader, IndexSearcher
    from iresearch_ray.sources.pages import write_pages

    base = tmp_path_factory.mktemp("qp")
    pages = str(base / "p.parquet")
    write_pages(pages, 300, row_group_size=100)
    idx = str(base / "idx")
    build_index(pages, idx, analyzer="ascii", target_docs=150)
    s = IndexSearcher(IndexReader(idx), BM25())
    a = s.search(parse_query('hterm -mterm OR "ref name"'), k=20)
    b = s.search(NotFilter(TermFilter("hterm"), TermFilter("mterm")), k=300)
    assert len(a) > 0
    # parsed tree equals hand-built tree on the simple sub-case
    p1 = s.search(parse_query("hterm -mterm"), k=300)
    assert list(p1["doc"]) == list(b["doc"])
    assert np.array_equal(p1["score"].to_numpy(), b["score"].to_numpy())


def test_parse_negated_and_boosted_ranges():
    n = parse_query("good -[aaa TO bbb]")
    assert isinstance(n, NotFilter)
    assert isinstance(n.negative, RangeFilter)
    assert n.negative.lo == "aaa"
    r = parse_query("[aaa TO bbb]^2")
    assert isinstance(r, RangeFilter) and r.boost == 2.0
    nf = parse_query('ok -"bad phrase"')
    assert isinstance(nf, NotFilter) and isinstance(nf.negative, PhraseFilter)


def test_parse_with_analyzer():
    from iresearch_ray.analysis import get_analyzer

    txt = get_analyzer("text")  # Porter stemming
    q = parse_query('Running "Dogs Running"', analyzer=txt)
    assert isinstance(q, AndFilter)
    assert q.children[0].term == "run"
    assert q.children[1].terms == ["dog", "run"]
    fz = parse_query("Jumped~1", analyzer=txt)
    assert fz.term == "jump"
    # prefixes pass through verbatim (dictionary-level operand)
    p = parse_query("Run*", analyzer=txt)
    assert isinstance(p, PrefixFilter) and p.prefix == "Run"


def test_parse_field_routing():
    """Lucene-style field:term syntax wraps leaves in Fielded (resolved by
    MultiFieldSearcher; plain readers reject with a clear error)."""
    from iresearch_ray.index.multifield import Fielded
    from iresearch_ray.search.query_parser import parse_query

    f = parse_query("title:hello")  # single leaf returns unwrapped
    assert isinstance(f, Fielded) and f.field == "title"
    assert isinstance(f.inner, TermFilter) and f.inner.term == "hello"

    g = parse_query('body:"ref name" title:pre*')
    kinds = {(c.field, type(c.inner).__name__) for c in g.children}
    assert kinds == {("body", "PhraseFilter"), ("title", "PrefixFilter")}

    # non-field tokens and ranges are untouched
    assert not isinstance(parse_query("[aaa TO bbb]"), Fielded)
    assert not isinstance(parse_query("plain"), Fielded)


def test_parse_field_routing_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.multifield import (
        MultiFieldReader,
        MultiFieldSearcher,
        build_multifield,
    )
    from iresearch_ray.search import BM25
    from iresearch_ray.search.query_parser import parse_query

    t = pa.table({"url": ["a", "b", "c"],
                  "title": ["alpha one", "beta two", "alpha three"],
                  "body": ["x common", "y common", "z common"]})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "mf")
    build_multifield(p, idx, fields={"title": {"analyzer": "ascii"},
                                    "body": {"analyzer": "ascii"}},
                     target_docs=10)
    s = MultiFieldSearcher(MultiFieldReader(idx, default_field="body"), BM25())
    res = s.search(parse_query("title:alpha body:z"), k=10)
    assert list(res["key"]) == ["c"]
    # field term does not leak into the default field
    assert len(s.search(parse_query("alpha"), k=10)) == 0


def test_parse_colon_tokens_stay_literal():
    """URL-ish tokens keep their pre-field-syntax meaning; only the first
    colon of a plain token routes."""
    from iresearch_ray.index.multifield import Fielded
    from iresearch_ray.search.query_parser import parse_query

    f = parse_query("http://example.com/page")
    assert isinstance(f, TermFilter)  # not Fielded('http', ...)
    g = parse_query("title:a:b")
    assert isinstance(g, Fielded) and g.field == "title"
    assert isinstance(g.inner, TermFilter) and g.inner.term == "a:b"


def test_parse_fields_policy():
    """``fields=`` opts colon routing in/out: False keeps every colon
    token a literal term (single-field indexes), a collection routes only
    known field names so `to:alice` degrades gracefully."""
    from iresearch_ray.index.multifield import Fielded
    from iresearch_ray.search.filters import TermFilter

    assert isinstance(parse_query("title:x", fields=False), TermFilter)
    assert parse_query("title:x", fields=False).term == "title:x"
    known = parse_query("title:x to:alice", fields={"title", "body"})
    a, b = known.children
    assert isinstance(a, Fielded) and a.field == "title"
    assert isinstance(b, TermFilter) and b.term == "to:alice"
    # negated leaves obey the same policy
    n = parse_query("good -title:bad", fields=False)
    assert isinstance(n.negative, TermFilter)
    # a bare string means ONE field, not substring matching: "tit" must
    # not route just because it is a substring of "title"
    s = parse_query("tit:x", fields="title")
    assert isinstance(s, TermFilter) and s.term == "tit:x"
    s2 = parse_query("title:x", fields="title")
    assert isinstance(s2, Fielded) and s2.field == "title"
