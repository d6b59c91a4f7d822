"""Minimal Lucene-flavored query-string parser -> filter tree.

The reference builds filter trees in code per benchmark category
(utils/index-search.cpp:241-424); user-facing deployments (ArangoDB)
expose a query language.  This is the small, deterministic middle:

    hello world          -> And(term, term)
    "ref name"           -> PhraseFilter
    "ref name"~same      -> SamePositionFilter
    pre*                 -> PrefixFilter
    wi%card / mid*dle    -> WildcardFilter (* and % both wildcard)
    fuzzy~1              -> FuzzyFilter(max_distance=1)
    [aaa TO bbb]         -> RangeFilter
    a OR b OR c          -> OrFilter
    a OR b AND c         -> And binds tighter than Or
    -bad good            -> NotFilter(And(good), And(bad))
    term^2.5             -> boost
    title:hello          -> Fielded('title', term)   (multifield indexes)
    body:"ref name"      -> Fielded('body', phrase)

Whitespace tokenizes; terms are analyzed literally (caller lowercases to
match the index analyzer if needed).
"""

from __future__ import annotations

import re

from iresearch_ray.search.filters import (
    AndFilter,
    FuzzyFilter,
    NotFilter,
    OrFilter,
    PhraseFilter,
    PrefixFilter,
    RangeFilter,
    SamePositionFilter,
    TermFilter,
    WildcardFilter,
)

_TOKEN_RE = re.compile(r'-?(?:[A-Za-z_][\w.]*:)?"[^"]*"(?:~same)?(?:\^[\d.]+)?'
                       r'|-?(?:[A-Za-z_][\w.]*:)?\[[^\]]+\](?:\^[\d.]+)?|\S+')
_FIELD_RE = re.compile(r"^([A-Za-z_][\w.]*):(?=\S)")


def _analyze_word(word: str, analyzer):
    """One query word through the index's analyzer (the reference runs
    query text through the same analyzer as the field, index-search.cpp
    :632-637); multi-token expansions keep the first token."""
    if analyzer is None:
        return word
    toks = analyzer.tokens(word)
    return toks[0] if toks else word


def _leaf(tok: str, analyzer=None, fields=True):
    # Lucene-style field routing: `title:hello`, `body:"ref name"` —
    # wraps the leaf in Fielded, resolved against a MultiFieldReader
    # (plain readers reject Fielded with a clear TypeError).  Only the
    # FIRST colon routes, and URL-ish remainders (`http://...`) stay
    # literal terms so colon-bearing tokens keep their old meaning.
    # ``fields``: True routes any field-shaped prefix; False keeps every
    # colon token a literal term (single-field indexes); a collection
    # routes ONLY those names, so `to:alice` on an index without a `to`
    # field degrades to a literal term instead of a TypeError.
    mf = _FIELD_RE.match(tok) if fields else None
    if (mf and not tok[mf.end():].startswith("/")
            and (fields is True or mf.group(1) in fields)):
        from iresearch_ray.index.multifield import Fielded

        return Fielded(mf.group(1),
                       _leaf(tok[mf.end():], analyzer, fields=False))
    boost = 1.0
    m = re.search(r"\^([\d.]+)$", tok)
    if m and not tok.endswith("]"):  # boost suffix (ranges end with ])
        boost = float(m.group(1))
        tok = tok[: m.start()]
    if tok.startswith('"'):
        same = tok.endswith("~same")
        body = tok[1:-6] if same else tok[1:-1]
        words = body.split()
        if not words:
            raise ValueError("empty phrase")
        words = [_analyze_word(w, analyzer) for w in words]
        return (SamePositionFilter(words, boost=boost) if same
                else PhraseFilter(words, boost=boost))
    if tok.startswith("[") and tok.endswith("]"):
        m2 = re.fullmatch(r"\[\s*(\S+)\s+TO\s+(\S+)\s*\]", tok)
        if not m2:
            raise ValueError(f"bad range {tok!r}")
        lo, hi = (None if v == "*" else v for v in m2.groups())
        return RangeFilter(lo, hi, include_hi=True, boost=boost)
    m3 = re.fullmatch(r"(\S+)~(\d)", tok)
    if m3:
        return FuzzyFilter(_analyze_word(m3.group(1), analyzer),
                           max_distance=int(m3.group(2)), boost=boost)
    if "*" in tok or "%" in tok or "_" in tok:
        pat = tok.replace("*", "%")
        if pat.endswith("%") and not any(c in pat[:-1] for c in "%_"):
            return PrefixFilter(pat[:-1], boost=boost)
        return WildcardFilter(pat, boost=boost)
    if not tok:
        raise ValueError("empty term")
    return TermFilter(_analyze_word(tok, analyzer), boost=boost)


def parse_query(q: str, analyzer=None, fields=True):
    """Parse a query string into a Filter tree (see module docstring).

    ``analyzer``: apply the index's analyzer to term/phrase/fuzzy words
    (stemmed or case-folding indexes need query words transformed the
    same way); prefix/wildcard/range operands pass through verbatim.

    ``fields``: field-routing policy for ``name:term`` tokens — ``True``
    routes any field-shaped prefix (multifield indexes), ``False``
    disables routing entirely, and a collection of field NAMES routes
    only those (unknown prefixes like ``to:alice`` stay literal terms,
    the safe setting when query strings come from users)."""
    if isinstance(fields, str):
        # a bare string would do SUBSTRING matching ("tit" in "title")
        # in the routing check — treat it as a one-field collection
        fields = frozenset((fields,))
    toks = _TOKEN_RE.findall(q.strip())
    if not toks:
        raise ValueError("empty query")
    # split on OR (lowest precedence); within a clause AND-combine, with
    # leading '-' marking exclusions
    clauses: list[list[str]] = [[]]
    for t in toks:
        if t.upper() == "OR":
            if not clauses[-1]:
                raise ValueError("dangling OR")
            clauses.append([])
        elif t.upper() == "AND":
            continue  # AND is the implicit default
        else:
            clauses[-1].append(t)
    if not clauses[-1]:
        raise ValueError("dangling OR")

    def build_clause(parts: list[str]):
        pos, neg = [], []
        for p in parts:
            if p.startswith("-") and len(p) > 1:
                neg.append(_leaf(p[1:], analyzer, fields))
            else:
                pos.append(_leaf(p, analyzer, fields))
        if not pos:
            raise ValueError("clause needs at least one positive term")
        node = pos[0] if len(pos) == 1 else AndFilter(pos)
        if neg:
            node = NotFilter(node, neg[0] if len(neg) == 1
                             else OrFilter(neg))
        return node

    nodes = [build_clause(c) for c in clauses]
    return nodes[0] if len(nodes) == 1 else OrFilter(nodes)
