"""Randomized differential testing: random filter TREES executed by the
engine vs a brute-force Python evaluator over the same corpus (the
reference's CheckQuery strategy, filter_test_case_base.hpp:379-404,
generalized to arbitrary boolean compositions)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.index.build import build_index
from iresearch_ray.search import (
    AndFilter,
    BM25,
    FuzzyFilter,
    IndexReader,
    IndexSearcher,
    NotFilter,
    OrFilter,
    PhraseFilter,
    PrefixFilter,
    RangeFilter,
    TermFilter,
    TermsFilter,
    WildcardFilter,
)
from iresearch_ray.search.filters import NgramSimilarityFilter
from iresearch_ray.search.automaton import levenshtein_distances, wildcard_to_regex

N_DOCS = 250
N_TREES = 60


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    rng = np.random.default_rng(99)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta",
             "theta", "iota", "kappa", "alphax", "alpzz", "beeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(N_DOCS)]
    base = tmp_path_factory.mktemp("diff")
    path = str(base / "p.parquet")
    pq.write_table(pa.table({"url": [f"u{i:04d}" for i in range(N_DOCS)],
                             "text": texts}), path, row_group_size=60)
    idx = str(base / "idx")
    build_index(path, idx, analyzer="ascii", target_docs=80)
    ana = get_analyzer("ascii")
    toks = [ana.tokens(t) for t in texts]
    return IndexReader(idx), toks, vocab


def _brute(flt, toks) -> set:
    """Doc-id set (1-based, global) matched by a filter, brute force."""
    if isinstance(flt, TermFilter):
        return {i + 1 for i, ts in enumerate(toks) if flt.term in ts}
    if isinstance(flt, PrefixFilter):
        return {i + 1 for i, ts in enumerate(toks)
                if any(t.startswith(flt.prefix) for t in ts)}
    if isinstance(flt, WildcardFilter):
        rx = wildcard_to_regex(flt.pattern)
        return {i + 1 for i, ts in enumerate(toks)
                if any(rx.fullmatch(t) for t in ts)}
    if isinstance(flt, FuzzyFilter):
        def near(t):
            return int(levenshtein_distances([t], flt.term,
                                             flt.max_distance)[0]) <= flt.max_distance
        return {i + 1 for i, ts in enumerate(toks)
                if any(near(t) for t in set(ts))}
    if isinstance(flt, TermsFilter):
        want = set(flt.terms)
        return {i + 1 for i, ts in enumerate(toks) if want & set(ts)}
    if isinstance(flt, RangeFilter):
        def in_range(t):
            if flt.lo is not None:
                if t < flt.lo or (t == flt.lo and not flt.include_lo):
                    return False
            if flt.hi is not None:
                if t > flt.hi or (t == flt.hi and not flt.include_hi):
                    return False
            return True
        return {i + 1 for i, ts in enumerate(toks)
                if any(in_range(t) for t in ts)}
    if isinstance(flt, NgramSimilarityFilter):
        # longest (pos, qidx) strictly-increasing chain, brute DP
        def chain(ts):
            matches = [(p, j) for p, t in enumerate(ts)
                       for j, g in enumerate(flt.ngrams) if t == g]
            import functools

            @functools.lru_cache(maxsize=None)
            def longest(k):
                p, j = matches[k]
                return 1 + max((longest(m) for m in range(k)
                                if matches[m][0] < p and matches[m][1] < j),
                               default=0)
            return max((longest(k) for k in range(len(matches))), default=0)
        m = len(flt.ngrams)
        need = max(1, int(np.ceil(flt.threshold * m)))
        return {i + 1 for i, ts in enumerate(toks) if chain(ts) >= need}
    if isinstance(flt, PhraseFilter):
        words = flt.terms
        return {i + 1 for i, ts in enumerate(toks)
                if any(ts[p:p + len(words)] == words
                       for p in range(len(ts) - len(words) + 1))}
    if isinstance(flt, AndFilter):
        sets = [_brute(c, toks) for c in flt.children]
        return set.intersection(*sets) if sets else set()
    if isinstance(flt, OrFilter):
        sets = [_brute(c, toks) for c in flt.children]
        if flt.min_match <= 1:
            return set.union(*sets)
        from collections import Counter

        cnt = Counter(d for s in sets for d in s)
        return {d for d, n in cnt.items() if n >= flt.min_match}
    if isinstance(flt, NotFilter):
        return _brute(flt.positive, toks) - _brute(flt.negative, toks)
    raise TypeError(flt)


def _random_tree(rng, vocab, depth=0):
    kind = rng.choice(["term", "term", "prefix", "wildcard", "fuzzy",
                       "phrase", "terms", "range", "ngramsim",
                       "and", "or", "not"]
                      if depth < 3 else ["term", "prefix", "phrase"])
    if kind == "term":
        return TermFilter(str(rng.choice(vocab + ["missingterm"])))
    if kind == "prefix":
        return PrefixFilter(str(rng.choice(["al", "be", "ze", "q"])))
    if kind == "wildcard":
        return WildcardFilter(str(rng.choice(["%eta", "al%", "%pp%", "z_ta"])))
    if kind == "fuzzy":
        return FuzzyFilter(str(rng.choice(["alpha", "beeta", "zeta"])),
                           max_distance=int(rng.integers(1, 3)))
    if kind == "terms":
        n = int(rng.integers(1, 4))
        return TermsFilter([str(w) for w in rng.choice(vocab, size=n)])
    if kind == "range":
        lo, hi = sorted(rng.choice(vocab + ["aa", "zz"], size=2,
                                   replace=False))
        return RangeFilter(str(lo), str(hi),
                           include_lo=bool(rng.random() < 0.5),
                           include_hi=bool(rng.random() < 0.5))
    if kind == "ngramsim":
        n = int(rng.integers(2, 5))
        return NgramSimilarityFilter(
            [str(w) for w in rng.choice(vocab, size=n)],
            threshold=float(rng.choice([0.5, 0.7, 1.0])))
    if kind == "phrase":
        n = int(rng.integers(2, 4))
        return PhraseFilter([str(w) for w in rng.choice(vocab, size=n)])
    if kind == "and":
        return AndFilter([_random_tree(rng, vocab, depth + 1)
                          for _ in range(rng.integers(2, 4))])
    if kind == "or":
        n = int(rng.integers(2, 5))
        mm = int(rng.integers(1, n + 1)) if rng.random() < 0.3 else 1
        return OrFilter([_random_tree(rng, vocab, depth + 1)
                         for _ in range(n)], min_match=mm)
    return NotFilter(_random_tree(rng, vocab, depth + 1),
                     _random_tree(rng, vocab, depth + 1))


def test_random_trees_match_bruteforce(corpus):
    reader, toks, vocab = corpus
    s = IndexSearcher(reader, BM25())
    rng = np.random.default_rng(7)
    checked = 0
    for t in range(N_TREES):
        flt = _random_tree(rng, vocab)
        want = _brute(flt, toks)
        got = set()
        for seg, docs, _ in s.execute(flt):
            got.update(int(d) + seg.base for d in docs)
        assert got == want, f"tree #{t}: {flt!r}\n missing={want-got}\n extra={got-want}"
        checked += 1
    assert checked == N_TREES


@pytest.mark.parametrize("seed", [1001, 1004])
def test_lifecycle_fuzz_consistent(ray_session, tmp_path_factory, seed):
    """Randomized build -> delete -> consolidate -> append lifecycle; at
    the end, term results by KEY must equal an independent brute force
    over the engine's own alive set (mask/purge/append interplay)."""
    import glob
    import os

    from iresearch_ray.analysis import get_analyzer
    from iresearch_ray.index.delete import delete_by_filter
    from iresearch_ray.index.merge import consolidate
    from iresearch_ray.search import AllFilter

    ana = get_analyzer("ascii")
    rng = np.random.default_rng(seed)
    vocab = [f"w{j}" for j in range(15)]
    n1 = int(rng.integers(100, 250))
    texts1 = [" ".join(rng.choice(vocab, size=rng.integers(2, 20)))
              for _ in range(n1)]
    d = str(tmp_path_factory.mktemp(f"lf{seed}"))
    pq.write_table(pa.table({"url": [f"a{i:04d}" for i in range(n1)],
                             "text": texts1}),
                   f"{d}/a.parquet", row_group_size=50)
    build_index(f"{d}/a.parquet", f"{d}/idx", analyzer="ascii",
                target_docs=int(rng.integers(40, 120)))
    for step in range(int(rng.integers(2, 5))):
        op = rng.choice(["delete", "consolidate", "append"])
        if op == "delete":
            delete_by_filter(f"{d}/idx", TermFilter(str(rng.choice(vocab))))
        elif op == "consolidate":
            consolidate(f"{d}/idx", target_docs=10_000)
        else:
            n2 = int(rng.integers(20, 60))
            texts2 = [" ".join(rng.choice(vocab, size=rng.integers(2, 20)))
                      for _ in range(n2)]
            pq.write_table(
                pa.table({"url": [f"b{step}{i:04d}" for i in range(n2)],
                          "text": texts2}),
                f"{d}/b{step}.parquet", row_group_size=50)
            files = sorted(glob.glob(f"{d}/*.parquet"))
            build_index(files, f"{d}/idx", analyzer="ascii",
                        target_docs=int(rng.integers(40, 120)))
    truth = {}
    for f in sorted(glob.glob(f"{d}/*.parquet")):
        t = pq.read_table(f)
        for k, tx in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            truth[k] = ana.tokens(tx)
    from iresearch_ray.search import IndexReader, IndexSearcher

    s = IndexSearcher(IndexReader(f"{d}/idx"), BM25())
    alive_keys = set()
    for seg, docs, _ in s.execute(AllFilter()):
        alive_keys |= {seg.reader.keys[x - 1] for x in docs}
    for term in rng.choice(vocab, size=5, replace=False):
        term = str(term)
        got = set()
        for seg, docs, _ in s.execute(TermFilter(term)):
            got |= {seg.reader.keys[x - 1] for x in docs}
        want = {k for k in alive_keys if term in truth[k]}
        assert got == want, (term, sorted(want - got)[:3], sorted(got - want)[:3])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_analyzer_pipeline_sql_twin_fuzz(ray_session, seed):
    """The analyzer_pipeline oracle twin over adversarial texts the sf
    corpora never exercise: double/leading/trailing spaces (empty tokens),
    NUL bytes inside tokens, digits, punctuation-glued tokens, safe
    accents, empty and NULL texts.  Documented exclusions — two classes
    where Python str.lower() and DuckDB lower() genuinely disagree, so
    the twin's contract excludes them: dotted 'İ' (U+0130 lowers to
    'i'+combining-dot in Python, plain 'i' in DuckDB) and Greek capital
    sigma (Python applies final-sigma context, DuckDB does not)."""
    import duckdb
    import ray.data

    import __ray_entry__ as M
    from iresearch_ray.analysis import (
        DelimiterAnalyzer,
        NormalizeAnalyzer,
        PipelineAnalyzer,
        StopwordsAnalyzer,
    )
    from iresearch_ray.pipelines import textstats

    rng = np.random.default_rng(seed)
    frags = ["the", "The", "THE", "AND", "of", "to", "x1", "B2", "", " ",
             "é", "Ñ", "a\x00b", "\x00", "Ø9", "zz", "Q", "0", "-", "a,b",
             "Straße", "ÀÉÎ"]
    texts: list = []
    for i in range(150):
        k = int(rng.integers(0, 9))
        if k == 0:
            texts.append(None if i % 2 == 0 else "")
        else:
            # draw by index, NOT rng.choice(frags): numpy's fixed-width
            # unicode array treats trailing NULs as padding, silently
            # turning the lone-'\x00' frag into '' and losing coverage
            idx = rng.integers(0, len(frags), size=k)
            texts.append(" ".join(frags[j] for j in idx))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})

    ana = PipelineAnalyzer([
        DelimiterAnalyzer(" "),
        StopwordsAnalyzer(NormalizeAnalyzer(lowercase=True,
                                            strip_accents=False),
                          M.PIPELINE_STOPWORDS),
    ])
    out = textstats.term_frequencies(ray.data.from_arrow(tbl),
                                     analyzer=ana).to_pandas()
    out = out.sort_values(["df", "ttf", "term"],
                          ascending=[False, False, True]).head(20)

    con = duckdb.connect()
    con.register("fuzz_docs", tbl)
    con.execute("CREATE VIEW documents AS SELECT * FROM fuzz_docs")
    exp = con.execute(M.oracle_sql()["analyzer_pipeline"]).df()
    assert list(out["term"]) == list(exp["term"])
    assert list(out["df"].astype(np.int64)) == list(exp["df"].astype(np.int64))
    assert list(out["ttf"].astype(np.int64)) == list(exp["ttf"].astype(np.int64))


@pytest.mark.parametrize("seed", [7, 8])
def test_highlight_snippet_sql_twin_fuzz(ray_session, tmp_path_factory, seed):
    """The highlight_snippets oracle twin over adversarial texts: the
    term at string start/end, glued into longer tokens (xbatch, batch1,
    batchy — must NOT match), uppercase/mixed case, punctuation and NUL
    boundaries, repeats (first occurrence wins), safe accents, texts
    shorter/longer than the context window, empty and NULL texts.  The
    ENGINE side is the real path — OFFS-featured index build, spans off
    the postings — so the fuzz pins tokenizer offsets == SQL boundary
    regex end to end."""
    import duckdb

    import __ray_entry__ as M
    from iresearch_ray.index.build import build_index
    from iresearch_ray.search import IndexReader
    from iresearch_ray.search.highlight import highlight_snippets

    rng = np.random.default_rng(seed)
    frags = ["batch", "BATCH", "Batch", "xbatch", "batch1", "batchy",
             "the", "quick", "", " ", "-", "(batch)", "a\x00batch", "é",
             "0batch0", "batch-batch", "zz", "...", "B", "longfillerword"]
    texts: list = []
    for i in range(200):
        k = int(rng.integers(0, 12))
        if k == 0:
            texts.append(None if i % 2 == 0 else "")
        else:
            idx = rng.integers(0, len(frags), size=k)
            texts.append(" ".join(frags[j] for j in idx))
    tbl = pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    base = tmp_path_factory.mktemp(f"snipfuzz{seed}")
    path = str(base / "docs.parquet")
    pq.write_table(
        pa.table({"url": [str(i) for i in range(1, len(texts) + 1)],
                  "text": tbl["text"]}), path, row_group_size=64)
    index_dir = str(base / "idx")
    build_index(path, index_dir, analyzer="ascii", target_docs=64,
                index_features=("pos", "offs"), store_columns=("text",))
    reader = IndexReader(index_dir)

    gdocs, keys = [], []
    for seg in reader.segments:
        i = seg.reader.lookup("batch")
        if i < 0:
            continue
        docs, _ = seg.reader.postings(i)
        docs = docs.astype(np.int64)
        gdocs.append(docs + seg.base)
        keys.append(seg.reader.keys[docs - 1])
    assert gdocs, "fuzz corpus must contain the term"
    gdocs, keys = np.concatenate(gdocs), np.concatenate(keys)
    sn = highlight_snippets(reader, gdocs, ["batch"], indexed=True,
                            context=30)
    id_by_gdoc = {int(g): int(k) for g, k in zip(gdocs, keys)}
    sn["doc_id"] = sn["doc"].map(id_by_gdoc).astype(np.int64)
    ours = (sn[["doc_id", "snippet"]]
            .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("fuzz_docs", tbl)
    con.execute("CREATE VIEW documents AS SELECT * FROM fuzz_docs")
    exp = (con.execute(M.oracle_sql()["highlight_snippets"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(ours["doc_id"]) == list(exp["doc_id"].astype(np.int64))
    assert list(ours["snippet"]) == list(exp["snippet"])
