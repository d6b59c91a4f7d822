"""Segment invert/flush/read round-trip vs the pure-Python oracle index."""

import numpy as np
import pytest

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.analysis.tokenizers import flatten_batch
from iresearch_ray.index.segment import SegmentReader, SegmentWriter
from tests.oracle import OracleIndex


def _zipf_texts(n_docs=300, seed=42):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(800)], dtype=object)
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    texts = []
    for i in range(n_docs):
        n = int(rng.integers(5, 200))
        texts.append(" ".join(rng.choice(vocab, size=n, p=probs)))
    return texts


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("seg"))
    ana = get_analyzer("ascii")
    texts = _zipf_texts()
    oracle = OracleIndex(ana)
    keys = [f"https://x/{i:06d}" for i in range(len(texts))]
    for k, t in zip(keys, texts):
        oracle.add(k, t)
    w = SegmentWriter("seg-000", ana.config())
    # feed in two batches to exercise doc-id continuation
    mid = len(texts) // 3
    for lo, hi in ((0, mid), (mid, len(texts))):
        w.add_batch(flatten_batch(ana, texts[lo:hi]), keys[lo:hi])
    meta = w.flush(idx_dir)
    return idx_dir, meta, oracle


def test_meta_and_docmap(built):
    idx_dir, meta, oracle = built
    r = SegmentReader(f"{idx_dir}/seg-000")
    assert r.num_docs == oracle.num_docs
    assert r.sum_doc_len == sum(oracle.doc_len)
    assert meta["num_terms"] == len(oracle.postings)
    assert np.array_equal(r.doc_len, np.array(oracle.doc_len))
    assert list(r.keys[:3]) == oracle.keys[:3]


def test_dictionary_sorted_and_complete(built):
    idx_dir, _, oracle = built
    r = SegmentReader(f"{idx_dir}/seg-000")
    assert list(r.terms) == oracle.sorted_terms()
    dfs = r.df_array()
    for i, t in enumerate(r.terms):
        assert dfs[i] == oracle.df(t)


def test_postings_match_oracle_every_term(built):
    idx_dir, _, oracle = built
    r = SegmentReader(f"{idx_dir}/seg-000")
    for i, t in enumerate(r.terms):
        docs, freqs, pos, run_offs = r.postings(i, positions=True)
        exp = oracle.postings[t]
        assert list(docs) == [d for d, _, _ in exp], t
        assert list(freqs) == [f for _, f, _ in exp], t
        exp_pos = [p for _, _, ps in exp for p in ps]
        assert list(pos) == exp_pos, t
        assert (np.diff(docs) > 0).all()


def test_skip_blocks_decode(built):
    idx_dir, _, oracle = built
    r = SegmentReader(f"{idx_dir}/seg-000")
    # pick the highest-df term — should exceed one block (300 docs, zipf head)
    dfs = r.df_array()
    i = int(dfs.argmax())
    assert dfs[i] > 128, "fixture should produce a multi-block term"
    sk = r.skips(i)
    assert sk is not None
    full_docs, full_freqs = r.postings(i)
    n_blocks = len(sk["last_doc"])
    # decode every single block alone and compare slices
    for b in range(n_blocks):
        mask = np.zeros(n_blocks, dtype=bool)
        mask[b] = True
        d, f = r.decode_blocks(i, mask)
        lo, hi = b * 128, min((b + 1) * 128, len(full_docs))
        assert np.array_equal(d, full_docs[lo:hi])
        assert np.array_equal(f, full_freqs[lo:hi])
        assert sk["last_doc"][b] == full_docs[hi - 1]
        assert sk["max_freq"][b] == full_freqs[lo:hi].max()


def test_lookup_and_ranges(built):
    idx_dir, _, oracle = built
    r = SegmentReader(f"{idx_dir}/seg-000")
    assert r.lookup("w0000") == 0
    assert r.lookup("zzz-missing") == -1
    lo, hi = r.prefix_range("w00")
    assert [t for t in r.terms[lo:hi]] == [t for t in oracle.sorted_terms() if t.startswith("w00")]
    lo, hi = r.term_range("w0010", "w0020")
    assert all("w0010" <= t < "w0020" for t in r.terms[lo:hi])


def test_sorted_index_build(ray_session, tmp_path_factory):
    """Reference 'sorted index' (comparer.hpp:31-44): docs within each
    segment physically ordered by a field, doc ids reassigned densely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.segment import SegmentReader
    from iresearch_ray.search import BM25, IndexReader, IndexSearcher, TermFilter

    base = tmp_path_factory.mktemp("sorted")
    rng = np.random.default_rng(3)
    n = 200
    prio = rng.permutation(n).astype(np.int64)
    t = pa.table({
        "url": [f"u{i:04d}" for i in range(n)],
        "text": [f"word{i % 7} common probe" for i in range(n)],
        "prio": prio,
    })
    path = str(base / "p.parquet")
    pq.write_table(t, path, row_group_size=50)
    index_dir = str(base / "idx")
    man = build_index(path, index_dir, analyzer="ascii", target_docs=100,
                      sort_by="prio", store_columns=("prio",))
    reader = IndexReader(index_dir)
    # within each segment, stored prio is ascending and doc ids dense
    for seg in reader.segments:
        vals = seg.reader.column("prio").to_numpy()
        assert (np.diff(vals) > 0).all()
    # resume honors the sort lineage (same sort -> skip)
    man2 = build_index(path, index_dir, analyzer="ascii", target_docs=100,
                       sort_by="prio", store_columns=("prio",))
    assert man2["build_stats"]["segments_skipped"] == len(man2["segments"])
    # different sort -> rebuild
    man3 = build_index(path, index_dir, analyzer="ascii", target_docs=100,
                       sort_by="prio", sort_descending=True,
                       store_columns=("prio",))
    assert man3["build_stats"]["segments_built"] == len(man3["segments"])
    # queries still correct after reorder
    res = IndexSearcher(IndexReader(index_dir), BM25()).search(
        TermFilter("word3"), k=500)
    assert sorted(res["key"]) == [f"u{i:04d}" for i in range(n) if i % 7 == 3]


def test_norm_feature_writer(ray_session, tmp_path):
    """Pluggable per-doc feature writers (reference Norm/Norm2,
    core/index/norm.hpp): 'norm' stores float32 1/sqrt(len) in the
    docmap; scoring from the stored column equals the on-the-fly
    TFIDF(with_norms) path bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.features import (
        get_norm_feature,
        known_norm_features,
        register_norm_feature,
    )
    from iresearch_ray.search import IndexReader, IndexSearcher, TFIDF, TermFilter

    assert {"norm", "norm2"} <= set(known_norm_features())
    with pytest.raises(KeyError):
        get_norm_feature("nope")

    t = pa.table({"url": [f"u{i}" for i in range(50)],
                  "text": [("probe " + "pad " * (i % 9)).strip()
                           for i in range(50)]})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p, row_group_size=25)
    idx = str(tmp_path / "idx")
    build_index(p, idx, analyzer="ascii", target_docs=25, norm_feature="norm")

    reader = IndexReader(idx)
    for sv in reader.segments:
        stored = sv.reader.norms("norm")
        assert stored is not None and stored.dtype == np.float32
        dl = sv.reader.doc_len
        assert np.array_equal(
            stored, np.float32(1) / np.sqrt(np.maximum(dl, 1).astype(np.float32)))
        assert sv.reader.norms("norm2") is dl  # norm2 IS doc_len
        assert sv.reader.norms("missing") is None

    # score computed FROM the stored column == with_norms on-the-fly path
    s = IndexSearcher(reader, TFIDF(with_norms=True))
    res = s.search(TermFilter("probe"), k=50)
    sv0 = reader.segments[0]
    i = sv0.reader.lookup("probe")
    docs, freqs = sv0.reader.postings(i)
    sp = TFIDF(with_norms=True).prepare(reader.stats, reader.df("probe"))
    from_stored = (np.sqrt(freqs.astype(np.float32)) * sp.num
                   * sv0.reader.norms("norm")[docs - 1])
    by_doc = dict(zip(res["doc"], res["score"]))
    for d, v in zip(docs + sv0.base, from_stored):
        assert np.float32(by_doc[int(d)]) == v

    # custom writers plug into the same registry + column path; the
    # (name, callable) form ships the writer to worker processes
    idx2 = str(tmp_path / "idx2")
    build_index(p, idx2, analyzer="ascii", target_docs=25,
                norm_feature=("sqrt_len",
                              lambda dl: np.sqrt(dl.astype(np.float64))))
    r2 = IndexReader(idx2)
    got = r2.segments[0].reader.norms("sqrt_len")
    assert np.allclose(got, np.sqrt(r2.segments[0].reader.doc_len))


def test_norm_feature_guards(ray_session, tmp_path):
    """Reserved docmap names are rejected; custom-callable lineage hashes
    closure state (edited captures invalidate resume); non-hashable
    callables are rejected with guidance."""
    import functools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import BuildSegmentTask, _stable_fn_hash, build_index

    with pytest.raises(ValueError):
        BuildSegmentTask(str(tmp_path / "x"), "ascii", {}, "text", "url",
                         norm_feature="doc_len")

    def make(k):
        return lambda dl: dl * k

    h2, h3 = _stable_fn_hash(make(2)), _stable_fn_hash(make(3))
    assert h2 != h3                      # closure value is part of identity
    assert h2 == _stable_fn_hash(make(2))  # and deterministic
    with pytest.raises(ValueError):
        _stable_fn_hash(functools.partial(lambda dl, k: dl * k, k=2))

    # end-to-end: rebuilding with a changed capture re-runs the segments
    t = pa.table({"url": ["a", "b"], "text": ["x y", "x"]})
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    import numpy as _np

    build_index(p, idx, analyzer="ascii", target_docs=10,
                norm_feature=("scaled", make(2)))
    from iresearch_ray.search import IndexReader

    assert list(IndexReader(idx).segments[0].reader.norms("scaled")) == [4, 2]
    man = build_index(p, idx, analyzer="ascii", target_docs=10,
                      norm_feature=("scaled", make(3)))
    assert man["build_stats"]["segments_skipped"] == 0  # resume invalidated
    # new reader: the old one caches the stale docmap
    assert list(IndexReader(idx).segments[0].reader.norms("scaled")) == [6, 3]


_NORM_SCALE = 7  # module-level global read by the feature below


def test_norm_feature_hash_covers_globals():
    """A custom norm feature's lineage hash covers module-level globals it
    reads (round-2 advice: editing one silently kept stale resume), while
    module / helper-function globals stay hashable and builtins are free."""
    import numpy as _np

    from iresearch_ray.index.build import _stable_fn_hash

    def reads_global(dl):
        return dl * _NORM_SCALE

    def reads_module(dl):
        return _np.log1p(dl)

    def reads_builtin(dl):
        return max(dl, 1)

    h1 = _stable_fn_hash(reads_global)
    assert h1 == _stable_fn_hash(reads_global)
    g = globals()
    try:
        g["_NORM_SCALE"] = 8
        assert _stable_fn_hash(reads_global) != h1  # global edit invalidates
    finally:
        g["_NORM_SCALE"] = 7
    assert _stable_fn_hash(reads_global) == h1
    # module + function globals hash stably; non-primitive data rejected
    assert _stable_fn_hash(reads_module) == _stable_fn_hash(reads_module)
    assert _stable_fn_hash(reads_builtin) == _stable_fn_hash(reads_builtin)
    import pytest as _pytest

    def reads_array(dl):
        return dl * _BAD_GLOBAL_ARR  # noqa: F821

    g["_BAD_GLOBAL_ARR"] = _np.arange(3)
    try:
        with _pytest.raises(ValueError, match="non-primitive global"):
            _stable_fn_hash(reads_array)
    finally:
        del g["_BAD_GLOBAL_ARR"]


def test_norm_feature_hash_helper_depth_and_c_callables():
    """Referenced helper functions are fingerprinted RECURSIVELY — two
    helpers with identical bytecode but different constants must yield
    different feature hashes (else editing a helper's constant keeps a
    stale resume) — and C-implemented callables like numpy ufuncs are
    accepted as stable named dependencies, not rejected."""
    import numpy as _np

    from iresearch_ray.index.build import _stable_fn_hash

    def helper_a(x):
        return x * 3.0

    def helper_b(x):
        return x * 4.0

    assert helper_a.__code__.co_code == helper_b.__code__.co_code

    def mk(h):
        def f(dl):
            return h(dl)
        return f

    assert _stable_fn_hash(mk(helper_a)) != _stable_fn_hash(mk(helper_b))
    assert _stable_fn_hash(mk(helper_a)) == _stable_fn_hash(mk(helper_a))
    # numpy ufuncs captured directly (`from numpy import sqrt` style)
    h_sqrt = _stable_fn_hash(mk(_np.sqrt))
    assert h_sqrt == _stable_fn_hash(mk(_np.sqrt))
    assert h_sqrt != _stable_fn_hash(mk(_np.log1p))
    # module-level C functions are fine (__self__ IS the module) ...
    import math as _math
    assert (_stable_fn_hash(mk(_math.sqrt))
            != _stable_fn_hash(mk(_math.log1p)))
    # ... but bound methods of INSTANCES hide state the name can't see:
    # re.Pattern.match / dict.get with different state must NOT collide
    import re as _re

    import pytest as _pytest
    for bound in (_re.compile("a+").match, {"a": 1}.get):
        with _pytest.raises(ValueError):
            _stable_fn_hash(mk(bound))


def test_nul_and_overlong_terms_exact(tmp_path):
    """Round-5 review fixes: (a) doc keys with trailing NULs survive the
    writer intact; (b) term_chars lens are EXACT code-point counts, so
    'a' and 'a\\x00' are distinct to fuzzy matching; (c) a mega-token
    caps the char-matrix width instead of inflating n_terms x len; (d)
    prefix_range's upper bound admits prefix+U10FFFF+more."""
    from iresearch_ray.index.segment import TERM_CHARS_MAX_WIDTH
    from iresearch_ray.search.filters import FuzzyFilter

    ana = get_analyzer("delimiter", delimiter="|")
    texts = ["a\x00|a|" + "z" * 600,
             "pre\U0010FFFFx|pre\U0010FFFF|prefix"]
    keys = ["k", "k\x00"]
    w = SegmentWriter("seg-000", ana.config())
    w.add_batch(flatten_batch(ana, texts), keys)
    idx_dir = str(tmp_path)
    w.flush(idx_dir)
    r = SegmentReader(f"{idx_dir}/seg-000")
    # (a) writer preserved both keys distinctly
    assert list(r.keys) == ["k", "k\x00"]
    # (b) exact lens: 'a' is 1 char, 'a\x00' is 2
    mat, lens = r.term_chars
    terms = list(r.terms)
    assert lens[terms.index("a")] == 1
    assert lens[terms.index("a\x00")] == 2
    # fuzzy 'a' at distance 0 must match ONLY 'a'
    f0 = FuzzyFilter("a", max_distance=0)
    assert [terms[i] for i in f0._match(r)] == ["a"]
    f1 = FuzzyFilter("a", max_distance=1)
    assert sorted(terms[i] for i in f1._match(r)) == ["a", "a\x00"]
    # (c) width capped; the mega-token keeps its exact length
    assert mat.shape[1] == TERM_CHARS_MAX_WIDTH
    assert lens[terms.index("z" * 600)] == 600
    # (d) prefix scan catches the term sorting AFTER prefix+U10FFFF
    lo, hi = r.prefix_range("pre")
    got = set(terms[lo:hi])
    assert {"pre\U0010FFFF", "pre\U0010FFFFx", "prefix"} <= got


def test_encode_postings_empty_last_group_is_loud():
    """The (df == 0) guard must fire BEFORE reduceat, which raises an
    opaque IndexError when the LAST dictionary position is empty."""
    from iresearch_ray.index.segment import encode_postings_table

    uniques = np.array(["a", "b"], dtype=object)
    offs = np.array([0, 2, 2], dtype=np.int64)  # 'b' has df=0
    docs = np.array([1, 2], dtype=np.int64)
    freqs = np.array([1, 1], dtype=np.int64)
    poss = np.array([0, 0], dtype=np.int64)
    runs = np.array([0, 1, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="empty posting list"):
        encode_postings_table(uniques, offs, docs, freqs, poss, runs)


def test_prefix_upper_bound_unit():
    from iresearch_ray.index.segment import prefix_upper_bound

    assert prefix_upper_bound("abc") == "abd"
    assert prefix_upper_bound("ab\U0010FFFF") == "ac"
    assert prefix_upper_bound("\U0010FFFF" * 3) is None
    # ordering property on adversarial neighbors
    for p in ("x", "x\U0010FFFF", "zz"):
        ub = prefix_upper_bound(p)
        if ub is not None:
            assert ub > p + "\U0010FFFF" * 4


def test_resume_invalidates_on_same_name_different_content(
        ray_session, tmp_path):
    """Lineage now pins file SIZE: a same-named input regenerated with
    different text must rebuild, not silently serve stale segments."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index

    src = str(tmp_path / "pages.parquet")
    idx = str(tmp_path / "idx")

    def write(texts):
        pq.write_table(pa.table({
            "url": [f"u{i}" for i in range(len(texts))],
            "text": texts}), src)

    write(["alpha beta"] * 4)
    man1 = build_index(src, idx, analyzer="ascii", target_docs=10)
    assert man1["build_stats"]["segments_built"] == 1
    write(["gamma delta variant content"] * 4)  # same name, new content
    man2 = build_index(src, idx, analyzer="ascii", target_docs=10)
    assert man2["build_stats"]["segments_built"] == 1  # NOT skipped
