"""duplicated_spans / duplicated_span_stats / top_bigrams / repetition_stats.

The substring-dedup surface mirrors the cross-document role of
suffix-array training-data dedup (find verbatim passages repeated across
a corpus) as rolling-hash k-token spans; the repetition surface is the
Gopher-style per-doc repetition quality filters.  Brute-force oracles
here are pure-Python over the same analyzer tokens.
"""

import collections

import numpy as np
import pytest
import ray.data

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.pipelines import dedup, textstats

SF = "/root/testdata/sf0.001"


def _brute_spans(rows, k=5):
    """doc -> set of k-token windows (full prefix if shorter)."""
    ana = get_analyzer("ascii")
    out = {}
    for r in rows:
        ts = ana.tokens(r["text"])
        if not ts:
            continue
        kk = min(k, len(ts))
        out[r["doc_id"]] = {tuple(ts[i:i + kk])
                            for i in range(len(ts) - kk + 1)}
    return out


SHARED = "quick brown fox jumps over the lazy dog tonight"
ROWS = [
    {"doc_id": 1, "text": f"intro words then {SHARED} and a unique tail one"},
    {"doc_id": 2, "text": f"other opening here {SHARED} closing differently two"},
    {"doc_id": 3, "text": "completely unrelated content with no overlap at all"},
    {"doc_id": 4, "text": "tiny doc"},          # shorter than k -> prefix span
    {"doc_id": 5, "text": ""},                   # tokenless -> dropped
    {"doc_id": 6, "text": "tiny doc"},           # duplicates doc 4's prefix span
]


def test_duplicated_spans_matches_bruteforce(ray_session):
    ds = ray.data.from_items(ROWS)
    out = dedup.duplicated_spans(ds).to_pandas()
    spans = _brute_spans(ROWS)
    counts = collections.Counter()
    for s in spans.values():
        counts.update(s)
    exp_dup = {s for s, c in counts.items() if c >= 2}
    # the shared 9-token run gives 5 shared 5-gram windows; docs 4/6 share
    # their full-prefix span
    assert len(out) == len(exp_dup)
    assert (out["n_docs"] >= 2).all()
    # keep_id is the min doc id holding each duplicated span
    keeps = collections.Counter(out["keep_id"])
    assert keeps[1] == 5 and keeps[4] == 1


def test_duplicated_spans_min_docs_filter(ray_session):
    ds = ray.data.from_items(ROWS)
    assert len(dedup.duplicated_spans(ds, min_docs=3).to_pandas()) == 0
    three = ROWS + [{"doc_id": 7, "text": f"third copy around {SHARED} again"}]
    out = dedup.duplicated_spans(ray.data.from_items(three),
                                 min_docs=3).to_pandas()
    assert len(out) == 5 and (out["n_docs"] == 3).all()


def test_duplicated_spans_hash_independent(ray_session):
    ds = ray.data.from_items(ROWS)
    a = dedup.duplicated_spans(ds, hash="stable").to_pandas()
    b = dedup.duplicated_spans(ds, hash="md5").to_pandas()
    assert sorted(zip(a["n_docs"], a["keep_id"])) == \
        sorted(zip(b["n_docs"], b["keep_id"]))


def test_duplicated_span_stats_bruteforce(ray_session):
    ds = ray.data.from_items(ROWS)
    out = (dedup.duplicated_span_stats(ds).to_pandas()
           .set_index("doc_id").sort_index())
    spans = _brute_spans(ROWS)
    counts = collections.Counter()
    for s in spans.values():
        counts.update(s)
    assert list(out.index) == [1, 2, 3, 4, 6]  # doc 5 tokenless -> dropped
    for doc_id, s in spans.items():
        dup = sum(1 for w in s if counts[w] >= 2)
        row = out.loc[doc_id]
        assert row["n_spans"] == len(s)
        assert row["n_dup_spans"] == dup
        assert row["dup_frac"] == dup / len(s)
    assert out.loc[3, "n_dup_spans"] == 0
    assert out.loc[4, "dup_frac"] == 1.0


def test_duplicated_span_stats_broadcast_guard(ray_session):
    ds = ray.data.from_items(ROWS)
    with pytest.raises(ValueError, match="max_broadcast"):
        dedup.duplicated_span_stats(ds, max_broadcast=2)


def test_duplicated_span_stats_corpus_consistency(ray_session):
    """On the sf0.001 corpus: per-doc distinct span count equals the
    brute-force tokenization, and sum(n_dup) is consistent with the
    span listing."""
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    stats = dedup.duplicated_span_stats(ds).to_pandas()
    listing = dedup.duplicated_spans(ds).to_pandas()
    import pandas as pd

    rows = pd.read_parquet(f"{SF}/documents.parquet")[
        ["doc_id", "text"]].to_dict("records")
    spans = _brute_spans(rows)
    got = stats.set_index("doc_id")["n_spans"]
    for doc_id, s in spans.items():
        assert got[doc_id] == len(s)
    # every duplicated span contributes one dup-span count per holding doc
    assert stats["n_dup_spans"].sum() == listing["n_docs"].sum()


def test_top_bigrams_counts_and_order(ray_session):
    rows = [{"doc_id": 1, "text": "a b a b c"},
            {"doc_id": 2, "text": "a b x"},
            {"doc_id": 3, "text": "c"},          # no bigram
            {"doc_id": 4, "text": "b a"}]
    out = textstats.top_bigrams(ray.data.from_items(rows)).to_pandas()
    exp = {"a b": 3, "b a": 2, "b c": 1, "b x": 1}
    assert dict(zip(out["bigram"], out["n"])) == exp
    # order: count desc, bigram asc on ties
    assert list(out["bigram"]) == ["a b", "b a", "b c", "b x"]
    top2 = textstats.top_bigrams(ray.data.from_items(rows), k_top=2).to_pandas()
    assert list(top2["bigram"]) == ["a b", "b a"]


def test_top_bigrams_no_cross_doc_pairs(ray_session):
    # "y z" then "z y" across a doc boundary must NOT create "z z" or "y y"
    rows = [{"doc_id": 1, "text": "y z"}, {"doc_id": 2, "text": "z y"}]
    out = textstats.top_bigrams(ray.data.from_items(rows)).to_pandas()
    assert set(out["bigram"]) == {"y z", "z y"}


def test_repetition_stats_hand_values(ray_session):
    rows = [{"doc_id": 1, "text": "a a a a"},
            {"doc_id": 2, "text": "w x y z"},
            {"doc_id": 3, "text": "solo"},
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": "p q p q p q"}]
    out = (textstats.repetition_stats(ray.data.from_items(rows))
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [1, 2, 3, 5]
    assert out.loc[1, "distinct_ratio"] == 0.25
    assert out.loc[1, "top_token_frac"] == 1.0
    assert out.loc[1, "top_bigram_frac"] == 1.0          # "a a" x3 / 3
    assert out.loc[2, "distinct_ratio"] == 1.0
    assert out.loc[2, "top_token_frac"] == 0.25
    assert out.loc[2, "top_bigram_frac"] == 1 / 3
    assert out.loc[3, "n_tokens"] == 1
    assert out.loc[3, "top_bigram_frac"] == 0.0          # no bigrams
    assert out.loc[5, "distinct_ratio"] == 2 / 6
    assert out.loc[5, "top_bigram_frac"] == 3 / 5        # "p q" x3 / 5


def test_repetition_stats_matches_bruteforce_corpus(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    out = (textstats.repetition_stats(ds).to_pandas()
           .set_index("doc_id").sort_index())
    import pandas as pd

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    ana = get_analyzer("ascii")
    for _, r in pdf.sample(40, random_state=7).iterrows():
        ts = ana.tokens(r["text"])
        if not ts:
            assert r["doc_id"] not in out.index
            continue
        row = out.loc[r["doc_id"]]
        c = collections.Counter(ts)
        assert row["n_tokens"] == len(ts)
        assert row["distinct_ratio"] == len(c) / len(ts)
        assert row["top_token_frac"] == max(c.values()) / len(ts)
        if len(ts) >= 2:
            bc = collections.Counter(zip(ts[:-1], ts[1:]))
            assert row["top_bigram_frac"] == max(bc.values()) / (len(ts) - 1)
        else:
            assert row["top_bigram_frac"] == 0.0


def test_duplicated_spans_hot_key_across_blocks(ray_session):
    """A span shared by MANY docs spread over many input blocks must
    combine to ONE output row (the sort's range partitioning keeps equal
    keys in one block; the per-block combine relies on that)."""
    rows = [{"doc_id": i, "text": "alpha beta gamma delta epsilon"}
            for i in range(64)]
    rows += [{"doc_id": 100 + i, "text": f"unique{i} filler{i} pad{i} x{i} y{i}"}
             for i in range(64)]
    ds = ray.data.from_items(rows).repartition(16)
    out = dedup.duplicated_spans(ds).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_docs"] == 64 and out.iloc[0]["keep_id"] == 0


def test_string_id_columns_with_tokenless_blocks(ray_session):
    """String id columns must survive blocks whose docs are ALL tokenless
    (the empty slice must not be inferred as a null-typed column)."""
    rows = ([{"uid": f"u{i:03d}", "text": ""} for i in range(8)]
            + [{"uid": f"v{i:03d}", "text": "alpha beta gamma delta epsilon zeta"}
               for i in range(8)])
    # repartition so some blocks hold only tokenless docs
    ds = ray.data.from_items(rows).repartition(8)
    stats = dedup.duplicated_span_stats(
        ds, id_column="uid").to_pandas().sort_values("uid")
    assert list(stats["uid"]) == [f"v{i:03d}" for i in range(8)]
    assert (stats["dup_frac"] == 1.0).all()      # all 8 share every span
    ds = ray.data.from_items(rows).repartition(8)
    rep = textstats.repetition_stats(
        ds, id_column="uid").to_pandas().sort_values("uid")
    assert list(rep["uid"]) == [f"v{i:03d}" for i in range(8)]
    assert (rep["n_tokens"] == 6).all()
    ds = ray.data.from_items(rows).repartition(8)
    spans = dedup.duplicated_spans(ds, id_column="uid").to_pandas()
    assert (spans["n_docs"] == 8).all() and (spans["keep_id"] == "v000").all()


def test_sort_combine_survives_tiny_block_targets(ray_session):
    """Sort+combine exactness must not depend on block sizing: force a
    4 KB target block size — far below the hot run's bytes — and require
    the hot key to still combine to a single exact row (the boundary
    repair merges however many pieces the blocking produces)."""
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 4096
        rows = [{"doc_id": i, "text": "alpha beta gamma delta epsilon"}
                for i in range(2000)]
        rows += [{"doc_id": 10_000 + i,
                  "text": f"u{i} v{i} w{i} x{i} y{i}"} for i in range(2000)]
        ds = ray.data.from_items(rows).repartition(16)
        out = dedup.duplicated_spans(ds).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["n_docs"] == 2000 and out.iloc[0]["keep_id"] == 0
    finally:
        ctx.target_max_block_size = old


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(-50, 50),        # key space with ties
                          st.integers(0, 10_000)),     # id
                min_size=0, max_size=300),
       st.one_of(st.none(), st.integers(1, 4)))
def test_grouped_count_min_matches_pandas(ray_session, rows, min_count):
    """_grouped_count_min == pandas groupby (count, min) for arbitrary
    (key, id) multisets, at every min_count, across block splits."""
    import pandas as pd
    import pyarrow as pa

    from iresearch_ray.pipelines.dedup import _grouped_count_min

    t = pa.table({"k": pa.array([k for k, _ in rows], pa.int64()),
                  "i": pa.array([i for _, i in rows], pa.int64())})
    ds = ray.data.from_arrow(t)
    if len(rows) > 8:
        ds = ds.repartition(4)
    got = _grouped_count_min(ds, "k", "i", count_alias="n",
                             keep_alias="m", min_count=min_count).to_pandas()
    if len(got):  # an all-empty Dataset to_pandas() has no columns to sort
        got = got.sort_values("k").reset_index(drop=True)
    if rows:
        exp = (pd.DataFrame(rows, columns=["k", "i"]).groupby("k")
               .agg(n=("i", "size"), m=("i", "min")).reset_index())
        if min_count is not None:
            exp = exp[exp["n"] >= min_count].reset_index(drop=True)
    else:
        exp = pd.DataFrame({"k": [], "n": [], "m": []}).astype("int64")
    assert len(got) == len(exp)
    if len(exp):
        assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
        assert (got["m"].to_numpy() == exp["m"].to_numpy()).all()


def test_keyterms_bruteforce_and_hash_independence(ray_session):
    """keyterms == a per-doc brute-force tf-idf ranking; stable and md5
    term-hash maps give identical output."""
    import math

    rows = [{"doc_id": 1, "text": "rare rare common common common"},
            {"doc_id": 2, "text": "common other words here rare"},
            {"doc_id": 3, "text": "common common unique1 unique2"},
            {"doc_id": 4, "text": ""}]
    ds = ray.data.from_items(rows)
    out = (textstats.keyterms(ds, n_terms=2).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    ana = get_analyzer("ascii")
    corpus = {r["doc_id"]: ana.tokens(r["text"]) for r in rows}
    df = collections.Counter()
    for ts in corpus.values():
        df.update(set(ts))
    n_total = len(rows)
    exp = []
    for doc_id, ts in corpus.items():
        tf = collections.Counter(ts)
        scored = sorted((-f * math.log((n_total + 1) / (df[t] + 1)), t)
                        for t, f in tf.items())
        for r, (_, t) in enumerate(scored[:2], 1):
            exp.append((doc_id, t, r))
    got = list(zip(out["doc_id"], out["term"], out["rank"]))
    assert got == exp
    ds2 = ray.data.from_items(rows)
    out_md5 = (textstats.keyterms(ds2, n_terms=2, hash="md5").to_pandas()
               .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    assert got == list(zip(out_md5["doc_id"], out_md5["term"],
                           out_md5["rank"]))


def test_keyterms_vocab_broadcast_guard(ray_session):
    rows = [{"doc_id": 1, "text": "a b c d e f"}]
    with pytest.raises(ValueError, match="max_broadcast"):
        textstats.keyterms(ray.data.from_items(rows), max_broadcast=2)


from hypothesis import HealthCheck


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large])
@given(st.lists(st.lists(st.sampled_from("abcdefgh"),
                         min_size=0, max_size=12),
                min_size=1, max_size=25),
       st.integers(1, 6))
def test_duplicated_spans_property(ray_session, token_lists, k):
    """duplicated_spans == the brute-force window-set counter for
    arbitrary tiny corpora at every window length k (heavy collisions by
    construction: single-letter vocab of 8)."""
    rows = [{"doc_id": i, "text": " ".join(ts)}
            for i, ts in enumerate(token_lists)]
    ds = ray.data.from_items(rows)
    out = dedup.duplicated_spans(ds, k=k).to_pandas()
    got = sorted(out["n_docs"]) if len(out) else []   # empty -> column-less
    spans = _brute_spans(rows, k=k)
    counts = collections.Counter()
    for s in spans.values():
        counts.update(s)
    exp = sorted(c for c in counts.values() if c >= 2)
    assert got == exp


def test_keyterms_materializes_derived_lineage_once(ray_session):
    """Round-5 (VERDICT r4 item 7): a DERIVED input lineage must execute
    exactly once — keyterms auto-materializes it before its df pass,
    count, and scoring pass.  The upstream map stage counts its own
    executions through a Ray actor."""
    import pyarrow as pa
    import ray

    from iresearch_ray.pipelines import textstats

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self, k):
            self.n += k

        def get(self):
            return self.n

    counter = Counter.remote()
    rows = [{"doc_id": f"d{i}", "text": f"alpha beta tok{i % 5} gamma"}
            for i in range(40)]
    base = ray.data.from_items(rows).repartition(4)

    def counted(b: pa.Table) -> pa.Table:
        ray.get(counter.inc.remote(1))
        return b

    derived = base.map_batches(counted, batch_format="pyarrow",
                               batch_size=None)
    out = textstats.keyterms(derived, n_terms=2).to_pandas()
    assert len(out) == 40 * 2
    # 4 blocks -> exactly 4 stage executions; the pre-fix shape ran the
    # lineage 3x (12)
    assert ray.get(counter.get.remote()) == 4

    # bare reads / from_items inputs pass through untouched (no
    # InputData materialization step) — shape check via the plan type
    from ray.data._internal.logical.operators.input_data_operator import (
        InputData,
    )
    plain = ray.data.from_items(rows)  # AbstractFrom: already in store
    assert textstats._materialize_derived(plain) is plain
    # base carries a Repartition op -> derived -> materialized
    assert isinstance(
        textstats._materialize_derived(base)._logical_plan.dag, InputData)
    assert isinstance(
        textstats._materialize_derived(derived)._logical_plan.dag,
        InputData)
