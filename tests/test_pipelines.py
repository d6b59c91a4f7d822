"""Dedup / textstats / ANN / multimodal pipeline correctness on testdata."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.analysis.minhash import (
    minhash_signatures,
    shingles,
    simhash,
    stable_hash_strings,
)
from iresearch_ray.pipelines import ann, dedup, multimodal, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_exact_dedup(docs, docs_pdf):
    out = dedup.exact_dedup_groups(docs).to_pandas()
    exp = docs_pdf.groupby(docs_pdf["text"]).agg(
        dup_count=("doc_id", "size"), keep_id=("doc_id", "min"))
    assert len(out) == len(exp)
    assert out["dup_count"].sum() == len(docs_pdf)
    m = out.set_index("text_hash")
    import hashlib
    for text, row in exp.iterrows():
        h = hashlib.md5(text.encode()).hexdigest()
        assert m.loc[h, "keep_id"] == row["keep_id"]
        assert m.loc[h, "dup_count"] == row["dup_count"]


def test_exact_dedup_stable_hash(docs, docs_pdf):
    """hash='stable' (vectorized 128-bit siphash pair, fixed_size_binary
    keys) must produce the SAME grouping as the md5 oracle mode: same
    group count, same (keep_id, dup_count) multiset — only the key
    space differs."""
    out = dedup.exact_dedup_groups(docs, hash="stable").to_pandas()
    exp = (docs_pdf.groupby("text")
           .agg(dup_count=("doc_id", "size"), keep_id=("doc_id", "min"))
           .reset_index(drop=True))
    assert len(out) == len(exp)
    assert out["dup_count"].sum() == len(docs_pdf)
    got = (out[["keep_id", "dup_count"]]
           .sort_values(["keep_id", "dup_count"]).reset_index(drop=True))
    want = (exp.sort_values(["keep_id", "dup_count"])[["keep_id", "dup_count"]]
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # keys are 16-byte fixed-width binary (half the hex shuffle payload)
    assert all(len(k) == 16 for k in out["text_hash"])
    with pytest.raises(ValueError):
        dedup.exact_dedup_groups(docs, hash="sha9")


def test_stable128_hex_matches_binary(ray_session):
    """The S32 hex form used for ingest's membership tests must be the
    hexlify of the fixed_size_binary form — including keys whose raw
    bytes carry leading/trailing NULs (the numpy 'S' aliasing hazard)."""
    import binascii

    from iresearch_ray.analysis.minhash import (
        stable_hash_strings128,
        stable_hash_strings128_hex,
    )

    vals = ["a", "b", "", "x" * 1000, "nul\x00inside", "a"]
    fsb = stable_hash_strings128(vals)
    hx = stable_hash_strings128_hex(vals)
    assert [binascii.hexlify(v.as_py()) for v in fsb] == list(hx)
    assert hx[0] == hx[-1] and hx[0] != hx[1]


def test_fingerprint_dedup(docs, docs_pdf):
    out = dedup.fingerprint_dedup_groups(docs).to_pandas()
    ana = get_analyzer("ascii")
    exp_groups = docs_pdf.assign(
        fp=docs_pdf["text"].map(lambda t: " ".join(sorted(ana.tokens(t))))
    ).groupby("fp")["doc_id"].agg(["size", "min"])
    assert len(out) == len(exp_groups)
    assert out["dup_count"].sum() == len(docs_pdf)


def test_minhash_identical_docs_pair(ray_session):
    rows = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta eta theta"},
            {"doc_id": 3, "text": "completely different words entirely unrelated content here now"},
            {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta eta iota"}]
    ds = ray.data.from_items(rows)
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    assert ((pairs["id_a"] == 1) & (pairs["id_b"] == 2)).any()
    assert not ((pairs["id_a"] == 1) & (pairs["id_b"] == 3)).any()
    exact = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]["est_jaccard"].iloc[0]
    assert exact == 1.0
    keep = dedup.dedup_keep_first(pairs, np.array([1, 2, 3, 4]))
    assert 1 in keep and 3 in keep and 2 not in keep


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    """ngram_jaccard_pairs returns EXACTLY the pairs a brute-force
    all-pairs shingle-set Jaccard finds — the prefix filter may not drop
    a single qualifying pair (completeness lemma) and verification is
    exact, across thresholds and with a hot shared shingle forced into
    the df-ordered path (hot_df_min=2)."""
    from itertools import combinations

    from iresearch_ray.analysis import get_analyzer
    from iresearch_ray.analysis.minhash import shingles

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(28):
        # every doc shares a hot prefix phrase -> one very hot shingle
        body = list(rng.choice(vocab, size=rng.integers(6, 14)))
        rows.append({"doc_id": i, "text": "the common start " + " ".join(body)})
    # guaranteed near-dup clusters: tiny perturbations of a base doc
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows += [{"doc_id": 100, "text": base},
             {"doc_id": 101, "text": base},
             {"doc_id": 102, "text": base + " extra"},
             {"doc_id": 103, "text": "totally disjoint words only here"}]
    ana = get_analyzer("ascii")

    def sset(text):
        return set(shingles(ana.tokens(text), 3))

    for threshold in (0.5, 0.8, 1.0):
        expect = set()
        for a, b in combinations(rows, 2):
            A, B = sset(a["text"]), sset(b["text"])
            if not A or not B:
                continue
            j = len(A & B) / len(A | B)
            if j >= threshold:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                expect.add((lo, hi, round(j, 9)))
        got = dedup.ngram_jaccard_pairs(
            ray.data.from_items(rows), threshold=threshold,
            hot_df_min=2).to_pandas()
        have = {(int(r.id_a), int(r.id_b), round(r.jaccard, 9))
                for r in got.itertuples(index=False)}
        assert have == expect, f"threshold={threshold}"


def test_ngram_jaccard_distributed_verify_matches_driver(ray_session):
    """Forcing the Ray-stage verification path (distributed_verify_min=0)
    must give byte-identical pairs to the driver-side path — measured
    2.1x faster end-to-end on a 100k-doc dense-shingle probe."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=rng.integers(8, 14)))}
            for i in range(40)]
    rows += [{"doc_id": 100, "text": rows[0]["text"]},
             {"doc_id": 101, "text": rows[1]["text"] + " tail"}]
    a = dedup.ngram_jaccard_pairs(
        ray.data.from_items(rows), threshold=0.6,
        hot_df_min=2).to_pandas()
    b = dedup.ngram_jaccard_pairs(
        ray.data.from_items(rows), threshold=0.6, hot_df_min=2,
        distributed_verify_min=0).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    assert ((a["id_a"] == 0) & (a["id_b"] == 100)).any()


def test_ngram_jaccard_output_is_hash_independent(ray_session):
    """The hash family only sets the candidate ORDER (any shared total
    order is complete by the prefix lemma) — switching stable->md5 must
    not change a single pair or jaccard value."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(20)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=rng.integers(6, 12)))}
            for i in range(30)]
    rows += [{"doc_id": 50, "text": rows[2]["text"]},
             {"doc_id": 51, "text": rows[2]["text"] + " coda"}]
    a = dedup.ngram_jaccard_pairs(ray.data.from_items(rows), threshold=0.5,
                                  hot_df_min=2, hash="stable").to_pandas()
    b = dedup.ngram_jaccard_pairs(ray.data.from_items(rows), threshold=0.5,
                                  hot_df_min=2, hash="md5").to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    assert ((a["id_a"] == 2) & (a["id_b"] == 50)).any()


def test_ngram_jaccard_tokenless_and_empty(ray_session):
    """Zero-shingle docs never pair; a corpus with no qualifying pairs
    returns an EMPTY typed frame (id dtype follows the input)."""
    rows = [{"doc_id": 1, "text": "!!! ..."},
            {"doc_id": 2, "text": "..."},
            {"doc_id": 3, "text": "some ordinary words here"},
            {"doc_id": 4, "text": "entirely different content now"}]
    out = dedup.ngram_jaccard_pairs(ray.data.from_items(rows), threshold=0.8)
    # columns live on the Dataset schema (to_pandas() of an empty Ray
    # dataset drops columns — a Ray quirk, not an operator one)
    assert out.schema().names == ["id_a", "id_b", "jaccard"]
    assert len(out.to_pandas()) == 0


def test_contamination_check(ray_session):
    """Per-doc distinct-shingle overlap with a broadcast probe set: a doc
    embedding a probe sentence scores frac > 0, unrelated docs score 0,
    token-less docs are dropped, and an empty probe set gives matched=0
    everywhere."""
    bench = "the quick brown fox jumps over the lazy dog every day"
    rows = [
        {"doc_id": 1, "text": "prefix words then " + bench + " then suffix"},
        {"doc_id": 2, "text": "completely unrelated content with many words "
                              "that never overlap anything at all"},
        {"doc_id": 3, "text": "..."},
    ]
    ds = ray.data.from_items(rows)
    out = dedup.contamination_check(
        ds, [bench], shingle_k=8).to_pandas().set_index("doc_id")
    assert 3 not in out.index           # token-less doc dropped
    assert out.loc[1, "matched"] > 0
    assert out.loc[1, "frac"] == out.loc[1, "matched"] / out.loc[1, "total"]
    assert out.loc[2, "matched"] == 0 and out.loc[2, "frac"] == 0.0
    empty = dedup.contamination_check(ds, [], shingle_k=8).to_pandas()
    assert (empty["matched"] == 0).all()
    # probe as a small Dataset works the same as a list of strings
    probe_ds = ray.data.from_items([{"text": bench}])
    out2 = dedup.contamination_check(
        ds, probe_ds, shingle_k=8).to_pandas().set_index("doc_id")
    assert out2["matched"].equals(out["matched"])


def test_minhash_tokenless_docs_emit_no_pairs(ray_session):
    """Docs whose text yields zero shingles (punctuation-only) have an
    empty shingle set — Jaccard with anything is undefined, so they must
    not pair with each other via untouched all-max signatures (and the
    SQL oracle excludes them, so emitting them would break the exact
    comparison)."""
    rows = [{"doc_id": 1, "text": "!!! ... ???"},
            {"doc_id": 2, "text": "--- ;;; :::"},
            {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta"}]
    pairs = dedup.minhash_lsh_pairs(
        ray.data.from_items(rows), threshold=0.5).to_pandas()
    assert not ((pairs["id_a"] == 1) | (pairs["id_b"] == 1)).any()
    assert not ((pairs["id_a"] == 2) | (pairs["id_b"] == 2)).any()
    assert ((pairs["id_a"] == 3) & (pairs["id_b"] == 4)).any()


def test_minhash_signature_estimates_jaccard():
    a = [f"tok{i}" for i in range(100)]
    b = [f"tok{i}" for i in range(20, 120)]  # true J = 80/120 = 0.666
    sh_a, sh_b = shingles(a, 1), shingles(b, 1)
    h = stable_hash_strings(sh_a + sh_b)
    sig = minhash_signatures(h, np.array([0, len(sh_a), len(sh_a) + len(sh_b)]),
                             num_hashes=256)
    est = (sig[0] == sig[1]).mean()
    assert abs(est - 2 / 3) < 0.12


def test_simhash_groups(ray_session):
    rows = [{"doc_id": 1, "text": "a b c d"}, {"doc_id": 2, "text": "a b c d"},
            {"doc_id": 3, "text": "x y z w"}]
    out = dedup.simhash_groups(ray.data.from_items(rows)).to_pandas()
    assert len(out) == 2
    g = out[out["dup_count"] == 2]
    assert g["keep_id"].iloc[0] == 1


def test_quality_stats(docs, docs_pdf):
    out = textstats.quality_stats(docs).to_pandas().set_index("doc_id")
    ana = get_analyzer("ascii")
    for doc_id in docs_pdf["doc_id"].head(20):
        text = docs_pdf.set_index("doc_id").loc[doc_id, "text"]
        toks = ana.tokens(text)
        assert out.loc[doc_id, "n_tokens"] == len(toks)
        assert out.loc[doc_id, "n_unique_tokens"] == len(set(toks))
        exp_sw = round(sum(w in textstats.STOPWORDS_EN for w in toks) / len(toks), 6)
        assert out.loc[doc_id, "stopword_ratio"] == pytest.approx(exp_sw)


def test_langid(ray_session):
    rows = [{"doc_id": 1, "text": "the cat and the dog"},
            {"doc_id": 2, "text": "der hund und die katze ist"},
            {"doc_id": 3, "text": "le chat et la mer est"},
            {"doc_id": 4, "text": "el perro y la casa es un"}]
    out = textstats.langid(ray.data.from_items(rows)).to_pandas()
    assert list(out.sort_values("doc_id")["lang_pred"]) == ["en", "de", "fr", "es"]


def test_dedup_clusters_nul_string_ids(ray_session):
    """Doc ids differing only past an embedded NUL are distinct nodes on
    BOTH clustering paths (the pandas factorize/groupby hashtables
    collapse them; the driver fast path and the distributed boundary
    merge both route through NUL-safe reductions now)."""
    ds = ray.data.from_pandas(pd.DataFrame(
        {"id_a": ["n\x001", "n\x003"], "id_b": ["n\x002", "n\x004"]}))
    for dm in (0, 2_000_000):
        out = (dedup.dedup_clusters(ds, driver_max=dm).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out.to_dict("list") == {
            "doc_id": ["n\x001", "n\x002", "n\x003", "n\x004"],
            "cluster_id": ["n\x001", "n\x001", "n\x003", "n\x003"]}


def test_token_count_by_nul_group_keys(ray_session):
    """Partial counts must not merge group keys that differ only past an
    embedded NUL."""
    df = pd.DataFrame({
        "source": ["s\x00a", "s\x00b", "s\x00a", "t"],
        "text": ["one two", "three", "four five six", "seven eight"]})
    out = (textstats.token_count_by(ray.data.from_pandas(df), "source")
           .to_pandas().set_index("source"))
    assert int(out.loc["s\x00a", "total_tokens"]) == 5
    assert int(out.loc["s\x00b", "total_tokens"]) == 1
    assert int(out.loc["t", "total_tokens"]) == 2


def test_token_count_by_null_group_keys_drop(ray_session):
    """Null group keys drop silently (the pandas-groupby history) —
    they must not crash the bincount partial with negative codes."""
    df = pd.DataFrame({"source": ["a", None, "a"],
                       "text": ["one two", "three four five", "six"]})
    out = (textstats.token_count_by(ray.data.from_pandas(df), "source")
           .to_pandas())
    assert out.to_dict("list") == {"source": ["a"], "total_tokens": [3]}


def test_nul_safe_factorize_dictionary_input():
    """A dictionary-encoded string column must decode, not fall through
    to the NUL-collapsing pd.factorize branch."""
    import pyarrow as pa

    from iresearch_ray.util import nul_safe_factorize

    enc = pa.array(["a\x00b", "a\x00c", "a\x00b"]).dictionary_encode()
    codes, uniques = nul_safe_factorize(enc, sort=True)
    assert codes.tolist() == [0, 1, 0]
    assert uniques.tolist() == ["a\x00b", "a\x00c"]


def test_token_count_by(docs, docs_pdf):
    out = textstats.token_count_by(docs, "source").to_pandas().set_index("source")
    ana = get_analyzer("ascii")
    exp = docs_pdf.assign(n=docs_pdf["text"].map(lambda t: len(ana.tokens(t)))) \
        .groupby("source")["n"].sum()
    for src, n in exp.items():
        assert out.loc[src, "total_tokens"] == n


def test_term_frequencies(docs, docs_pdf):
    out = textstats.term_frequencies(docs).to_pandas().set_index("term")
    ana = get_analyzer("ascii")
    from collections import Counter
    df_c, ttf_c = Counter(), Counter()
    for t in docs_pdf["text"]:
        c = Counter(ana.tokens(t))
        for w, n in c.items():
            df_c[w] += 1
            ttf_c[w] += n
    assert len(out) == len(df_c)
    for w in list(df_c)[:25]:
        assert out.loc[w, "df"] == df_c[w]
        assert out.loc[w, "ttf"] == ttf_c[w]


def test_cosine_topk_exact(ray_session):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    M = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
    ids = emb["vec_id"].to_numpy()
    q = M[0]
    out = ann.cosine_topk(ds, q, k=10)
    qn = q / np.linalg.norm(q)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ qn
    order = np.lexsort((ids, -sims))[:10]
    assert list(out["vec_id"]) == list(ids[order])
    assert np.allclose(out["cosine"], sims[order], atol=1e-6)


def test_lsh_topk_recall(ray_session):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    M = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    q = M[0]
    exact = ann.cosine_topk(ds, q, k=10)
    approx = ann.lsh_topk(ds, q, k=10, planes=4, multiprobe=1)
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5  # loose: sign-LSH on raw embeddings
    assert exact["vec_id"].iloc[0] == approx["vec_id"].iloc[0] == 0  # self-match


def test_multimodal_decode_plumbing(ray_session):
    from iresearch_ray.sources.pages import synthesize_pages

    t = synthesize_pages(32)
    ds = ray.data.from_arrow(t)
    out = multimodal.decode_features(ds, payload_column="html",
                                     feature_dim=8, batch_size=8).to_pandas()
    assert len(out) == 32
    assert "html" not in out.columns
    assert all(len(f) == 8 for f in out["feature"])
    assert (out["payload_bytes"] > 0).all()
    # determinism
    out2 = multimodal.decode_features(ray.data.from_arrow(t), payload_column="html",
                                      feature_dim=8, batch_size=8).to_pandas()
    a = out.sort_values("url")["feature"].map(tuple).tolist()
    b = out2.sort_values("url")["feature"].map(tuple).tolist()
    assert a == b


def test_multimodal_stub_raises():
    stage = multimodal.DecodeFeatureBatch(fake=None)
    with pytest.raises(NotImplementedError):
        stage._decode_stub(b"payload")


def test_classify_and_neighbors_plumbing(ray_session, docs):
    from iresearch_ray.pipelines.classify import classify, nearest_neighbors

    out = (classify(docs, labels=("a", "b", "c"), top_k=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert {"doc_id", "labels"} <= set(out.columns)
    assert all(len(ls) == 2 and set(ls) <= {"a", "b", "c"} for ls in out["labels"])
    # deterministic across runs (sorted: block arrival order is not)
    out2 = (classify(docs, labels=("a", "b", "c"), top_k=2).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(map(list, out["labels"])) == list(map(list, out2["labels"]))

    nn = nearest_neighbors(docs.limit(20), k=2).to_pandas()
    assert all(len(v) % 2 == 0 for v in nn["neighbor_tokens"])
    assert any(len(v) > 0 for v in nn["neighbor_tokens"])


def test_nearest_neighbors_hash_modes(ray_session):
    """The batched-unique-token refactor must preserve the fake's exact
    per-token output in both hash families: fnv (the original per-token
    _stable_hash format) and md5 (== md5_number_lower, the SQL-oracle
    mode)."""
    import hashlib

    import ray

    from iresearch_ray.pipelines.classify import (
        NearestNeighborsBatch, _stable_hash, nearest_neighbors)

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "Alpha beta ALPHA"},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "42-beta"},
    ])

    def expect(tokens, hash_fn, k=2):
        out = []
        for t in tokens:
            h = hash_fn(t)
            out.extend(f"{t}~{(h >> (8 * i)) % 97:02d}" for i in range(k))
        return out

    def md5h(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                              "little")

    for mode, fn in (("fnv", _stable_hash), ("md5", md5h)):
        nn = (nearest_neighbors(ds, k=2, hash=mode).to_pandas()
              .set_index("doc_id")["neighbor_tokens"])
        assert list(nn.loc[1]) == expect(["alpha", "beta", "alpha"], fn)
        assert list(nn.loc[2]) == []
        assert list(nn.loc[3]) == expect(["42", "beta"], fn)
    with pytest.raises(ValueError):
        NearestNeighborsBatch(hash="crc")


def test_classify_model_path_raises_without_fasttext(ray_session):
    import pytest as _pytest

    from iresearch_ray.pipelines.classify import ClassifyBatch

    with _pytest.raises(NotImplementedError):
        ClassifyBatch(model_path="/nonexistent/model.bin")


def test_windows_tumbling_and_sessions(ray_session):
    import duckdb

    from iresearch_ray.pipelines.windows import sessionize, tumbling_aggregate

    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    tb = (tumbling_aggregate(ds, window_minutes=120).to_pandas()
          .sort_values(["bucket", "event_type"]).reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT (epoch_us(ts) // 7200000000) * 7200000000 AS bucket,
               event_type, count(*) AS n, sum(value) AS sum_value
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1,2 ORDER BY 1,2
    """).df()
    assert len(tb) == len(want)
    assert (tb["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(tb["sum_value"], want["sum_value"])

    se = (sessionize(ds, gap_minutes=45).to_pandas()
          .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    wants = con.execute(f"""
        WITH o AS (SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 45 MINUTE
                  THEN 1 ELSE 0 END AS new_s
             FROM read_parquet('{SF}/events.parquet')
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM o)
        SELECT user_id, session_id, count(*) AS n_events, sum(value) AS sum_value
        FROM s GROUP BY 1,2 ORDER BY 1,2
    """).df()
    assert len(se) == len(wants)
    assert (se["n_events"].to_numpy() == wants["n_events"].to_numpy()).all()
    assert np.allclose(se["sum_value"], wants["sum_value"])


def test_ivf_topk_exact_when_probing_all(ray_session):
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    q = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")["embedding"]
                   .to_pylist()[0], dtype=np.float32)
    exact = ann.cosine_topk(emb, q, k=10)
    full = ann.ivf_topk(emb, q, k=10, n_cells=8, n_probe=8)
    assert list(full["vec_id"]) == list(exact["vec_id"])
    # pruned probe: returns k rows, recall over the true top-10 reasonable
    approx = ann.ivf_topk(emb, q, k=10, n_cells=8, n_probe=2)
    assert len(approx) == 10
    # synthetic embeddings have no planted cluster structure, so partial
    # probing recall is moderate; the check pins determinism + sanity
    assert len(set(approx["vec_id"]) & set(exact["vec_id"])) >= 3
    # the query's own vector (cosine 1.0) is always in its probed cell
    assert approx["vec_id"].iloc[0] == exact["vec_id"].iloc[0]


def test_as_matrix_layouts():
    """Zero-copy decode agrees across list layouts and rejects ragged."""
    import pyarrow as pa

    from iresearch_ray.pipelines.ann import _as_matrix

    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    var = pa.array(rows, type=pa.list_(pa.float32()))
    fixed = pa.array(rows, type=pa.list_(pa.float32(), 2))
    expect = np.asarray(rows, dtype=np.float32)
    assert np.array_equal(_as_matrix(var), expect)
    assert np.array_equal(_as_matrix(fixed), expect)
    # sliced arrays must honor the offset
    assert np.array_equal(_as_matrix(var.slice(1)), expect[1:])
    assert np.array_equal(_as_matrix(fixed.slice(1)), expect[1:])
    chunked = pa.chunked_array([var.slice(0, 1), var.slice(1)])
    assert np.array_equal(_as_matrix(chunked), expect)
    with pytest.raises(ValueError):
        _as_matrix(pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float32())))


def test_scattered_sample_not_head_biased(ray_session, tmp_path):
    """The IVF training sample must be scattered across the input, not the
    first rows (ds.limit on sorted/clustered input gives biased centroids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 2000
    pq.write_table(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [[float(i), 1.0] for i in range(n)],
    }), str(tmp_path / "e.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "e.parquet"))
    s1 = ann.scattered_sample(ds, 128, "vec_id", ["vec_id", "embedding"])
    s2 = ann.scattered_sample(ds, 128, "vec_id", ["vec_id", "embedding"])
    ids = np.sort(s1["vec_id"].to_numpy())
    assert len(ids) == 128
    assert np.array_equal(ids, np.sort(s2["vec_id"].to_numpy()))  # deterministic
    # scattered: hits both halves of the id range, never just the head
    assert (ids < n // 2).any() and (ids >= n // 2).any()
    assert ids.max() > n * 3 // 4


def test_lsh_index_prunes_reads_and_matches_scan(ray_session, tmp_path):
    """The persisted LSH layout must (a) answer identically to the ad-hoc
    bucket scan (same candidate set) and (b) read ONLY probed partitions."""
    import os

    import pyarrow.parquet as pq

    emb_path = f"{SF}/embeddings.parquet"
    ds = ray.data.read_parquet(emb_path)
    q = np.asarray(pq.read_table(emb_path)["embedding"].to_pylist()[0],
                   dtype=np.float32)
    idx = str(tmp_path / "lsh_idx")
    meta = ann.build_lsh_index(ds, idx, planes=4)
    assert meta["dim"] == len(q)
    # resumable: identical config returns without rewriting
    mtime = os.path.getmtime(os.path.join(idx, "ann_meta.json"))
    assert ann.build_lsh_index(ds, idx, planes=4)["dim"] == meta["dim"]
    assert os.path.getmtime(os.path.join(idx, "ann_meta.json")) == mtime

    all_parts = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    paths = ann.plan_lsh_query(idx, q, multiprobe=1)
    read_parts = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert 0 < len(read_parts) < len(all_parts)  # strict read pruning
    assert all(d.startswith("bucket=") for d in read_parts)

    got = ann.lsh_index_topk(idx, q, k=10, multiprobe=1)
    want = ann.lsh_topk(ds, q, k=10, planes=4, multiprobe=1)
    assert list(got["vec_id"]) == list(want["vec_id"])
    assert np.allclose(got["cosine"], want["cosine"], atol=1e-6)


def test_ivf_index_prunes_reads_and_matches_scan(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    emb_path = f"{SF}/embeddings.parquet"
    ds = ray.data.read_parquet(emb_path)
    q = np.asarray(pq.read_table(emb_path)["embedding"].to_pylist()[0],
                   dtype=np.float32)
    idx = str(tmp_path / "ivf_idx")
    ann.build_ivf_index(ds, idx, n_cells=8, train_sample=256)
    all_parts = [d for d in os.listdir(idx) if d.startswith("cell=")]
    paths = ann.plan_ivf_query(idx, q, n_probe=2)
    read_parts = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert 0 < len(read_parts) < len(all_parts)

    got = ann.ivf_index_topk(idx, q, k=10, n_probe=2)
    want = ann.ivf_topk(ds, q, k=10, n_cells=8, n_probe=2, train_sample=256)
    assert list(got["vec_id"]) == list(want["vec_id"])
    # probing every cell must recover the exact brute-force answer
    exact = ann.cosine_topk(ds, q, k=10)
    full = ann.ivf_index_topk(idx, q, k=10, n_probe=8)
    assert list(full["vec_id"]) == list(exact["vec_id"])


def test_rolling_doc_fingerprints_matches_reference(docs, docs_pdf):
    """The distributed map_batches fingerprint pipeline must reproduce the
    single-process rolling-hash reference exactly."""
    from iresearch_ray.analysis.minhash import (
        rolling_fingerprints,
        stable_hash_strings,
    )

    out = dedup.rolling_doc_fingerprints(docs).to_pandas()
    out = out.sort_values(["doc_id", "fingerprint"]).reset_index(drop=True)

    ana = get_analyzer("ascii")
    toks, offs = [], np.zeros(len(docs_pdf) + 1, dtype=np.int64)
    for i, t in enumerate(docs_pdf["text"]):
        ws = ana.tokens(t)
        toks.extend(ws)
        offs[i + 1] = len(toks)
    th = stable_hash_strings(toks)
    d, f = rolling_fingerprints(th, offs)
    exp = pd.DataFrame({"doc_id": docs_pdf["doc_id"].to_numpy()[d],
                        "fingerprint": f.view(np.int64)})
    exp = exp.sort_values(["doc_id", "fingerprint"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)


def test_hopping_aggregate(ray_session):
    from iresearch_ray.pipelines.windows import hopping_aggregate

    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "event_type", "value"])
    out = hopping_aggregate(ds, window_minutes=60, hop_minutes=30).to_pandas()
    out = out.sort_values(["bucket", "event_type"]).reset_index(drop=True)
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ts = ev["ts"].astype("int64")
    hop = 30 * 60 * 1_000_000
    rows = []
    for j in (0, 1):  # every event is in 2 overlapping 60-min windows
        rows.append(pd.DataFrame({"bucket": (ts // hop - j) * hop,
                                  "event_type": ev["event_type"],
                                  "value": ev["value"]}))
    exp = (pd.concat(rows).groupby(["bucket", "event_type"], as_index=False)
           .agg(n=("value", "size"), sum_value=("value", "sum"))
           .sort_values(["bucket", "event_type"]).reset_index(drop=True))
    assert len(out) == len(exp)
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(out["sum_value"], exp["sum_value"])
    with pytest.raises(ValueError):
        hopping_aggregate(ds, window_minutes=60, hop_minutes=45)


def test_embedding_neardup_exact_and_lsh(ray_session):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    M = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    r, c = np.nonzero(np.triu(S >= 0.35, k=1))
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(r, c)}

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = dedup.embedding_neardup_pairs(ds, threshold=0.35,
                                        dtype=np.float64).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert got == want  # exact path is exact
    assert (out["cosine"] >= 0.35).all()

    # LSH-bucketed scale path: subset of the exact pairs, nonzero recall
    approx = dedup.embedding_neardup_pairs(ds, threshold=0.35,
                                           planes=4).to_pandas()
    got_a = set(zip(approx["id_a"].astype(int), approx["id_b"].astype(int)))
    assert got_a <= want
    assert len(got_a) > 0


def test_minhash_checkpoint_resume(ray_session, tmp_path):
    """Review finding: a reused checkpoint_dir must resume (skip the
    sketch pass), never append duplicate sketch rows that poison the
    bucket counts."""
    rows = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 3, "text": "other words entirely different here now"}]
    ckpt = str(tmp_path / "ckpt")
    ds = ray.data.from_items(rows)
    p1 = dedup.minhash_lsh_pairs(ds, threshold=0.9,
                                 checkpoint_dir=ckpt).to_pandas()
    p2 = dedup.minhash_lsh_pairs(ray.data.from_items(rows), threshold=0.9,
                                 checkpoint_dir=ckpt).to_pandas()
    pd.testing.assert_frame_equal(p1, p2)
    assert set(zip(p1["id_a"], p1["id_b"])) == {(1, 2)}


def test_ngram_jaccard_checkpoint_resume(ray_session, tmp_path):
    """A reused checkpoint_dir must resume the shingle-set sketch pass
    with identical pairs (same _sketch_checkpoint machinery as minhash,
    exercised through the Jaccard operator's params)."""
    rows = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 3, "text": "other words entirely different here now"}]
    ckpt = str(tmp_path / "ckpt")
    p1 = dedup.ngram_jaccard_pairs(ray.data.from_items(rows), threshold=0.8,
                                   checkpoint_dir=ckpt).to_pandas()
    assert (tmp_path / "ckpt" / "_sketch_done.json").exists()
    p2 = dedup.ngram_jaccard_pairs(ray.data.from_items(rows), threshold=0.8,
                                   checkpoint_dir=ckpt).to_pandas()
    pd.testing.assert_frame_equal(p1, p2)
    assert set(zip(p1["id_a"], p1["id_b"])) == {(1, 2)}
    assert (p1["jaccard"] == 1.0).all()


def test_sessionize_salted_equals_unsalted(ray_session):
    """The hot-key-safe (time-bucket salted + stitched) sessionization
    must be row-identical to the single-group path — including sessions
    that SPAN bucket boundaries."""
    from iresearch_ray.pipelines.windows import sessionize, sessionize_salted

    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])
    a = sessionize(ds, gap_minutes=30, salted=False).to_pandas()
    # 1-hour buckets guarantee many boundary-spanning sessions in testdata
    b = sessionize_salted(
        ray.data.read_parquet(f"{SF}/events.parquet",
                              columns=["event_id", "ts", "user_id", "value"]),
        gap_minutes=30, bucket_hours=1).to_pandas()
    key = ["user_id", "session_id"]
    a = a.sort_values(key).reset_index(drop=True)[a.columns.sort_values()]
    b = b.sort_values(key).reset_index(drop=True)[b.columns.sort_values()]
    pd.testing.assert_frame_equal(
        a.astype({"n_events": np.int64}), b.astype({"n_events": np.int64}))
    with pytest.raises(ValueError):
        sessionize_salted(ds, gap_minutes=120, bucket_hours=1)


def test_minhash_checkpoint_guards(ray_session, tmp_path):
    """Param-mismatched markers rebuild; foreign parquet dirs are refused
    (never deleted, never appended to)."""
    import os

    rows = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"}]
    ckpt = str(tmp_path / "ckpt")
    dedup.minhash_lsh_pairs(ray.data.from_items(rows), threshold=0.9,
                            checkpoint_dir=ckpt).to_pandas()
    # different params -> marker mismatch -> rebuilt, still correct
    p2 = dedup.minhash_lsh_pairs(ray.data.from_items(rows), threshold=0.9,
                                 num_hashes=32, checkpoint_dir=ckpt).to_pandas()
    assert set(zip(p2["id_a"], p2["id_b"])) == {(1, 2)}
    # a directory holding parquet we did not write is refused verbatim
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "data.parquet").write_bytes(b"not ours")
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(ray.data.from_items(rows), threshold=0.9,
                                checkpoint_dir=str(foreign))
    assert (foreign / "data.parquet").read_bytes() == b"not ours"


def test_embedding_lsh_checkpoint_no_pin(ray_session, tmp_path):
    """The LSH scale path must checkpoint the bucketed sketch to Parquet
    (never materialize() a corpus-sized object in the object store),
    resume from an unchanged checkpoint, and rebuild when the input
    changes (fingerprinted marker)."""
    import os

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    ckpt = str(tmp_path / "emb_ckpt")
    a = dedup.embedding_neardup_pairs(
        ds, threshold=0.35, planes=4, checkpoint_dir=ckpt).to_pandas()
    # the sketch went to Parquet — this is the no-object-store-pin proof
    assert os.path.exists(os.path.join(ckpt, "_sketch_done.json"))
    pq_files = sorted(f for f in os.listdir(ckpt) if f.endswith(".parquet"))
    assert pq_files
    mtimes = [os.path.getmtime(os.path.join(ckpt, f)) for f in pq_files]
    # unchanged corpus + params: resume — identical pairs, sketch NOT rewritten
    b = dedup.embedding_neardup_pairs(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"),
        threshold=0.35, planes=4, checkpoint_dir=ckpt).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert [os.path.getmtime(os.path.join(ckpt, f)) for f in pq_files] == mtimes
    # changed input (row-count fingerprint for in-memory data): rebuild,
    # never stale results from the old corpus
    rows = [{"vec_id": 1, "embedding": [1.0, 0.0]},
            {"vec_id": 2, "embedding": [1.0, 0.0]},
            {"vec_id": 3, "embedding": [0.0, 1.0]}]
    c = dedup.embedding_neardup_pairs(
        ray.data.from_items(rows), threshold=0.9, planes=2,
        checkpoint_dir=ckpt).to_pandas()
    assert set(zip(c["id_a"], c["id_b"])) == {(1, 2)}


def test_ann_index_rebuilds_on_input_change(ray_session, tmp_path):
    """ADVICE fix: build_lsh_index resume compares an input fingerprint,
    so a changed corpus in the same index_dir rebuilds instead of serving
    stale partitions."""
    rows1 = [{"vec_id": i, "embedding": [1.0, 0.0]} for i in range(4)]
    d = str(tmp_path / "lsh_idx")
    ann.build_lsh_index(ray.data.from_items(rows1), d, planes=2)
    top1 = ann.lsh_index_topk(d, np.array([1.0, 0.0]), k=8, multiprobe=2)
    assert set(top1["vec_id"]) == {0, 1, 2, 3}
    # same dir, GROWN corpus: must rebuild and serve the new rows
    rows2 = rows1 + [{"vec_id": 9, "embedding": [1.0, 0.0]}]
    ann.build_lsh_index(ray.data.from_items(rows2), d, planes=2)
    top2 = ann.lsh_index_topk(d, np.array([1.0, 0.0]), k=8, multiprobe=2)
    assert 9 in set(top2["vec_id"])


def test_embedding_exact_streams_blocks(ray_session):
    """Exact path: multi-block input must produce each qualifying pair
    exactly once (block-tiled matmuls, no driver-side corpus concat)."""
    rows = ([{"vec_id": i, "embedding": [1.0, 0.0, 0.0]} for i in range(6)]
            + [{"vec_id": 10 + i, "embedding": [0.0, 1.0, 0.0]}
               for i in range(6)])
    ds = ray.data.from_items(rows).repartition(5)
    out = dedup.embedding_neardup_pairs(ds, threshold=0.9).to_pandas()
    want = ({(a, b) for a in range(6) for b in range(a + 1, 6)}
            | {(10 + a, 10 + b) for a in range(6) for b in range(a + 1, 6)})
    assert set(zip(out["id_a"], out["id_b"])) == want
    # exactly once each (duplicate pairs would break downstream union-find
    # counters)
    assert len(out) == len(want)


def test_multimodal_resize_and_frames(ray_session):
    """resize_images keeps output size exactly proportional to the target
    box; sample_frames fans one input row out to its sampled chunks with
    passthrough columns replicated."""
    import pyarrow as pa
    import ray.data

    from iresearch_ray.pipelines.multimodal import (
        FrameSampleBatch,
        ResizeBatch,
        resize_images,
        sample_frames,
    )

    rows = [{"vid": "a", "blob": bytes(range(256)) * 3},    # 768 B
            {"vid": "b", "blob": b"xy"},
            {"vid": "c", "blob": b""}]
    ds = ray.data.from_arrow(pa.table({
        "vid": pa.array([r["vid"] for r in rows]),
        "blob": pa.array([r["blob"] for r in rows], pa.binary())}))
    rz = resize_images(ds, payload_column="blob", target_w=8,
                       target_h=4).to_pandas().sort_values("vid")
    assert [len(x) for x in rz["resized"]] == [32, 32, 32]
    assert (rz["width"] == 8).all() and (rz["height"] == 4).all()

    ds = ray.data.from_arrow(pa.table({
        "vid": pa.array([r["vid"] for r in rows]),
        "blob": pa.array([r["blob"] for r in rows], pa.binary())}))
    fr = (sample_frames(ds, payload_column="blob", frame_bytes=256,
                        every_n=2, max_frames=8).to_pandas()
          .sort_values(["vid", "frame_idx"]))
    # a: 3 chunks -> picks 0,2 ; b: 1 chunk -> pick 0 ; c: empty -> none
    assert list(zip(fr["vid"], fr["frame_idx"])) == [("a", 0), ("a", 1),
                                                     ("b", 0)]
    assert [len(x) for x in fr["frame"]] == [256, 256, 2]

    with pytest.raises(NotImplementedError):
        ResizeBatch(fake=None)._resize_stub(b"z")
    with pytest.raises(NotImplementedError):
        FrameSampleBatch(fake=None)._frames_stub(b"z")


def test_sessionize_default_is_salted_and_hotkey_safe(ray_session):
    """VERDICT r3 item 5: the DEFAULT sessionize path must survive one
    pathological hot user (most events on a single key) — and stay
    row-identical to the plain single-group construction."""
    from iresearch_ray.pipelines.windows import sessionize

    rng = np.random.default_rng(7)
    # hot user 0 owns 2000 events spread over days; 10 cold users get 5
    ts_hot = np.sort(rng.integers(0, 5 * 24 * 3600, size=2000)) * 1_000_000
    rows = [{"event_id": i, "user_id": 0, "ts": int(t), "value": 1.0}
            for i, t in enumerate(ts_hot)]
    k = len(rows)
    for u in range(1, 11):
        for j in range(5):
            rows.append({"event_id": k, "user_id": u,
                         "ts": int((u * 9000 + j * 60) * 1_000_000),
                         "value": 0.5})
            k += 1
    ds = ray.data.from_items(rows).repartition(8)
    a = (sessionize(ds, gap_minutes=30).to_pandas()
         .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    b = (sessionize(ray.data.from_items(rows), gap_minutes=30, salted=False)
         .to_pandas()
         .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].astype({"n_events": np.int64}),
        b[cols].astype({"n_events": np.int64}))
    assert a[a["user_id"] == 0]["n_events"].sum() == 2000


def test_embedding_lsh_degenerate_bucket_distributed(ray_session):
    """VERDICT r3 item 3: one adversarial hot bucket (every vector
    identical -> one LSH bucket holds the whole corpus) must not drive a
    corpus-sized driver concat: widths above max_bucket route through the
    tiled exact path, same-bucket masked.  Pairs must be exact, unique,
    and identical to the uncapped run."""
    n = 40
    rows = [{"vec_id": i, "embedding": [1.0, 0.0, 0.0]} for i in range(n)]
    # one outlier in its own bucket direction
    rows.append({"vec_id": 99, "embedding": [-1.0, 0.0, 0.0]})
    ds = ray.data.from_items(rows).repartition(6)
    out = dedup.embedding_neardup_pairs(
        ds, threshold=0.9, planes=3, max_bucket=8).to_pandas()
    want = {(a, b) for a in range(n) for b in range(a + 1, n)}
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == want
    assert len(out) == len(want)  # each pair exactly once
    # and the normal (uncapped) path agrees
    out2 = dedup.embedding_neardup_pairs(
        ray.data.from_items(rows).repartition(6),
        threshold=0.9, planes=3, max_bucket=4096).to_pandas()
    assert set(zip(out2["id_a"], out2["id_b"])) == want
    assert len(out2) == len(want)


def test_grouped_count_min_boundary_repair(ray_session):
    """Sort+combine must stay exact when equal-key runs straddle block
    boundaries.  Ray's current partitioner is a pure key function and
    never splits a run, so adversarial splits are injected through the
    ``_presorted`` seam: hand-built sorted blocks where a hot run spans
    three blocks, tiny runs sit exactly on boundaries, and whole blocks
    are a single key."""
    import pyarrow as pa

    splits = [
        # hot key 5 spans blocks 1-3 (incl. one block that is ONLY 5s)
        [(1, 10), (2, 11), (5, 30)],
        [(5, 12), (5, 13)],
        [(5, 14), (7, 15), (8, 16)],
        # key 8 straddles the next boundary too; 9 is interior
        [(8, 17), (9, 18), (9, 3), (10, 19)],
        # single-run block, same key continues once more
        [(10, 2)],
        [(10, 40), (11, 41)],
    ]
    blocks = [pa.table({"k": pa.array([k for k, _ in rows], pa.int64()),
                        "i": pa.array([i for _, i in rows], pa.int64())})
              for rows in splits]
    ds = ray.data.from_arrow(blocks)
    flat = [r for rows in splits for r in rows]
    exp = (pd.DataFrame(flat, columns=["k", "i"]).groupby("k")
           .agg(n=("i", "size"), m=("i", "min")).reset_index())
    for min_count in (None, 2, 3):
        got = dedup._grouped_count_min(
            ds, "k", "i", count_alias="n", keep_alias="m",
            min_count=min_count, _presorted=True).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        want = exp if min_count is None else \
            exp[exp["n"] >= min_count].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the optional sum aggregate rides the same boundary repair
    exp_sum = (pd.DataFrame(flat, columns=["k", "i"]).groupby("k")
               .agg(n=("i", "size"), s=("i", "sum")).reset_index())
    got = dedup._grouped_count_min(
        ds, "k", None, count_alias="n", sum_column="i", sum_alias="s",
        _presorted=True).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp_sum, check_dtype=False)


def test_grouped_rank_drop_ids_boundary_repair(ray_session):
    """Per-group rank must stay exact when a hot key straddles blocks:
    the edge-piece offset repair orders a straddling key's pieces by
    their min id and adds each piece's cumulative prior count back."""
    import pyarrow as pa

    rows = [("a", 0), ("a", 1),
            # hot key spans 3 blocks, incl. one all-h block
            ("h", 2), ("h", 3), ("h", 4), ("h", 5), ("h", 6), ("h", 7),
            ("h", 8), ("h", 9), ("h", 10), ("h", 11), ("h", 12),
            ("h", 13), ("h", 14),
            ("z", 15), ("z", 16), ("z", 17)]
    splits = [rows[0:5], rows[5:9], rows[9:14], rows[14:18]]
    blocks = [pa.table({"k": pa.array([k for k, _ in rs], pa.string()),
                        "i": pa.array([i for _, i in rs], pa.int64())})
              for rs in splits]
    ds = ray.data.from_arrow(blocks)
    got = dedup.grouped_rank_drop_ids(
        ds, "k", "i", cap=4, _presorted=True).to_pandas()
    # h has 13 rows with ids 2..14: keep the 4 smallest, drop 6..14
    assert sorted(got["i"]) == list(range(6, 15))
    # and the real sort path on a shuffled skewed input agrees with pandas
    rng = np.random.default_rng(11)
    k = np.where(rng.random(4000) < 0.6, "hot",
                 rng.integers(0, 40, 4000).astype(str))
    df = pd.DataFrame({"k": k, "i": rng.permutation(4000)})
    want = df[df.groupby("k")["i"].rank(method="first") > 3]["i"]
    got2 = dedup.grouped_rank_drop_ids(
        ray.data.from_pandas(df).repartition(9), "k", "i", cap=3
    ).to_pandas()
    assert sorted(got2["i"]) == sorted(want)


def test_domain_operators(ray_session):
    from iresearch_ray.pipelines import curate

    urls = ["https://WWW.Example.com:443/a", "http://example.com/b",
            "https://sub.example.com/c", None, "no-scheme",
            "http://www.Hot.io:8080/x"] + \
           [f"http://hot.io/p{i}" for i in range(20)]
    df = pd.DataFrame({"doc_id": range(len(urls)), "url": urls,
                       "text": ["alpha beta gamma"] * len(urls)})
    ds = ray.data.from_pandas(df)
    out = curate.extract_domain(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "domain"] == "example.com"      # www + port stripped
    assert out.loc[2, "domain"] == "sub.example.com"  # subdomain kept
    assert out.loc[3, "domain"] == ""                 # null url
    assert out.loc[4, "domain"] == ""                 # no scheme
    assert out.loc[5, "domain"] == "hot.io"           # non-default port too
    st = curate.domain_stats(ds).to_pandas().set_index("domain")
    assert int(st.loc["hot.io", "n_docs"]) == 21
    assert int(st.loc["hot.io", "total_tokens"]) == 63
    assert int(st.loc["example.com", "n_docs"]) == 2
    capped = curate.cap_per_domain(ds, cap=3).to_pandas()
    # smallest 3 ids of hot.io are 5, 6, 7; full schema survives
    assert sorted(capped["doc_id"]) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert list(capped.columns) == ["doc_id", "url", "text"]
    with pytest.raises(ValueError):
        curate.cap_per_domain(ds, cap=1, max_broadcast=2).to_pandas()


def test_grouped_count_min_nul_keys(ray_session):
    """pandas groupby hashes object strings like C strings and collapses
    keys that differ only past an embedded NUL — exactly the packed-pair
    key idiom (``domain_links``).  The driver merge is numpy-based; pin
    it with NUL keys whose runs straddle block boundaries so every
    boundary partial routes through it."""
    import pyarrow as pa

    splits = [["a\x00b", "a\x00b", "a\x00c"],
              ["a\x00c", "a\x00c"],
              ["a\x00d", "x"]]
    blocks = [pa.table({"k": pa.array(rs, pa.string())}) for rs in splits]
    got = dedup._grouped_count_min(
        ray.data.from_arrow(blocks), "k", None, count_alias="n",
        _presorted=True).to_pandas()
    assert {r.k: r.n for r in got.itertuples()} == {
        "a\x00b": 2, "a\x00c": 3, "a\x00d": 1, "x": 1}
    # and through the real sort path
    rows = ray.data.from_items(
        [{"k": k} for k in ["a\x00b", "a\x00c", "a\x00b", "x",
                            "x", "a\x00c", "a\x00b"]]).repartition(4)
    got2 = dedup._grouped_count_min(
        rows, "k", None, count_alias="n").to_pandas()
    assert {r.k: r.n for r in got2.itertuples()} == {
        "a\x00b": 3, "a\x00c": 2, "x": 2}


def test_grouped_rank_drop_ids_nul_keys(ray_session):
    """Same NUL hazard in the rank repair's offset merge: two NUL-keyed
    groups each straddling a block boundary must not share offsets."""
    import pyarrow as pa

    rows = [("p\x00q", 0), ("p\x00q", 1), ("p\x00q", 2),
            ("p\x00r", 3), ("p\x00r", 4), ("p\x00r", 5), ("p\x00r", 6)]
    splits = [rows[0:2], rows[2:5], rows[5:7]]
    blocks = [pa.table({"k": pa.array([k for k, _ in rs], pa.string()),
                        "i": pa.array([i for _, i in rs], pa.int64())})
              for rs in splits]
    got = dedup.grouped_rank_drop_ids(
        ray.data.from_arrow(blocks), "k", "i", cap=2,
        _presorted=True).to_pandas()
    # p\x00q (ids 0,1,2) drops 2; p\x00r (ids 3..6) drops 5,6
    assert sorted(got["i"]) == [2, 5, 6]


def test_extract_links_and_domain_links(ray_session):
    from iresearch_ray.pipelines import curate

    docs = [
        {"url": "http://src1.com/a",
         "html": '<a href="http://dst1.org/x">1</a> '
                 '<a href="http://dst2.org/y">2</a>'},
        {"url": "http://src1.com/b",
         "html": '<link href="http://dst1.org/z"> '
                 'text href="http://dst1.org/w"'},
        {"url": "http://src2.com/a",
         "html": '<a href="/relative">r</a> '
                 '<a href="http://dst2.org/q">q</a>'},
        {"url": "http://src3.com/a", "html": "no links here"},
        {"url": "http://src4.com/a", "html": None},
    ]
    ds = ray.data.from_items(docs)
    links = curate.extract_links(ds).to_pandas()
    # one row per href occurrence, in page order
    per_page = links.groupby("url")["href"].apply(list).to_dict()
    assert per_page == {
        "http://src1.com/a": ["http://dst1.org/x", "http://dst2.org/y"],
        "http://src1.com/b": ["http://dst1.org/z", "http://dst1.org/w"],
        "http://src2.com/a": ["/relative", "http://dst2.org/q"]}
    dl = curate.domain_links(ds).to_pandas()
    edges = {(r.src_domain, r.dst_domain): r.n for r in dl.itertuples()}
    # relative href has no host -> dropped; counts aggregate per pair
    assert edges == {("src1.com", "dst1.org"): 3,
                     ("src1.com", "dst2.org"): 1,
                     ("src2.com", "dst2.org"): 1}


def test_extract_anchors_split_scan(ray_session):
    """(href, anchor) pairs under the documented split-scan spec: the
    anchor body is cleaned with the extract_text chain; a fragment
    without its own '</a>' (interrupted by a nested '<a ') emits
    nothing; non-anchor href carriers (<link>) never match."""
    from iresearch_ray.pipelines import curate

    docs = [
        {"url": "u0",
         "html": '<a href="http://x.org/1">First <b>Link</b> &amp; '
                 'more</a> <a class="c" href="http://x.org/2">second</a>'},
        {"url": "u1",
         "html": '<link href="http://not-anchor.org"> '
                 '<a href="/rel">rel ok</a>'},
        {"url": "u2",
         "html": '<a href="http://a.org">outer '
                 '<a href="http://b.org">inner</a>'},
        {"url": "u3", "html": "no anchors"},
        {"url": "u4", "html": None},
    ]
    out = (curate.extract_anchors(ray.data.from_items(docs))
           .to_pandas().sort_values(["url", "href"]))
    got = list(map(tuple, out.to_numpy()))
    assert got == [
        ("u0", "http://x.org/1", "First Link & more"),
        ("u0", "http://x.org/2", "second"),
        ("u1", "/rel", "rel ok"),
        ("u2", "http://b.org", "inner")]


def test_extract_text_matches_duckdb_chain(ray_session):
    """HTML->text must be byte-exact against the SQL twin's RE2 chain;
    also pins single-decode of double-encoded entities (&amp;amp; ->
    &amp;, never &)."""
    import duckdb

    from iresearch_ray.pipelines import curate

    docs = [
        {"i": 0, "html":
         "<html><head><SCRIPT src='x'>var a=1;\n</script><style>.a{}"
         "</style></head><body><h1>Title</h1><p>Hello &amp;amp; "
         "<b>world</b>&nbsp;&#39;q&#39;</p><!-- note\nmore -->"
         "</body></html>"},
        {"i": 1, "html": "plain text no tags"},
        {"i": 2, "html": None},
        {"i": 3, "html": "  spaces\t\tand\nnewlines  "},
    ]
    out = (curate.extract_text(ray.data.from_items(docs))
           .to_pandas().sort_values("i"))
    assert out["text_extracted"].tolist() == [
        "Title Hello &amp; world 'q'", "plain text no tags", "",
        "spaces and newlines"]
    q = lambda s: s.replace("'", "''")
    expr = "coalesce(html,'')"
    for pat, _ in curate.TEXT_STRIP_STEPS:
        expr = f"regexp_replace({expr}, '{q(pat)}', ' ', 'g')"
    for ent, ch in curate.HTML_ENTITIES:
        expr = f"replace({expr}, '{q(ent)}', '{q(ch)}')"
    expr = f"regexp_replace({expr}, '[ \\t\\r\\n]+', ' ', 'g')"
    expr = f"regexp_replace({expr}, '^ | $', '', 'g')"
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs))
    sql = con.execute(
        f"SELECT {expr} AS t FROM d ORDER BY i").df()["t"]
    assert out["text_extracted"].tolist() == sql.tolist()


def test_pagerank_fixed_point_exact(ray_session):
    """Engine PageRank must bit-match an independent per-edge float
    reference (same IEEE expression, different code path), conserve
    mass, handle dangling nodes, and guard the node broadcast."""
    from iresearch_ray.pipelines import graph

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1),
             ("c", "a", 1), ("d", "a", 3), ("d", "e", 1)]
    ed = ray.data.from_items(
        [{"src_domain": s, "dst_domain": t, "n": n} for s, t, n in edges])
    pr = (graph.pagerank(ed, iterations=10).to_pandas()
          .sort_values("node").reset_index(drop=True))
    nodes = sorted({x for e in edges for x in e[:2]})
    N, idx = len(nodes), {v: i for i, v in enumerate(nodes)}
    W = {}
    for s, _, n in edges:
        W[s] = W.get(s, 0) + n
    r = np.full(N, np.floor(1e12 / N + 0.5))
    base = np.floor(((1.0 - 0.85) * 1e12) / N + 0.5)
    for _ in range(10):
        nxt = np.full(N, base)
        dang = sum(r[idx[v]] for v in nodes if v not in W)
        nxt += np.floor((0.85 * dang) / N + 0.5)
        for s, t, n in edges:
            nxt[idx[t]] += np.floor(((0.85 * r[idx[s]]) * n) / W[s] + 0.5)
        r = nxt
    assert pr["node"].tolist() == nodes
    assert (pr["rank_units"].to_numpy() == r.astype(np.int64)).all()
    # fixed-point mass is conserved to within rounding (±1 unit/node/iter)
    assert abs(int(pr["rank_units"].sum()) - 10 ** 12) <= 10 * N
    # rank is the single exact division
    assert (pr["rank"].to_numpy()
            == pr["rank_units"].to_numpy() / 1e12).all()
    # empty edge list -> empty result, no division by zero
    empty = graph.pagerank(ray.data.from_items(
        [{"src_domain": "x", "dst_domain": "y", "n": 1}]).filter(
        lambda row: False)).to_pandas()
    assert len(empty) == 0
    # above the broadcast guard the PARTITIONED path runs instead of
    # raising (round-5: the ~4M-node ceiling is gone) — and it must be
    # bit-identical to the broadcast path
    part = (graph.pagerank(ed, iterations=10, max_broadcast=10)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert part["node"].tolist() == pr["node"].tolist()
    assert (part["rank_units"].to_numpy()
            == pr["rank_units"].to_numpy()).all()
    assert (part["rank"].to_numpy() == pr["rank"].to_numpy()).all()
    # a zero out-weight sum would divide by zero in contrib() and cast
    # inf to garbage int64 units — it must fail loudly instead
    zed = ray.data.from_items(
        [{"src_domain": "a", "dst_domain": "b", "n": 0},
         {"src_domain": "b", "dst_domain": "a", "n": 1}])
    with pytest.raises(ValueError, match="non-positive out-weight"):
        graph.pagerank(zed).to_pandas()
    with pytest.raises(ValueError, match="non-positive out-weight"):
        graph.pagerank(zed, partitions=2).to_pandas()


def test_pagerank_partitioned_random_equality(ray_session):
    """The partitioned path (rank vector as P object-store refs, edges
    co-range-sorted) must be bit-identical to the broadcast path on a
    random weighted digraph with dangling nodes, hubs, and self-loops —
    for several partition counts including P=1 and P > node count."""
    from iresearch_ray.pipelines import graph

    rng = np.random.default_rng(11)
    names = np.array([f"h{i:03d}.x" for i in range(80)])
    src = names[rng.integers(0, 60, 700)]        # 20 pure-dangling nodes
    dst = names[rng.integers(0, 80, 700)]
    df = (pd.DataFrame({"src_domain": src, "dst_domain": dst,
                        "n": rng.integers(1, 7, 700)})
          .groupby(["src_domain", "dst_domain"], as_index=False)["n"].sum())
    ed = ray.data.from_pandas(df).repartition(5)
    ref = (graph.pagerank(ed, iterations=6).to_pandas()
           .sort_values("node").reset_index(drop=True))
    for p in (1, 3, 200):
        got = (graph.pagerank(ed, iterations=6, partitions=p)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert got["node"].tolist() == ref["node"].tolist(), p
        assert (got["rank_units"].to_numpy()
                == ref["rank_units"].to_numpy()).all(), p


def test_filter_by_domain_rank_hashed_path(ray_session):
    """Past max_broadcast the kept set becomes hash-partitioned numeric
    blocks (round 5): results must equal the broadcast string path
    exactly, including extractionless rows and sub-block partitioning."""
    from iresearch_ray.pipelines import graph

    rng = np.random.default_rng(17)
    hosts = [f"h{i:03d}.org" for i in range(60)]
    edges = (pd.DataFrame({
        "src_domain": rng.choice(hosts[:50], 500),
        "dst_domain": rng.choice(hosts, 500),
        "n": rng.integers(1, 5, 500)})
        .groupby(["src_domain", "dst_domain"], as_index=False)["n"].sum())
    ranks = graph.pagerank(
        ray.data.from_pandas(edges), iterations=4).materialize()
    med = int(ranks.to_pandas()["rank_units"].median())
    docs = [{"doc_id": i, "url": f"http://{hosts[i % 60]}/p{i}"}
            for i in range(300)]
    docs += [{"doc_id": 300, "url": "not a url"},
             {"doc_id": 301, "url": "http://unknown.net/x"}]
    ds = ray.data.from_items(docs).repartition(4)
    a = (graph.filter_by_domain_rank(ds, ranks, med)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (graph.filter_by_domain_rank(ds, ranks, med, max_broadcast=1)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
    assert 300 not in b["doc_id"].tolist()
    assert 301 not in b["doc_id"].tolist()


def test_filter_by_domain_rank(ray_session):
    """Rank-aware curation keeps exactly the docs whose host clears the
    int64 fixed-point threshold; unknown/extractionless hosts drop."""
    from iresearch_ray.pipelines import graph

    edges = [("a.com", "b.org", 5), ("c.net", "b.org", 5),
             ("b.org", "a.com", 1)]
    ranks = graph.pagerank(ray.data.from_items(
        [{"src_domain": s, "dst_domain": t, "n": n}
         for s, t, n in edges]), iterations=5)
    rp = ranks.to_pandas().set_index("node")
    # b.org receives two strong in-links -> ranks above the others
    thr = int(rp.loc["b.org", "rank_units"])
    docs = [{"doc_id": 0, "url": "http://b.org/x"},
            {"doc_id": 1, "url": "http://a.com/y"},
            {"doc_id": 2, "url": "http://unknown.io/z"},
            {"doc_id": 3, "url": "no-scheme"}]
    out = graph.filter_by_domain_rank(
        ray.data.from_items(docs), ranks, min_rank_units=thr).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert list(out.columns) == ["doc_id", "url"]
    # low threshold keeps every ranked domain, still drops unknowns
    out2 = graph.filter_by_domain_rank(
        ray.data.from_items(docs), ranks, min_rank_units=0).to_pandas()
    assert sorted(out2["doc_id"]) == [0, 1]
    # past the broadcast guard the hashed membership path runs instead
    # of raising (round 5) and must agree with the broadcast path
    out3 = graph.filter_by_domain_rank(ray.data.from_items(docs), ranks,
                                       min_rank_units=0,
                                       max_broadcast=4).to_pandas()
    assert sorted(out3["doc_id"]) == sorted(out2["doc_id"])


def test_grouped_count_min_result_is_reconsumable(ray_session):
    """Consuming the lazy result twice (count then to_pandas) must not
    change it: the sorted input is materialized, so a second execution
    cannot re-sample sort boundaries (the failure mode that false-tripped
    the retired round-3 range-guard actor on a 5M-edge probe)."""
    rng = np.random.default_rng(3)
    k = rng.integers(0, 50, 5000)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": k, "i": np.arange(5000)})).repartition(8)
    out = dedup._grouped_count_min(ds, "k", "i", count_alias="n",
                                   keep_alias="m")
    n1 = out.count()
    df = out.to_pandas()
    assert n1 == len(df) == 50
    assert int(df["n"].sum()) == 5000


def _brute_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((x, find(x)) for x in parent)


def test_dedup_clusters_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    cases = [
        [(1, 2)],
        [(i, i + 1) for i in range(1, 64)],       # worst-case chain
        [(10, 1), (10, 2), (10, 3)],              # star
        # mega-hub: a converged duplicate cluster IS a hot node whose
        # symmetrized adjacency dominates every sort block — the shape
        # that exercises the boundary-repair path on first/last runs
        [(0, v) for v in range(1, 3000)] + [(9000, 9001)],
        [(1, 2), (3, 4), (5, 6), (2, 3)],         # merge across pairs
        list(zip(rng.integers(0, 300, 500).tolist(),
                 rng.integers(0, 300, 500).tolist())),
        list(zip(rng.integers(0, 4000, 1500).tolist(),
                 rng.integers(0, 4000, 1500).tolist())),
    ]
    for i, pairs in enumerate(cases):
        pairs = [(a, b) for a, b in pairs if a != b]
        ds = ray.data.from_pandas(pd.DataFrame(
            {"id_a": [a for a, _ in pairs], "id_b": [b for _, b in pairs]}))
        # alternate paths: driver union-find and the distributed
        # two-phase star contraction must be row-identical
        out = dedup.dedup_clusters(
            ds, driver_max=0 if i % 2 else 2_000_000
        ).to_pandas().sort_values("doc_id")
        got = list(zip(out["doc_id"].tolist(), out["cluster_id"].tolist()))
        assert got == _brute_components(pairs)


def test_dedup_clusters_string_ids_and_empty(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"id_a": ["b", "c", "x"], "id_b": ["a", "b", "y"]}))
    for dm in (0, 2_000_000):  # both paths handle string ids
        out = (dedup.dedup_clusters(ds, driver_max=dm).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out.to_dict("list") == {
            "doc_id": ["a", "b", "c", "x", "y"],
            "cluster_id": ["a", "a", "a", "x", "x"]}
    empty = ray.data.from_pandas(pd.DataFrame(
        {"id_a": pd.Series([], dtype=np.int64),
         "id_b": pd.Series([], dtype=np.int64)}))
    res = dedup.dedup_clusters(empty)
    assert res.count() == 0
    assert set(res.schema().names) == {"doc_id", "cluster_id"}


def test_dedup_clusters_over_minhash_pairs(ray_session):
    # identical texts at ids 1/5/9 + 2/7 -> clusters {1,5,9} and {2,7}
    texts = {i: f"unique words for document number {i} " + "filler " * 10
             for i in range(12)}
    for i in (5, 9):
        texts[i] = texts[1]
    texts[7] = texts[2]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.9)
    out = (dedup.dedup_clusters(pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.to_dict("list") == {
        "doc_id": [1, 2, 5, 7, 9], "cluster_id": [1, 2, 1, 2, 1]}


def test_column_quantiles_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    con = duckdb.connect()
    for _ in range(6):
        vals = rng.integers(0, 60, size=int(rng.integers(1, 500))).astype(np.int64)
        vds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
        qs = sorted(set([0.0, 1.0] + rng.random(4).round(3).tolist()))
        out = textstats.column_quantiles(vds, "v", qs=qs)
        for q, got in zip(out["q"], out["value"]):
            exp = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM (SELECT unnest($1) AS v)",
                [vals.tolist()]).fetchone()[0]
            assert got == exp, (q, got, exp, len(vals))
    with pytest.raises(ValueError):
        textstats.column_quantiles(
            ray.data.from_pandas(pd.DataFrame({"v": [1]})), "v", qs=(1.5,))


def test_quality_filter_rules(ray_session):
    texts = {
        1: "the quick brown foxes jumped over the lazy dogs and " * 8,  # keep
        2: "short doc",                              # fails min_tokens
        3: "ab " * 80,                               # fails mean_token_len < 3
        4: "zebra yonder xylem wombat vortex " * 16,  # fails stopword ratio
    }
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = (textstats.quality_filter(
        ds, min_tokens=50, min_stopword_ratio=0.01, min_unique_ratio=0.0)
        .to_pandas().set_index("doc_id").sort_index())
    assert bool(out.loc[1, "keep"])
    assert out.loc[1, "fail_mask"] == 0
    assert out.loc[2, "fail_mask"] & 1          # token count
    assert out.loc[3, "fail_mask"] & 2          # mean token length
    assert out.loc[4, "fail_mask"] & 4          # stopword ratio
    assert not out.loc[2, "keep"] and not out.loc[4, "keep"]
    # unique-ratio rule: a doc of one repeated token fails at 0.5
    strict = (textstats.quality_filter(
        ds, min_tokens=1, min_unique_ratio=0.5)
        .to_pandas().set_index("doc_id"))
    assert strict.loc[3, "fail_mask"] & 8


def test_redact_pii_patterns_and_counts(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["mail bob.smith+x@foo-bar.co.uk or 10.0.0.7, "
                 "tel +1 (555) 123-4567 now",
                 None,
                 "no pii here 1.2.3 and plain 5551234567",
                 "a@b.io a@b.io 255.255.255.255"]}))
    out = (textstats.redact_pii(ds).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "text_redacted"] == \
        "mail <EMAIL> or <IP>, tel <PHONE> now"
    assert out.loc[2, "text_redacted"] == ""      # NULL -> ''
    # conservative phone pattern: bare digit runs survive
    assert out.loc[3, "text_redacted"] == \
        "no pii here 1.2.3 and plain 5551234567"
    assert out.loc[4, "text_redacted"] == "<EMAIL> <EMAIL> <IP>"
    assert out["n_email"].tolist() == [1, 0, 0, 2]
    assert out["n_ip"].tolist() == [1, 0, 0, 1]
    assert out["n_phone"].tolist() == [1, 0, 0, 0]


def test_dedup_corpus_keeps_cluster_minimum(ray_session):
    # three exact-duplicate families + unique docs; minhash at 0.9 with
    # identical texts is deterministic (est_jaccard = 1.0)
    rows = []
    for i in range(30):
        fam = i % 3
        if i < 9:  # docs 0..8: three families of three duplicates
            text = f"family {fam} " + " ".join(
                f"tok{fam}w{j}" for j in range(40))
        else:      # unique long docs
            text = " ".join(f"unique{i}x{j}" for j in range(40))
        rows.append({"doc_id": i, "text": text})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = dedup.dedup_corpus(ds, threshold=0.9).to_pandas()
    survivors = sorted(out["doc_id"].tolist())
    # each family keeps its minimum id (0, 1, 2); 3..8 drop
    assert survivors == [0, 1, 2] + list(range(9, 30))
    assert set(out.columns) == {"doc_id", "text"}  # full schema streams
    # pairs= override path: reuse precomputed edges
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.9)
    out2 = dedup.dedup_corpus(ds, pairs=pairs).to_pandas()
    assert sorted(out2["doc_id"].tolist()) == survivors


def test_hash_split_deterministic_and_proportional(ray_session):
    from iresearch_ray.pipelines import curate

    ds = ray.data.range(20000).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy")
    out = curate.hash_split(ds, ratios=(0.8, 0.1, 0.1)).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["valid"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # pure function of the id: a re-run and a differently-partitioned
    # run assign every doc identically
    out2 = curate.hash_split(ds.repartition(7),
                             ratios=(0.8, 0.1, 0.1)).to_pandas()
    m = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert m.sort_index().equals(m2.sort_index())
    with pytest.raises(ValueError):
        curate.hash_split(ds, ratios=(0.5, 0.1))  # doesn't sum to 1


def test_url_canonicalize_rules(ray_session):
    from iresearch_ray.pipelines import curate

    cases = {
        "HTTP://Example.COM:80/Path?x=1&utm_source=a&y=2#frag":
            "http://example.com/Path?x=1&y=2",
        "https://Host.org:443/": "https://host.org",
        "http://h.io/p?utm_a=1&utm_b=2": "http://h.io/p",
        "ftp://Mixed.Case/KeepPath": "ftp://mixed.case/KeepPath",
        "http://h.io:8080/x": "http://h.io:8080/x",  # non-default port
        "no-scheme/path": "no-scheme/path",
        # a param NAME merely containing 'utm_' is not a tracking param —
        # the interior strip is anchored at a [?&] boundary
        "http://h.io/p?xutm_source=1&y=2": "http://h.io/p?xutm_source=1&y=2",
        # consecutive interior utm params all go in one anchored pass
        "http://h.io/p?utm_a=1&utm_b=2&y=3": "http://h.io/p?y=3",
    }
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(cases)), "url": list(cases)}))
    out = curate.url_canonicalize(ds).to_pandas()
    got = dict(zip(out["url"], out["url_canonical"]))
    assert got == cases
    # canonical form is the URL-dedup key
    dup = ray.data.from_items(
        [{"doc_id": 1, "url": "HTTP://A.com:80/x"},
         {"doc_id": 2, "url": "http://a.COM/x"},
         {"doc_id": 3, "url": "http://b.com/x"}])
    groups = dedup.exact_dedup_groups(
        curate.url_canonicalize(dup), text_column="url_canonical"
    ).to_pandas()
    assert sorted(groups["dup_count"]) == [1, 2]


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(-8, 8), st.integers(0, 100)),
                min_size=1, max_size=120),
       st.lists(st.integers(1, 9), min_size=1, max_size=10),
       st.one_of(st.none(), st.integers(1, 3)))
def test_grouped_count_min_presorted_random_splits(ray_session, rows,
                                                   cuts, min_count):
    """Property: sort+combine with boundary repair equals pandas groupby
    for ANY blocking of the sorted rows — random cut points put runs on
    boundaries, split runs across many blocks, and make whole-block
    single-key pieces (the tiny key space guarantees collisions)."""
    import pyarrow as pa

    rows = sorted(rows, key=lambda r: r[0])
    bounds, pos = [], 0
    for c in cuts:
        pos += c
        if pos >= len(rows):
            break
        bounds.append(pos)
    pieces = np.split(np.arange(len(rows)), bounds)
    blocks = [pa.table({"k": pa.array([rows[i][0] for i in p], pa.int64()),
                        "i": pa.array([rows[i][1] for i in p], pa.int64())})
              for p in pieces if len(p)]
    got = dedup._grouped_count_min(
        ray.data.from_arrow(blocks), "k", "i", count_alias="n",
        keep_alias="m", min_count=min_count,
        _presorted=True).to_pandas()
    if len(got):
        got = got.sort_values("k").reset_index(drop=True)
    exp = (pd.DataFrame(rows, columns=["k", "i"]).groupby("k")
           .agg(n=("i", "size"), m=("i", "min")).reset_index())
    if min_count is not None:
        exp = exp[exp["n"] >= min_count].reset_index(drop=True)
    if not len(exp):
        assert not len(got)
    else:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_markup_twins_differential_fuzz(ray_session):
    """The three markup operators must agree with their DuckDB twins on
    RANDOM markup soup — not just the contract's synthetic fixture:
    random tag fragments, quotes, entities, NULs, newlines, nesting."""
    import duckdb

    from iresearch_ray.pipelines import curate

    rng = np.random.default_rng(29)
    pieces = ["<a href=\"", "\">", "</a>", "<A HREF=\"", "<a>", "href=\"",
              "\"", "<link href=\"", "<script>", "</script>", "<style>",
              "</style>", "<!--", "-->", "<b>", "</b>", "<p ", ">",
              "http://h", ".org/", "/rel", "&amp;", "&nbsp;", "&#39;",
              "&lt;", "txt ", "x\x00y", "\n", "\t", " ", "q", "7", "<",
              '"', "'"]
    docs = []
    for i in range(300):
        n = rng.integers(0, 25)
        docs.append({"i": i, "url": f"http://s{i % 9}.io/p{i}",
                     "html": "".join(rng.choice(pieces, n))})
    pdf = pd.DataFrame(docs)
    ds = ray.data.from_pandas(pdf).repartition(7)
    con = duckdb.connect()
    con.register("d", pdf)
    q = lambda s: s.replace("'", "''")

    # extract_text
    expr = "coalesce(html,'')"
    for pat, _ in curate.TEXT_STRIP_STEPS:
        expr = f"regexp_replace({expr}, '{q(pat)}', ' ', 'g')"
    for ent, ch in curate.HTML_ENTITIES:
        expr = f"replace({expr}, '{q(ent)}', '{q(ch)}')"
    expr = f"regexp_replace({expr}, '{q(curate._WS_COLLAPSE[0])}', ' ', 'g')"
    expr = f"regexp_replace({expr}, '{q(curate._WS_TRIM[0])}', '', 'g')"
    want = con.execute(f"SELECT {expr} AS t FROM d ORDER BY i").df()["t"]
    got = (curate.extract_text(ds).to_pandas().sort_values("i")
           ["text_extracted"])
    assert got.tolist() == want.tolist()

    # extract_links — split-scan twin (a findall of 'href="([^"]*)"'
    # legitimately differs on values that contain 'href="' themselves;
    # the split spec is what both engine and oracle implement)
    hp = q(curate._HREF_TAIL)
    want_l = con.execute(f"""
        WITH f AS (SELECT url, UNNEST(string_split(coalesce(html,''),
                   '{q(curate._HREF_SPLIT)}')[2:]) AS frag FROM d),
        l AS (SELECT url, regexp_extract(frag, '{hp}', 1) AS href FROM f
              WHERE regexp_matches(frag, '{hp}'))
        SELECT url, href FROM l ORDER BY url, href""").df()
    got_l = (curate.extract_links(ds).to_pandas()
             .sort_values(["url", "href"]).reset_index(drop=True))
    assert got_l["href"].tolist() == want_l["href"].tolist()
    assert got_l["url"].tolist() == want_l["url"].tolist()

    # extract_anchors (split-scan twin incl. the clean chain)
    p = q(curate._ANCHOR_PAT)
    want_a = con.execute(f"""
        WITH f AS (SELECT url, UNNEST(string_split(coalesce(html,''),
                   '{q(curate._ANCHOR_SPLIT)}')[2:]) AS frag FROM d),
        m AS (SELECT url, regexp_extract(frag, '{p}', 1) AS href,
                     regexp_extract(frag, '{p}', 2) AS t
              FROM f WHERE regexp_matches(frag, '{p}'))
        SELECT url, href, {expr.replace("coalesce(html,'')", 't')} AS anchor
        FROM m ORDER BY url, href, anchor""").df()
    got_a = (curate.extract_anchors(ds).to_pandas()
             .sort_values(["url", "href", "anchor"]).reset_index(drop=True))
    assert got_a["href"].tolist() == want_a["href"].tolist()
    assert got_a["anchor"].tolist() == want_a["anchor"].tolist()


def test_domain_links_nul_domains(ray_session):
    """Round-5 ADVICE: domain_links packs edges as src + '\\x00' + dst,
    so a NUL-bearing host would mis-split the key (src truncated at its
    first NUL, the remainder prepended to dst) and diverge from the SQL
    twin, which groups by the two columns directly.  The shared
    _DOMAIN_STEPS rewrite now maps any NUL-bearing host to '' on BOTH
    sides, keeping the packed separator unambiguous; this fuzz drives
    NUL hosts through source urls and href targets."""
    import duckdb

    from iresearch_ray.pipelines import curate

    rng = np.random.default_rng(31)
    hosts = ["a.com", "b\x00c.com", "ok.org", "x\x00", "\x00", "d.net",
             "www.e.io:8080", "f\x00.com:99"]
    docs = []
    for i in range(200):
        src = hosts[int(rng.integers(0, len(hosts)))]
        tgt = hosts[int(rng.integers(0, len(hosts)))]
        extra = ("" if rng.integers(0, 2) == 0 else
                 f'<a href="http://{hosts[int(rng.integers(0, len(hosts)))]}/z">y</a>')
        docs.append({"i": i, "url": f"http://{src}/p{i}",
                     "html": f'<p><a href="http://{tgt}/q">x</a>{extra}</p>'})
    pdf = pd.DataFrame(docs)
    assert pdf["url"].str.contains("\x00").any()  # the hazard is exercised
    ds = ray.data.from_pandas(pdf).repartition(5)
    con = duckdb.connect()
    con.register("d", pdf)
    q = lambda s: s.replace("'", "''")

    def dom(col):
        e = f"lower(regexp_extract({col}, '{q(curate._DOMAIN_PATTERN)}', 1))"
        for pat, repl in curate._DOMAIN_STEPS:
            e = f"regexp_replace({e}, '{q(pat)}', '{q(repl)}', 'g')"
        return e

    hp = q(curate._HREF_TAIL)
    want = con.execute(f"""
        WITH f AS (SELECT url, UNNEST(string_split(coalesce(html,''),
                   '{q(curate._HREF_SPLIT)}')[2:]) AS frag FROM d),
        l AS (SELECT url, regexp_extract(frag, '{hp}', 1) AS href FROM f
              WHERE regexp_matches(frag, '{hp}')),
        e AS (SELECT {dom('url')} AS src_domain,
                     {dom('href')} AS dst_domain FROM l)
        SELECT src_domain, dst_domain, count(*)::BIGINT AS n FROM e
        WHERE src_domain <> '' AND dst_domain <> ''
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    got = (curate.domain_links(ds).to_pandas()
           .sort_values(["src_domain", "dst_domain"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # no surviving domain carries the packed-key separator
    assert not got["src_domain"].str.contains("\x00").any()
    assert not got["dst_domain"].str.contains("\x00").any()


def test_hash_split_nullable_int_ids(ray_session):
    """A null in an int id column must not change OTHER rows' split
    assignment (nullable int -> float64 to_numpy renders '1.0'/'nan'
    keys; review finding, round 5): membership stays a pure function
    of the id regardless of batch composition, in both hash modes."""
    import pyarrow as pa

    from iresearch_ray.pipelines import curate

    with_null = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, None, 4, 5], pa.int64())}))
    no_null = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 4, 5], pa.int64())}))
    for mode in ("md5", "stable"):
        a = (curate.hash_split(with_null, ratios=(0.5, 0.5),
                               names=("x", "y"), hash=mode)
             .to_pandas().dropna(subset=["doc_id"]))
        b = (curate.hash_split(no_null, ratios=(0.5, 0.5),
                               names=("x", "y"), hash=mode).to_pandas())
        ma = a.set_index("doc_id")["split"].sort_index()
        mb = b.set_index("doc_id")["split"].sort_index()
        assert ma.index.tolist() == mb.index.tolist()
        assert ma.tolist() == mb.tolist(), mode


def test_filter_by_domain_rank_empty_node_agreement(ray_session):
    """When '' is itself a ranked node (caller-built edge lists can
    contain '' endpoints), BOTH membership shapes must still drop
    extractionless rows and agree exactly (review finding, round 5)."""
    from iresearch_ray.pipelines import graph

    edges = ray.data.from_items(
        [{"src_domain": "", "dst_domain": "a.com", "n": 5},
         {"src_domain": "a.com", "dst_domain": "", "n": 9},
         {"src_domain": "b.com", "dst_domain": "", "n": 9},
         {"src_domain": "a.com", "dst_domain": "b.com", "n": 1}])
    ranks = graph.pagerank(edges, iterations=3).materialize()
    rdf = ranks.to_pandas()
    # '' must be the strongest node for the test to bite
    assert rdf.loc[rdf["node"] == "", "rank_units"].iloc[0] == \
        rdf["rank_units"].max()
    docs = [{"doc_id": 0, "url": "http://a.com/x"},
            {"doc_id": 1, "url": "http://b.com/x"},
            {"doc_id": 2, "url": "not a url"},      # no extractable host
            {"doc_id": 3, "url": "http://c.com/x"}]  # unranked
    ds = ray.data.from_items(docs)
    lo = int(rdf["rank_units"].min())
    a = (graph.filter_by_domain_rank(ds, ranks, lo)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (graph.filter_by_domain_rank(ds, ranks, lo, max_broadcast=1)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].tolist() == [0, 1]


def test_dedup_hash_stages_survive_empty_and_tokenless_blocks(ray_session):
    """Empty blocks (and all-tokenless batches with string ids) must not
    infer null-typed key/id columns — mixed schemas break the downstream
    range sort (review findings, round 5)."""
    import pyarrow as pa

    rows = [{"doc_id": f"d{i}", "text": f"alpha beta gamma delta {i}"}
            for i in range(4)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)

    def empty_some(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        if any(i in ("d0", "d1") for i in ids):
            return b.slice(0, 0)  # an EMPTY block, schema intact
        return b

    holey = ds.map_batches(empty_some, batch_format="pyarrow")
    out = dedup.exact_dedup_groups(holey, hash="md5").to_pandas()
    assert sorted(out["keep_id"]) == ["d2", "d3"]
    out = dedup.fingerprint_dedup_groups(holey).to_pandas()
    assert sorted(out["keep_id"]) == ["d2", "d3"]
    # all-tokenless batch with STRING ids through the fingerprint mapper
    blank = ray.data.from_pandas(pd.DataFrame(
        [{"doc_id": "e0", "text": ""}, {"doc_id": "e1", "text": "  "}]))
    import pyarrow as pa2
    got_ds = dedup.rolling_doc_fingerprints(blank, k=3).materialize()
    assert got_ds.count() == 0  # no fingerprints, but schema stays clean
    sch = got_ds.schema()
    assert sch.base_schema.field("doc_id").type == pa2.string()


def test_dedup_corpus_nul_bearing_string_ids(ray_session):
    """Ids differing only by a trailing NUL alias in fixed-width numpy
    unicode arrays ('x' == 'x\\x00' after storage): the drop-set scan
    must compare exactly (review finding, round 5)."""
    rows = [{"doc_id": "x", "text": "t"},
            {"doc_id": "x\x00", "text": "t"},
            {"doc_id": "y", "text": "u"}]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = ray.data.from_items([{"id_a": "x", "id_b": "x\x00"}])
    out = dedup.dedup_corpus(ds, pairs=pairs).to_pandas()
    assert sorted(out["doc_id"].tolist()) == ["x", "y"]


def test_embedding_neardup_rejects_string_ids(ray_session):
    ds = ray.data.from_items(
        [{"vec_id": "doc_a", "embedding": [1.0, 0.0]},
         {"vec_id": "doc_b", "embedding": [1.0, 0.0]}])
    with pytest.raises(Exception) as ei:
        dedup.embedding_neardup_pairs(ds, threshold=0.9).to_pandas()
    assert "integer id column" in str(ei.value)


def test_pagerank_integer_node_ids(ray_session):
    """Non-string endpoint columns must rank identically to their
    string-labeled equivalent — the node table is built via
    cast(pa.string()), and a raw int64 get_indexer probe used to return
    -1 for every row (silently wrong ranks; review finding, round 5)."""
    from iresearch_ray.pipelines import graph

    edges = [(5, 7, 2), (5, 11, 1), (7, 11, 1), (11, 5, 1), (3, 5, 3)]
    ints = ray.data.from_items(
        [{"src_domain": s, "dst_domain": t, "n": n} for s, t, n in edges])
    strs = ray.data.from_items(
        [{"src_domain": str(s), "dst_domain": str(t), "n": n}
         for s, t, n in edges])
    a = (graph.pagerank(ints, iterations=5).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (graph.pagerank(strs, iterations=5).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert a["node"].tolist() == b["node"].tolist() == [
        "11", "3", "5", "7"]
    assert (a["rank_units"].to_numpy() == b["rank_units"].to_numpy()).all()
    # ranks differ across nodes (a get_indexer(-1) bug collapses them)
    assert a["rank_units"].nunique() > 1
    # partitioned path agrees on the same int-keyed input
    p = (graph.pagerank(ints, iterations=5, partitions=2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert (p["rank_units"].to_numpy() == a["rank_units"].to_numpy()).all()


def test_pagerank_float_weight_rejected(ray_session):
    """The fixed-point contract sums weights as int64; a float weight
    column would ship exact per edge but truncate in the out-weight sum
    (silently inflated rank mass) — rejected loudly instead."""
    from iresearch_ray.pipelines import graph

    ed = ray.data.from_items(
        [{"src_domain": "a", "dst_domain": "b", "n": 1.5},
         {"src_domain": "b", "dst_domain": "a", "n": 2.0}])
    with pytest.raises(ValueError, match="integer column"):
        graph.pagerank(ed).to_pandas()


def test_window_bucket_truncation_matches_duckdb(ray_session):
    """Bucket arithmetic truncates toward zero (Arrow divide == DuckDB
    `//`) in BOTH tumbling and hopping — numpy // floors and made
    hopping diverge from its own SQL twin for pre-epoch timestamps
    (review finding, round 5)."""
    import duckdb

    from iresearch_ray.pipelines.windows import (
        hopping_aggregate,
        tumbling_aggregate,
    )

    hour = 3_600_000_000
    ts = [-3 * hour // 2, -hour, -1, 0, 1, hour // 2, 2 * hour + 7]
    pdf = pd.DataFrame({"ts": np.array(ts, np.int64),
                        "event_type": ["a", "b", "a", "b", "a", "b", "a"],
                        "value": np.arange(7, dtype=np.float64)})
    ds = ray.data.from_pandas(pdf).repartition(3)

    con = duckdb.connect()
    con.register("ev", pdf)
    want_t = con.execute(
        "SELECT (ts // 3600000000) * 3600000000 AS bucket, event_type, "
        "count(*)::BIGINT AS n, sum(value) AS sum_value FROM ev "
        "GROUP BY 1, 2 ORDER BY 1, 2").df()
    got_t = (tumbling_aggregate(ds, window_minutes=60).to_pandas()
             .sort_values(["bucket", "event_type"]).reset_index(drop=True))
    assert got_t["bucket"].tolist() == want_t["bucket"].tolist()
    assert got_t["n"].tolist() == want_t["n"].tolist()

    want_h = con.execute(
        "WITH off AS (SELECT unnest(range(2)) AS j) "
        "SELECT ((ts // 1800000000) - j) * 1800000000 AS bucket, "
        "event_type, count(*)::BIGINT AS n, sum(value) AS sum_value "
        "FROM ev, off GROUP BY 1, 2 ORDER BY 1, 2").df()
    got_h = (hopping_aggregate(ds, window_minutes=60, hop_minutes=30)
             .to_pandas().sort_values(["bucket", "event_type"])
             .reset_index(drop=True))
    assert got_h["bucket"].tolist() == want_h["bucket"].tolist()
    assert got_h["n"].tolist() == want_h["n"].tolist()
    assert np.allclose(got_h["sum_value"], want_h["sum_value"])


def test_filter_by_domain_rank_empty_hashed_exit(ray_session):
    """The hashed path's empty-kept-set exit keeps the schema contract
    (no _rank_domain leak) and returns zero rows without a per-row
    Python filter (review finding, round 5)."""
    from iresearch_ray.pipelines import graph

    ranks = graph.pagerank(ray.data.from_items(
        [{"src_domain": "a.com", "dst_domain": "b.org", "n": 1},
         {"src_domain": "b.org", "dst_domain": "a.com", "n": 1}]),
        iterations=2)
    ds = ray.data.from_items(
        [{"doc_id": 0, "url": "http://a.com/x"},
         {"doc_id": 1, "url": "http://b.org/y"}])
    out = graph.filter_by_domain_rank(
        ds, ranks, min_rank_units=10 ** 18, max_broadcast=-1)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["doc_id", "url"]
