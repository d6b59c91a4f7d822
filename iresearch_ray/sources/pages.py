"""Deterministic Common-Crawl-style pages table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Text is Zipf-sampled from a ~10k-word vocabulary with planted patterns so
every reference query category has known-cardinality answers (mirrors the
freq-annotated tasks of /root/reference/scripts/iresearch-benchmark.tasks):

- ``hterm`` in ~10% of docs, ``mterm`` ~1%, ``lterm`` ~0.1%
- fixed phrases "ref name" and "books id"
- shared-prefix family abcd / abcde / abcdef
- fuzzy probe targets: "fuzzy" with neighbors "fuzzy1"(d1-ish), "fuzy"(d1),
  "fuzzzy"(d1), "buzzy"(d1), "fzzy"(d1)
- one duplicated-doc pair (identical text, distinct url) for near-dup checks

The per-row invariant required by the north rule — byte-identical extracted
``text`` per ``url`` — holds by construction: ``html`` embeds ``text``
verbatim (``<html><body>TEXT</body></html>``) and the extraction stage
(`extract_text_batch`) recovers exactly that slice.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 10_000
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PLANTED = {
    "hterm": 0.10, "mterm": 0.01, "lterm": 0.001,
    "phrase_ref_name": 0.02, "phrase_books_id": 0.005,
    "prefix_family": 0.02, "fuzzy_family": 0.01,
}


def _vocab() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    lengths = rng.integers(3, 11, size=VOCAB_SIZE)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = ["".join(letters[rng.integers(0, 26, size=n)]) for n in lengths]
    return np.array(words, dtype=object)


def synthesize_pages(n_docs: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.1
    probs /= probs.sum()
    lens = rng.integers(5, 200, size=n_docs)
    total = int(lens.sum())
    flat = rng.choice(vocab, size=total, p=probs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])

    hit = {k: rng.random(n_docs) < p for k, p in PLANTED.items()}
    texts: list[str] = []
    prefix_cycle = ["abcd", "abcde", "abcdef"]
    fuzzy_cycle = ["fuzzy", "fuzy", "fuzzzy", "buzzy", "fzzy"]
    for i in range(n_docs):
        words = list(flat[offs[i]:offs[i + 1]])
        if hit["hterm"][i]:
            words.append("hterm")
        if hit["mterm"][i]:
            words.append("mterm")
        if hit["lterm"][i]:
            words.append("lterm")
        if hit["phrase_ref_name"][i]:
            words.extend(["ref", "name"])
        if hit["phrase_books_id"][i]:
            words.extend(["books", "id"])
        if hit["prefix_family"][i]:
            words.append(prefix_cycle[i % 3])
        if hit["fuzzy_family"][i]:
            words.append(fuzzy_cycle[i % 5])
        texts.append(" ".join(words))
    if n_docs >= 4:  # duplicated-doc pair at fixed slots
        texts[-1] = texts[-3]

    urls = [f"https://site{i % 101}.example/{i:08d}" for i in range(n_docs)]
    langs = ["en" if rng.random() < 0.95 else ["de", "fr", "sv", "nl"][i % 4]
             for i in range(n_docs)]
    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in texts]
    ts = pa.array(EPOCH_US + np.arange(n_docs, dtype=np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def write_pages(out_path: str, n_docs: int, seed: int = SEED,
                row_group_size: int | None = None) -> str:
    """Write (and cache) the synthetic pages table; idempotent per params."""
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    t = synthesize_pages(n_docs, seed)
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp, row_group_size=row_group_size or max(1, n_docs // 8),
                   compression="zstd")
    os.replace(tmp, out_path)
    return out_path


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Deterministically derive a pages table from testdata documents.parquet
    (same shape as input_hint; text passes through byte-identical)."""
    d = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_id = d["doc_id"].to_numpy()
    texts = d["text"].to_pylist()
    urls = [f"https://docs.example/{i:08d}" for i in doc_id]
    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in texts]
    ts = pa.array(EPOCH_US + doc_id.astype(np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(html, type=pa.binary()),
        "text": d["text"],
        "lang": d["lang"],
    })


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html -> text extraction stage; byte-identical per url by construction.

    Real-world HTML extraction would slot in here (actor-pool map_batches);
    for the synthetic corpus the body is the exact text payload.
    """
    import pyarrow.compute as pc

    html = batch["html"].cast(pa.string())
    text = pc.replace_substring(
        pc.replace_substring(html, "<html><body>", ""), "</body></html>", "")
    return batch.set_column(batch.schema.get_field_index("text"), "text",
                            text.cast(pa.string()))
