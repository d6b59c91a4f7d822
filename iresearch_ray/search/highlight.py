"""Match highlighting: char-offset spans for matched terms in top-k docs.

The reference can index char offsets per position (OFFS feature,
core/index/field_data.cpp invert's offs writer; token_attributes offset).
At 10^12 docs, storing start/end varints on EVERY posting inflates the
hottest artifact for data touched only on the ~k docs a user actually
sees.  We instead keep the source ``text`` in the segment columnstore
(``build_index(store_columns=("text",))``) and re-tokenize ONLY the top-k
docs at highlight time with the same analyzer — O(k) work per query,
independent of corpus size, and byte-identical offsets because the
analyzer is deterministic (documented deviation from the reference's
stored-offset layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def highlight(reader, global_docs, terms, analyzer,
              text_column: str = "text", _texts=None) -> pd.DataFrame:
    """Spans of ``terms`` in each doc: DataFrame(doc, term, start, end).

    ``reader``: IndexReader whose index stored ``text_column``;
    ``analyzer`` must expose ``tokens_with_offsets`` (RegexTokenizer does).
    Offsets index the ORIGINAL stored text (casefold preserves positions).
    """
    if not hasattr(analyzer, "tokens_with_offsets"):
        raise TypeError(f"analyzer {analyzer!r} has no offset support")
    want = set(terms)
    texts = (_texts if _texts is not None else
             reader.stored(np.asarray(global_docs, dtype=np.int64),
                           [text_column]))
    rows = {"doc": [], "term": [], "start": [], "end": []}
    for doc, text in zip(texts["doc"], texts[text_column]):
        if text is None:
            continue
        toks, starts, ends = analyzer.tokens_with_offsets(text)
        for t, s, e in zip(toks, starts, ends):
            if t in want:
                rows["doc"].append(int(doc))
                rows["term"].append(t)
                rows["start"].append(int(s))
                rows["end"].append(int(e))
    return pd.DataFrame(rows)


def highlight_indexed(reader, global_docs, terms) -> pd.DataFrame:
    """Spans from STORED per-posting offsets (the OFFS index feature,
    ``build_index(index_features=('pos', 'offs'))``) — no re-tokenization
    and no stored text needed: DataFrame(doc, term, start, end), identical
    to ``highlight`` because both derive from tokens_with_offsets."""
    want = np.sort(np.asarray(global_docs, dtype=np.int64))
    rows = {"doc": [], "term": [], "start": [], "end": []}
    for seg in reader.segments:
        lo = np.searchsorted(want, seg.base, side="right")
        hi = np.searchsorted(want, seg.base + seg.reader.num_docs,
                             side="right")
        local = want[lo:hi] - seg.base  # 1-based local ids
        if not len(local):
            continue
        for t in terms:
            i = seg.reader.lookup(t)
            if i < 0:
                continue
            docs, freqs, starts, ends, run_offs = \
                seg.reader.postings_offsets(i)
            at = np.searchsorted(docs, local)
            ok = (at < len(docs)) & (docs[np.minimum(at, len(docs) - 1)] == local)
            for j, d in zip(at[ok], local[ok]):
                for s, e in zip(starts[run_offs[j]:run_offs[j + 1]],
                                ends[run_offs[j]:run_offs[j + 1]]):
                    rows["doc"].append(int(d + seg.base))
                    rows["term"].append(t)
                    rows["start"].append(int(s))
                    rows["end"].append(int(e))
    out = pd.DataFrame(rows)
    return out.sort_values(["doc", "start"]).reset_index(drop=True) if len(out) else out


def highlight_snippets(reader, global_docs, terms, analyzer=None,
                       text_column: str = "text", context: int = 30,
                       tag_open: str = "<em>", tag_close: str = "</em>",
                       indexed: bool = False) -> pd.DataFrame:
    """One tagged snippet per doc around its first match.

    ``indexed=True`` takes spans from the stored OFFS posting feature
    (:func:`highlight_indexed` — no re-tokenization; the index must have
    been built with ``index_features=('pos', 'offs')``); the default
    re-tokenizes the stored text with ``analyzer``.  Both paths produce
    identical snippets because the OFFS writer records exactly the
    offsets ``tokens_with_offsets`` emits (reference parity:
    core/analysis/token_attributes.hpp offset attribute consumed by
    field_data::invert's offs writer)."""
    texts = reader.stored(np.asarray(global_docs, dtype=np.int64),
                          [text_column])
    if indexed:
        spans = highlight_indexed(reader, global_docs, terms)
    else:
        if analyzer is None:
            raise TypeError("highlight_snippets needs an analyzer "
                            "when indexed=False")
        spans = highlight(reader, global_docs, terms, analyzer, text_column,
                          _texts=texts)
    text_by_doc = dict(zip(texts["doc"], texts[text_column]))
    out = {"doc": [], "snippet": []}
    for doc, grp in spans.groupby("doc", sort=True):
        text = text_by_doc[doc]
        s, e = int(grp["start"].iloc[0]), int(grp["end"].iloc[0])
        lo, hi = max(0, s - context), min(len(text), e + context)
        snippet = (text[lo:s] + tag_open + text[s:e] + tag_close + text[e:hi])
        out["doc"].append(int(doc))
        out["snippet"].append(("..." if lo else "") + snippet
                              + ("..." if hi < len(text) else ""))
    return pd.DataFrame(out)
