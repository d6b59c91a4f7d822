"""Text-analysis stages: quality scores, language-ID, token counts,
top terms — all map_batches + small pre-aggregated groupbys.

Each operator tokenizes with the deterministic `ascii` analyzer by default
so the DuckDB correctness oracle can reproduce it in ANSI SQL
(`string_split_regex(lower(text), '[^a-z0-9]+')`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.analysis import get_analyzer
from iresearch_ray.analysis.tokenizers import flatten_batch, flatten_batch_arrow
from iresearch_ray.util import StatelessBatchFn, pool_size


def _coded_tokens(analyzer, col):
    """(codes, dict_np, doc_idx, doc_len) for a text column.

    Uses the zero-Python-object Arrow tokenize path (case fold + regex
    split + dictionary encode in Arrow C kernels) whenever the analyzer
    supports it; otherwise tokenizes in Python and factorizes, so every
    downstream stat is a vectorized bincount either way."""
    if getattr(analyzer, "arrow_split_pattern", None):
        out = flatten_batch_arrow(analyzer, col)
        return out["codes"], out["dict"], out["doc_idx"], out["doc_len"]
    out = flatten_batch(analyzer, col.to_pylist())
    if len(out["terms"]):
        codes, uniques = pd.factorize(out["terms"])
        codes = codes.astype(np.int64, copy=False)
        dict_np = np.asarray(uniques, dtype=object)
    else:
        codes = np.empty(0, dtype=np.int64)
        dict_np = np.empty(0, dtype=object)
    return codes, dict_np, out["doc_idx"], out["doc_len"]


def _dict_mask(dict_np: np.ndarray, vocab: frozenset) -> np.ndarray:
    """Membership mask over the (small) batch dictionary — O(|dict|), not
    O(tokens)."""
    return np.fromiter((t in vocab for t in dict_np), dtype=np.float64,
                       count=len(dict_np))

# fixed stopword profiles for the language-ID heuristic (deterministic,
# SQL-reproducible; tiny on purpose)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "la", "los", "y", "es", "un", "una"),
}
LANG_ORDER = ("en", "de", "fr", "es")

STOPWORDS_EN = frozenset(LANG_PROFILES["en"])


class QualityBatch:
    """(doc) -> n_tokens, n_unique_tokens, stopword_ratio, mean_token_len."""

    def __init__(self, text_column="text", analyzer="ascii", round_to: int = 6):
        self.text_column = text_column
        self.analyzer = get_analyzer(analyzer)
        self.round_to = round_to

    def __call__(self, b: pa.Table) -> pa.Table:
        codes, dict_np, doc_idx, n_tok = _coded_tokens(
            self.analyzer, b[self.text_column])
        n_docs = len(n_tok)
        D = max(1, len(dict_np))
        # per-doc distinct terms: unique (doc, code) pairs, one bincount
        u = np.unique(doc_idx * D + codes)
        n_uniq = np.bincount(u // D, minlength=n_docs).astype(np.int64)
        # stopword hits / token lengths: O(|dict|) lookups, then bincounts
        is_stop = _dict_mask(dict_np, STOPWORDS_EN)
        tok_len = np.fromiter((len(t) for t in dict_np), dtype=np.float64,
                              count=len(dict_np))
        denom = np.maximum(n_tok, 1).astype(np.float64)
        sw_ratio = np.bincount(doc_idx, weights=is_stop[codes],
                               minlength=n_docs) / denom
        mean_len = np.bincount(doc_idx, weights=tok_len[codes],
                               minlength=n_docs) / denom
        cols = {name: b[name] for name in b.column_names
                if name not in ("n_tokens", "n_unique_tokens", "stopword_ratio",
                                "mean_token_len")}
        cols.update({
            "n_tokens": pa.array(n_tok),
            "n_unique_tokens": pa.array(n_uniq),
            "stopword_ratio": pa.array(np.round(sw_ratio, self.round_to)),
            "mean_token_len": pa.array(np.round(mean_len, self.round_to)),
        })
        return pa.table(cols)


def quality_stats(ds, text_column="text", analyzer="ascii", concurrency=None):
    # stateless tasks, not an actor pool: analyzer construction is cheap
    # and plain tasks reuse Ray's prestarted workers (no per-run spawn)
    return ds.map_batches(
        StatelessBatchFn(QualityBatch,
                         dict(text_column=text_column, analyzer=analyzer)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)


class LangIdBatch:
    """Heuristic language ID: argmax of stopword-profile hits, first-max
    wins in LANG_ORDER (deterministic; SQL-reproducible)."""

    def __init__(self, text_column="text", analyzer="ascii"):
        self.text_column = text_column
        self.analyzer = get_analyzer(analyzer)
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}

    def __call__(self, b: pa.Table) -> pa.Table:
        codes, dict_np, doc_idx, doc_len = _coded_tokens(
            self.analyzer, b[self.text_column])
        n_docs = len(doc_len)
        # per-lang hit counts: one O(|dict|) mask + one bincount each;
        # first-max-wins in LANG_ORDER (strict > against the running best)
        best = np.full(n_docs, -1.0)
        pred = np.zeros(n_docs, dtype=np.int64)
        for li, lang in enumerate(LANG_ORDER):
            mask = _dict_mask(dict_np, self.profiles[lang])
            hits = np.bincount(doc_idx, weights=mask[codes], minlength=n_docs)
            win = hits > best
            pred[win] = li
            best = np.where(win, hits, best)
        preds = np.asarray(LANG_ORDER, dtype=object)[pred]
        return b.append_column("lang_pred", pa.array(preds, type=pa.string()))


def langid(ds, text_column="text", analyzer="ascii", concurrency=None):
    return ds.map_batches(
        StatelessBatchFn(LangIdBatch,
                         dict(text_column=text_column, analyzer=analyzer)),
        batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)


def token_count_by(ds, group_column: str, text_column="text", analyzer="ascii",
                   concurrency=None):
    """SUM(token count) per group, pre-aggregated inside each batch so the
    groupby shuffles one row per (group, batch) — the combiner pattern."""
    from ray.data.aggregate import Sum

    class CountBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            _, _, _, doc_len = _coded_tokens(self.analyzer, b[text_column])
            df = pd.DataFrame({group_column: b[group_column].to_pylist(),
                               "n": doc_len})
            g = df.groupby(group_column, as_index=False)["n"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

    partial = ds.map_batches(
        StatelessBatchFn(CountBatch), batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)
    return partial.groupby(group_column).aggregate(Sum("n", alias_name="total_tokens"))


def term_frequencies(ds, text_column="text", analyzer="ascii", concurrency=None):
    """Corpus-wide (term, df, ttf) via per-batch partial counts + one small
    groupby — the index-build dictionary computed purely in Ray Data
    (cross-checks the segment build)."""
    from ray.data.aggregate import Sum

    class TermBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            codes, dict_np, doc_idx, _ = _coded_tokens(
                self.analyzer, b[text_column])
            D = max(1, len(dict_np))
            ttf = np.bincount(codes, minlength=len(dict_np)).astype(np.int64)
            # df: unique (doc, code) pairs, then count per code
            u = np.unique(doc_idx * D + codes)
            df_ = np.bincount(u % D, minlength=len(dict_np)).astype(np.int64)
            return pa.table({
                "term": pa.array(dict_np, type=pa.string()),
                "df": pa.array(df_),
                "ttf": pa.array(ttf),
            })

    partial = ds.map_batches(
        StatelessBatchFn(TermBatch), batch_format="pyarrow",
        concurrency=pool_size(concurrency) if concurrency else None)
    return partial.groupby("term").aggregate(Sum("df", alias_name="df"),
                                             Sum("ttf", alias_name="ttf"))
