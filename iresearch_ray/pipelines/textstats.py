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
from iresearch_ray.util import pool_size

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
        texts = b[self.text_column].to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_uniq = np.zeros(len(texts), dtype=np.int64)
        sw_ratio = np.zeros(len(texts), dtype=np.float64)
        mean_len = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = self.analyzer.tokens(t)
            n_tok[i] = len(toks)
            n_uniq[i] = len(set(toks))
            if toks:
                sw_ratio[i] = sum(1 for w in toks if w in STOPWORDS_EN) / len(toks)
                mean_len[i] = sum(len(w) for w in toks) / len(toks)
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
    return ds.map_batches(QualityBatch,
                          fn_constructor_kwargs=dict(text_column=text_column,
                                                     analyzer=analyzer),
                          batch_format="pyarrow", concurrency=pool_size(concurrency))


class LangIdBatch:
    """Heuristic language ID: argmax of stopword-profile hits, first-max
    wins in LANG_ORDER (deterministic; SQL-reproducible)."""

    def __init__(self, text_column="text", analyzer="ascii"):
        self.text_column = text_column
        self.analyzer = get_analyzer(analyzer)
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b[self.text_column].to_pylist()
        preds = []
        for t in texts:
            toks = self.analyzer.tokens(t)
            best_lang, best = LANG_ORDER[0], -1
            for lang in LANG_ORDER:
                prof = self.profiles[lang]
                hits = sum(1 for w in toks if w in prof)
                if hits > best:
                    best_lang, best = lang, hits
            preds.append(best_lang)
        return b.append_column("lang_pred", pa.array(preds, type=pa.string()))


def langid(ds, text_column="text", analyzer="ascii", concurrency=None):
    return ds.map_batches(LangIdBatch,
                          fn_constructor_kwargs=dict(text_column=text_column,
                                                     analyzer=analyzer),
                          batch_format="pyarrow", concurrency=pool_size(concurrency))


def token_count_by(ds, group_column: str, text_column="text", analyzer="ascii",
                   concurrency=None):
    """SUM(token count) per group, pre-aggregated inside each batch so the
    groupby shuffles one row per (group, batch) — the combiner pattern."""
    from ray.data.aggregate import Sum

    class CountBatch:
        def __init__(self):
            self.analyzer = get_analyzer(analyzer)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                group_column: b[group_column].to_pylist(),
                "n": [len(self.analyzer.tokens(t))
                      for t in b[text_column].to_pylist()],
            })
            g = df.groupby(group_column, as_index=False)["n"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

    partial = ds.map_batches(CountBatch, batch_format="pyarrow",
                             concurrency=pool_size(concurrency))
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
            counts: dict[str, list[int]] = {}
            for t in b[text_column].to_pylist():
                seen: dict[str, int] = {}
                for w in self.analyzer.tokens(t):
                    seen[w] = seen.get(w, 0) + 1
                for w, c in seen.items():
                    if w in counts:
                        counts[w][0] += 1
                        counts[w][1] += c
                    else:
                        counts[w] = [1, c]
            terms = list(counts)
            return pa.table({
                "term": pa.array(terms, type=pa.string()),
                "df": pa.array([counts[t][0] for t in terms], type=pa.int64()),
                "ttf": pa.array([counts[t][1] for t in terms], type=pa.int64()),
            })

    partial = ds.map_batches(TermBatch, batch_format="pyarrow",
                             concurrency=pool_size(concurrency))
    return partial.groupby("term").aggregate(Sum("df", alias_name="df"),
                                             Sum("ttf", alias_name="ttf"))
