"""Verbatim / typed-value token streams + collation sort keys.

The analogues of the reference's non-text token streams
(core/analysis/token_streams.hpp:126-160: string_token_stream emits the
value verbatim; boolean/null streams emit fixed marker terms) and of
collation_token_stream (core/analysis/collation_token_stream.cpp:214-237 —
ICU collation sort key as a single term).  Without ICU, the collation key
here is a deterministic locale-less stand-in: NFKD-normalize, casefold,
strip combining marks — byte-comparable and stable, but NOT the ICU
tailored order (documented deviation).
"""

from __future__ import annotations

import unicodedata

from iresearch_ray.analysis.tokenizers import Analyzer, register_analyzer

# marker terms for typed values (the reference uses single bytes
# \xFF / \x00; printable markers keep the Parquet dictionaries debuggable)
TRUE_TERM = "$true"
FALSE_TERM = "$false"
NULL_TERM = "$null"


class KeywordAnalyzer(Analyzer):
    """Whole input as ONE verbatim term (reference string_token_stream)."""

    name = "keyword"

    def tokens(self, text: str) -> list[str]:
        return [text] if text is not None else [NULL_TERM]


class BooleanAnalyzer(Analyzer):
    """true/false marker term (reference boolean_token_stream)."""

    name = "boolean"

    _TRUTHY = frozenset(("true", "1", "t", "yes", "y"))

    def tokens(self, value) -> list[str]:
        if value is None:
            return [NULL_TERM]
        if isinstance(value, str):
            value = value.strip().lower() in self._TRUTHY
        return [TRUE_TERM if value else FALSE_TERM]


class NullAnalyzer(Analyzer):
    """Fixed null marker (reference null_token_stream)."""

    name = "null"

    def tokens(self, value) -> list[str]:
        return [NULL_TERM]


def collation_key(text: str) -> str:
    """Locale-less collation key: NFKD + casefold + strip combining marks."""
    decomposed = unicodedata.normalize("NFKD", text).casefold()
    return "".join(c for c in decomposed if not unicodedata.combining(c))


class CollationAnalyzer(Analyzer):
    """Collation sort key as a single term (reference
    collation_token_stream; ICU-free stand-in, see module docstring)."""

    name = "collation"

    def tokens(self, text: str) -> list[str]:
        return [collation_key(text)] if text is not None else [NULL_TERM]


register_analyzer("keyword", lambda **o: KeywordAnalyzer(**o))
register_analyzer("boolean", lambda **o: BooleanAnalyzer(**o))
register_analyzer("null", lambda **o: NullAnalyzer(**o))
register_analyzer("collation", lambda **o: CollationAnalyzer(**o))
