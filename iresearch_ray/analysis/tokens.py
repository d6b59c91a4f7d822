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


def _icu_collator(locale: str):
    """A PyICU Collator for ``locale``, or None when PyICU is not
    importable (reference collation_token_stream.cpp:214-237 uses the
    same public ICU collation API)."""
    try:
        import icu
    except ImportError:
        return None
    return icu.Collator.createInstance(icu.Locale(locale))


class CollationAnalyzer(Analyzer):
    """Collation sort key as a single term (reference
    collation_token_stream).  With ``locale=`` and PyICU importable the
    key is the locale-tailored ICU sort key hex-encoded (two lowercase
    hex digits per byte preserve the byte order, so range/prefix filters
    order correctly); otherwise the documented locale-less NFKD stand-in
    (see module docstring)."""

    name = "collation"

    def __init__(self, locale: str | None = None):
        self.locale = locale
        self._coll = _icu_collator(locale) if locale else None

    def tokens(self, text: str) -> list[str]:
        if text is None:
            return [NULL_TERM]
        if self._coll is not None:
            return [bytes(self._coll.getSortKey(text)).hex()]
        return [collation_key(text)]

    def config(self) -> dict:
        cfg = {"name": self.name}
        if self.locale is not None:
            # locale changes the key space -> part of segment lineage; so
            # does whether PyICU was actually present at build time
            cfg["locale"] = self.locale
            cfg["icu"] = self._coll is not None
        return cfg


register_analyzer("keyword", lambda **o: KeywordAnalyzer(**o))
register_analyzer("boolean", lambda **o: BooleanAnalyzer(**o))
register_analyzer("null", lambda **o: NullAnalyzer(**o))
register_analyzer("collation", lambda **o: CollationAnalyzer(**o))
