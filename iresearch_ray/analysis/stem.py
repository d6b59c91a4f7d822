"""Porter stemmer (classic 1980 algorithm, public domain description) and
the composite `text` analyzer.

Plays the role of the reference's Snowball-based stemming analyzers
(text_token_stemming_stream.cpp and the stemming step of
text_token_stream.cpp:373-433) without ICU/Snowball dependencies: the
original Porter English algorithm, implemented from the published rules.
Not byte-identical to Snowball's "english" (porter2) — documented
deviation; the default index analyzer remains the deterministic
segmentation-style tokenizer, as in the reference's own benchmark.
"""

from __future__ import annotations

from iresearch_ray.analysis.tokenizers import (
    Analyzer,
    RegexTokenizer,
    register_analyzer,
)

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences (the Porter 'm' measure)."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (_is_cons(word, len(word) - 3)
            and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)
            and word[-1] not in "wxy")


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class StemAnalyzer(Analyzer):
    """Whole-input Porter stem -> one token (reference `stem` analyzer)."""

    name = "stem"

    def tokens(self, text: str) -> list[str]:
        return [porter_stem(text.lower())]

    def config(self) -> dict:
        return {"name": self.name, "algorithm": "porter"}


class TextAnalyzer(Analyzer):
    """Composite `text` analyzer: word split + accent strip + case convert
    + stopword drop + stem + optional edge n-grams — the reference
    text_token_stream pipeline (segmentation -> normalize -> stopwords ->
    stem -> edge ngrams, options text_token_stream.hpp:51-79) with the
    ICU pieces re-expressed over unicodedata.

    Options mirror the reference's ``options_t``:
    - ``locale``: selects the Snowball stemmer ('en' -> Porter2, 'de' ->
      German, 'fr' -> French, 'es' -> Spanish; other locales
      stem-fallback to identity, documented) and is recorded in the
      config.  ``locale=None`` keeps
      the round-1 behavior (classic Porter) so existing indexes
      reconstruct identically.  With ``kind='icu'`` the locale also
      drives the word-break tier (PyICU when importable, CJK-aware
      regex fallback otherwise).
    - ``case``: 'lower' | 'none' | 'upper' (case_convert_t).
    - ``accent``: False strips combining marks (NFD -> remove marks ->
      NFC), the reference's accent=false default; True preserves them.
    - ``min_gram``/``max_gram``: emit word-prefix n-grams of those
      lengths per (stemmed) token; ``preserve_original`` additionally
      emits the token itself when longer than ``max_gram``.
    """

    name = "text"

    def __init__(self, stopwords=(), stemming: bool = True,
                 kind: str = "unicode", min_gram: int = 0, max_gram: int = 0,
                 preserve_original: bool = True, locale: str | None = None,
                 case: str = "lower", accent: bool = True):
        if case not in ("lower", "none", "upper"):
            raise ValueError(f"bad case convert {case!r}")
        tok_opts = {"locale": locale or "en"} if kind == "icu" else {}
        self.tokenizer = RegexTokenizer(kind=kind,
                                        lowercase=(case == "lower"),
                                        **tok_opts)
        self.stopwords = frozenset(stopwords)
        self.stemming = stemming
        self.locale = locale
        self.case = case
        self.accent = bool(accent)
        if locale is not None and stemming:
            from iresearch_ray.analysis.snowball import snowball_stemmer

            self._stem = snowball_stemmer(locale) or (lambda t: t)
        elif stemming:
            self._stem = porter_stem
        else:
            self._stem = None
        self.min_gram, self.max_gram = int(min_gram), int(max_gram)
        if self.min_gram and not self.max_gram:
            self.max_gram = self.min_gram
        self.preserve_original = bool(preserve_original)

    @staticmethod
    def _strip_accents(tok: str) -> str:
        import unicodedata

        d = unicodedata.normalize("NFD", tok)
        return unicodedata.normalize(
            "NFC", "".join(c for c in d if not unicodedata.combining(c)))

    def _edge_ngrams(self, tok: str) -> list[str]:
        out = [tok[:n] for n in range(self.min_gram,
                                      min(self.max_gram, len(tok)) + 1)]
        if self.preserve_original and len(tok) > self.max_gram:
            out.append(tok)
        return out or ([tok] if self.preserve_original else [])

    def tokens(self, text: str) -> list[str]:
        toks = self.tokenizer.tokens(text)
        if not self.accent:
            toks = [self._strip_accents(t) for t in toks]
        if self.case == "upper":
            toks = [t.upper() for t in toks]
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        if self._stem is not None:
            if self.case == "upper":
                # stem the lowercase form, restore case (snowball operates
                # on lowercase; the reference stems the converted term)
                toks = [self._stem(t.lower()).upper() for t in toks]
            else:
                toks = [self._stem(t) for t in toks]
        if self.min_gram:
            toks = [g for t in toks for g in self._edge_ngrams(t)]
        return toks

    def config(self) -> dict:
        return {"name": self.name, "stopwords": sorted(self.stopwords),
                "stemming": self.stemming,
                "min_gram": self.min_gram, "max_gram": self.max_gram,
                "preserve_original": self.preserve_original,
                "locale": self.locale, "case": self.case,
                "accent": self.accent,
                "tokenizer": self.tokenizer.config()}


register_analyzer("stem", lambda **o: StemAnalyzer(**o))
register_analyzer("text", lambda **o: TextAnalyzer(**o))
