"""CJK / multilingual golden-token suite for the ICU word-break tier
(VERDICT r3 item 8).

The reference's `text` analyzer segments with ICU UBRK word boundaries
(text_token_stream.cpp:1098-1135; multilingual goldens in
tests/analysis/text_analyzer_tests.cpp).  PyICU is not installed in this
container, so `kind='icu'` runs the documented regex fallback: Han
ideographs emit as unigrams (the public Lucene StandardTokenizer
convention for unsegmented scripts), hiragana / katakana runs as single
tokens (script change = boundary), every other word run via \\w+.  These
goldens PIN that fallback behavior; a separate test proves the tier
upgrades itself to ICU breaks the moment `import icu` succeeds."""

import sys

import numpy as np
import pytest

from iresearch_ray.analysis.tokenizers import RegexTokenizer


FALLBACK_GOLDENS = [
    # pure Han: one unigram per ideograph
    ("中文分词测试", ["中", "文", "分", "词", "测", "试"]),
    # Latin/Han mix: script change is a boundary, Latin lowercased
    ("Ray数据处理Engine", ["ray", "数", "据", "处", "理", "engine"]),
    # hiragana and katakana runs stay whole; the script switch splits
    ("これはテストです", ["これは", "テスト", "です"]),
    ("漢字とカタカナとひらがな混在",
     ["漢", "字", "と", "カタカナ", "とひらがな", "混", "在"]),
    # whitespace/punctuation drop, like every other kind
    ("日本語 と English!", ["日", "本", "語", "と", "english"]),
    # Cyrillic rides the \w+ class (reference Russian golden corpus,
    # text_analyzer_tests.cpp:440-520 — ours unstemmed at this layer)
    ("по вечерам ёжик ходил", ["по", "вечерам", "ёжик", "ходил"]),
    # DOCUMENTED DEVIATION: Thai has no dictionary segmentation without
    # real ICU; combining vowels split \w runs (ICU would emit syllable/
    # word chunks).  Pinned so a behavior change is loud, not silent.
    ("สวัสดีครับ ABC", ["สว", "สด", "คร", "บ", "abc"]),
]


@pytest.fixture()
def fallback_analyzer():
    a = RegexTokenizer(kind="icu", locale="zh")
    assert a._brk is None, "suite expects the no-PyICU fallback tier"
    return a


@pytest.mark.parametrize("text,want", FALLBACK_GOLDENS,
                         ids=[t[:12] for t, _ in FALLBACK_GOLDENS])
def test_icu_fallback_goldens(fallback_analyzer, text, want):
    assert fallback_analyzer.tokens(text) == want


def test_icu_fallback_offsets_anchor_original(fallback_analyzer):
    """Offsets must index the ORIGINAL mixed-script text (OFFS feature /
    highlighting depend on it)."""
    text = "Ray数据处理Engine"
    toks, starts, ends = fallback_analyzer.tokens_with_offsets(text)
    assert toks == ["ray", "数", "据", "处", "理", "engine"]
    for tok, s, e in zip(toks, starts, ends):
        assert text[s:e].lower() == tok


def test_icu_tier_upgrades_when_pyicu_importable(monkeypatch):
    """The import-gated upgrade path: with an `icu` module importable,
    kind='icu' must use UBRK word boundaries (here a fake iterator that
    breaks at spaces and flags non-space segments as words) instead of
    the regex fallback — same plumbing real PyICU would hit."""

    class FakeBreakIterator:
        def setText(self, text):
            self._text = text
            bounds, prev = [], 0
            for i, ch in enumerate(text):
                is_sp, prev_sp = ch == " ", i > 0 and text[i - 1] == " "
                if i > 0 and is_sp != prev_sp:
                    bounds.append(i)
            bounds.append(len(text))
            self._bounds = bounds
            self._pos = -1
            self._last_seg = None

        def first(self):
            return 0

        def __iter__(self):
            return self

        def __next__(self):
            self._pos += 1
            if self._pos >= len(self._bounds):
                raise StopIteration
            start = 0 if self._pos == 0 else self._bounds[self._pos - 1]
            end = self._bounds[self._pos]
            self._last_seg = self._text[start:end]
            return end

        def getRuleStatus(self):
            # UBRK_WORD_NONE (0) for whitespace segments, word otherwise
            return 0 if self._last_seg.strip() == "" else 200

    fake = type(sys)("icu")
    fake.BreakIterator = type("BI", (), {
        "createWordInstance": staticmethod(lambda loc: FakeBreakIterator())})
    fake.Locale = lambda loc: loc
    monkeypatch.setitem(sys.modules, "icu", fake)

    a = RegexTokenizer(kind="icu", locale="ja")
    assert a._brk is not None  # tier upgraded at construction
    assert a.tokens("Foo BAR baz") == ["foo", "bar", "baz"]
    toks, starts, ends = a.tokens_with_offsets("Foo BAR")
    assert toks == ["foo", "bar"]
    assert list(starts) == [0, 4] and list(ends) == [3, 7]
    # config still round-trips with the tier recorded
    cfg = a.config()
    assert cfg.get("kind", "icu") == "icu" or cfg["name"] == "regex-icu"
