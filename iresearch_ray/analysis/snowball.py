"""Snowball stemmers (English Porter2, German) in pure Python.

Implemented from the published algorithm descriptions at snowballstem.org
(public specifications), giving the `text` analyzer the reference's
Snowball stemming tier (core/analysis/text_token_stream.cpp:1098-1135
calls libstemmer) without any native dependency.  Each stemmer is a plain
function str -> str over already-lowercased words.
"""

from __future__ import annotations

__all__ = ["stem_en", "stem_de", "snowball_stemmer"]

# ---------------------------------------------------------------- english ---

_EN_VOWELS = frozenset("aeiouy")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = frozenset("cdeghkmnrt")

_EN_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_EN_STEP2 = (  # longest-first; (suffix, replacement, needs)
    ("ization", "ize", None), ("ational", "ate", None), ("fulness", "ful", None),
    ("ousness", "ous", None), ("iveness", "ive", None), ("tional", "tion", None),
    ("biliti", "ble", None), ("lessli", "less", None), ("entli", "ent", None),
    ("ation", "ate", None), ("alism", "al", None), ("aliti", "al", None),
    ("ousli", "ous", None), ("iviti", "ive", None), ("fulli", "ful", None),
    ("enci", "ence", None), ("anci", "ance", None), ("abli", "able", None),
    ("izer", "ize", None), ("ator", "ate", None), ("alli", "al", None),
    ("bli", "ble", None), ("ogi", "og", "l"), ("li", "", "_li"),
)
_EN_STEP3 = (
    ("ational", "ate", None), ("tional", "tion", None), ("alize", "al", None),
    ("icate", "ic", None), ("iciti", "ic", None), ("ative", "", "_r2"),
    ("ical", "ic", None), ("ness", "", None), ("ful", "", None),
)
_EN_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment",
             "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
             "ion", "al", "er", "ic")


def _en_regions(w: str) -> tuple[int, int]:
    r1 = len(w)
    for p in ("gener", "commun", "arsen"):  # exceptional R1 prefixes
        if w.startswith(p):
            r1 = len(p)
            break
    else:
        for i in range(1, len(w)):
            if w[i] not in _EN_VOWELS and w[i - 1] in _EN_VOWELS:
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _EN_VOWELS and w[i - 1] in _EN_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _en_short_syllable_end(w: str) -> bool:
    if len(w) == 2:
        return w[0] in _EN_VOWELS and w[1] not in _EN_VOWELS
    if len(w) >= 3:
        c, v, n = w[-3], w[-2], w[-1]
        return (v in _EN_VOWELS and n not in _EN_VOWELS and n not in "wxY"
                and c not in _EN_VOWELS)
    return False


def stem_en(word: str) -> str:
    """English Porter2 (Snowball) stemmer over a lowercase word."""
    w = word
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EN_EXCEPTION1:
        return _EN_EXCEPTION1[w]
    # mark consonant-y: initial y, and y after a vowel
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join("Y" if c == "y" and i > 0 and w[i - 1] in _EN_VOWELS else c
                for i, c in enumerate(w))
    r1, r2 = _en_regions(w)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[:-len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _EN_VOWELS for c in w[:-2]):
            w = w[:-1]
    if w in _EN_EXCEPTION2:
        return w
    # step 1b
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[:-len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[:-len(suf)]
                if any(c in _EN_VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _en_short_syllable_end(w):
                        w += "e"
                break
    # step 1c
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_VOWELS):
        w = w[:-1] + "i"
    # step 2
    for suf, rep, need in _EN_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if need == "l" and not w[:-len(suf)].endswith("l"):
                    pass
                elif need == "_li" and (not w[:-len(suf)]
                                        or w[-len(suf) - 1] not in _EN_LI_END):
                    pass
                else:
                    w = w[:-len(suf)] + rep
            break
    # step 3
    for suf, rep, need in _EN_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if need == "_r2":
                    if len(w) - len(suf) >= r2:
                        w = w[:-len(suf)] + rep
                else:
                    w = w[:-len(suf)] + rep
            break
    # step 4
    for suf in _EN_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if w[:-3].endswith(("s", "t")):
                        w = w[:-3]
                else:
                    w = w[:-len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                and not _en_short_syllable_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]
    return w.replace("Y", "y")


# ----------------------------------------------------------------- german ---

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")


def _de_regions(w: str) -> tuple[int, int]:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def stem_de(word: str) -> str:
    """German Snowball stemmer over a lowercase word."""
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants
    w = "".join(
        c.upper() if c in "uy" and 0 < i < len(w) - 1
        and w[i - 1] in _DE_VOWELS and w[i + 1] in _DE_VOWELS else c
        for i, c in enumerate(w))
    r1, r2 = _de_regions(w)

    def in_r1(n):  # deletable suffix of length n lies in R1
        return len(w) - n >= r1

    def in_r2(n):
        return len(w) - n >= r2

    # step 1
    matched = False
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(suf)):
                w = w[:-len(suf)]
            matched = True
            break
    if not matched:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(suf)):
                    w = w[:-len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                matched = True
                break
    if not matched and w.endswith("s") and in_r1(1) and len(w) >= 2 \
            and w[-2] in _DE_S_END:
        w = w[:-1]

    # step 2
    matched = False
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(suf)):
                w = w[:-len(suf)]
            matched = True
            break
    if not matched and w.endswith("st") and in_r1(2) and len(w) >= 6 \
            and w[-3] in _DE_ST_END:
        w = w[:-2]

    # step 3 (d-suffixes)
    if w.endswith(("end", "ung")):
        if in_r2(3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(2) and not w[:-2].endswith("e"):
                w = w[:-2]
    elif w.endswith(("isch", "ig", "ik")):
        n = 4 if w.endswith("isch") else 2
        if in_r2(n) and not w[:-n].endswith("e"):
            w = w[:-n]
    elif w.endswith(("lich", "heit")):
        if in_r2(4):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and len(w) - 2 >= r1:
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(2):
                w = w[:-2]

    w = w.lower()
    return (w.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


_STEMMERS = {"en": stem_en, "english": stem_en,
             "de": stem_de, "german": stem_de}


def snowball_stemmer(locale: str):
    """Stemmer callable for a locale ('en'/'de'), or None if the language
    has no built-in Snowball implementation (callers fall back to no
    stemming, the reference's behavior for unknown locales)."""
    return _STEMMERS.get(locale.split("_")[0].split("-")[0].lower())
