"""Snowball stemmers (English Porter2, German) in pure Python.

Implemented from the published algorithm descriptions at snowballstem.org
(public specifications), giving the `text` analyzer the reference's
Snowball stemming tier (core/analysis/text_token_stream.cpp:1098-1135
calls libstemmer) without any native dependency.  Each stemmer is a plain
function str -> str over already-lowercased words.
"""

from __future__ import annotations

__all__ = ["stem_en", "stem_de", "stem_fr", "stem_es", "snowball_stemmer"]

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


# ----------------------------------------------------------------- french ---

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _fr_prelude(word: str) -> str:
    """Mark u/i between vowels, y next to a vowel, and u after q as
    consonants (upper-cased), left to right on the evolving word — a
    marked letter is no longer a vowel for later positions."""
    cs = list(word)
    n = len(cs)

    def isv(j):
        return 0 <= j < n and cs[j] in _FR_VOWELS

    for i in range(n):
        c = cs[i]
        if c in "ui" and isv(i - 1) and isv(i + 1):
            cs[i] = c.upper()
        elif c == "y" and (isv(i - 1) or isv(i + 1)):
            cs[i] = "Y"
        elif c == "u" and i > 0 and cs[i - 1] == "q":
            cs[i] = "U"
    return "".join(cs)


def _fr_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS and n >= 3:
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    r1 = n
    for i in range(1, n):
        if w[i] not in _FR_VOWELS and w[i - 1] in _FR_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _FR_VOWELS and w[i - 1] in _FR_VOWELS:
            r2 = i + 1
            break
    return rv, r1, r2


# step-1 standard suffixes: (suffix, group) — longest textual match wins,
# then the group's rule applies (and may do nothing)
_FR_STEP1 = sorted((
    [(s, 1) for s in ("ance", "iqUe", "isme", "able", "iste", "eux",
                      "ances", "iqUes", "ismes", "ables", "istes")]
    + [(s, 2) for s in ("atrice", "ateur", "ation",
                        "atrices", "ateurs", "ations")]
    + [("logie", 3), ("logies", 3)]
    + [(s, 4) for s in ("usion", "ution", "usions", "utions")]
    + [("ence", 5), ("ences", 5)]
    + [("ement", 6), ("ements", 6)]
    + [("ité", 7), ("ités", 7)]
    + [(s, 8) for s in ("if", "ive", "ifs", "ives")]
    + [("eaux", 9), ("aux", 10), ("euse", 11), ("euses", 11)]
    + [("issement", 12), ("issements", 12)]
    + [("amment", 13), ("emment", 14), ("ment", 15), ("ments", 15)]
), key=lambda t: -len(t[0]))

_FR_STEP2A = sorted((
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it",
), key=len, reverse=True)

_FR_STEP2B = sorted(
    [("ions", 1)]
    + [(s, 2) for s in ("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
                        "eraIent", "erais", "erait", "eras", "erez", "eriez",
                        "erions", "erons", "eront", "ez", "iez")]
    + [(s, 3) for s in ("âmes", "ât", "âtes", "a", "ai", "aIent", "ais",
                        "ait", "ant", "ante", "antes", "ants", "as", "asse",
                        "assent", "asses", "assiez", "assions")],
    key=lambda t: -len(t[0]))

_FR_STEP4 = sorted(
    [("ion", 1), ("ier", 2), ("ière", 2), ("Ier", 3), ("Ière", 3),
     ("e", 4), ("ë", 5)], key=lambda t: -len(t[0]))


def _longest_in(w: str, table, minpos: int):
    """Longest (suffix, group) whose match lies fully at/after minpos
    (Snowball's ``setlimit tomark pV`` among semantics)."""
    for suf, grp in table:
        p = len(w) - len(suf)
        if p >= minpos and w.endswith(suf):
            return suf, grp, p
    return None, 0, -1


def stem_fr(word: str) -> str:
    """French Snowball stemmer over a lowercase word (implemented from
    the published specification at snowballstem.org/algorithms/french;
    the ë/ï -> He/Hi refinement of the newest revision is not applied —
    documented deviation, those letters stay plain vowels)."""
    w = _fr_prelude(word)
    rv, r1, r2 = _fr_regions(w)
    changed = False
    matched_ment = False

    # ---- step 1: standard suffix removal (longest textual match) ----
    suf = next((s for s, _ in _FR_STEP1 if w.endswith(s)), None)
    if suf is not None:
        grp = next(g for s, g in _FR_STEP1 if s == suf)
        p = len(w) - len(suf)
        matched_ment = grp in (13, 14, 15)
        if grp == 1 and p >= r2:
            w = w[:p]; changed = True
        elif grp == 2 and p >= r2:
            w = w[:p]; changed = True
            if w.endswith("ic"):
                q = len(w) - 2
                w = w[:q] if q >= r2 else w[:q] + "iqU"
        elif grp == 3 and p >= r2:
            w = w[:p] + "log"; changed = True
        elif grp == 4 and p >= r2:
            w = w[:p] + "u"; changed = True
        elif grp == 5 and p >= r2:
            w = w[:p] + "ent"; changed = True
        elif grp == 6 and p >= rv:
            w = w[:p]; changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif w.endswith("eus"):
                q = len(w) - 3
                if q >= r2:
                    w = w[:q]
                elif q >= r1:
                    w = w[:q] + "eux"
            elif w.endswith(("abl", "iqU")) and len(w) - 3 >= r2:
                w = w[:-3]
            elif w.endswith(("ièr", "Ièr")) and len(w) - 3 >= rv:
                w = w[:-3] + "i"
        elif grp == 7 and p >= r2:
            w = w[:p]; changed = True
            if w.endswith("abil"):
                q = len(w) - 4
                w = w[:q] if q >= r2 else w[:q] + "abl"
            elif w.endswith("ic"):
                q = len(w) - 2
                w = w[:q] if q >= r2 else w[:q] + "iqU"
            elif w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
        elif grp == 8 and p >= r2:
            w = w[:p]; changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    q = len(w) - 2
                    w = w[:q] if q >= r2 else w[:q] + "iqU"
        elif grp == 9:
            w = w[:p] + "eau"; changed = True
        elif grp == 10 and p >= r1:
            w = w[:p] + "al"; changed = True
        elif grp == 11:
            if p >= r2:
                w = w[:p]; changed = True
            elif p >= r1:
                w = w[:p] + "eux"; changed = True
        elif grp == 12 and p >= r1 and p > 0 and w[p - 1] not in _FR_VOWELS:
            w = w[:p]; changed = True
        elif grp == 13 and p >= rv:
            w = w[:p] + "ant"; changed = True
        elif grp == 14 and p >= rv:
            w = w[:p] + "ent"; changed = True
        elif grp == 15 and p > 0 and w[p - 1] in _FR_VOWELS and p - 1 >= rv:
            w = w[:p]; changed = True

    # ---- step 2a: verb suffixes beginning i (in RV) ----
    step2a_ran = not changed or matched_ment
    removed_2a = False
    if step2a_ran:
        suf2 = next((s for s in _FR_STEP2A
                     if len(w) - len(s) >= rv and w.endswith(s)), None)
        if suf2 is not None:
            p = len(w) - len(suf2)
            if p - 1 >= rv and w[p - 1] not in _FR_VOWELS:
                w = w[:p]
                changed = removed_2a = True
        # ---- step 2b: other verb suffixes (if 2a removed nothing) ----
        if not removed_2a:
            suf2, grp, p = _longest_in(w, _FR_STEP2B, rv)
            if suf2 is not None:
                if grp == 1:
                    if p >= r2:
                        w = w[:p]; changed = True
                elif grp == 2:
                    w = w[:p]; changed = True
                else:
                    w = w[:p]; changed = True
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    if changed:
        # ---- step 3 ----
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4: residual suffixes ----
        if w.endswith("s") and (len(w) < 2 or w[-2] not in "aiouès"):
            w = w[:-1]
        suf4, grp, p = _longest_in(w, _FR_STEP4, rv)
        if suf4 is not None:
            if grp == 1:
                if p >= r2 and p - 1 >= rv and w[p - 1] in "st":
                    w = w[:p]
            elif grp == 2:
                w = w[:p] + "i"
            elif grp == 3:
                w = w[:p] + "I"
            elif grp == 4:
                w = w[:p]
            elif grp == 5 and w[:p].endswith("gu"):
                w = w[:p]

    # ---- step 5: undouble ----
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]
    # ---- step 6: un-accent é/è before trailing non-vowels ----
    i = len(w) - 1
    cnt = 0
    while i >= 0 and w[i] not in _FR_VOWELS:
        i -= 1
        cnt += 1
    if cnt >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]
    # postlude: unmark
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ------------------------------------------------------------------ es ----
_ES_VOWELS = frozenset("aeiouáéíóúü")
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")

_ES_PRONOUNS = sorted(
    ("me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"), key=len, reverse=True)
_ES_PRON_A = ("iéndo", "ándo", "ár", "ér", "ír")   # accent removed after
_ES_PRON_B = ("ando", "iendo", "ar", "er", "ir")

_ES_STEP1 = sorted(
    [(s, 1) for s in ("anza", "anzas", "ico", "ica", "icos", "icas",
                      "ismo", "ismos", "able", "ables", "ible", "ibles",
                      "ista", "istas", "oso", "osa", "osos", "osas",
                      "amiento", "amientos", "imiento", "imientos")]
    + [(s, 2) for s in ("adora", "ador", "ación", "adoras", "adores",
                        "aciones", "ante", "antes", "ancia", "ancias")]
    + [("logía", 3), ("logías", 3)]
    + [("ución", 4), ("uciones", 4)]
    + [("encia", 5), ("encias", 5)]
    + [("amente", 6), ("mente", 7)]
    + [("idad", 8), ("idades", 8)]
    + [(s, 9) for s in ("iva", "ivo", "ivas", "ivos")],
    key=lambda t: -len(t[0]))

_ES_STEP2A = sorted(("ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                     "yó", "yas", "yes", "yais", "yamos"),
                    key=len, reverse=True)

_ES_STEP2B = sorted(
    [(s, 1) for s in ("en", "es", "éis", "emos")]   # + gu -> drop u
    + [(s, 2) for s in (
        "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
        "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
        "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
        "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
        "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
        "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
        "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
        "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar",
        "er", "ir", "as", "abas", "adas", "idas", "ías", "aras",
        "ieras", "ases", "ieses", "ís", "áis", "abais", "íais",
        "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
        "ados", "idos", "amos", "ábamos", "íamos", "imos", "áramos",
        "iéramos", "iésemos", "ásemos")],
    key=lambda t: -len(t[0]))

_ES_STEP3 = sorted(
    [(s, 1) for s in ("os", "a", "o", "á", "í", "ó")]
    + [("e", 2), ("é", 2)], key=lambda t: -len(t[0]))


def _es_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in _ES_VOWELS:
            # next vowel after position 1
            for i in range(2, n):
                if w[i] in _ES_VOWELS:
                    rv = i + 1
                    break
        elif w[0] in _ES_VOWELS:
            # two initial vowels: after the next consonant
            for i in range(2, n):
                if w[i] not in _ES_VOWELS:
                    rv = i + 1
                    break
        else:  # consonant-vowel: after the third letter
            rv = min(3, n)
    r1 = n
    for i in range(1, n):
        if w[i] not in _ES_VOWELS and w[i - 1] in _ES_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _ES_VOWELS and w[i - 1] in _ES_VOWELS:
            r2 = i + 1
            break
    return rv, r1, r2


def stem_es(word: str) -> str:
    """Spanish Snowball stemmer over a lowercase word (implemented from
    the published specification at snowballstem.org/algorithms/spanish —
    public; the reference reaches the same algorithm through libstemmer,
    core/analysis/text_token_stream.cpp)."""
    w = word
    rv, r1, r2 = _es_regions(w)

    # ---- step 0: attached pronoun (pronoun AND verb pattern in RV) ----
    for suf in _ES_PRONOUNS:
        p = len(w) - len(suf)
        if p < rv or not w.endswith(suf):
            continue
        before = w[:p]
        pat_a = next((t for t in _ES_PRON_A
                      if before.endswith(t) and p - len(t) >= rv), None)
        if pat_a is not None:
            w = before[:-len(pat_a)] + pat_a.translate(_ES_UNACCENT)
        elif any(before.endswith(t) and p - len(t) >= rv
                 for t in _ES_PRON_B):
            w = before
        elif (before.endswith("yendo") and p - 5 >= rv
              and before[:-5].endswith("u")):
            w = before
        break  # longest pronoun only; no backtracking

    # ---- step 1: standard suffix removal ----
    removed1 = False
    suf, grp, p = _longest_in(w, _ES_STEP1, 0)
    if suf is not None:
        if grp == 1 and p >= r2:
            w = w[:p]; removed1 = True
        elif grp == 2 and p >= r2:
            w = w[:p]; removed1 = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif grp == 3 and p >= r2:
            w = w[:p] + "log"; removed1 = True
        elif grp == 4 and p >= r2:
            w = w[:p] + "u"; removed1 = True
        elif grp == 5 and p >= r2:
            w = w[:p] + "ente"; removed1 = True
        elif grp == 6 and p >= r1:  # amente
            w = w[:p]; removed1 = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif (w.endswith(("os", "ic", "ad"))
                  and len(w) - 2 >= r2):
                w = w[:-2]
        elif grp == 7 and p >= r2:  # mente
            w = w[:p]; removed1 = True
            if (w.endswith(("ante", "able", "ible"))
                    and len(w) - 4 >= r2):
                w = w[:-4]
        elif grp == 8 and p >= r2:  # idad(es)
            w = w[:p]; removed1 = True
            if w.endswith("abil") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith(("ic", "iv")) and len(w) - 2 >= r2:
                w = w[:-2]
        elif grp == 9 and p >= r2:  # iv*
            w = w[:p]; removed1 = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]

    # ---- step 2a: verb suffixes beginning y, preceded by u (u not
    # necessarily in RV) — only if step 1 removed nothing ----
    removed2a = False
    if not removed1:
        suf2 = next((s for s in _ES_STEP2A
                     if len(w) - len(s) >= rv and w.endswith(s)), None)
        if suf2 is not None:
            p = len(w) - len(suf2)
            if p > 0 and w[p - 1] == "u":
                w = w[:p]
                removed2a = True
        # ---- step 2b: other verb suffixes (if 2a removed nothing) ----
        if not removed2a:
            suf2, grp, p = _longest_in(w, _ES_STEP2B, rv)
            if suf2 is not None:
                w = w[:p]
                if grp == 1 and w.endswith("gu"):
                    w = w[:-1]  # the gu need not be in RV

    # ---- step 3: residual vowel suffix (in RV) ----
    suf3, grp, p = _longest_in(w, _ES_STEP3, rv)
    if suf3 is not None:
        w = w[:p]
        if grp == 2 and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]  # u must be in RV here

    # ---- postlude: remove acute accents ----
    return w.translate(_ES_UNACCENT)


_STEMMERS = {"en": stem_en, "english": stem_en,
             "de": stem_de, "german": stem_de,
             "fr": stem_fr, "french": stem_fr,
             "es": stem_es, "spanish": stem_es}


def snowball_stemmer(locale: str):
    """Stemmer callable for a locale ('en'/'de'), or None if the language
    has no built-in Snowball implementation (callers fall back to no
    stemming, the reference's behavior for unknown locales)."""
    return _STEMMERS.get(locale.split("_")[0].split("-")[0].lower())
