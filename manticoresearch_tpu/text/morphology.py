"""Morphology processors (reference: SPH_MORPH_* dispatch, sphinx.cpp:16695+).

stem_en is the classic Porter (1980) algorithm, which is what the reference's
sphinxstemen.cpp implements; soundex and metaphone follow the standard
published algorithms (reference: sphinxsoundex.cpp / sphinxmetaphone.cpp).
These run host-side only, at index and query time.
"""
from __future__ import annotations

from typing import Callable

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the stem."""
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


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2 or not w.isascii() or not w.isalpha():
        return word

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
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    continue
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def soundex(word: str) -> str:
    """Exact replica of stem_soundex (sphinxsoundex.cpp:14-39). NOT
    standard Soundex: dedup compares against the last EMITTED char (codes
    collapse across vowels; the first letter never matches a digit), and
    zero-padding stops at the original word length."""
    if not word or not all("a" <= c <= "z" for c in word):
        return word
    table = "01230120022455012623010202"
    out = [word[0]]
    for c in word[1:]:
        code = table[ord(c) - ord("a")]
        if code != "0" and out[-1] != code:
            out.append(code)
    while len(out) < 4 and len(out) < len(word):
        out.append("0")
    return "".join(out)


_MORPHS: dict[str, Callable[[str], str]] = {
    "stem_en": porter_stem,
    "soundex": soundex,
    "none": lambda w: w,
}


def _register_late():
    _MORPHS["stem_ru"] = russian_stem
    _MORPHS["metaphone"] = metaphone
    _MORPHS["stem_enru"] = lambda w: (russian_stem(w) if any(
        "\u0400" <= c <= "\u04ff" for c in w) else porter_stem(w))


# libstemmer language pack (reference vendors libstemmer_c the same way,
# SURVEY #52): Snowball algorithms for 15 languages via the environment's
# nltk implementation, loaded lazily per language. Accepts both the
# reference's config names (libstemmer_german / libstemmer_de) and short
# stem_de-style aliases.
_LIBSTEMMER_LANGS = {
    "ar": "arabic", "da": "danish", "nl": "dutch", "en": "english",
    "fi": "finnish", "fr": "french", "de": "german", "hu": "hungarian",
    "it": "italian", "no": "norwegian", "pt": "portuguese",
    "ro": "romanian", "ru": "russian", "es": "spanish", "sv": "swedish",
}
_LANG_BY_NAME = {v: v for v in _LIBSTEMMER_LANGS.values()}
_LANG_BY_NAME.update(_LIBSTEMMER_LANGS)


def _load_libstemmer(lang: str) -> Callable[[str], str]:
    from nltk.stem.snowball import SnowballStemmer
    st = SnowballStemmer(lang)
    stem = st.stem

    def run(word: str) -> str:
        out = stem(word)
        return out if out else word
    return run


def get_morph(name: str) -> Callable[[str], str]:
    if "stem_ru" not in _MORPHS:
        _register_late()
    if name not in _MORPHS:
        lang = None
        if name.startswith("libstemmer_"):
            lang = _LANG_BY_NAME.get(name[len("libstemmer_"):])
        elif name.startswith("stem_") and len(name) == 7:
            lang = _LIBSTEMMER_LANGS.get(name[5:])
        if lang is not None:
            try:
                _MORPHS[name] = _load_libstemmer(lang)
            except ImportError:
                raise ValueError(
                    f"morphology {name!r} needs the snowball language "
                    f"pack, which is unavailable in this build")
        else:
            raise ValueError(f"unknown morphology processor: {name!r}")
    return _MORPHS[name]


# ---------------------------------------------------------------------------
# Russian stemmer — the standard Snowball russian algorithm
# (reference sphinxstemru.cpp implements the same algorithm).
_RU_VOWELS = "аеиоуыэюя"

_RU_PERFECTIVE_1 = ("в", "вши", "вшись")                  # require preceding а/я
_RU_PERFECTIVE_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
                 "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
                 "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")          # require а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_REFLEXIVE = ("ся", "сь")
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
              "но", "ет", "ют", "ны", "ть", "ешь", "нно")  # require а/я
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
              "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
              "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
              "ишь", "ую", "ю")
_RU_NOUN = ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
            "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
            "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
            "ью", "ю", "ия", "ья", "я")
_RU_SUPERLATIVE = ("ейш", "ейше")
_RU_DERIVATIONAL = ("ост", "ость")


def _ru_rv(word: str) -> int:
    for i, c in enumerate(word):
        if c in _RU_VOWELS:
            return i + 1
    return len(word)


def _ru_ends(word: str, rv: int, suffixes, require_ay: bool = False):
    """Longest matching suffix within RV; require_ay: char before the suffix
    must be а or я (group-1 endings in the snowball spec)."""
    best = None
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            if require_ay:
                i = len(word) - len(suf) - 1
                if i < 0 or word[i] not in "ая":
                    continue
            if best is None or len(suf) > len(best):
                best = suf
    return best


def russian_stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    if not w or not any(c in _RU_VOWELS for c in w):
        return word
    rv = _ru_rv(w)

    # step 1: perfective gerund, else adjectival / reflexive+verb / noun
    suf = _ru_ends(w, rv, _RU_PERFECTIVE_2) or \
        _ru_ends(w, rv, _RU_PERFECTIVE_1, require_ay=True)
    if suf:
        w = w[: -len(suf)]
    else:
        adj = _ru_ends(w, rv, _RU_ADJECTIVE)
        if adj:
            w = w[: -len(adj)]
            part = _ru_ends(w, rv, _RU_PARTICIPLE_2) or \
                _ru_ends(w, rv, _RU_PARTICIPLE_1, require_ay=True)
            if part:
                w = w[: -len(part)]
        else:
            refl = _ru_ends(w, rv, _RU_REFLEXIVE)
            if refl:
                w = w[: -len(refl)]
            verb = _ru_ends(w, rv, _RU_VERB_2) or \
                _ru_ends(w, rv, _RU_VERB_1, require_ay=True)
            if verb:
                w = w[: -len(verb)]
            else:
                noun = _ru_ends(w, rv, _RU_NOUN)
                if noun:
                    w = w[: -len(noun)]

    # step 2: drop trailing и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (R2 check approximated by RV here, like many
    # lightweight ports; exact R2 TODO)
    der = _ru_ends(w, rv, _RU_DERIVATIONAL)
    if der:
        w = w[: -len(der)]

    # step 4
    if w.endswith("нн"):
        w = w[:-1]
    else:
        sup = _ru_ends(w, rv, _RU_SUPERLATIVE)
        if sup:
            w = w[: -len(sup)]
            if w.endswith("нн"):
                w = w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w or word


# ---------------------------------------------------------------------------
# Metaphone (original 1990 algorithm) — reference sphinxmetaphone.cpp.
def metaphone(word: str) -> str:
    if not word or not word.isascii() or not word.isalpha():
        return word
    w = word.upper()
    # initial-letter exceptions
    for pre, rep in (("AE", "E"), ("GN", "N"), ("KN", "N"), ("PN", "N"),
                     ("WR", "R"), ("X", "S"), ("WH", "W")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    out = []
    vowels = "AEIOU"
    i = 0
    n = len(w)

    def ch(k):
        return w[k] if 0 <= k < n else ""

    while i < n and len(out) < 6:
        c = w[i]
        if c in vowels:
            if i == 0:
                out.append(c)
        elif c in "FJLMNR":
            if not (out and out[-1] == c):
                out.append({"F": "F", "J": "J", "L": "L", "M": "M",
                            "N": "N", "R": "R"}[c])
        elif c == "B":
            if not (i == n - 1 and ch(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if ch(i + 1) == "I" and ch(i + 2) == "A":
                out.append("X")
            elif ch(i + 1) == "H":
                out.append("X" if ch(i - 1) != "S" else "K")
                i += 1
            elif ch(i + 1) in "IEY":
                if ch(i - 1) != "S":
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if ch(i + 1) == "G" and ch(i + 2) in "EIY":
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c == "G":
            if ch(i + 1) == "H":
                if i + 1 == n - 1 or ch(i + 2) not in vowels:
                    i += 1  # silent GH
                else:
                    out.append("K")
            elif ch(i + 1) == "N":
                pass  # silent in GN, GNED
            elif ch(i + 1) in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if ch(i - 1) in vowels and ch(i + 1) not in vowels:
                pass
            elif ch(i - 1) in "CSPTG":
                pass
            else:
                out.append("H")
        elif c == "K":
            if ch(i - 1) != "C":
                out.append("K")
        elif c == "P":
            if ch(i + 1) == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if ch(i + 1) == "H":
                out.append("X")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if ch(i + 1) == "H":
                out.append("0")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if ch(i + 1) in vowels:
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if ch(i + 1) in vowels:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out).lower()
