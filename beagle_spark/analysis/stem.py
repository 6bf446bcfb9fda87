"""Snowball-compatible stemming.

The reference uses Lucene's Snowball programs for 26 languages
(reference: src/beagle/text_analysis.clj:15-49). This container has no
Snowball bindings, so every language ships a pure-Python
implementation (see _PURE_PYTHON below; the snowball_* sibling modules
implement the published snowballstem.org algorithms — the larger
well-specified ones faithfully, the rest following the published
program's structure with reconstructed suffix tables, documented in
each module). If the optional `snowballstemmer` / `Stemmer`
(PyStemmer) package is present at runtime (e.g. a fuller cluster
image), all 26 languages dispatch to it instead.

Stemmers are resolved per *analysis config* once per Arrow batch, never
per row.
"""

from __future__ import annotations

import logging
import warnings
from functools import lru_cache

logger = logging.getLogger(__name__)

_SNOWBALL_LANGS = {
    "arabic": "arabic", "armenian": "armenian", "basque": "basque",
    "catalan": "catalan", "danish": "danish", "dutch": "dutch",
    "english": "english", "estonian": "estonian", "finnish": "finnish",
    "french": "french", "german": "german", "german2": "german2",
    "hungarian": "hungarian", "irish": "irish", "italian": "italian",
    "kp": "kp", "lithuanian": "lithuanian", "lovins": "lovins",
    "norwegian": "norwegian", "porter": "porter", "portuguese": "portuguese",
    "romanian": "romanian", "russian": "russian", "spanish": "spanish",
    "swedish": "swedish", "turkish": "turkish",
}

# Languages whose algorithm has no same-named counterpart in the
# snowballstemmer/PyStemmer bindings. Aliasing them to the closest
# binding name (kp->dutch, lovins->english, german2->german) would
# silently run a DIFFERENT algorithm, so they always dispatch to the
# faithful in-repo pure-Python programs even when bindings are present.
_PURE_ONLY = frozenset({"kp", "lovins", "german2"})


# ---------------------------------------------------------------------------
# Porter stemmer (pure Python, classic 1980 algorithm).
# ---------------------------------------------------------------------------
_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the stem (Porter's m)."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Classic Porter stemmer; ASCII lowercase input assumed for the
    algorithm core (other chars pass through untouched)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Porter2 / Snowball English stemmer (pure Python). This is what Lucene's
# SnowballProgram "English" runs — the reference's default `:english`
# stemmer (text_analysis.clj:22). Algorithm: snowballstem.org/algorithms/
# english/stemmer.html (public specification).
# ---------------------------------------------------------------------------
_P2_VOWELS = frozenset("aeiouy")
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_ENDING = frozenset("cdeghkmnrt")
_P2_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)


def _p2_is_vowel(w: str, i: int) -> bool:
    return w[i] in _P2_VOWELS


def _p2_regions(w: str) -> tuple[int, int]:
    """(R1, R2) start indexes."""
    n = len(w)
    r1 = n
    if w.startswith(("gener", "arsen")):
        r1 = 5
    elif w.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if not _p2_is_vowel(w, i) and _p2_is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _p2_is_vowel(w, i) and _p2_is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _p2_short_syllable(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive of the consonant)."""
    # (a) vowel followed by non-vowel (not w/x/Y), preceded by non-vowel
    if i >= 2:
        return (
            _p2_is_vowel(w, i - 1)
            and not _p2_is_vowel(w, i)
            and w[i] not in "wxY"
            and not _p2_is_vowel(w, i - 2)
        )
    # (b) vowel at beginning followed by non-vowel
    return i == 1 and _p2_is_vowel(w, 0) and not _p2_is_vowel(w, 1)


def _p2_is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and len(w) >= 2 and _p2_short_syllable(w, len(w) - 1)


def porter2_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    if not w.isascii() or not w.isalpha():
        # pass through tokens the Snowball program wouldn't change
        if w not in _P2_EXCEPTIONS and "'" not in w:
            return w
    if w.startswith("'"):
        w = w[1:]
    if w in _P2_EXCEPTIONS:
        return _P2_EXCEPTIONS[w]
    # mark consonant-y as Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _p2_is_vowel("".join(chars), i - 1):
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _p2_regions(w)

    # Step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(_p2_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _P2_EXCEPTIONS2:
        return w

    # Step 1b
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_p2_is_vowel(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_P2_DOUBLES):
                        w = w[:-1]
                    elif _p2_is_short(w, r1):
                        w += "e"
                break

    # Step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _p2_is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ]
    done2 = False
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            done2 = True
            break
    if not done2:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _P2_LI_ENDING:
                w = w[:-2]

    # Step 3 (in R1)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    ]
    done3 = False
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            done3 = True
            break
    if not done3 and w.endswith("ative"):
        if len(w) - 5 >= r1 and len(w) - 5 >= r2:
            w = w[:-5]

    # Step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    ]
    done4 = False
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            done4 = True
            break
    if not done4 and w.endswith("ion"):
        if len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _p2_short_syllable(w, len(w) - 2)
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


_warned: set[str] = set()


@lru_cache(maxsize=64)
def get_stemmer(lang: str):
    """Return a str->str stem function for `lang`.

    Unknown language falls back to english (reference:
    text_analysis.clj:47-49 logs+defaults to English).
    """
    lang = (lang or "english").lstrip(":").lower()
    if lang not in _SNOWBALL_LANGS:
        logger.debug("Unknown stemmer %r; defaulting to english", lang)
        lang = "english"
    if lang not in _PURE_ONLY:
        try:  # optional real Snowball bindings
            import snowballstemmer  # type: ignore

            return snowballstemmer.stemmer(_SNOWBALL_LANGS[lang]).stemWord
        except ImportError:
            pass
        try:
            import Stemmer  # type: ignore  # PyStemmer

            return Stemmer.Stemmer(_SNOWBALL_LANGS[lang]).stemWord
        except ImportError:
            pass
    fn = _PURE_PYTHON.get(lang)
    if fn is not None:
        return fn()
    # unreachable for the 26 known names; kept as a guard for future
    # additions to _SNOWBALL_LANGS without a pure-Python entry
    if lang not in _warned:  # pragma: no cover
        _warned.add(lang)
        warnings.warn(
            f"No Snowball implementation available for {lang!r}; "
            "stemming is identity for this language in this environment."
        )
    return lambda w: w


def _lazy(module: str, name: str):
    def load():
        import importlib

        return getattr(importlib.import_module(module, __package__), name)

    return load


# All 26 reference stemmer names resolve to a pure-Python
# implementation — no identity fallback (reference:
# src/beagle/text_analysis.clj:15-49).
_PURE_PYTHON = {
    "english": lambda: porter2_stem,
    "porter": lambda: porter_stem,
    "german": _lazy(".snowball_de", "german_stem"),
    "german2": _lazy(".snowball_de", "german2_stem"),
    "spanish": _lazy(".snowball_es", "spanish_stem"),
    "danish": _lazy(".snowball_scand", "danish_stem"),
    "norwegian": _lazy(".snowball_scand", "norwegian_stem"),
    "swedish": _lazy(".snowball_scand", "swedish_stem"),
    "dutch": _lazy(".snowball_nl", "dutch_stem"),
    "kp": _lazy(".snowball_nl", "kp_stem"),
    "russian": _lazy(".snowball_ru", "russian_stem"),
    "french": _lazy(".snowball_fr", "french_stem"),
    "italian": _lazy(".snowball_romance", "italian_stem"),
    "portuguese": _lazy(".snowball_romance", "portuguese_stem"),
    "catalan": _lazy(".snowball_romance", "catalan_stem"),
    "romanian": _lazy(".snowball_romance", "romanian_stem"),
    "lithuanian": _lazy(".snowball_balt", "lithuanian_stem"),
    "estonian": _lazy(".snowball_balt", "estonian_stem"),
    "finnish": _lazy(".snowball_fi_hu", "finnish_stem"),
    "hungarian": _lazy(".snowball_fi_hu", "hungarian_stem"),
    "turkish": _lazy(".snowball_misc", "turkish_stem"),
    "arabic": _lazy(".snowball_misc", "arabic_stem"),
    "armenian": _lazy(".snowball_misc", "armenian_stem"),
    "basque": _lazy(".snowball_misc", "basque_stem"),
    "irish": _lazy(".snowball_misc", "irish_stem"),
    "lovins": _lazy(".snowball_misc", "lovins_stem"),
}
