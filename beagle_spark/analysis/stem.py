"""Snowball-compatible stemming.

The reference uses Lucene's Snowball programs for 26 languages
(reference: src/beagle/text_analysis.clj:15-49). This container has no
Snowball bindings, so:

- `english` / `porter` use a faithful pure-Python implementation of the
  public-domain Porter algorithm (Porter, "An algorithm for suffix
  stripping", 1980) — the same algorithm as Lucene's PorterStemmer.
- If the optional `snowballstemmer` / `Stemmer` (PyStemmer) package is
  present at runtime (e.g. on a real cluster with a fuller image), all 26
  languages dispatch to it.
- Otherwise non-English languages fall back to identity with a one-time
  warning: documented deviation, gated so the code path is correct when
  the dependency is available.

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
    "french": "french", "german": "german", "german2": "german",
    "hungarian": "hungarian", "irish": "irish", "italian": "italian",
    "kp": "dutch", "lithuanian": "lithuanian", "lovins": "english",
    "norwegian": "norwegian", "porter": "porter", "portuguese": "portuguese",
    "romanian": "romanian", "russian": "russian", "spanish": "spanish",
    "swedish": "swedish", "turkish": "turkish",
}


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
    if lang in ("english", "porter", "lovins"):
        return porter_stem
    if lang not in _warned:
        _warned.add(lang)
        warnings.warn(
            f"No Snowball implementation available for {lang!r}; "
            "stemming is identity for this language in this environment."
        )
    return lambda w: w
