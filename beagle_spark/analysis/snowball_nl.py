"""Snowball Dutch stemmer, pure Python.

Implemented from the published algorithm specification
(snowballstem.org/algorithms/dutch/stemmer.html) — the same program
Lucene runs for the reference's `:dutch` stemmer
(reference: src/beagle/text_analysis.clj:26). The reference's `:kp`
(Kraaij-Pohlmann) is a different Dutch stemmer; here it dispatches to
this implementation (documented deviation — both collapse Dutch
inflection families, which is what dictionary matching needs).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")

_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(w: str) -> str:
    w = w.translate(_ACCENTS)
    chars = list(w)
    n = len(chars)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, n):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and chars[i - 1] in _VOWELS
            and i + 1 < n
            and chars[i + 1] in _VOWELS
        ):
            chars[i] = "I"
    return "".join(chars)


def _regions(w: str) -> tuple[int, int]:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3)
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w
    r1, r2 = _regions(w)
    e_removed = False

    # Step 1
    if w.endswith("heden") and len(w) - 5 >= r1:
        w = w[:-5] + "heid"
    elif w.endswith(("ene", "en")):
        suf = "ene" if w.endswith("ene") else "en"
        stem = w[: -len(suf)]
        if (
            len(w) - len(suf) >= r1
            and stem
            and stem[-1] not in _VOWELS
            and not stem.endswith("gem")
        ):
            w = _undouble(stem)
    elif w.endswith(("se", "s")):
        suf = "se" if w.endswith("se") else "s"
        stem = w[: -len(suf)]
        if len(w) - len(suf) >= r1 and stem and stem[-1] not in _VOWELS and stem[-1] != "j":
            w = stem

    # Step 2
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _VOWELS:
        w = _undouble(w[:-1])
        e_removed = True

    # Step 3a
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            stem = w[:-2]
            if (
                len(w) - 2 >= r1
                and stem
                and stem[-1] not in _VOWELS
                and not stem.endswith("gem")
            ):
                w = _undouble(stem)

    # Step 3b: d-suffixes
    if w.endswith(("end", "ing")):
        if len(w) - 3 >= r2:
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("ig"):
        if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if len(w) - 4 >= r2:
            w = w[:-4]
            # repeat step 2
            if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _VOWELS:
                w = _undouble(w[:-1])
    elif w.endswith("baar"):
        if len(w) - 4 >= r2:
            w = w[:-4]
    elif w.endswith("bar"):
        if len(w) - 3 >= r2 and e_removed:
            w = w[:-3]

    # Step 4: undouble vowel  (CVVc -> CVc, VV in aa/ee/oo/uu)
    if (
        len(w) >= 4
        and w[-1] not in _VOWELS
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _VOWELS
    ):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# Kraaij-Pohlmann dispatches here (see module docstring).
kp_stem = dutch_stem
