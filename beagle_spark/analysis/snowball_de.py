"""Snowball German stemmer, pure Python.

Implemented from the published algorithm specification
(snowballstem.org/algorithms/german/stemmer.html) — the same program
Lucene runs for the reference's `:german` stemmer
(reference: src/beagle/text_analysis.clj:25). `german2` differs only in
also treating `ae/oe/ue` as umlauts; both variants are provided.

Spec summary:
- ß -> ss; u/y between vowels marked as consonants (U/Y).
- R1/R2 standard regions, with R1 adjusted to start no earlier than
  position 3.
- Step 1: {em, ern, er} | {e, en, es} (+"niss" s-drop) | s after valid
  s-ending — delete in R1.
- Step 2: {est, en, er} | st after valid st-ending (stem >= 3 chars) —
  delete in R1.
- Step 3 (d-suffixes): end/ung, ig/ik/isch, lich/heit, keit with their
  chained deletions in R2.
- Unmark U/Y, strip umlauts a"/o"/u".
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _prelude(word: str, german2: bool) -> str:
    w = word.replace("ß", "ss")
    if german2:
        # german2: ae/oe/ue -> umlauts (except after q: "que" stays)
        out = []
        i = 0
        while i < len(w):
            two = w[i : i + 2]
            if two in ("ae", "oe") :
                out.append({"ae": "ä", "oe": "ö"}[two])
                i += 2
            elif two == "ue" and i > 0 and w[i - 1] not in "qQ" and w[i - 1] in "aeiouyäöü":
                # ue after a vowel stays (e.g. 'feuer'); spec: ue -> ü
                out.append("ue")
                i += 2
            elif two == "ue" and i > 0 and w[i - 1] not in "qQ":
                out.append("ü")
                i += 2
            else:
                out.append(w[i])
                i += 1
        w = "".join(out)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        if chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _regions(w: str) -> tuple[int, int]:
    def first_nonvowel_after_vowel(start: int) -> int:
        # marked U/Y are consonants here (uppercase, so not in _VOWELS)
        for i in range(start + 1, len(w)):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                return i + 1
        return len(w)

    r1 = first_nonvowel_after_vowel(0)
    r2 = first_nonvowel_after_vowel(r1 - 1) if r1 < len(w) else len(w)
    # spec: R1 starts no earlier than position 3
    if r1 < 3:
        r1 = 3
    return r1, r2


def _stem(word: str, german2: bool) -> str:
    w = _prelude(word.lower(), german2)
    r1, r2 = _regions(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # Step 1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and in_r1(len(w) - 1)
                and len(w) >= 2
                and w[-2] in _S_ENDING
            ):
                w = w[:-1]

    # Step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6  # st preceded by valid st-ending with >= 3 before it
            and w[-3] in _ST_ENDING
        ):
            w = w[:-2]

    # Step 3: d-suffixes
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if (
                w.endswith("ig")
                and in_r2(len(w) - 2)
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
    elif w.endswith(("isch", "ik", "ig")):
        suf = "isch" if w.endswith("isch") else w[-2:]
        if in_r2(len(w) - len(suf)) and (len(w) < len(suf) + 1 or w[-len(suf) - 1] != "e"):
            w = w[: -len(suf)]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            for suf in ("er", "en"):
                if w.endswith(suf) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # Finally
    w = w.replace("U", "u").replace("Y", "y")
    return w.translate(str.maketrans({"ä": "a", "ö": "o", "ü": "u"}))


def german_stem(word: str) -> str:
    return _stem(word, german2=False)


def german2_stem(word: str) -> str:
    return _stem(word, german2=True)
