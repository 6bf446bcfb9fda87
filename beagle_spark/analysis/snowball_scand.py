"""Snowball Danish / Norwegian / Swedish stemmers, pure Python.

Implemented from the published algorithm specifications
(snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html) —
the same programs Lucene runs for the reference's `:danish`,
`:norwegian`, `:swedish` stemmers
(reference: src/beagle/text_analysis.clj:24,38).

All three share the Scandinavian shape: R1 (adjusted to start no
earlier than position 3), one big a-suffix deletion step with an
s-ending condition, a consonant-cluster trim, and a small d-suffix
step.
"""

from __future__ import annotations

_DA_VOWELS = frozenset("aeiouyæåø")
_NO_VOWELS = frozenset("aeiouyæåø")
_SV_VOWELS = frozenset("aeiouyäåö")


def _r1(w: str, vowels: frozenset) -> int:
    """Start of R1, adjusted so at least 3 chars precede it."""
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, 3)


def _longest_in_r1(w: str, r1: int, suffixes) -> str | None:
    for suf in suffixes:  # pre-sorted longest-first
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            return suf
    return None


_DA_STEP1 = sorted(
    [
        "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
        "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
        "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
        "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret",
    ],
    key=len,
    reverse=True,
)
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP3 = sorted(["ig", "lig", "elig", "els"], key=len, reverse=True)


def _da_step2(w: str, r1: int) -> str:
    # the whole cluster must sit inside R1 (setlimit tomark p1)
    if w[-2:] in ("gd", "dt", "gt", "kt") and len(w) - 2 >= r1:
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _DA_VOWELS)

    # step 1
    suf = _longest_in_r1(w, r1, _DA_STEP1)
    if suf:
        w = w[: -len(suf)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] in _DA_S_ENDING:
        w = w[:-1]

    # step 2
    w = _da_step2(w, r1)

    # step 3
    if w.endswith("igst"):
        w = w[:-2]
    if w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]
    else:
        suf = _longest_in_r1(w, r1, _DA_STEP3)
        if suf:
            w = w[: -len(suf)]
            w = _da_step2(w, r1)

    # step 4: undouble final consonants in R1
    if (
        len(w) >= 2
        and len(w) - 1 >= r1
        and w[-1] == w[-2]
        and w[-1] not in _DA_VOWELS
    ):
        w = w[:-1]
    return w


_NO_STEP1 = sorted(
    [
        "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
        "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
        "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
        "ast",
    ],
    key=len,
    reverse=True,
)
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1_ALL = sorted(_NO_STEP1 + ["erte", "ert", "s"], key=len, reverse=True)
_NO_STEP3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len,
    reverse=True,
)


def norwegian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _NO_VOWELS)

    # step 1: one limit-mode among; 'erte'/'ert' map to 'er', bare 's'
    # needs a valid s-ending (or k after a non-vowel)
    suf = _longest_in_r1(w, r1, _NO_STEP1_ALL)
    if suf in ("erte", "ert"):
        w = w[: -len(suf)] + "er"
    elif suf == "s":
        prev = w[-2] if len(w) >= 2 else ""
        if prev in _NO_S_ENDING or (
            prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)
        ):
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]

    # step 2: dt / vt -> drop t (whole pair inside R1)
    if w[-2:] in ("dt", "vt") and len(w) - 2 >= r1:
        w = w[:-1]

    # step 3
    suf = _longest_in_r1(w, r1, _NO_STEP3)
    if suf:
        w = w[: -len(suf)]
    return w


_SV_STEP1 = sorted(
    [
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
        "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas",
        "es", "ades", "andes", "ens", "arens", "hetens", "erns", "at",
        "andet", "het", "ast",
    ],
    key=len,
    reverse=True,
)
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1_ALL = sorted(_SV_STEP1 + ["s"], key=len, reverse=True)
_SV_STEP2_CLUSTERS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _SV_VOWELS)

    # step 1: limit-mode among incl. the conditioned bare 's'
    suf = _longest_in_r1(w, r1, _SV_STEP1_ALL)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]

    # step 2: drop the final letter of a double cluster inside R1
    if w[-2:] in _SV_STEP2_CLUSTERS and len(w) - 2 >= r1:
        w = w[:-1]

    # step 3: limit-mode among: lig/ig/els delete, löst->lös, fullt->full
    for suf in ("fullt", "löst", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if suf == "fullt":
                w = w[:-1]
            elif suf == "löst":
                w = w[:-1]
            else:
                w = w[: -len(suf)]
            break
    return w
