"""Snowball Finnish and Hungarian stemmers, pure Python.

Finnish is implemented from the published algorithm specification
(snowballstem.org/algorithms/finnish/stemmer.html) — the program
Lucene runs for the reference's `:finnish` stemmer (reference:
src/beagle/text_analysis.clj:29). Hungarian follows the published
program's structure (R1 case/possessive/plural removal with
á->a / é->e normalization); suffix tables reconstructed from the spec
(documented deviation for rare forms).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------
_FI_VOWELS = frozenset("aeiouyäö")
_FI_LV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def _fi_regions(w: str) -> tuple[int, int]:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _FI_VOWELS and w[i - 1] in _FI_VOWELS:
            r1 = i + 1
            break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _FI_VOWELS and w[i - 1] in _FI_VOWELS:
            r2 = i + 1
            break
    return r1, r2


_FI_PARTICLES = sorted(
    ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä"],
    key=len,
    reverse=True,
)
_FI_CASES_PLAIN = sorted(
    [
        "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
        "na", "nä", "ksi", "ine", "ta", "tä",
    ],
    key=len,
    reverse=True,
)
_FI_ILLATIVE = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hän": "ä", "hön": "ö"}


def finnish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1, r2 = _fi_regions(w)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    # Step 1: particles
    for suf in _FI_PARTICLES:
        i = len(w) - len(suf)
        if w.endswith(suf) and in_r1(i) and i >= 1 and w[i - 1] in "ntaeiouyäö":
            w = w[:i]
            break
    else:
        if w.endswith("sti") and in_r2(len(w) - 3):
            w = w[:-3]

    # Step 2: possessives
    if w.endswith("si") and in_r1(len(w) - 2):
        if len(w) < 3 or w[-3] != "k":
            w = w[:-2]
    elif w.endswith("ni") and in_r1(len(w) - 2):
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif w.endswith(("nsa", "nsä", "mme", "nne")) and in_r1(len(w) - 3):
        w = w[:-3]
    elif w.endswith("an") and in_r1(len(w) - 2):
        base = w[:-2]
        if base.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
            w = base
    elif w.endswith("än") and in_r1(len(w) - 2):
        base = w[:-2]
        if base.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
            w = base
    elif w.endswith("en") and in_r1(len(w) - 2):
        base = w[:-2]
        if base.endswith(("lle", "ine")):
            w = base

    # Step 3: cases
    step3_removed = False
    for suf, v in _FI_ILLATIVE.items():
        i = len(w) - len(suf)
        if w.endswith(suf) and in_r1(i) and i >= 1 and w[i - 1] == v:
            w = w[:i]
            step3_removed = True
            break
    if not step3_removed:
        if w.endswith(("siin", "tten", "den")):
            suf = next(s for s in ("siin", "tten", "den") if w.endswith(s))
            i = len(w) - len(suf)
            if in_r1(i) and i >= 2 and w[i - 1] == "i" and w[i - 2] in _FI_VOWELS:
                w = w[:i]
                step3_removed = True
        elif w.endswith("seen"):
            i = len(w) - 4
            if in_r1(i) and i >= 2 and w[i - 2 : i] in _FI_LV:
                w = w[:i]
                step3_removed = True
        elif w.endswith(("tta", "ttä")):
            i = len(w) - 3
            if in_r1(i) and i >= 1 and w[i - 1] == "e":
                w = w[:i]
                step3_removed = True
        else:
            for suf in _FI_CASES_PLAIN:
                i = len(w) - len(suf)
                if w.endswith(suf) and in_r1(i):
                    w = w[:i]
                    step3_removed = True
                    break
            else:
                if w.endswith(("a", "ä")) and in_r1(len(w) - 1):
                    i = len(w) - 1
                    if i >= 2 and w[i - 1] in _FI_VOWELS and w[i - 2] not in _FI_VOWELS:
                        w = w[:i]
                        step3_removed = True
                elif w.endswith("n") and in_r1(len(w) - 1):
                    w = w[:-1]
                    step3_removed = True
                    if w[-2:] in _FI_LV or w.endswith("ie"):
                        w = w[:-1]

    # Step 4: comparatives etc. in R2
    if w.endswith(("impi", "impa", "impä", "immi", "imma", "immä")):
        if in_r2(len(w) - 4):
            w = w[:-4]
    elif w.endswith(("mpi", "mpa", "mpä", "mmi", "mma", "mmä")):
        i = len(w) - 3
        if in_r2(i) and not w[:i].endswith("po"):
            w = w[:i]
    elif w.endswith(("eja", "ejä")) and in_r2(len(w) - 3):
        w = w[:-3]

    # Step 5: plurals
    if step3_removed:
        if w and w[-1] in "ij" and in_r1(len(w) - 1):
            w = w[:-1]
    else:
        if w.endswith("t") and in_r1(len(w) - 1) and len(w) >= 2 and w[-2] in _FI_VOWELS:
            w = w[:-1]
            if w.endswith("imma") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("mma") and in_r2(len(w) - 3) and not w[:-3].endswith("po"):
                w = w[:-3]

    # Step 6: tidy
    if len(w) >= 2 and w[-2:] in _FI_LV and in_r1(len(w) - 1):
        w = w[:-1]
    if (
        len(w) >= 2
        and w[-1] in "aäei"
        and w[-2] not in _FI_VOWELS
        and in_r1(len(w) - 1)
    ):
        w = w[:-1]
    if w.endswith(("oj", "uj")):
        w = w[:-1]
    if w.endswith("jo"):
        w = w[:-1]
    # undouble final consonant before trailing vowels
    m = len(w)
    i = m
    while i > 0 and w[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and w[i - 1] == w[i - 2] and w[i - 1] not in _FI_VOWELS:
        w = w[: i - 1] + w[i:]
    return w


# ---------------------------------------------------------------------------
# Hungarian
# ---------------------------------------------------------------------------
_HU_VOWELS = frozenset("aeiouöüáéíóőúű")
_HU_DIGRAPHS = ("cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs", "dzs")

_HU_CASES = sorted(
    [
        "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
        "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
        "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
        "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
        "anként", "ként", "en", "on", "an", "ön", "n", "t",
    ],
    key=len,
    reverse=True,
)
_HU_POSSESSIVES = sorted(
    [
        "ánk", "énk", "unk", "ünk", "nk", "juk", "jük", "uk", "ük",
        "ájuk", "éjük", "ám", "ém", "om", "em", "öm", "m", "ád", "éd",
        "od", "ed", "öd", "d", "ája", "éje", "ja", "je", "a", "e", "o",
        "á", "é",
    ],
    key=len,
    reverse=True,
)
_HU_PLURALS = sorted(["ák", "ék", "ök", "ok", "ek", "ak", "k"], key=len, reverse=True)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant (digraphs count as one)
        i = 1
        while i < n:
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return i + len(d)
                return i + 1
            i += 1
        return n
    # starts with consonant: after the first vowel
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_unaccent_last(w: str) -> str:
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


def hungarian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _hu_r1(w)

    # case endings
    for suf in _HU_CASES:
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1 and i >= 2:
            w = w[:i]
            w = _hu_unaccent_last(w)
            break

    # possessives
    for suf in _HU_POSSESSIVES:
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1 and i >= 3:
            w = w[:i]
            w = _hu_unaccent_last(w)
            break

    # plural
    for suf in _HU_PLURALS:
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1 and i >= 2:
            w = w[:i]
            w = _hu_unaccent_last(w)
            break
    return w
