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
# Hungarian — published Snowball program structure
# (snowballstem.org/algorithms/hungarian/stemmer.html): R1 with the
# word-initial-vowel/digraph rule, then the nine steps in program
# order: instrumental (with consonant undoubling), frequent cases with
# á->a/é->e restoration, special cases, 'stul' cases, factive (with
# undoubling), owned, singular-owner, plural-owner, plural.
# ---------------------------------------------------------------------------
_HU_VOWELS = frozenset("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

# double consonants (digraph doubles spelled with the first letter
# repeated: ccs = cs+cs etc.); undoubling removes the repeated letter
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)

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

# suffix -> replacement ('' = delete, 'a'/'e' = accent restoration)
_HU_CASE_SPECIAL = (("ánként", "a"), ("én", "e"), ("án", "a"))
_HU_CASE_OTHER = (
    ("ástul", "a"), ("éstül", "e"),
    ("astul", ""), ("estül", ""), ("stul", ""), ("stül", ""),
)
_HU_OWNED = (
    ("áké", "a"), ("éké", "e"), ("ájé", "a"), ("éjé", "e"),
    ("aké", ""), ("eké", ""), ("oké", ""), ("öké", ""), ("jé", ""),
    ("ké", ""), ("éé", "e"), ("é", ""),
)
_HU_SING_OWNER = (
    ("ánk", "a"), ("énk", "e"), ("unk", ""), ("ünk", ""), ("nk", ""),
    ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""),
    ("uk", ""), ("ük", ""),
    ("ám", "a"), ("ém", "e"), ("am", ""), ("em", ""), ("om", ""), ("m", ""),
    ("ád", "a"), ("éd", "e"), ("ad", ""), ("ed", ""), ("od", ""),
    ("öd", ""), ("d", ""),
    ("ája", "a"), ("éje", "e"), ("ja", ""), ("je", ""),
    ("a", ""), ("e", ""), ("o", ""), ("á", "a"), ("é", "e"),
)
_HU_PLUR_OWNER = (
    ("jaitok", ""), ("jeitek", ""), ("áitok", "a"), ("éitek", "e"),
    ("aitok", ""), ("eitek", ""), ("itek", ""),
    ("jaink", ""), ("jeink", ""), ("áink", "a"), ("éink", "e"),
    ("aink", ""), ("eink", ""), ("ink", ""),
    ("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
    ("aim", ""), ("eim", ""), ("im", ""),
    ("jaid", ""), ("jeid", ""), ("áid", "a"), ("éid", "e"),
    ("aid", ""), ("eid", ""), ("id", ""),
    ("jaik", ""), ("jeik", ""), ("áik", "a"), ("éik", "e"),
    ("aik", ""), ("eik", ""), ("ik", ""),
    ("jai", ""), ("jei", ""), ("ái", "a"), ("éi", "e"),
    ("ai", ""), ("ei", ""), ("i", ""),
)
_HU_PLURAL = (
    ("ák", "a"), ("ék", "e"),
    ("ök", ""), ("ok", ""), ("ek", ""), ("ak", ""), ("k", ""),
)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant (a digraph counts as one consonant)
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


def _hu_apply(w: str, r1: int, table) -> tuple[str, bool]:
    """Longest-match removal/replacement from a (suffix, repl) table,
    conditioned on the match point lying in R1."""
    for suf, repl in sorted(table, key=lambda t: len(t[0]), reverse=True):
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1:
            return w[:i] + repl, True
    return w, False


def _hu_undouble(w: str) -> str:
    for d in _HU_DOUBLES:
        if w.endswith(d):
            # drop the repeated first letter: 'bb'->'b', 'ccs'->'cs'
            return w[: len(w) - len(d)] + d[1:]
    return w


def _hu_v_ending(w: str, r1: int) -> str:
    if w.endswith("á") and len(w) - 1 >= r1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= r1:
        return w[:-1] + "e"
    return w


def hungarian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _hu_r1(w)

    # 1. instrumental case: -al/-el after a double consonant; undouble
    for suf in ("al", "el"):
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1 and any(
            w[:i].endswith(d) for d in _HU_DOUBLES
        ):
            w = _hu_undouble(w[:i])
            break

    # 2. frequent cases, then á/é restoration
    w2, hit = _hu_apply(w, r1, [(s, "") for s in _HU_CASES])
    if hit:
        w = _hu_v_ending(w2, r1)
    else:
        # 3./4. special and 'stul' cases
        for table in (_HU_CASE_SPECIAL, _HU_CASE_OTHER):
            w2, hit = _hu_apply(w, r1, table)
            if hit:
                w = w2
                break

    # 5. factive case: -á/-é after a double consonant; undouble
    for suf in ("á", "é"):
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= r1 and any(
            w[:i].endswith(d) for d in _HU_DOUBLES
        ):
            w = _hu_undouble(w[:i])
            break

    # 6. owned  7. singular owner  8. plural owner  9. plural
    w, _ = _hu_apply(w, r1, _HU_OWNED)
    w, _ = _hu_apply(w, r1, _HU_SING_OWNER)
    w, _ = _hu_apply(w, r1, _HU_PLUR_OWNER)
    w, _ = _hu_apply(w, r1, _HU_PLURAL)
    return w
