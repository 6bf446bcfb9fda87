"""Snowball Lithuanian and Estonian stemmers, pure Python.

Follows the published Snowball programs' structure (R1-conditioned
longest-match removal of nominal case endings, then verb endings) for
the reference's `:lithuanian` and `:estonian` stemmers (reference:
src/beagle/text_analysis.clj:36,27; behavior pinned by
test/beagle/phrases_test.clj:198-242 — Kaunas/Kauno and
Sabonis/Saboniai collapse under :lithuanian; :estonian must NOT strip
the English plural of "dogs"). Suffix tables reconstructed from the
languages' declension systems; faithful in shape (documented
deviation for rare forms).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Lithuanian
# ---------------------------------------------------------------------------
_LT_VOWELS = frozenset("aeiyouąęėįųū")

# Nominal case endings across declensions (longest first), then verb
# endings. The R1 condition keeps short roots intact.
_LT_NOMINAL = sorted(
    [
        # locatives / plurals (longest)
        "iuose", "uose", "iose", "ose", "ėse", "yse", "uyse",
        "iomis", "omis", "ėmis", "imis", "umis", "iams", "ams", "oms",
        "ioms", "ėms", "ims", "ums", "iais", "ais", "iai",
        "yje", "ioje", "oje", "ėje", "uje", "ije",
        # genitive/dative/instrumental/accusative singular & plural
        "iaus", "aus", "iui", "ui", "ių", "ų", "io", "o", "ios", "os",
        "ės", "ies", "ers",
        "ias", "as", "is", "ys", "ia", "a", "ė", "ius", "us", "iu", "u",
        "ią", "ą", "ię", "ę", "į", "ei", "ai", "ie", "i", "e", "y",
    ],
    key=len,
    reverse=True,
)
_LT_VERB = sorted(
    [
        "iavo", "avo", "ojo", "ėjo", "uoja", "uoji", "iame", "iate",
        "ame", "ate", "ome", "ote", "ėme", "ėte", "ime", "ite",
        "iau", "jau", "au", "ei", "ti", "ta", "o", "ė", "a", "i",
        "damas", "dama", "dami", "damos", "antis", "anti", "intis",
    ],
    key=len,
    reverse=True,
)


def _lt_r1(w: str) -> int:
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _LT_VOWELS and w[i - 1] in _LT_VOWELS:
            r1 = i + 1
            break
    return r1


def lithuanian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    r1 = _lt_r1(w)

    for suf in _LT_NOMINAL:
        if w.endswith(suf) and len(w) - len(suf) >= max(r1, 3):
            w = w[: -len(suf)]
            break
    else:
        for suf in _LT_VERB:
            if w.endswith(suf) and len(w) - len(suf) >= max(r1, 3):
                w = w[: -len(suf)]
                break

    # palatalization fixes (č/dž arise before dropped front endings)
    if w.endswith("č"):
        w = w[:-1] + "t"
    elif w.endswith("dž"):
        w = w[:-2] + "d"
    return w


# ---------------------------------------------------------------------------
# Estonian
# ---------------------------------------------------------------------------
_ET_VOWELS = frozenset("aeiouõäöü")

# Case endings attach to the vowel-final genitive stem, so removal
# requires a preceding vowel — this is also what keeps English words
# like "dogs" un-stemmed (the reference's pinned behavior).
_ET_CASES = sorted(
    ["sse", "ga", "ta", "le", "lt", "st", "ni", "na", "ks", "s", "l"],
    key=len,
    reverse=True,
)
_ET_PLURAL = ("sid", "de", "te", "id", "d")


def estonian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w

    def vowel_before(i: int) -> bool:
        return i >= 1 and w[i - 1] in _ET_VOWELS

    # case ending (singular or after plural marker)
    for suf in _ET_CASES:
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= 3 and vowel_before(i):
            w = w[:i]
            break

    # plural marker
    for suf in _ET_PLURAL:
        i = len(w) - len(suf)
        if w.endswith(suf) and i >= 3 and w[i - 1] in _ET_VOWELS:
            w = w[:i]
            break

    return w
