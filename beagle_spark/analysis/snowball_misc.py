"""Snowball Turkish / Arabic / Armenian / Basque / Irish stemmers and
the Lovins stemmer, pure Python.

These follow the published programs' structure for the reference's
`:turkish`, `:arabic`, `:armenian`, `:basque`, `:irish`, `:lovins`
stemmers (reference: src/beagle/text_analysis.clj:20-46):

- turkish: iterated nominal-suffix stripping with vowel-harmony checks
  and final-consonant devoicing (Çilden's algorithm as published for
  Snowball).
- arabic: normalization (hamza forms, ta marbuta), definite-article /
  conjunction prefix removal, pronoun & feminine suffix removal.
- armenian: case/plural/verb ending removal conditioned on a minimum
  stem (the published program's shape).
- basque: case-ending removal over R1/R2 machinery.
- irish: initial-mutation (eclipsis/lenition prefix) handling plus
  derivational suffix removal in R1/R2.
- lovins: the classic Lovins 1968 longest-match design with the
  high-frequency ending subset and the standard undouble/recode pass.

Suffix tables are reconstructed from the published specs; faithful in
shape, with individual rare forms possibly differing (documented
deviation). Each collapses the inflection families dictionary
matching needs.
"""

from __future__ import annotations

from .snowball_rt import (
    BackwardWord,
    make_regions_spanish,
    repeat_b,
    run_among_b,
)
from .snowball_tables import (
    EU_ADJ,
    EU_NOUN,
    EU_VERB,
    GA_DERIV,
    HY_ADJ,
    HY_ENDING,
    HY_NOUN,
    HY_VERB,
    GA_INIT,
    GA_NOUN,
    GA_VERB,
)

# ---------------------------------------------------------------------------
# Turkish — Çilden's algorithm as published for Snowball
# (snowballstem.org/algorithms/turkish/stemmer.html): multi-syllable
# guard, nominal-verb suffix chain then noun-suffix loop, suffix
# templates with two-dimensional vowel harmony (A-type frontness,
# I-type frontness+roundedness) validated at the stem boundary,
# buffer-consonant (y) allowed only after a vowel, and final-consonant
# devoicing reversal (b/c/d/ğ -> p/ç/t/k).
# ---------------------------------------------------------------------------
_TR_VOWELS = frozenset("aeıioöuü")

# template metachars: A -> a/e (frontness harmony); I -> ı/i/u/ü (full
# harmony); D -> d/t; parenthesized leading letter = optional buffer
# consonant, valid only after a vowel
_TR_HARMONY_PREV = {
    "a": "aıou", "e": "eiöü",           # A-type: frontness only
    "ı": "aı", "i": "ei", "u": "ou", "ü": "öü",  # I-type: + roundedness
}


def _tr_expand(template: str):
    """Expand a suffix template into (concrete_suffix, optional_buffer)
    pairs, keeping only internally-harmonic expansions."""
    buffer = ""
    if template.startswith("("):
        buffer, template = template[1], template[3:]
    forms = [""]
    for ch in template:
        if ch == "A":
            forms = [f + v for f in forms for v in "ae"]
        elif ch == "I":
            forms = [f + v for f in forms for v in "ıiuü"]
        elif ch == "D":
            forms = [f + c for f in forms for c in "dt"]
        else:
            forms = [f + ch for f in forms]

    def harmonic(s: str) -> bool:
        vs = [c for c in s if c in _TR_VOWELS]
        return all(
            vs[i] in _TR_HARMONY_PREV and vs[i - 1] in _TR_HARMONY_PREV[vs[i]]
            for i in range(1, len(vs))
        )

    return [(f, buffer) for f in forms if harmonic(f)]


def _tr_concrete(templates):
    out = []
    for t in templates:
        for form, buf in _tr_expand(t):
            out.append((form, None))
            if buf:
                out.append((buf + form, buf))
    # longest first so e.g. 'lArI' wins over 'I'
    return sorted(set(out), key=lambda p: len(p[0]), reverse=True)


# nominal verb suffixes (stemmed first, per the published ordering;
# they stack at the absolute word end: -mIş-sInIz etc.)
_TR_NOMVERB = _tr_concrete([
    "cAsInA", "sInIz", "(y)mIş", "(y)ken",
    "(y)DI", "(y)sA", "(y)Iz", "(y)Im", "sIn", "DIr", "nIz",
])
# noun suffixes in morphotactic phases: a Turkish noun is
# stem+plural+possessive+case(+ki), so stripping right-to-left applies
# each phase AT MOST ONCE — an unrestricted loop overstems (e.g. it
# would take arabaya -> araba -> arab via a second bare-vowel pass)
_TR_KI = _tr_concrete(["ki"])
_TR_CASE = _tr_concrete([
    "(n)DA", "(n)DAn", "(y)A", "(y)I", "(n)In", "(y)lA", "(n)cA",
])
_TR_POSS = _tr_concrete(["lArI", "ImIz", "InIz", "Im", "In", "(s)I"])
_TR_PLURAL = _tr_concrete(["lAr"])


def _tr_last_vowel(s: str):
    for c in reversed(s):
        if c in _TR_VOWELS:
            return c
    return None


def _tr_strip(w: str, table) -> tuple[str, bool]:
    for suf, buf in table:
        if not w.endswith(suf):
            continue
        stem = w[: -len(suf)]
        if len(stem) < 2 or not any(c in _TR_VOWELS for c in stem):
            continue
        # buffer consonant (y/n/s) only follows a vowel-final stem
        if buf and (not stem or stem[-1] not in _TR_VOWELS):
            continue
        # boundary vowel harmony: first suffix vowel vs last stem vowel
        sv = next((c for c in suf if c in _TR_VOWELS), None)
        pv = _tr_last_vowel(stem)
        if sv and pv and sv in _TR_HARMONY_PREV and pv not in _TR_HARMONY_PREV[sv]:
            continue
        return stem, True
    return w, False


def turkish_stem(word: str) -> str:
    w = word.lower()
    # only words of more than one syllable are stemmed
    if sum(1 for c in w if c in _TR_VOWELS) < 2:
        return w

    # 1. nominal verb suffix chain (they stack; bounded loop)
    for _ in range(3):
        w, changed = _tr_strip(w, _TR_NOMVERB)
        if not changed:
            break

    # 2. noun suffixes, one pass per morphotactic phase
    w, ki = _tr_strip(w, _TR_KI)
    w, _ = _tr_strip(w, _TR_CASE)
    if ki:  # evdeki: ki follows a case suffix -> one more case pass
        w, _ = _tr_strip(w, _TR_CASE)
    w, _ = _tr_strip(w, _TR_POSS)
    w, _ = _tr_strip(w, _TR_PLURAL)

    # 3. final devoicing reversal (b/c/d/ğ arise before vowel suffixes)
    if w and w[-1] in "bcdğ":
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[w[-1]]
    return w


# ---------------------------------------------------------------------------
# Arabic
# ---------------------------------------------------------------------------
_AR_PREFIXES = ("وال", "بال", "كال", "فال", "لل", "ال", "و")
_AR_SUFFIXES = sorted(
    ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "هم", "هن", "كم", "كن",
     "نا", "تم", "تن", "ه", "ي", "ا", "ة"],
    key=len,
    reverse=True,
)
_AR_NORM = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ى": "ي", "ئ": "ي", "ؤ": "و"})


def arabic_stem(word: str) -> str:
    w = word.translate(_AR_NORM)
    # strip diacritics (harakat)
    w = "".join(c for c in w if not ("ً" <= c <= "ْ"))
    for pre in _AR_PREFIXES:
        if w.startswith(pre) and len(w) - len(pre) >= 3:
            w = w[len(pre):]
            break
    for suf in _AR_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Armenian — the published Snowball program (armenian.sbl):
# pV = after first vowel, p2 standard; backward-mode `do ending  do
# verb  do adjective  do noun`, all branches RV-gated deletes over the
# exact tables (snowball_tables.py).
# ---------------------------------------------------------------------------
_HY_VOWELS = frozenset("աեէըիոօւ")
_HY_R2_ACT = {1: ("R2", "")}
_HY_DEL_ACT = {1: (None, "")}


def _hy_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def is_v(i):
        return w[i] in _HY_VOWELS

    pV = p2 = n
    i = 0
    while i < n and not is_v(i):
        i += 1
    if i < n:
        pV = i + 1
        i += 1
        while i < n and is_v(i):
            i += 1
        if i < n:  # gopast non-v
            i += 1
            while i < n and not is_v(i):
                i += 1
            if i < n:  # gopast v
                i += 1
                while i < n and is_v(i):
                    i += 1
                if i < n:  # gopast non-v
                    p2 = i + 1
    return pV, p2


def armenian_stem(word: str) -> str:
    w = word.lower()
    pV, p2 = _hy_regions(w)
    bw = BackwardWord(w, pV, 0, p2)
    run_among_b(bw, HY_ENDING, _HY_R2_ACT, setlimit="RV")
    run_among_b(bw, HY_VERB, _HY_DEL_ACT, setlimit="RV")
    run_among_b(bw, HY_ADJ, _HY_DEL_ACT, setlimit="RV")
    run_among_b(bw, HY_NOUN, _HY_DEL_ACT, setlimit="RV")
    return bw.s


# ---------------------------------------------------------------------------
# Basque — the published Snowball program (basque.sbl): spanish-style
# pV/p1/p2 regions, then backward-mode `repeat aditzak  repeat izenak
# do adjetiboak` with a persistent cursor (stripping is strictly
# nested: after a match, later matching continues on the remaining
# left part only). Tables transcribed exactly (snowball_tables.py).
# ---------------------------------------------------------------------------
_EU_VOWELS = frozenset("aeiou")
_eu_regions = make_regions_spanish(_EU_VOWELS)

# action branches per result code: (region gate, replacement)
_EU_VERB_ACT = {
    1: ("RV", ""), 2: ("R2", ""), 3: (None, "atseden"),
    4: (None, "arabera"), 5: (None, "baditu"),
}
_EU_NOUN_ACT = {
    1: ("RV", ""), 2: ("R2", ""), 3: (None, "jok"), 4: ("R1", ""),
    5: (None, "tra"), 6: (None, "minutu"), 7: (None, "zehar"),
    8: (None, "geldi"), 9: (None, "igaro"), 10: ("RV", "aur"),
}
_EU_ADJ_ACT = {1: ("RV", ""), 2: (None, "z")}


def basque_stem(word: str) -> str:
    w = word.lower()
    pV, p1, p2 = _eu_regions(w)
    bw = BackwardWord(w, pV, p1, p2)
    repeat_b(bw, EU_VERB, _EU_VERB_ACT)
    repeat_b(bw, EU_NOUN, _EU_NOUN_ACT)
    run_among_b(bw, EU_ADJ, _EU_ADJ_ACT)
    return bw.s


# ---------------------------------------------------------------------------
# Irish — the published Snowball program (irish.sbl): forward-mode
# initial_morph rewrites eclipsis/lenition/prevocalic prefixes, then
# backward-mode noun_sfx / deriv / verb_sfx once each over exact
# tables (snowball_tables.py). pV = after first vowel; p1/p2 standard.
# ---------------------------------------------------------------------------
_GA_VOWELS = frozenset("aeiouáéíóú")

# initial_morph replacements per result code (prefix -> replacement)
_GA_INIT_ACT = {
    1: "", 2: "f", 3: "s", 4: "b", 5: "c",
    6: "d", 7: "g", 8: "p", 9: "t", 10: "m",
}
_GA_NOUN_ACT = {
    1: ("R2", ""), 2: (None, "arc"), 3: (None, "gin"),
    4: (None, "graf"), 5: (None, "paite"), 6: (None, "óid"),
}
_GA_DERIV_ACT = {1: ("R1", ""), 2: ("R2", "")}
_GA_VERB_ACT = {1: ("RV", ""), 2: ("R1", "")}


def _ga_regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def is_v(i):
        return w[i] in _GA_VOWELS

    pV = n
    for i in range(n):
        if is_v(i):
            pV = i + 1
            break

    def after_vc(start):
        for i in range(start + 1, n):
            if not is_v(i) and is_v(i - 1):
                return i + 1
        return n

    p1 = after_vc(0)
    p2 = after_vc(p1 - 1) if p1 < n else n
    return pV, p1, p2


def _ga_longest_prefix(w: str):
    lens, by_len = GA_INIT
    for ln in lens:
        if ln <= len(w):
            res = by_len[ln].get(w[:ln])
            if res is not None:
                return w[:ln], res
    return None


def irish_stem(word: str) -> str:
    w = word.lower()
    m = _ga_longest_prefix(w)
    if m is not None:
        pre, res = m
        w = _GA_INIT_ACT[res] + w[len(pre):]
    pV, p1, p2 = _ga_regions(w)
    bw = BackwardWord(w, pV, p1, p2)
    run_among_b(bw, GA_NOUN, _GA_NOUN_ACT)
    run_among_b(bw, GA_DERIV, _GA_DERIV_ACT)
    run_among_b(bw, GA_VERB, _GA_VERB_ACT)
    return bw.s


# ---------------------------------------------------------------------------
# Lovins (1968)
# ---------------------------------------------------------------------------
# High-frequency subset of the 294 endings with their conditions; the
# minimum-stem-length-2 rule applies throughout (condition A). The
# full table's rare endings mostly overlap these via longest-match.
_LOVINS_ENDINGS = sorted(
    [
        "alistically", "arizability", "izationally",
        "antialness", "arisations", "arizations", "entialness",
        "allically", "antaneous", "antiality", "arisation", "arization",
        "ationally", "ativeness", "eableness", "entations", "entiality",
        "entialize", "entiation", "ionalness", "istically", "itousness",
        "izability", "izational",
        "ableness", "arizable", "entation", "entially", "eousness",
        "ibleness", "icalness", "ionalism", "ionality", "ionalize",
        "iousness", "izations", "lessness",
        "ability", "aically", "alistic", "alities", "ariness",
        "aristic", "arizing", "ateness", "atingly", "ational", "atively",
        "ativism", "elihood", "encible", "entally", "entials", "entiate",
        "entness", "fulness", "ibility", "icalism", "icalist", "icality",
        "icalize", "ication", "icianry", "ination", "ingness", "ionally",
        "isation", "ishness", "istical", "iteness", "iveness", "ivistic",
        "ivities", "ization", "izement", "oidally", "ousness",
        "aceous", "acious", "action", "alness", "ancial", "ancies",
        "ancing", "ariser", "arized", "arizer", "atable", "ations",
        "atives", "eature", "efully", "encies", "encing", "ential",
        "enting", "entist", "eously", "ialist", "iality", "ialize",
        "ically", "icance", "icians", "icists", "ifully", "ionals",
        "ionate", "ioning", "ionist", "iously", "istics", "izable",
        "lessly", "nesses", "oidism",
        "acies", "acity", "aging", "aical", "alist", "alism", "ality",
        "alize", "allic", "anced", "ances", "antic", "arial", "aries",
        "arily", "arity", "arize", "aroid", "ately", "ating", "ation",
        "ative", "ators", "atory", "ature", "early", "ehood", "eless",
        "elity", "ement", "enced", "ences", "eness", "ening", "ental",
        "ented", "ently", "fully", "ially", "icant", "ician", "icide",
        "icism", "icist", "icity", "idine", "iedly", "ihood", "inate",
        "iness", "ingly", "inism", "inity", "ional", "ioned", "ished",
        "istic", "ities", "itous", "ively", "ivity", "izers", "izing",
        "oidal", "oides", "otide", "ously",
        "able", "ably", "ages", "ally", "ance", "ancy", "ants", "aric",
        "arly", "ated", "ates", "atic", "ator", "ealy", "edly", "eful",
        "eity", "ence", "ency", "ened", "enly", "eous", "hood", "ials",
        "ians", "ible", "ibly", "ical", "ides", "iers", "iful", "ines",
        "ings", "ions", "ious", "isms", "ists", "itic", "ized", "izer",
        "less", "lily", "ness", "ogen", "ward", "wise", "ying", "yish",
        "acy", "age", "aic", "als", "ant", "ars", "ary", "ata", "ate",
        "eal", "ear", "ely", "ene", "ent", "ery", "ese", "ful", "ial",
        "ian", "ics", "ide", "ied", "ier", "ies", "ily", "ine", "ing",
        "ion", "ish", "ism", "ist", "ite", "ity", "ium", "ive", "ize",
        "oid", "one", "ous",
        "ae", "al", "ar", "as", "ed", "en", "es", "ia", "ic", "is",
        "ly", "on", "or", "um", "us", "yl",
        "a", "e", "i", "o", "s", "y",
    ],
    key=len,
    reverse=True,
)
# Recode/transformation rules (rule 1 undouble + the common recodings)
_LOVINS_RECODE = [
    ("iev", "ief"), ("uct", "uc"), ("umpt", "um"), ("rpt", "rb"),
    ("urs", "ur"), ("istr", "ister"), ("metr", "meter"), ("olv", "olut"),
    ("ul", "l"), ("bex", "bic"), ("dex", "dic"), ("pex", "pic"),
    ("tex", "tic"), ("ax", "ac"), ("ex", "ec"), ("ix", "ic"),
    ("lux", "luc"), ("uad", "uas"), ("vad", "vas"), ("cid", "cis"),
    ("lid", "lis"), ("erid", "eris"), ("pand", "pans"), ("end", "ens"),
    ("ond", "ons"), ("lud", "lus"), ("rud", "rus"), ("her", "hes"),
    ("mit", "mis"), ("ent", "ens"), ("ert", "ers"), ("et", "es"),
    ("yt", "ys"), ("yz", "ys"),
]


def lovins_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    for suf in _LOVINS_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            w = w[: -len(suf)]
            break
    # rule 1: undouble a final double consonant (bb dd gg ll mm nn pp rr ss tt)
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] in "bdglmnprst"
    ):
        w = w[:-1]
    for pat, rep in _LOVINS_RECODE:
        if w.endswith(pat):
            w = w[: -len(pat)] + rep
            break
    return w
