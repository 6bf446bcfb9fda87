"""Snowball Italian / Portuguese / Catalan / Romanian stemmers, pure
Python.

Italian and Portuguese are implemented from the published algorithm
specifications (snowballstem.org/algorithms/{italian,portuguese}/
stemmer.html) — the programs Lucene runs for the reference's `:italian`
and `:portuguese` stemmers (reference: src/beagle/text_analysis.clj:
35,40). Catalan and Romanian follow the published Snowball programs'
structure (step 0 pronouns / step 1 standard suffixes in R1/R2 / verb
suffixes in RV / residuals) with suffix tables reconstructed from the
specs; they are faithful in shape and collapse the same inflection
families, though individual rare forms may stem differently
(documented deviation).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Shared machinery (Spanish-style RV/R1/R2)
# ---------------------------------------------------------------------------


def _make_regions(vowels: frozenset):
    def regions(w: str) -> tuple[int, int, int]:
        n = len(w)

        def is_v(i):
            return w[i] in vowels

        rv = n
        if n >= 3:
            if not is_v(1):
                for i in range(2, n):
                    if is_v(i):
                        rv = i + 1
                        break
            elif is_v(0) and is_v(1):
                for i in range(2, n):
                    if not is_v(i):
                        rv = i + 1
                        break
            else:
                rv = 3

        def nonvowel_after_vowel(start):
            for i in range(start + 1, n):
                if not is_v(i) and is_v(i - 1):
                    return i + 1
            return n

        r1 = nonvowel_after_vowel(0)
        r2 = nonvowel_after_vowel(r1 - 1) if r1 < n else n
        return rv, r1, r2

    return regions


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------
_IT_VOWELS = frozenset("aeiouàèìòù")
_it_regions = _make_regions(_IT_VOWELS)
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = sorted(
    [
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
        "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
        "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
        "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
        "veli", "velo", "vene",
    ],
    key=len,
    reverse=True,
)
_IT_STEP1_R2 = sorted(
    [
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
        "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
        "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
        "atrice", "atrici", "ante", "anti",
    ],
    key=len,
    reverse=True,
)
_IT_STEP2 = sorted(
    [
        "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
        "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
        "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
        "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
        "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
        "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
        "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
        "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
        "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
        "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
        "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
        "uti", "uto", "ar", "ir",
    ],
    key=len,
    reverse=True,
)


def italian_stem(word: str) -> str:
    w = word.lower().translate(_IT_ACUTE)
    # mark u after q and u/i between vowels
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _IT_VOWELS
        next_v = i + 1 < n and chars[i + 1] in _IT_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    if len(w) <= 2:
        return w.replace("I", "i").replace("U", "u")
    rv, r1, r2 = _it_regions(w)

    def in_rv(p):
        return p >= rv

    def in_r2(p):
        return p >= r2

    # Step 0: attached pronouns
    for pron in _IT_PRONOUNS:
        if w.endswith(pron):
            base = w[: -len(pron)]
            if base.endswith(("ando", "endo")) and in_rv(len(base) - 4):
                w = base
            elif base.endswith(("ar", "er", "ir")) and in_rv(len(base) - 2):
                w = base + "e"
            break

    before = w

    # Step 1: standard suffixes
    if w.endswith(("azione", "azioni", "atore", "atori")):
        suf = next(s for s in ("azione", "azioni", "atore", "atori") if w.endswith(s))
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            if w.endswith("ic") and in_r2(len(w) - 2):
                w = w[:-2]
    elif w.endswith(("logia", "logie")):
        if in_r2(len(w) - 5):
            w = w[:-5] + "log"
    elif w.endswith(("uzione", "uzioni", "usione", "usioni")):
        if in_r2(len(w) - 6):
            w = w[:-6] + "u"
    elif w.endswith(("enza", "enze")):
        if in_r2(len(w) - 4):
            w = w[:-4] + "ente"
    elif w.endswith(("amento", "amenti", "imento", "imenti")):
        if in_rv(len(w) - 6):
            w = w[:-6]
    elif w.endswith("amente"):
        if len(w) - 6 >= r1:
            w = w[:-6]
            if w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            elif w.endswith("abil") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith(("os", "ic")) and in_r2(len(w) - 2):
                w = w[:-2]
    elif w.endswith("ità"):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("abil") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                w = w[:-2]
    elif w.endswith(("ivo", "ivi", "iva", "ive")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
    else:
        for suf in _IT_STEP1_R2:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break

    # Step 2: verb suffixes (only if step 1 removed nothing)
    if w == before:
        # setlimit tomark pV: a region-crossing longer entry never
        # blocks a shorter in-RV one
        for suf in _IT_STEP2:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # Step 3a: residual vowel (then a further final i)
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # Step 3b: the whole ch/gh must sit in RV
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------
_PT_VOWELS = frozenset("aeiouáéíóúâêô")
_pt_regions = _make_regions(_PT_VOWELS)

_PT_STEP1_R2 = sorted(
    [
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos", "adora", "ador",
        "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
    ],
    key=len,
    reverse=True,
)
_PT_STEP2 = sorted(
    [
        "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
        "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
        "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
        "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
        "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
        "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir",
        "as", "adas", "idas", "ias", "arias", "erias", "irias", "arás",
        "erás", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
        "eres", "ires", "asses", "esses", "isses", "astes", "estes",
        "istes", "is", "ais", "aras", "eras", "eis", "áreis", "areis",
        "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis",
        "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis", "ados",
        "idos", "amos", "ámos", "íamos", "aríamos", "eríamos",
        "iríamos", "áramos", "éramos", "íramos", "ávamos",
        "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
        "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
        "ira", "iras",
    ],
    key=len,
    reverse=True,
)


def portuguese_stem(word: str) -> str:
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _pt_regions(w)

    def in_rv(p):
        return p >= rv

    def in_r2(p):
        return p >= r2

    before = w

    # Step 1: standard suffixes
    if w.endswith(("logia", "logias")):
        suf = "logias" if w.endswith("logias") else "logia"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "log"
    elif w.endswith(("uça~o", "uço~es")):
        suf = "uço~es" if w.endswith("uço~es") else "uça~o"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "u"
    elif w.endswith(("ência", "ências")):
        suf = "ências" if w.endswith("ências") else "ência"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "ente"
    elif w.endswith("amente"):
        if len(w) - 6 >= r1:
            w = w[:-6]
            if w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            elif w.endswith(("os", "ic", "ad")) and in_r2(len(w) - 2):
                w = w[:-2]
    elif w.endswith("mente"):
        if in_r2(len(w) - 5):
            w = w[:-5]
            for p in ("ante", "avel", "ível"):
                if w.endswith(p) and in_r2(len(w) - 4):
                    w = w[:-4]
                    break
    elif w.endswith(("idade", "idades")):
        suf = "idades" if w.endswith("idades") else "idade"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            for p in ("abil", "ic", "iv"):
                if w.endswith(p) and in_r2(len(w) - len(p)):
                    w = w[: -len(p)]
                    break
    elif w.endswith(("iva", "ivo", "ivas", "ivos")):
        suf = next(s for s in ("ivas", "ivos", "iva", "ivo") if w.endswith(s))
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
    elif w.endswith(("ira", "iras")):
        suf = "iras" if w.endswith("iras") else "ira"
        i = len(w) - len(suf)
        if in_rv(i) and i >= 1 and w[i - 1] == "e":
            w = w[:i] + "ir"
    else:
        for suf in _PT_STEP1_R2:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break

    step1_removed = w != before

    # Step 2: verb suffixes (only if step 1 removed nothing) — the
    # published program matches under `setlimit tomark pV`, so a
    # region-crossing longer entry never blocks a shorter in-RV one
    if not step1_removed:
        for suf in _PT_STEP2:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    altered = w != before

    # Step 3 / Step 4
    if altered:
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf):
                if in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break

    # Step 5: ( ['e'|'é'|'ê'] RV delete + gu/ci fix ) OR ( ['ç'] <- 'c' )
    # — an or-chain: a successful e-removal skips the cedilla rewrite
    if w and w[-1] in "eéê" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("gu") and in_rv(len(w) - 1):
            w = w[:-1]
        elif w.endswith("ci") and in_rv(len(w) - 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Catalan — the published Snowball program (catalan.sbl): R1/R2 only
# (no RV); backward-mode attached_pronoun, then standard_suffix or
# verb_suffix, then residual_suffix; forward cleaning pass strips
# accents and the ela geminada dot. Tables in snowball_tables.py.
# ---------------------------------------------------------------------------
from .snowball_tables import CA_PRON, CA_RESID, CA_STD, CA_VERB

_CA_VOWELS = frozenset("aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00f2\u00f3\u00f9\u00fa\u00ef\u00fc")

_CA_CLEAN = str.maketrans(
    {"\u00e0": "a", "\u00e1": "a", "\u00e8": "e", "\u00e9": "e",
     "\u00ec": "i", "\u00ed": "i", "\u00ef": "i", "\u00f2": "o",
     "\u00f3": "o", "\u00f9": "u", "\u00fa": "u", "\u00fc": "u",
     "\u00b7": None}
)


def _ca_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def is_v(i):
        return w[i] in _CA_VOWELS

    def after_vc(start):
        for i in range(start + 1, n):
            if not is_v(i) and is_v(i - 1):
                return i + 1
        return n

    p1 = after_vc(0)
    p2 = after_vc(p1 - 1) if p1 < n else n
    return p1, p2


def _ca_find(w: str, among):
    lens, by_len = among
    n = len(w)
    for ln in lens:
        if ln > n:
            continue
        res = by_len[ln].get(w[n - ln:])
        if res is not None:
            return w[n - ln:], res
    return None


def catalan_stem(word: str) -> str:
    w = word.lower()
    p1, p2 = _ca_regions(w)

    # attached pronouns (R1 delete)
    m = _ca_find(w, CA_PRON)
    if m is not None:
        suf, _res = m
        if len(w) - len(suf) >= p1:
            w = w[: len(w) - len(suf)]

    # standard suffixes; verb suffixes only if no standard matched
    std = False
    m = _ca_find(w, CA_STD)
    if m is not None:
        suf, res = m
        start = len(w) - len(suf)
        if res == 1 and start >= p1:
            w, std = w[:start], True
        elif res == 2 and start >= p2:
            w, std = w[:start], True
        elif res == 3 and start >= p2:
            w, std = w[:start] + "log", True
        elif res == 4 and start >= p2:
            w, std = w[:start] + "ic", True
        elif res == 5 and start >= p1:
            w, std = w[:start] + "c", True
    if not std:
        m = _ca_find(w, CA_VERB)
        if m is not None:
            suf, res = m
            # branch 2 ('ando') needs R2; the rest R1
            if len(w) - len(suf) >= (p2 if res == 2 else p1):
                w = w[: len(w) - len(suf)]

    # residual suffix
    m = _ca_find(w, CA_RESID)
    if m is not None:
        suf, res = m
        start = len(w) - len(suf)
        if start >= p1:
            w = w[:start] + ("ic" if res == 2 else "")

    # cleaning: deaccent + drop ela geminada dot
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Romanian — the published Snowball program (romanian.sbl, cedilla-era
# tables as generated into Snowball 2.x / Lucene 8.x): prelude marks
# i/u between vowels as consonants, spanish-style pV/p1/p2, then
# step_0 (R1) -> standard_suffix (repeat combo R1, then R2) ->
# verb_suffix (RV-limited, consonant/u guard) if no standard suffix
# was removed -> vowel_suffix (RV). Tables in snowball_tables.py.
# ---------------------------------------------------------------------------
from .snowball_rt import BackwardWord, apply_b, find_b
from .snowball_tables import RO_COMBO, RO_STD, RO_STEP0, RO_VERB, RO_VOWEL

_RO_VOWELS = frozenset("aeiouâîă")
_ro_regions = _make_regions(_RO_VOWELS)

_RO_COMBO_REPL = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at", 6: "it"}
_RO_STEP0_REPL = {1: "", 2: "a", 3: "e", 4: "i", 5: "i", 6: "at", 7: "aţi"}


def _ro_find(w: str, among, limit: int = 0):
    """Longest suffix of w in `among` not reaching left of `limit`."""
    lens, by_len = among
    n = len(w)
    for ln in lens:
        if ln > n - limit:
            continue
        res = by_len[ln].get(w[n - ln:])
        if res is not None:
            return w[n - ln:], res
    return None


def romanian_stem(word: str) -> str:
    w = word.lower()
    # prelude: i/u between vowels are consonantal (marked uppercase,
    # so they fall outside the vowel grouping)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    pV, p1, p2 = _ro_regions(w)

    # step_0: plural/article removal in R1
    m = _ro_find(w, RO_STEP0)
    if m is not None:
        suf, res = m
        start = len(w) - len(suf)
        if start >= p1 and not (res == 5 and w.endswith("ab" + suf)):
            w = w[:start] + _RO_STEP0_REPL[res]

    # standard_suffix: repeat combo (R1; `test` semantics - matching
    # restarts from the full new end each iteration), then main (R2)
    std_removed = False
    while True:
        m = _ro_find(w, RO_COMBO)
        if m is None:
            break
        suf, res = m
        start = len(w) - len(suf)
        if start < p1:
            break
        w = w[:start] + _RO_COMBO_REPL[res]
        std_removed = True
    m = _ro_find(w, RO_STD)
    if m is not None:
        suf, res = m
        start = len(w) - len(suf)
        if start >= p2:
            if res == 1:
                w = w[:start]
                std_removed = True
            elif res == 2:  # 'iune'/'iuni' after ţ -> 't'
                if w[:start].endswith("ţ"):
                    w = w[:start - 1] + "t"
                    std_removed = True
            else:  # 3: unify -ism/-ist family to 'ist'
                w = w[:start] + "ist"
                std_removed = True

    # verb_suffix: only when no standard suffix was removed; matching
    # limited to RV; branch 1 requires a consonant or 'u' before
    if not std_removed:
        m = _ro_find(w, RO_VERB, pV)
        if m is not None:
            suf, res = m
            start = len(w) - len(suf)
            if res == 2:
                w = w[:start]
            # branch 1 guard: preceding char is a consonant or 'u';
            # the RV setlimit applies to the guard's movement too, so
            # the guard char itself must sit inside RV
            elif start - 1 >= pV and (w[start - 1] not in _RO_VOWELS or w[start - 1] == "u"):
                w = w[:start]

    # vowel_suffix: residual vowel in RV
    m = _ro_find(w, RO_VOWEL)
    if m is not None:
        suf, _res = m
        if len(w) - len(suf) >= pV:
            w = w[: len(w) - len(suf)]

    return w.lower()
