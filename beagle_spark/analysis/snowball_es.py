"""Snowball Spanish stemmer, pure Python.

Implemented from the published algorithm specification
(snowballstem.org/algorithms/spanish/stemmer.html) — the program Lucene
runs for the reference's `:spanish` stemmer (reference:
src/beagle/text_analysis.clj:42). Structure:

- RV/R1/R2 regions (RV per the Spanish rule on the first two letters).
- Step 0: attached-pronoun removal after gerund/infinitive endings.
- Step 1: standard (derivational) suffixes, mostly conditioned on R2.
- Step 2a/2b: verb suffixes in RV (2a: y-forms after u; 2b: the full
  conjugation table, with the `gu`->`g` fix for en/es/éis/emos).
- Step 3: residual vowel suffixes in RV.
- Finally strip acute accents.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")

_STEP0_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
               "me", "se", "la", "le", "lo")
_STEP0_A = ("iéndo", "ándo", "ár", "ér", "ír")  # delete pronoun + unaccent
_STEP0_B = ("iendo", "ando", "ar", "er", "ir")
_UNACCENT0 = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er", "ír": "ir"}

_STEP1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos", "ables",
    "ibles", "istas", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
    "osos", "osas", "ico", "ica", "oso", "osa",
)
_STEP1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación",
               "antes", "ancia", "ador", "ante")
_STEP2B_GU = ("éis", "emos", "en", "es")
_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "asteis", "isteis",
    "aremos", "eremos", "iremos",
    "ábamos", "áramos", "ásemos", "arían", "arías", "aríais", "eríais",
    "iríais", "ierais", "ieseis", "abais", "arais", "aseis", "íamos",
    "erían", "erías", "irían", "irías", "ieran", "iesen", "ieron", "iendo",
    "ieras", "ieses", "aréis", "eréis", "iréis", "arán", "arás", "erán",
    "erás", "irán", "irás", "aban", "aran", "asen", "ases", "aron", "ados",
    "idos", "amos", "imos", "ando", "aría", "ería", "iría", "iera", "iese",
    "aste", "iste", "abas", "adas", "idas", "aras", "íais", "ará", "aré",
    "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían",
    "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar",
    "er", "ir", "as", "ís",
)
_STEP3_RV = ("os", "a", "o", "á", "í", "ó")
_ACCENTS = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"})


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def is_v(i):
        return w[i] in _VOWELS

    # RV
    rv = n
    if n >= 3:
        if not is_v(1):
            # X C: after the next vowel following position 1
            for i in range(2, n):
                if is_v(i):
                    rv = i + 1
                    break
        elif is_v(0) and is_v(1):
            # V V: after the next consonant
            for i in range(2, n):
                if not is_v(i):
                    rv = i + 1
                    break
        else:
            # C V: after the third letter
            rv = 3

    def first_nonvowel_after_vowel(start: int) -> int:
        for i in range(start + 1, n):
            if not is_v(i) and is_v(i - 1):
                return i + 1
        return n

    r1 = first_nonvowel_after_vowel(0)
    r2 = first_nonvowel_after_vowel(r1 - 1) if r1 < n else n
    return rv, r1, r2


def spanish_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w.translate(_ACCENTS)
    rv, r1, r2 = _regions(w)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    # Step 0: attached pronouns
    for pron in _STEP0_PRON:
        if w.endswith(pron):
            base = w[: -len(pron)]
            matched = False
            for suf in _STEP0_A:
                if base.endswith(suf) and in_rv(len(base) - len(suf)):
                    w = base[: -len(suf)] + _UNACCENT0[suf]
                    matched = True
                    break
            if not matched:
                for suf in _STEP0_B:
                    if base.endswith(suf) and in_rv(len(base) - len(suf)):
                        w = base
                        matched = True
                        break
            if not matched and base.endswith("yendo") and in_rv(len(base) - 5):
                if len(base) >= 6 and base[-6] == "u":
                    w = base
                    matched = True
            break  # longest pronoun tried first; only one removal
    rv, r1, r2 = _regions(w)  # regions over the (possibly) shortened word

    before_step1 = w

    # Step 1: standard suffixes (longest match first)
    done = False
    for suf in _STEP1_DELETE_R2:
        if w.endswith(suf):
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)]
            done = True
            break
    if not done:
        for suf in _STEP1_ADOR:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
                done = True
                break
    if not done:
        if w.endswith(("logías", "logía")):
            suf = "logías" if w.endswith("logías") else "logía"
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)] + "log"
            done = True
        elif w.endswith(("uciones", "ución")):
            suf = "uciones" if w.endswith("uciones") else "ución"
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)] + "u"
            done = True
        elif w.endswith(("encias", "encia")):
            suf = "encias" if w.endswith("encias") else "encia"
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)] + "ente"
            done = True
        elif w.endswith("amente"):
            if in_r1(len(w) - 6):
                w = w[:-6]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(len(w) - 2):
                    w = w[:-2]
            done = True
        elif w.endswith("mente"):
            if in_r2(len(w) - 5):
                w = w[:-5]
                for p in ("ante", "able", "ible"):
                    if w.endswith(p) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
            done = True
        elif w.endswith(("idades", "idad")):
            suf = "idades" if w.endswith("idades") else "idad"
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)]
                for p in ("abil", "ic", "iv"):
                    if w.endswith(p) and in_r2(len(w) - len(p)):
                        w = w[: -len(p)]
                        break
            done = True
        elif w.endswith(("ivas", "ivos", "iva", "ivo")):
            suf = next(s for s in ("ivas", "ivos", "iva", "ivo") if w.endswith(s))
            if in_r2(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            done = True

    step1_removed = w != before_step1

    if not step1_removed:
        # Step 2a: y-verb forms after u
        removed_2a = False
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
                    "yes", "ya", "ye", "yo", "yó"):
            # setlimit semantics: the preceding 'u' must sit in RV too
            if w.endswith(suf) and in_rv(len(w) - len(suf) - 1):
                if len(w) > len(suf) and w[-len(suf) - 1] == "u":
                    w = w[: -len(suf)]
                    removed_2a = True
                break
        if not removed_2a:
            # Step 2b: main verb suffixes — the published program uses
            # `setlimit tomark pV for [substring]`, so entries crossing
            # RV can't match and a shorter in-RV entry wins instead
            for suf in sorted(_STEP2B_GU + _STEP2B, key=len, reverse=True):
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if suf in _STEP2B_GU and w.endswith("gu"):
                        w = w[:-1]
                    break

    # Step 3: residual suffix
    for suf in ("e", "é"):
        if w.endswith(suf):
            if in_rv(len(w) - 1):
                w = w[:-1]
                if w.endswith("gu") and in_rv(len(w) - 1):
                    w = w[:-1]
            break
    else:
        for suf in _STEP3_RV:
            if w.endswith(suf):
                if in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break

    return w.translate(_ACCENTS)
