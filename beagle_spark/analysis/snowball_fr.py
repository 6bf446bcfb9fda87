"""Snowball French stemmer, pure Python.

Implemented from the published algorithm specification
(snowballstem.org/algorithms/french/stemmer.html) — the program Lucene
runs for the reference's `:french` stemmer
(reference: src/beagle/text_analysis.clj:30).

Structure: prelude marks (u/i between vowels -> U/I, y next to a vowel
-> Y, u after q -> U); RV per the French rule (two initial vowels or
par/col/tap => after 3rd letter); step 1 standard suffixes; steps 2a/2b
verb suffixes in RV; steps 3/4 residuals; step 5 undouble; step 6
un-accent.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _prelude(w: str) -> str:
    """The published `repeat goto` marking walk: after a vowel, u/i
    before a vowel and any y are marked; y before a vowel marks; u
    after q marks. The cursor moves past each marked char, so marks
    never chain ("aiie" -> "aIie"; "yue" -> "yUe" with the y left a
    vowel)."""
    chars = list(w)
    n = len(chars)
    i = 0
    while i < n:
        c = chars[i]
        if c in _VOWELS and i + 1 < n:
            nxt = chars[i + 1]
            if nxt == "u" and i + 2 < n and chars[i + 2] in _VOWELS:
                chars[i + 1] = "U"
                i += 2
                continue
            if nxt == "i" and i + 2 < n and chars[i + 2] in _VOWELS:
                chars[i + 1] = "I"
                i += 2
                continue
            if nxt == "y":
                chars[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < n and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < n and chars[i + 1] == "u":
            chars[i + 1] = "U"
            i += 2
            continue
        i += 1
    # diaeresis decomposition: the published prelude rewrites
    # {e"} -> He and {i"} -> Hi (H is a marker consonant), recomposed
    # by the postlude — this is what lets 'e' strip after ë etc.
    return "".join(chars).replace("ë", "He").replace("ï", "Hi")


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def is_v(i):
        return w[i] in _VOWELS

    rv = n
    if n >= 3 and ((is_v(0) and is_v(1)) or w[:3] in ("par", "col", "tap")):
        rv = 3
    else:
        for i in range(1, n):
            if is_v(i):
                rv = i + 1
                break

    def nonvowel_after_vowel(start):
        for i in range(start + 1, n):
            if not is_v(i) and is_v(i - 1):
                return i + 1
        return n

    r1 = nonvowel_after_vowel(0)
    r2 = nonvowel_after_vowel(r1 - 1) if r1 < n else n
    return rv, r1, r2


_STEP1_R2_DELETE = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe", "isme",
    "able", "iste", "eux",
)
_STEP1_AT = ("atrices", "atrice", "ateurs", "ations", "ateur", "ation")
_STEP2A = (
    "issaIent", "issantes", "issants", "issante", "issions", "issent",
    "issant", "issais", "issait", "issiez", "issons", "iraIent", "issez",
    "isses", "irions", "irais", "irait", "irent", "iriez", "irons",
    "iront", "isse", "îtes", "îmes", "irai", "iras", "irez", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i",
)
_STEP2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_STEP2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âtes",
    "âmes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)


def french_stem(word: str) -> str:
    w = _prelude(word.lower())
    rv, r1, r2 = _regions(w)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    before = w
    step1_did_mment = False

    # ---- Step 1: standard suffixes (longest applicable family first) ----
    done = False
    # families sorted so longer suffixes are tried before their tails
    if w.endswith(("issements", "issement")):
        suf = "issements" if w.endswith("issements") else "issement"
        i = len(w) - len(suf)
        if in_r1(i) and i >= 1 and w[i - 1] not in _VOWELS:
            w = w[:i]
        done = True
    elif w.endswith(_STEP1_AT):
        suf = next(s for s in _STEP1_AT if w.endswith(s))
        i = len(w) - len(suf)
        if in_r2(i):
            w = w[:i]
            if w.endswith("ic"):
                if in_r2(len(w) - 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        done = True
    elif w.endswith(("logies", "logie")):
        suf = "logies" if w.endswith("logies") else "logie"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "log"
        done = True
    elif w.endswith(("usions", "utions", "usion", "ution")):
        suf = next(s for s in ("usions", "utions", "usion", "ution") if w.endswith(s))
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "u"
        done = True
    elif w.endswith(("ences", "ence")):
        suf = "ences" if w.endswith("ences") else "ence"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)] + "ent"
        done = True
    elif w.endswith(("ements", "ement")):
        suf = "ements" if w.endswith("ements") else "ement"
        i = len(w) - len(suf)
        if in_rv(i):
            w = w[:i]
            if w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            elif w.endswith("eus"):
                if in_r2(len(w) - 3):
                    w = w[:-3]
                elif in_r1(len(w) - 3):
                    w = w[:-3] + "eux"
            elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                w = w[:-3]
            elif w.endswith(("ièr", "Ièr")) and in_rv(len(w) - 3):
                w = w[:-3] + "i"
        done = True
    elif w.endswith(("ités", "ité")):
        suf = "ités" if w.endswith("ités") else "ité"
        i = len(w) - len(suf)
        if in_r2(i):
            w = w[:i]
            if w.endswith("abil"):
                if in_r2(len(w) - 4):
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if in_r2(len(w) - 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
        done = True
    elif w.endswith(("ives", "ifs", "ive", "if")):
        suf = next(s for s in ("ives", "ifs", "ive", "if") if w.endswith(s))
        i = len(w) - len(suf)
        if in_r2(i):
            w = w[:i]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        done = True
    elif w.endswith("eaux"):
        w = w[:-4] + "eau"
        done = True
    elif w.endswith("aux"):
        if in_r1(len(w) - 3):
            w = w[:-3] + "al"
        done = True
    elif w.endswith(("euses", "euse")):
        suf = "euses" if w.endswith("euses") else "euse"
        i = len(w) - len(suf)
        if in_r2(i):
            w = w[:i]
        elif in_r1(i):
            w = w[:i] + "eux"
        done = True
    elif w.endswith(_STEP1_R2_DELETE):
        suf = next(s for s in _STEP1_R2_DELETE if w.endswith(s))
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
        done = True
    elif w.endswith("amment"):
        if in_rv(len(w) - 6):
            w = w[:-6] + "ant"
            step1_did_mment = True
        done = True
    elif w.endswith("emment"):
        if in_rv(len(w) - 6):
            w = w[:-6] + "ent"
            step1_did_mment = True
        done = True
    elif w.endswith(("ments", "ment")):
        suf = "ments" if w.endswith("ments") else "ment"
        i = len(w) - len(suf)
        if i >= 1 and w[i - 1] in _VOWELS and in_rv(i - 1):
            w = w[:i]
            step1_did_mment = True
        done = True

    step1_removed = w != before

    # ---- Steps 2a / 2b: verb suffixes, all in RV ----
    altered = step1_removed
    if not step1_removed or step1_did_mment:
        did_2a = False
        for suf in _STEP2A:
            if w.endswith(suf):
                i = len(w) - len(suf)
                # branch guard: (not 'H') non-v delete — the diaeresis
                # marker H blocks i-verb stripping (ï is not a verb i)
                if (in_rv(i) and i >= 1 and w[i - 1] not in _VOWELS
                        and w[i - 1] != "H" and in_rv(i - 1)):
                    w = w[:i]
                    did_2a = True
                break
        if did_2a:
            altered = True
        else:
            # 2b, longest among three families
            cand = None
            if w.endswith("ions") and in_r2(len(w) - 4):
                cand = ("ions", "")
            for suf in _STEP2B_ER:
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    if cand is None or len(suf) > len(cand[0]):
                        cand = (suf, "er-family")
                    break
            for suf in _STEP2B_A:
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    if cand is None or len(suf) > len(cand[0]):
                        cand = (suf, "a-family")
                    break
            if cand:
                suf, fam = cand
                w = w[: -len(suf)]
                if fam == "a-family" and w.endswith("e") and in_rv(len(w) - 1):
                    w = w[:-1]
                altered = True

    # ---- Step 3 / Step 4 ----
    if altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 (residual): try ['s'] first, then a pV-limited among —
        # entries crossing RV can't match, shorter in-RV entries win
        if w.endswith("s") and len(w) >= 2 and (
            w[-3:-1] == "Hi" or w[-2] not in "aiouès"
        ):
            w = w[:-1]
        for suf in ("Ière", "ière", "Ier", "ier", "ion", "e"):
            if not w.endswith(suf) or not in_rv(len(w) - len(suf)):
                continue
            i = len(w) - len(suf)
            if suf == "ion":
                # R2 + preceded by s/t, the s/t itself inside RV
                if in_r2(i) and i >= 1 and w[i - 1] in "st" and in_rv(i - 1):
                    w = w[:i]
                break
            if suf in ("Ière", "ière", "Ier", "ier"):
                w = w[:i] + "i"
            else:
                w = w[:i]
            break

    # ---- Step 5: undouble ----
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- Step 6: un-accent: (atleast 1 non-v) ['é'|'è'] <- 'e'.
    # Marked I/U/Y/H count as non-vowels here.
    j = len(w) - 1
    while j >= 0 and w[j] not in _VOWELS:
        j -= 1
    if j >= 0 and j < len(w) - 1 and w[j] in "éè":
        w = w[:j] + "e" + w[j + 1:]

    # postlude: unmark, recompose diaereses, drop stray markers
    w = w.replace("I", "i").replace("U", "u").replace("Y", "y")
    return w.replace("Hi", "ï").replace("He", "ë").replace("H", "")
