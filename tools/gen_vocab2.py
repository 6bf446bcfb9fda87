"""Dev-only: generic probe-vocab generator for tier-1/2 oracle diffs.

Suffix pool comes from the language's exact among tables extracted out
of dict_snowball.so (tools/extract_among.py dump); stems come from the
PostgreSQL stopword lists (real inflected words), a few synthetic
cores, and seeded random strings.
"""

from __future__ import annotations

import random
import re
import sys

# among-table ids (UTF-8 variants) in /tmp/tables.txt per language
TABLE_IDS = {
    "danish": range(147, 150), "dutch": range(150, 156),
    "english": range(156, 166), "finnish": range(166, 176),
    "french": range(176, 183), "german": range(183, 187),
    "hungarian": range(308, 317), "italian": range(326, 334),
    "lithuanian": range(334, 338), "norwegian": range(342, 345),
    "portuguese": range(351, 360), "russian": range(365, 390),
    "spanish": range(394, 404), "swedish": range(404, 407),
    "turkish": range(430, 447),
}

ALPHABET = {
    "danish": "abcdefghijklmnopqrstuvwxyzæøå",
    "dutch": "abcdefghijklmnopqrstuvwxyzëï",
    "english": "abcdefghijklmnopqrstuvwxyz'",
    "finnish": "abcdefghijklmnopqrstuvwxyzäö",
    "french": "abcdefghijklmnopqrstuvwxyzàâçèéêëîïôùûü",
    "german": "abcdefghijklmnopqrstuvwxyzäöüß",
    "hungarian": "abcdefghijklmnopqrstuvwxyzáéíóöúüőű",
    "italian": "abcdefghijklmnopqrstuvwxyzàèéìòù",
    "lithuanian": "abcdefghijklmnoprstuvyzążčęėįšūų",
    "norwegian": "abcdefghijklmnopqrstuvwxyzæøå",
    "portuguese": "abcdefghijklmnopqrstuvwxyzáâãàçéêíóôõú",
    "russian": "абвгдежзийклмнопрстуфхцчшщъыьэюяё",
    "spanish": "abcdefghijklmnopqrstuvwxyzáéíñóúü",
    "swedish": "abcdefghijklmnopqrstuvwxyzäåö",
    "turkish": "abcçdefgğhıijklmnoöprsştuüvyz",
}

STOPFILES = {
    "danish": "danish", "dutch": "dutch", "english": "english",
    "finnish": "finnish", "french": "french", "german": "german",
    "hungarian": "hungarian", "italian": "italian",
    "norwegian": "norwegian", "portuguese": "portuguese",
    "russian": "russian", "spanish": "spanish", "swedish": "swedish",
    "turkish": "turkish",
}


def load_suffixes(lang: str) -> set[str]:
    ids = set(TABLE_IDS[lang])
    out: set[str] = set()
    cur = None
    for line in open("/tmp/tables.txt"):
        m = re.match(r"=== t(\d+) ", line)
        if m:
            cur = int(m.group(1))
            continue
        if cur in ids:
            m = re.match(r"  (.*)\t(-?\d+)\t(-?\d+)\t(\d)$", line.rstrip("\n"))
            if m:
                out.add(eval(m.group(1)))
    return out


def gen(lang: str) -> list[str]:
    rng = random.Random(1234)
    vocab: set[str] = set()
    stems = set()
    sf = STOPFILES.get(lang)
    if sf:
        try:
            for w in open(f"/usr/share/postgresql/15/tsearch_data/{sf}.stop",
                          encoding="utf-8"):
                w = w.strip()
                if w:
                    stems.add(w)
                    vocab.add(w)
        except OSError:
            pass
    alpha = ALPHABET[lang]
    while len(stems) < 60:
        stems.add("".join(rng.choice(alpha) for _ in range(rng.randint(2, 7))))
    sufs = load_suffixes(lang)
    for st in list(stems)[:60]:
        for suf in sufs:
            vocab.add(st + suf)
    for _ in range(6000):
        vocab.add("".join(rng.choice(alpha) for _ in range(rng.randint(2, 14))))
    return sorted(w for w in vocab if w)


if __name__ == "__main__":
    lang, out = sys.argv[1], sys.argv[2]
    words = gen(lang)
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(words) + "\n")
    print(f"{lang}: {len(words)} words -> {out}")
