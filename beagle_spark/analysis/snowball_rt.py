"""Minimal Snowball backward-mode runtime.

Implements the published Snowball execution semantics (snowballstem.org
manual) needed by the table-driven stemmers: a backward cursor that
starts at the word end and persists across routine calls, longest-match
`among` over suffix tables with NO retry of shorter entries when a
branch's region gate fails, region marks (pV/p1/p2) fixed at
mark_regions time, and delete / replace actions that leave the cursor
at the left edge of the replaced region (inserted text is never
rescanned).

The per-language suffix tables in the sibling modules are transcribed
from the published Snowball programs (verified byte-exact against the
Snowball 2.x implementations compiled into PostgreSQL 15's
dict_snowball.so — the same generated sources Lucene 8.x runs for the
reference, /root/reference/deps.edn).
"""

from __future__ import annotations


def make_regions_spanish(vowels: frozenset):
    """Standard romance-style (pV, p1, p2) marker.

    pV: if the 2nd letter is a consonant, after the next vowel; if the
    first two letters are vowels, after the next consonant; else
    (consonant+vowel) position 3.  p1/p2: after the 1st/2nd
    vowel-followed-by-consonant sequence.
    """

    def regions(w: str) -> tuple[int, int, int]:
        n = len(w)

        def is_v(i):
            return w[i] in vowels

        pV = n
        if n >= 2:
            if is_v(0):
                if not is_v(1):          # v non-v: gopast v
                    for i in range(2, n):
                        if is_v(i):
                            pV = i + 1
                            break
                else:                    # v v: gopast non-v
                    for i in range(2, n):
                        if not is_v(i):
                            pV = i + 1
                            break
            else:
                if not is_v(1):          # non-v non-v: gopast v
                    for i in range(2, n):
                        if is_v(i):
                            pV = i + 1
                            break
                else:                    # non-v v: next
                    if n >= 3:
                        pV = 3

        def after_vc(start):
            for i in range(start + 1, n):
                if not is_v(i) and is_v(i - 1):
                    return i + 1
            return n

        p1 = after_vc(0)
        p2 = after_vc(p1 - 1) if p1 < n else n
        return pV, p1, p2

    return regions


class BackwardWord:
    """Word being stemmed in backward mode. `cursor` is the index of
    the left edge of the consumed (matched) region; the stemmable
    text is s[:cursor]."""

    __slots__ = ("s", "cursor", "pV", "p1", "p2")

    def __init__(self, s: str, pV: int = 0, p1: int = 0, p2: int = 0):
        self.s = s
        self.cursor = len(s)
        self.pV, self.p1, self.p2 = pV, p1, p2

    # region gates: matched suffix must start at or after the mark
    def gate(self, name: str | None, start: int) -> bool:
        if name is None:
            return True
        if name == "RV":
            return start >= self.pV
        if name == "R1":
            return start >= self.p1
        if name == "R2":
            return start >= self.p2
        raise ValueError(name)


def compile_among(entries):
    """entries: iterable of (suffix, result). Returns a matcher usable
    with among_b. Longest-match via length-bucketed dicts."""
    by_len: dict[int, dict[str, int]] = {}
    for suf, res in entries:
        by_len.setdefault(len(suf), {})[suf] = res
    lens = sorted(by_len, reverse=True)
    return lens, by_len


def find_b(word: BackwardWord, among, limit: int = 0) -> tuple[str, int] | None:
    """Longest suffix of s[:cursor] present in `among`; returns
    (suffix, result) without consuming. `limit` implements Snowball's
    `setlimit tomark X for [substring]`: entries reaching left of
    `limit` can't match, so shorter in-limit entries win instead."""
    lens, by_len = among
    text = word.s
    c = word.cursor
    for ln in lens:
        if ln > c - limit:
            continue
        suf = text[c - ln:c]
        res = by_len[ln].get(suf)
        if res is not None:
            return suf, res
    return None


def apply_b(word: BackwardWord, suffix: str, replacement: str) -> None:
    """Replace the matched suffix (ending at cursor) with
    `replacement`; cursor moves to the left edge of the replacement."""
    start = word.cursor - len(suffix)
    word.s = word.s[:start] + replacement + word.s[word.cursor:]
    word.cursor = start


def run_among_b(word: BackwardWord, among, actions, setlimit: str | None = None) -> bool:
    """One `[substring] among(...)` step: longest match, gate check,
    delete/replace. Gate failure fails the whole step (no shorter-entry
    retry), matching generated-code semantics for branch conditions.
    `setlimit` instead restricts matching to the named region up front
    (shorter entries win over region-crossing longer ones)."""
    limit = 0
    if setlimit is not None:
        limit = {"RV": word.pV, "R1": word.p1, "R2": word.p2}[setlimit]
    m = find_b(word, among, limit)
    if m is None:
        return False
    suf, res = m
    gate, repl = actions[res]
    if not word.gate(gate, word.cursor - len(suf)):
        return False
    apply_b(word, suf, repl)
    return True


def repeat_b(word: BackwardWord, among, actions, setlimit: str | None = None) -> None:
    while run_among_b(word, among, actions, setlimit):
        pass
