"""Offset-preserving tokenizers.

Mirrors the reference's 7 tokenizers (reference:
src/beagle/text_analysis.clj:51-63) as compiled-regex scanners that
return (token, begin, end) char offsets into the original string —
offsets are required because annotations carry char spans
(schema.clj:36-37).

Implemented with the `regex` module for proper Unicode classes.
`standard`/`classic` approximate Lucene's UAX#29 StandardTokenizer:
word = letter run (with internal apostrophes kept by `classic` style
possessive handling downstream), number = digit run with internal
./, separators. Validated against the HTML corner-case corpus (see
tests/test_corner_cases.py).
"""

from __future__ import annotations

import re as sre
from functools import lru_cache
from typing import NamedTuple

import regex as re


class Token(NamedTuple):
    text: str
    begin: int
    end: int


# UAX#29 word with the MidLetter/MidNumLet join rules Lucene's
# StandardTokenizer applies (WB6/WB7, WB11/WB12): an alnum run extends
# across a single joiner when the joiner sits between the right kinds of
# neighbors — apostrophe/'/’ or '.' between LETTERS ("John's", "U.S.A",
# "example.com" each one token), '.' or ',' between DIGITS ("3.14",
# "1,000"). A joiner with the wrong neighbors splits ("a,b", "R2D2.com").
# CJK per UAX#29/Lucene: each Han ideograph / hiragana char is its own
# token (<IDEOGRAPHIC>/<HIRAGANA>); katakana forms runs (<KATAKANA>);
# hangul forms runs (<HANGUL>). The general alnum run excludes those
# scripts (regex-module V1 set subtraction).
_ALNUM = r"[[\p{L}\p{M}\p{Nd}]--[\p{Han}\p{Hiragana}\p{Katakana}]]"
# UAX#29 WB15/16: regional indicators bind in PAIRS (a flag = one
# token; an odd trailing RI stands alone). WB3c: no break inside
# emoji ZWJ sequences; Extended_Pictographic with variation selectors
# (FE0F), skin-tone modifiers (1F3FB-1F3FF) and combining marks stays
# one token — Lucene 8.x StandardTokenizer emits these as <EMOJI>.
# Text-default pictographs (\u00A9/\u00AE/\u2122/\u3030/\u303D: Emoji_Presentation=No symbols
# that double as ordinary text) are emoji ONLY with an explicit FE0F
# presentation selector \u2014 Lucene 8.x drops the bare forms as
# punctuation, so the standalone branch must not emit them (ADVICE r8).
_TEXT_DEFAULT_PICTO = "\u00A9\u00AE\u2122\u3030\u303D"
_EMOJI_UNIT = (
    rf"(?:[{_TEXT_DEFAULT_PICTO}]\uFE0F"
    rf"|[\p{{Extended_Pictographic}}--[{_TEXT_DEFAULT_PICTO}]])"
    r"[\uFE0F\U0001F3FB-\U0001F3FF\p{Mn}]*"
)
# Emoji keycap sequence (UTS#51 ED-20): [0-9#*] + optional FE0F +
# U+20E3 combining enclosing keycap is ONE token ("1\uFE0F\u20E3") \u2014
# checked before the alnum branch so the digit isn't split off.
_KEYCAP = r"[0-9#*]\uFE0F?\u20E3"
_STANDARD = re.compile(
    rf"{_KEYCAP}"
    r"|\p{Regional_Indicator}{2}"
    r"|\p{Regional_Indicator}"
    rf"|{_EMOJI_UNIT}(?:\u200D{_EMOJI_UNIT})*"
    r"|\p{Katakana}+"
    r"|[\p{Han}\p{Hiragana}]"
    rf"|{_ALNUM}+"
    rf"(?:(?:(?<=\p{{L}})['’.](?=\p{{L}})|(?<=\p{{Nd}})[.,](?=\p{{Nd}})){_ALNUM}+)*",
    re.UNICODE | re.V1,
)
# ClassicTokenizer (pre-UAX#29 Lucene grammar) emits TYPED tokens; the
# types drive ClassicFilter (possessive/acronym stripping) downstream.
# ACRONYM = letter-dot pairs INCLUDING the trailing dot ("U.S.A.");
# APOSTROPHE = letters with internal ASCII apostrophes ("John's");
# EMAIL / HOST / COMPANY per the classic jflex grammar ("foo@bar.com",
# "example.com", "AT&T" are each ONE typed token). jflex resolves
# ACRONYM-vs-HOST by longest match, so "U.S.A." is an ACRONYM but
# dotless "U.S.A" is a HOST — the (?!\p{L}) lookahead reproduces that;
# NUM before HOST keeps "3.14" a NUM.
_CLASSIC_TYPED = re.compile(
    r"(?P<EMAIL>[\p{L}\p{Nd}]+(?:[._-][\p{L}\p{Nd}]+)*"
    r"@[\p{L}\p{Nd}]+(?:[.-][\p{L}\p{Nd}]+)+)"
    r"|(?P<ACRONYM>\p{L}\.(?:\p{L}\.)+(?!\p{L}))"
    r"|(?P<COMPANY>\p{L}+[&@]\p{L}+)"
    r"|(?P<APOSTROPHE>\p{L}+(?:'\p{L}+)+)"
    r"|(?P<NUM>\p{Nd}+(?:[.,]\p{Nd}+)*)"
    r"|(?P<HOST>[\p{L}\p{Nd}]+(?:\.[\p{L}\p{Nd}]+)+)"
    r"|(?P<ALPHANUM>[\p{L}\p{M}\p{Nd}]+)",
    re.UNICODE,
)
_CLASSIC = _CLASSIC_TYPED
_LETTER = re.compile(r"[\p{L}\p{M}]+", re.UNICODE)
# Lucene WhitespaceTokenizer splits on java Character.isWhitespace —
# which EXCLUDES no-break spaces (U+00A0, U+2007, U+202F);
# UnicodeWhitespaceTokenizer splits on the Unicode whitespace property
# (includes them). Mirror the distinction.
_JAVA_WS = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x1680]
        + list(range(0x2000, 0x2007))      # 2000-2006 (2007 is no-break)
        + list(range(0x2008, 0x200B))      # 2008-200A
        + [0x2028, 0x2029, 0x205F, 0x3000]
    )
)
_WHITESPACE = re.compile(f"[^{re.escape(_JAVA_WS)}]+", re.UNICODE)
_UNICODE_WHITESPACE = re.compile(r"\S+", re.UNICODE)
# reference `strict` tokenizer regex (text_analysis.clj:58-60): splits on
# anything NOT in [a-zA-Z0-9{}\[\]()<>#+=@&'] — i.e. tokens are runs of
# those chars.
_STRICT = re.compile(r"[a-zA-Z0-9{}\[\]()<>#+=@&']+")

_PATTERNS = {
    "standard": _STANDARD,
    "classic": _CLASSIC,
    "letter": _LETTER,
    "whitespace": _WHITESPACE,
    "unicode-whitespace": _UNICODE_WHITESPACE,
    "strict": _STRICT,
}

# ASCII-restricted twin of _STANDARD, compiled with the stdlib `re`
# engine (~2.4x faster than the regex-module UAX#29 pattern on this
# corpus). For pure-ASCII input the keycap / regional-indicator /
# emoji / CJK branches of _STANDARD are unreachable (every char they
# can match is non-ASCII, incl. the '’' joiner), so the full grammar
# collapses to the alnum run + ASCII join rules below. Equivalence is
# pinned by tests/test_analysis.py::test_ascii_fastpath_equivalence.
_ASCII_STANDARD = sre.compile(
    r"[0-9A-Za-z]+"
    r"(?:(?:(?<=[A-Za-z])['.](?=[A-Za-z])|(?<=[0-9])[.,](?=[0-9]))[0-9A-Za-z]+)*"
)
# Same idea for the letter tokenizer: \p{L}\p{M} runs restricted to
# ASCII are exactly [A-Za-z] runs.
_ASCII_LETTER = sre.compile(r"[A-Za-z]+")
_ASCII_TWINS = {"standard": _ASCII_STANDARD, "letter": _ASCII_LETTER}


def _scan(pattern: re.Pattern, text: str) -> list[Token]:
    return [Token(m.group(), m.start(), m.end()) for m in pattern.finditer(text)]


def tokenize_classic_typed(text: str) -> list[tuple[Token, str]]:
    """Classic tokenization with Lucene token types (ACRONYM /
    APOSTROPHE / NUM / ALPHANUM) — ClassicFilter keys off the type
    (Lucene ClassicFilter.incrementToken)."""
    return [
        (Token(m.group(), m.start(), m.end()), m.lastgroup)
        for m in _CLASSIC_TYPED.finditer(text)
    ]


def _keyword(text: str) -> list[Token]:
    # Lucene KeywordTokenizer: entire input is one token.
    return [Token(text, 0, len(text))] if text else []


def _keyword_lower(text: str) -> list[Token]:
    return [Token(text.lower(), 0, len(text))] if text else []


def _make_scanner(pattern, ascii_twin=None, lower: bool = False):
    """Build a scan fn, optionally fusing the LowerCaseFilter into the
    match loop (one Token construction per token instead of two — the
    annotate hot path lowers every token) and optionally dispatching
    pure-ASCII input to a faster stdlib-re twin pattern."""
    if lower:
        def scan(text: str) -> list[Token]:
            return [
                Token(m.group().lower(), m.start(), m.end())
                for m in pattern.finditer(text)
            ]
    else:
        def scan(text: str) -> list[Token]:
            return [Token(m.group(), m.start(), m.end()) for m in pattern.finditer(text)]
    if ascii_twin is None:
        return scan
    fast = _make_scanner(ascii_twin, None, lower)
    slow = scan

    def dispatch(text: str) -> list[Token]:
        return fast(text) if text.isascii() else slow(text)

    return dispatch


@lru_cache(maxsize=64)
def get_tokenizer(name: str, lower: bool = False):
    """Return fn(text) -> list[Token]. Unknown name -> standard
    (reference: text_analysis.clj:62-63 logs at debug and defaults).

    ``lower=True`` fuses the LowerCaseFilter into the scan (identical
    output to lowering each token afterwards — per-char lowercase never
    empties a token, and offsets are taken from the original text)."""
    name = (name or "standard").lstrip(":").lower()
    if name == "keyword":
        return _keyword_lower if lower else _keyword
    pattern = _PATTERNS.get(name, _STANDARD)
    twin = _ASCII_TWINS.get(name if name in _PATTERNS else "standard")
    return _make_scanner(pattern, twin, lower)
