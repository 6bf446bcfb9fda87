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

from functools import lru_cache
from typing import NamedTuple

import regex as re


class Token(NamedTuple):
    text: str
    begin: int
    end: int


# UAX#29-ish word: numbers may contain internal . or , between digits;
# words are letter/digit/mark runs; apostrophe kept inside letter runs
# (Lucene StandardTokenizer keeps "don't" as one token).
_STANDARD = re.compile(
    r"\d+(?:[.,]\d+)*|[\p{L}\p{M}\p{Nd}]+(?:['’][\p{L}\p{M}]+)*",
    re.UNICODE,
)
# classic ≈ standard for our purposes (ClassicTokenizer additionally
# handles emails/hosts; the reference's tests don't pin those).
_CLASSIC = _STANDARD
_LETTER = re.compile(r"[\p{L}\p{M}]+", re.UNICODE)
_WHITESPACE = re.compile(r"\S+", re.UNICODE)
# reference `strict` tokenizer regex (text_analysis.clj:58-60): splits on
# anything NOT in [a-zA-Z0-9{}\[\]()<>#+=@&'] — i.e. tokens are runs of
# those chars.
_STRICT = re.compile(r"[a-zA-Z0-9{}\[\]()<>#+=@&']+")

_PATTERNS = {
    "standard": _STANDARD,
    "classic": _CLASSIC,
    "letter": _LETTER,
    "whitespace": _WHITESPACE,
    "unicode-whitespace": _WHITESPACE,
    "strict": _STRICT,
}


def _scan(pattern: re.Pattern, text: str) -> list[Token]:
    return [Token(m.group(), m.start(), m.end()) for m in pattern.finditer(text)]


def _keyword(text: str) -> list[Token]:
    # Lucene KeywordTokenizer: entire input is one token.
    return [Token(text, 0, len(text))] if text else []


@lru_cache(maxsize=32)
def get_tokenizer(name: str):
    """Return fn(text) -> list[Token]. Unknown name -> standard
    (reference: text_analysis.clj:62-63 logs at debug and defaults)."""
    name = (name or "standard").lstrip(":").lower()
    if name == "keyword":
        return _keyword
    pattern = _PATTERNS.get(name, _STANDARD)
    return lambda text: _scan(pattern, text)
