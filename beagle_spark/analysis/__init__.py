"""Text-analysis chain: tokenize -> lowercase -> ascii-fold -> stem.

Mirrors the reference's analyzer construction and config cascade
(reference: src/beagle/text_analysis.clj). Key semantics carried over:

- Library defaults: standard tokenizer, CASE-SENSITIVE, no fold, no stem,
  english stemmer (text_analysis.clj:101-106).
- Three-way merge per key: entry config > highlighter defaults > library
  defaults (text_analysis.clj:110-126).
- Canonical field name per distinct config (text_analysis.clj:84-96) —
  used as the derived token-column identity so each document is analyzed
  once per distinct config, not once per query (monitor.clj:48-59).
- Filter order: tokenize -> lowercase -> fold -> stem
  (text_analysis.clj:73-80).
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from functools import lru_cache

from .stem import get_stemmer
from .tokenizers import Token, get_tokenizer, tokenize_classic_typed

__all__ = [
    "AnalysisConfig",
    "Token",
    "DEFAULT_CONF",
    "merge_config",
    "field_name",
    "analyze",
    "text_to_token_strings",
    "ascii_fold",
]

DEFAULT_CONF = {
    "tokenizer": "standard",
    "case_sensitive": True,
    "ascii_fold": False,
    "stem": False,
    "stemmer": "english",
}


@dataclass(frozen=True)
class AnalysisConfig:
    tokenizer: str = "standard"
    case_sensitive: bool = True
    ascii_fold: bool = False
    stem: bool = False
    stemmer: str = "english"


def _pick(key, entry: dict, defaults: dict):
    """Three-way merge for one key (reference: text_analysis.clj:110-126):
    entry value if set, else highlighter default, else library default."""
    for src in (entry, defaults, DEFAULT_CONF):
        v = src.get(key)
        if v is not None:
            return v
    return None


def merge_config(entry: dict, defaults: dict | None = None) -> AnalysisConfig:
    defaults = defaults or {}
    return AnalysisConfig(
        tokenizer=str(_pick("tokenizer", entry, defaults)).lstrip(":"),
        case_sensitive=bool(_pick("case_sensitive", entry, defaults)),
        ascii_fold=bool(_pick("ascii_fold", entry, defaults)),
        stem=bool(_pick("stem", entry, defaults)),
        stemmer=str(_pick("stemmer", entry, defaults)).lstrip(":"),
    )


def field_name(conf: AnalysisConfig) -> str:
    """Canonical analysis identity (reference: text_analysis.clj:84-96):
    `text.<tokenizer>-tokenizer[.<filters...>]` with filters in the fixed
    order the reference emits (folded, lowercased, stemmed-<lang>)."""
    parts = [f"text.{conf.tokenizer}-tokenizer"]
    filters = []
    if conf.ascii_fold:
        filters.append("ascii-folded")
    if not conf.case_sensitive:
        filters.append("lowercased")
    if conf.stem:
        filters.append(f"stemmed-{conf.stemmer}")
    if filters:
        parts.append("-".join(filters))
    return ".".join(parts)


def ascii_fold(s: str) -> str:
    """ASCIIFoldingFilter approximation: NFKD-decompose and drop combining
    marks; non-decomposable non-ASCII chars pass through."""
    if s.isascii():
        return s
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        out.append(ch)
    return "".join(out)


def _classic_filtered_tokenize(text: str) -> list[Token]:
    """ClassicFilter over classic-typed tokens (Lucene ClassicFilter):
    APOSTROPHE tokens lose a trailing 's / 'S; ACRONYM tokens lose all
    dots. Offsets keep the ORIGINAL token span (the filter shrinks the
    term text only), so highlights cover e.g. the whole "John's"."""
    out = []
    for t, typ in tokenize_classic_typed(text):
        s = t.text
        if typ == "APOSTROPHE" and len(s) >= 2 and s[-2] == "'" and s[-1] in "sS":
            s = s[:-2]
        elif typ == "ACRONYM":
            s = s.replace(".", "")
        out.append(Token(s, t.begin, t.end))
    return out


@lru_cache(maxsize=64)
def _chain(conf: AnalysisConfig):
    """Build the token-transform chain once per config (reference memoizes
    analyzers, text_analysis.clj:98-99).

    ClassicFilter parity (text_analysis.clj:77-81): the reference wraps
    the chain in ClassicFilter only when stem? is false AND the chain is
    still the bare tokenizer (no LowerCaseFilter, no ASCIIFoldingFilter —
    i.e. case-sensitive and no fold). Lucene's ClassicFilter acts only on
    ACRONYM/APOSTROPHE token types, which only ClassicTokenizer emits —
    for the standard tokenizer it is a no-op (StandardTokenizer emits
    <ALPHANUM>/<NUM>), so "John's" stays one unstripped token under the
    DEFAULT config, and strips to "John" under tokenizer=classic."""
    classic_filter = (
        conf.tokenizer == "classic"
        and not conf.stem
        and conf.case_sensitive
        and not conf.ascii_fold
    )
    stem_fn = get_stemmer(conf.stemmer) if conf.stem else None
    lower = not conf.case_sensitive
    fold = conf.ascii_fold
    if not classic_filter and not fold and stem_fn is None:
        # fast path (the common annotate configs): the optional
        # LowerCaseFilter is fused into the scan loop — one Token per
        # token instead of scan-then-rebuild (see get_tokenizer).
        return get_tokenizer(conf.tokenizer, lower=lower)
    tokenize = _classic_filtered_tokenize if classic_filter else get_tokenizer(conf.tokenizer)

    def run(text: str) -> list[Token]:
        toks = tokenize(text)
        if not (lower or fold or stem_fn):
            return toks
        out = []
        for t in toks:
            s = t.text
            if lower:
                s = s.lower()
            if fold:
                s = ascii_fold(s)
            if stem_fn is not None:
                s = stem_fn(s)
            if s:
                out.append(Token(s, t.begin, t.end))
        return out

    return run


def analyze(text: str, conf: AnalysisConfig) -> list[Token]:
    """Tokenize + filter, preserving original char offsets."""
    return _chain(conf)(text)


def text_to_token_strings(text: str, conf: AnalysisConfig) -> list[str]:
    """Reference `text->token-strings` (text_analysis.clj:136-148)."""
    return [t.text for t in analyze(text, conf)]
