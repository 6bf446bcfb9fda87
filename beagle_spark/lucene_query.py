"""Lucene-style query-string annotator ("alpha" API surface).

Reference: src/beagle/lucene_alpha.clj — dictionary `text` is parsed as
a classic Lucene query string (booleans, phrases, regex, wildcards,
fuzzy); matching is boolean per document (QueryMatch.SIMPLE_MATCHER),
returning the query text + id + meta but NO offsets
(lucene_alpha.clj:18-28). Default type "QUERY" (lucene_alpha.clj:60).
Parse errors are logged and the entry dropped (lucene_alpha.clj:41-43).

Engine design: query string -> small AST -> either
  (a) a per-document Python evaluator over the analyzed token list
      (used inside the same Arrow-batched UDF as the phrase matcher), or
  (b) a Spark SQL boolean Column over a token-array column
      (`to_spark_predicate`) for queries without phrase clauses —
      pure JVM, whole-stage-codegen'able, the Spark-first fast path.
"""

from __future__ import annotations

import logging
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Iterator, Optional

import pandas as pd
import regex as re

from .analysis import analyze, field_name, merge_config
from .matcher.core import dl_distance_leq

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TermQ:
    term: str


@dataclass(frozen=True)
class FuzzyQ:
    term: str
    max_edits: int = 2


@dataclass(frozen=True)
class WildcardQ:
    pattern: str  # original with * and ?


@dataclass(frozen=True)
class RegexpQ:
    pattern: str


@dataclass(frozen=True)
class PhraseQ:
    terms: tuple[str, ...]
    slop: int = 0


@dataclass(frozen=True)
class RangeQ:
    """Term range [a TO b] / {a TO b} (classic QueryParser
    TermRangeQuery): matches any analyzed token lexicographically
    within the bounds; '*' endpoint = open-ended."""
    lower: Optional[str]
    upper: Optional[str]
    incl_lower: bool = True
    incl_upper: bool = True


@dataclass(frozen=True)
class BoolQ:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()


# ---------------------------------------------------------------------------
# Tokenizer for the query language
# ---------------------------------------------------------------------------
_TOK = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|
        (?P<and>AND\b|&&)|(?P<or>OR\b|\|\|)|(?P<not>NOT\b|!)|
        (?P<plus>\+)|(?P<minus>-)|
        (?P<range>[\[\{][^\[\]{}]*?\sTO\s[^\[\]{}]*?[\]\}])|
        (?P<phrase>"(?:[^"\\]|\\.)*"(?:~(?P<pslop>\d+))?)|
        (?P<regex>/(?:[^/\\]|\\.)*/)|
        (?P<boost>\^\d+(?:\.\d+)?)|
        (?P<term>(?:\\.|[^\s()"/\\^\[\]{}])+)
    )""",
    re.VERBOSE,
)


def _unescape(s: str) -> str:
    """Remove QueryParser backslash escapes: '\\X' -> 'X'."""
    return re.sub(r"\\(.)", r"\1", s)


class ParseError(ValueError):
    pass


def _lex(s: str):
    out = []
    i = 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise ParseError(f"cannot lex at {i}: {s[i:]!r}")
            break
        i = m.end()
        kind = m.lastgroup if m.lastgroup != "pslop" else "phrase"
        for k in ("lparen", "rparen", "and", "or", "not", "plus", "minus",
                  "range", "phrase", "regex", "boost", "term"):
            if m.group(k):
                out.append((k, m.group(k), m.groupdict().get("pslop")))
                break
    return out


class _Parser:
    """Pratt-ish parser: OR < AND < NOT/unary; bare terms at the same
    level combine as SHOULD (classic QueryParser default OR)."""

    def __init__(self, toks, conf):
        self.toks = toks
        self.i = 0
        self.conf = conf

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.i < len(self.toks):
            raise ParseError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def parse_or(self):
        parts = [self.parse_and()]
        while self.peek()[0] == "or":
            self.next()
            parts.append(self.parse_and())
        if len(parts) == 1:
            return parts[0]
        return BoolQ(should=tuple(parts))

    def parse_and(self):
        parts = [self.parse_clauses()]
        while self.peek()[0] == "and":
            self.next()
            parts.append(self.parse_clauses())
        if len(parts) == 1:
            return parts[0]
        return BoolQ(must=tuple(parts))

    def parse_clauses(self):
        """A run of +/-/bare atoms (implicit SHOULD combination)."""
        must, should, must_not = [], [], []
        while True:
            kind, _, _ = self.peek()
            if kind in (None, "rparen", "and", "or"):
                break
            if kind == "plus":
                self.next()
                must.append(self.parse_boosted_atom())
            elif kind in ("minus", "not"):
                self.next()
                must_not.append(self.parse_boosted_atom())
            else:
                should.append(self.parse_boosted_atom())
        if not (must or should or must_not):
            raise ParseError("empty clause")
        if len(should) == 1 and not must and not must_not:
            return should[0]
        return BoolQ(must=tuple(must), should=tuple(should), must_not=tuple(must_not))

    def parse_boosted_atom(self):
        """Atom plus any trailing boost tokens (`term^2`, `"a b"^3`,
        `(x y)^0.5`). Boosts are irrelevant to boolean matching (the
        reference's SIMPLE_MATCHER ignores scores), so they are parsed
        and dropped — NOT a parse error."""
        node = self.parse_atom()
        while self.peek()[0] == "boost":
            self.next()
        return node

    def parse_atom(self):
        kind, text, pslop = self.next()
        if (
            kind == "term"
            and self.peek()[0] in ("range", "lparen", "phrase", "regex")
            and re.fullmatch(r"(?:\\.|[^\\:])+:", text)
        ):
            # `field:` immediately before a range/group/phrase/regex binds
            # the field to that clause; single-field engine drops the
            # qualifier (same convention as field:term below) instead of
            # emitting a spurious TermQ("field").
            kind, text, pslop = self.next()
        if kind == "lparen":
            node = self.parse_or()
            if self.next()[0] != "rparen":
                raise ParseError("expected )")
            return node
        if kind == "phrase":
            body = text[1 : text.rindex('"')]
            slop = int(pslop) if pslop else 0
            terms = tuple(t.text for t in analyze(_unescape(body), self.conf))
            if not terms:
                raise ParseError(f"phrase analyzes to no terms: {body!r}")
            return PhraseQ(terms=terms, slop=slop)
        if kind == "regex":
            return RegexpQ(pattern=text[1:-1])
        if kind == "range":
            m = re.fullmatch(
                r"([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])", text
            )
            if not m:
                raise ParseError(f"malformed range: {text!r}")
            lo_raw, hi_raw = _unescape(m.group(2)), _unescape(m.group(3))

            def endpoint(raw):
                if raw == "*":
                    return None
                analyzed = [t.text for t in analyze(raw, self.conf)]
                return analyzed[0] if analyzed else raw

            return RangeQ(
                lower=endpoint(lo_raw),
                upper=endpoint(hi_raw),
                incl_lower=m.group(1) == "[",
                incl_upper=m.group(4) == "]",
            )
        if kind == "term":
            # field:term -> ignore the field prefix (single-field
            # engine); the colon must not be escaped
            m = re.match(r"^(?:\\.|[^\\:])+:(?!$)", text)
            if m and not text.startswith(":"):
                text = text[m.end():]
            fuzzy = None
            m = re.fullmatch(r"(.+?)(?<!\\)~(\d*)", text)
            if m:
                text, n = m.group(1), m.group(2)
                fuzzy = int(n) if n else 2
            if re.search(r"(?<!\\)[*?]", text):
                return WildcardQ(pattern=text)
            analyzed = [t.text for t in analyze(_unescape(text), self.conf)]
            term = analyzed[0] if analyzed else _unescape(text)
            if fuzzy is not None:
                return FuzzyQ(term=term, max_edits=fuzzy)
            return TermQ(term=term)
        raise ParseError(f"unexpected token {kind}:{text}")


def parse_query(query_string: str, conf) -> BoolQ | TermQ | PhraseQ | RegexpQ | WildcardQ | FuzzyQ:
    toks = _lex(query_string)
    if not toks:
        raise ParseError("empty query")
    return _Parser(toks, conf).parse()


# ---------------------------------------------------------------------------
# Local evaluation over an analyzed token list
# ---------------------------------------------------------------------------
def _wildcard_to_regex(pattern: str) -> re.Pattern:
    parts = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):  # escaped char is literal
            parts.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
        i += 1
    return re.compile("".join(parts))


def _in_range(t: str, node: "RangeQ") -> bool:
    if node.lower is not None:
        if t < node.lower or (not node.incl_lower and t == node.lower):
            return False
    if node.upper is not None:
        if t > node.upper or (not node.incl_upper and t == node.upper):
            return False
    return True


def eval_query(node, token_list: list[str], token_set: set) -> bool:
    if isinstance(node, TermQ):
        return node.term in token_set
    if isinstance(node, FuzzyQ):
        return any(dl_distance_leq(node.term, t, node.max_edits) for t in token_set)
    if isinstance(node, WildcardQ):
        rx = _wildcard_to_regex(node.pattern)
        return any(rx.fullmatch(t) for t in token_set)
    if isinstance(node, RegexpQ):
        rx = re.compile(node.pattern)
        return any(rx.fullmatch(t) for t in token_set)
    if isinstance(node, RangeQ):
        return any(_in_range(t, node) for t in token_set)
    if isinstance(node, PhraseQ):
        k = len(node.terms)
        if k == 1:
            return node.terms[0] in token_set
        # sloppy-phrase existence over string positions
        from .matcher.core import CompiledQuery, find_matches
        from .analysis import Token

        toks = [Token(t, i, i + 1) for i, t in enumerate(token_list)]
        q = CompiledQuery(query_id="", terms=node.terms, field="", slop=node.slop)
        return bool(find_matches(toks, q))
    if isinstance(node, BoolQ):
        for m in node.must_not:
            if eval_query(m, token_list, token_set):
                return False
        for m in node.must:
            if not eval_query(m, token_list, token_set):
                return False
        if node.should and not node.must:
            return any(eval_query(s, token_list, token_set) for s in node.should)
        return bool(node.must) or not node.should
    raise TypeError(f"unknown node {node!r}")


def has_phrase(node) -> bool:
    if isinstance(node, PhraseQ):
        return len(node.terms) > 1
    if isinstance(node, BoolQ):
        return any(has_phrase(c) for c in node.must + node.should + node.must_not)
    return False


# ---------------------------------------------------------------------------
# Spark Column compilation (phrase-free queries): pure JVM predicate
# ---------------------------------------------------------------------------
def to_spark_predicate(node, tokens_col):
    """Compile a phrase-free AST to a Column over an array<string> token
    column: array_contains / exists(rlike) / AND/OR/NOT. Stays inside
    whole-stage codegen — no Python in the hot path."""
    from pyspark.sql import functions as F

    if isinstance(node, TermQ):
        return F.array_contains(tokens_col, node.term)
    if isinstance(node, (RegexpQ, WildcardQ)):
        pat = (
            node.pattern
            if isinstance(node, RegexpQ)
            else _wildcard_to_regex(node.pattern).pattern
        )
        return F.exists(tokens_col, lambda t: t.rlike(f"^(?:{pat})$"))
    if isinstance(node, PhraseQ) and len(node.terms) == 1:
        return F.array_contains(tokens_col, node.terms[0])
    if isinstance(node, RangeQ):
        def in_range(t):
            cond = F.lit(True)
            if node.lower is not None:
                lo = F.lit(node.lower)
                cond = cond & ((t >= lo) if node.incl_lower else (t > lo))
            if node.upper is not None:
                hi = F.lit(node.upper)
                cond = cond & ((t <= hi) if node.incl_upper else (t < hi))
            return cond

        return F.exists(tokens_col, in_range)
    if isinstance(node, FuzzyQ):
        raise ValueError("fuzzy term not SQL-expressible; use the UDF path")
    if isinstance(node, BoolQ):
        import functools

        cond = F.lit(True)
        if node.must:
            cond = functools.reduce(
                lambda a, b: a & b, (to_spark_predicate(m, tokens_col) for m in node.must)
            )
        if node.should and not node.must:
            cond = functools.reduce(
                lambda a, b: a | b, (to_spark_predicate(s, tokens_col) for s in node.should)
            )
        for m in node.must_not:
            cond = cond & ~to_spark_predicate(m, tokens_col)
        return cond
    raise ValueError(f"not SQL-expressible: {node!r}")


# ---------------------------------------------------------------------------
# Public API (parity with lucene_alpha/annotator)
# ---------------------------------------------------------------------------
@dataclass
class CompiledLuceneQuery:
    query_id: str
    query_string: str
    ast: object
    conf: object
    type: Optional[str] = None
    meta: dict = dc_field(default_factory=dict)


def compile_lucene_dictionary(dictionary, opts: dict | None = None):
    opts = opts or {}
    default_conf = {
        str(k).lstrip(":").replace("-", "_").rstrip("?"): v for k, v in opts.items()
    }
    type_name = default_conf.pop("type_name", None) or "QUERY"
    compiled = []
    for idx, entry in enumerate(dictionary):
        entry = {str(k).lstrip(":"): v for k, v in entry.items()}
        conf = merge_config(
            {k.replace("-", "_").rstrip("?"): v for k, v in entry.items()}, default_conf
        )
        try:
            ast = parse_query(entry["text"], conf)
        except Exception as e:  # parse failure -> drop entry (lucene_alpha.clj:41-43)
            logger.error("Failed to parse query %r: %s", entry.get("text"), e)
            continue
        meta = {str(k).lstrip(":"): str(v) for k, v in (entry.get("meta") or {}).items()}
        compiled.append(
            CompiledLuceneQuery(
                query_id=str(entry.get("id") or idx),
                query_string=entry["text"],
                ast=ast,
                conf=conf,
                type=entry.get("type"),
                meta=meta,
            )
        )
    return compiled, type_name


def _make_matcher(compiled, type_name):
    def annotate(text: str, _opts: dict | None = None) -> list[dict]:
        if text is None or not text.strip():
            return []
        out = []
        by_conf: dict = {}
        for cq in compiled:
            key = cq.conf
            if key not in by_conf:
                tl = [t.text for t in analyze(text, key)]
                by_conf[key] = (tl, set(tl))
            token_list, token_set = by_conf[key]
            if eval_query(cq.ast, token_list, token_set):
                out.append(
                    {
                        "text": cq.query_string,
                        "type": cq.type if cq.type is not None else type_name,
                        "dict_entry_id": cq.query_id,
                        "meta": cq.meta,
                    }
                )
        return out

    return annotate


def lucene_annotator(dictionary, opts: dict | None = None):
    """Local API parity (lucene_alpha.clj:57-66): fn(text) -> matches
    with {text: query-string, type, dict_entry_id, meta} — no offsets."""
    compiled, type_name = compile_lucene_dictionary(dictionary, opts)
    annotate = _make_matcher(compiled, type_name)
    annotate.compiled = compiled  # type: ignore[attr-defined]
    return annotate


def lucene_annotate_df(df, dictionary, text_col: str = "text", opts: dict | None = None,
                       output_col: str = "query_matches"):
    """DataFrame operator: array<struct> of boolean query matches per row.
    Same broadcast + Arrow-batch design as the phrase annotator."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (ArrayType, MapType, StringType, StructField,
                                   StructType)

    schema = ArrayType(
        StructType(
            [
                StructField("text", StringType()),
                StructField("type", StringType()),
                StructField("dict_entry_id", StringType()),
                StructField("meta", MapType(StringType(), StringType())),
            ]
        )
    )
    spark = df.sparkSession
    # broadcast the picklable compiled form; rebuild the evaluator per
    # executor (closures over module functions don't pickle)
    compiled, type_name = compile_lucene_dictionary(dictionary, opts)
    bc = spark.sparkContext.broadcast((compiled, type_name))

    @pandas_udf(schema)
    def match_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cqs, tname = bc.value
        f = _make_matcher(cqs, tname)
        for s in batches:
            yield s.map(f)

    # non-deterministic mark: stop filter pushdown from duplicating the
    # UDF evaluation (guide §4.4; same rationale as Annotator.udf)
    return df.withColumn(output_col, match_udf.asNondeterministic()(F.col(text_col)))
