"""Dictionary readers: CSV / JSON / EDN (reference:
src/beagle/readers.clj:11-51).

Semantics carried over exactly:
- CSV is header-driven: header tokens become keys (readers.clj:20-25).
- All cells trimmed; blank cells dropped (readers.clj:23-25).
- `synonyms` split on `;`, items trimmed (readers.clj:26-29).
- `case-sensitive?`/`ascii-fold?` parsed Java-`Boolean/valueOf`-style:
  any string other than case-insensitive "true" is False
  (readers.clj:30-37).
- `meta` split on `;` into consecutive k/v pairs; an odd trailing key is
  dropped (readers.clj:38-46, README.md:232).

Dictionaries are small, slowly-changing data: reading is driver-side
plain Python (no Spark job), the compiled form is broadcast. A
DataFrame loader is provided for dictionaries that live in a lake.
"""

from __future__ import annotations

import csv
import io
import json
from typing import IO, Union

Source = Union[str, IO]


def _reader(source: Source, mode="r"):
    if hasattr(source, "read"):
        return io.StringIO(source.read()) if mode == "r" else source
    return open(source, mode, encoding="utf-8")


def _java_boolean(s: str) -> bool:
    """Boolean/valueOf: true iff equalsIgnoreCase('true')."""
    return str(s).strip().lower() == "true"


def read_csv(source: Source) -> list[dict]:
    with _reader(source) as f:
        rows = list(csv.reader(f, delimiter=",", quotechar='"'))
    if not rows:
        return []
    header, *lines = rows
    header = [h.strip() for h in header]
    out = []
    for line in lines:
        if not line:
            continue
        d = {k: v.strip() for k, v in zip(header, line)}
        d = {k: v for k, v in d.items() if v}  # drop blank cells
        if "synonyms" in d:
            d["synonyms"] = [s.strip() for s in d["synonyms"].split(";")]
        for bkey in ("case-sensitive?", "ascii-fold?", "stem?", "fuzzy?", "in-order?"):
            if bkey in d:
                d[bkey] = _java_boolean(d[bkey])
        if "slop" in d:
            d["slop"] = int(d["slop"])
        if "fuzziness" in d:
            d["fuzziness"] = int(d["fuzziness"])
        if "meta" in d and isinstance(d["meta"], str):
            parts = [p.strip() for p in d["meta"].split(";")]
            meta = {}
            for i in range(0, len(parts) - 1, 2):  # odd trailing key dropped
                if parts[i + 1]:
                    meta[parts[i]] = parts[i + 1]
            d["meta"] = meta
        out.append(d)
    return out


def read_json(source: Source) -> list[dict]:
    with _reader(source) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Minimal EDN reader — enough for dictionary files: vectors/lists, maps,
# sets, strings, numbers, booleans, nil, keywords (readers.clj:11-16).
# Driver-only, dictionaries are tiny.
# ---------------------------------------------------------------------------
class _EdnParser:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def _ws(self):
        while self.i < len(self.t):
            c = self.t[self.i]
            if c in " \t\n\r,":
                self.i += 1
            elif c == ";":  # comment to EOL
                while self.i < len(self.t) and self.t[self.i] != "\n":
                    self.i += 1
            else:
                break

    def parse(self):
        self._ws()
        c = self.t[self.i]
        if c == "[" or c == "(":
            return self._seq("]" if c == "[" else ")")
        if c == "{":
            return self._map()
        if c == "#" and self.t[self.i : self.i + 2] == "#{":
            self.i += 1
            return set(self._seq("}"))
        if c == '"':
            return self._string()
        if c == ":":
            return self._keyword()
        return self._atom()

    def _seq(self, close):
        self.i += 1
        out = []
        while True:
            self._ws()
            if self.t[self.i] == close:
                self.i += 1
                return out
            out.append(self.parse())

    def _map(self):
        self.i += 1
        out = {}
        while True:
            self._ws()
            if self.t[self.i] == "}":
                self.i += 1
                return out
            k = self.parse()
            v = self.parse()
            if isinstance(k, (list, set, dict)):
                k = str(k)
            out[k] = v

    def _string(self):
        self.i += 1
        buf = []
        while self.t[self.i] != '"':
            c = self.t[self.i]
            if c == "\\":
                self.i += 1
                esc = self.t[self.i]
                buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
            else:
                buf.append(c)
            self.i += 1
        self.i += 1
        return "".join(buf)

    def _keyword(self):
        j = self.i + 1
        while j < len(self.t) and self.t[j] not in ' \t\n\r,]})("':
            j += 1
        kw = self.t[self.i + 1 : j]
        self.i = j
        return kw  # keywords surface as plain strings

    def _atom(self):
        j = self.i
        while j < len(self.t) and self.t[j] not in ' \t\n\r,]})("':
            j += 1
        tok = self.t[self.i : j]
        self.i = j
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "nil":
            return None
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return tok


def read_edn(source: Source):
    with _reader(source) as f:
        return _EdnParser(f.read()).parse()


def read_dictionary_df(spark, path: str, fmt: str = "csv") -> list[dict]:
    """Load a dictionary stored in the lake via Spark, collect to the
    driver (dictionaries are small by design — they get broadcast)."""
    if fmt == "csv":
        df = spark.read.option("header", True).csv(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"File type not supported: `{fmt}`")
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return [{k: v for k, v in r.items() if v is not None} for r in rows]
