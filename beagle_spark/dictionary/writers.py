"""Dictionary persistence (reference A10: queries are serialized as
(id, query-string, metadata) JSON and recompiled from source text on
load — monitor.clj:12-25; we persist the dictionary itself and always
recompile, never the compiled form)."""

from __future__ import annotations

import csv
import json
from typing import IO, Union

Sink = Union[str, IO]


def _writer(sink: Sink):
    if hasattr(sink, "write"):
        return sink, False
    return open(sink, "w", encoding="utf-8"), True


def write_json(dictionary: list[dict], sink: Sink) -> None:
    f, close = _writer(sink)
    try:
        json.dump([_clean(e) for e in dictionary], f, ensure_ascii=False, indent=1)
    finally:
        if close:
            f.close()


CSV_COLUMNS = [
    "text", "type", "id", "synonyms", "case-sensitive?", "ascii-fold?",
    "stem?", "stemmer", "slop", "in-order?", "tokenizer", "fuzzy?",
    "fuzziness", "meta",
]


def write_csv(dictionary: list[dict], sink: Sink) -> None:
    """Inverse of readers.read_csv: synonyms joined with ';', meta
    flattened to alternating k;v."""
    f, close = _writer(sink)
    try:
        w = csv.writer(f)
        w.writerow(CSV_COLUMNS)
        for e in dictionary:
            e = _clean(e)
            row = []
            for col in CSV_COLUMNS:
                v = e.get(col)
                if v is None:
                    row.append("")
                elif col == "synonyms":
                    row.append(";".join(v))
                elif col == "meta":
                    row.append(";".join(x for kv in v.items() for x in kv))
                elif isinstance(v, bool):
                    row.append("true" if v else "false")
                else:
                    row.append(str(v))
            w.writerow(row)
    finally:
        if close:
            f.close()


def _clean(entry) -> dict:
    if hasattr(entry, "to_dict"):
        entry = entry.to_dict()
    out = {}
    for k, v in entry.items():
        k = str(k).lstrip(":")
        # normalize snake_case back to the reference's file spelling
        k = {
            "case_sensitive": "case-sensitive?", "ascii_fold": "ascii-fold?",
            "stem": "stem?", "in_order": "in-order?", "fuzzy": "fuzzy?",
        }.get(k, k)
        out[k] = v
    return out
