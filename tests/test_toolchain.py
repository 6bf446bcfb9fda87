"""Dictionary toolchain tests: merger, optimizer, readers, validator.
Ported from reference test/beagle/{annotation_merge,
dictionary_optimization, optimization_suggestions, readers,
validator}_test.clj."""

import io

import pytest

from beagle_spark import highlighter
from beagle_spark.dictionary import (
    dry_run,
    optimize,
    read_csv,
    read_edn,
    read_json,
    valid_dictionary,
    validate_dictionary,
)
from beagle_spark.matcher import merge_same_type_annotations


# ---------------------------------------------------------------------------
# annotation merger (annotation_merge_test.clj)
# ---------------------------------------------------------------------------
def _ann(text, type_, id_, begin, end):
    return {
        "text": text, "type": type_, "dict_entry_id": id_, "meta": {},
        "begin_offset": begin, "end_offset": end,
    }


def test_annotation_merge():  # annotation_merge_test.clj:27-41
    merged = merge_same_type_annotations(
        [
            _ann("AAAAA", "TEST", "1", 0, 5),
            _ann("A", "TEST", "3", 0, 1),
            _ann("AAAA", "TEST", "2", 1, 5),
        ]
    )
    assert merged == [_ann("AAAAA", "TEST", "1", 0, 5)]

    merged = merge_same_type_annotations(
        [
            _ann("AAAAA", "TEST", "1", 0, 5),
            _ann("A", "TEST", "2", 0, 1),
            _ann("AAAA", "TEST", "3", 1, 5),
            _ann("AAA", "TEST2", "10", 0, 3),
            _ann("A", "TEST2", "11", 0, 1),
        ]
    )
    assert sorted(
        [(m["type"], m["text"]) for m in merged]
    ) == [("TEST", "AAAAA"), ("TEST2", "AAA")]


def test_annotator_with_merge_option():  # annotation_merge_test.clj:6-25
    dictionary = [
        {"text": "1 2"}, {"text": "2"}, {"text": "1 2 3 4"}, {"text": "4"},
        {"text": "5"}, {"text": "6 5 3 7"}, {"text": "6 5"},
    ]
    hl = highlighter(dictionary, {"type-name": "TEST"})
    text = "A B C 1 2 3 4 D E F G 6 5 3 7"
    plain = hl(text)
    assert len(hl(text, {"merge-annotations?": False})) == len(plain)
    merged = hl(text, {"merge-annotations?": True})
    assert len(merged) < len(plain)
    assert sorted((m["text"], m["begin_offset"], m["end_offset"]) for m in merged) == [
        ("1 2 3 4", 6, 13),
        ("6 5 3 7", 22, 29),
    ]


# ---------------------------------------------------------------------------
# optimizer (dictionary_optimization_test.clj)
# ---------------------------------------------------------------------------
def test_dictionary_optimization():  # dictionary_optimization_test.clj:47-86
    dictionary = [
        {"case-sensitive?": True, "ascii-fold?": True, "synonyms": ["AAAA1"], "text": "AAAA"},
        {"case-sensitive?": True, "ascii-fold?": True, "synonyms": ["AAAA2"], "text": "AAAA"},
        {"case-sensitive?": False, "ascii-fold?": True, "synonyms": ["AAAA3"], "text": "AAAA"},
        {"case-sensitive?": True, "ascii-fold?": True, "synonyms": ["AAAA4"], "text": "AAAA"},
        {"case-sensitive?": True, "ascii-fold?": False, "synonyms": ["AAAA5"], "text": "AAAA"},
        {"case-sensitive?": True, "ascii-fold?": False, "synonyms": ["AAAA"], "text": "AAAA"},
        {"case-sensitive?": False, "synonyms": ["BBBB1"], "text": "BBBB"},
        {"case-sensitive?": False, "synonyms": ["BBBB"], "text": "BBBB"},
    ]
    optimized = optimize(dictionary)
    assert len(optimized) < len(dictionary)
    assert len(optimized) == 4
    expected = {
        ("AAAA", True, True): {"AAAA4", "AAAA2", "AAAA1"},
        ("AAAA", False, True): {"AAAA3"},
        ("AAAA", True, False): {"AAAA5"},
        ("BBBB", False, None): {"BBBB1"},
    }
    for e in optimized:
        key = (e["text"], e.get("case-sensitive?"), e.get("ascii-fold?"))
        assert set(e.get("synonyms") or []) == expected[key]


def test_meta_merge_mergeable():  # dictionary_optimization_test.clj:6-45
    from beagle_spark.dictionary.optimizer import _aggregate_by_meta, _mergeable_meta

    assert _mergeable_meta({}, {"meta": {"email": "123"}})
    assert _mergeable_meta({"meta": {}}, {"meta": {"email": "123"}})
    assert _mergeable_meta({"meta": {"email": "123"}}, {})
    assert _mergeable_meta({"meta": {"email": "123"}}, {"meta": {"email": "123"}})
    assert _mergeable_meta(
        {"meta": {"email": "123"}}, {"meta": {"email": "123", "total": 5646}}
    )
    assert not _mergeable_meta({"meta": {"email": "123"}}, {"meta": {"email": "321"}})

    agg = _aggregate_by_meta(
        [
            {"text": "test text", "id": "test-id", "synonyms": ["abc"],
             "case-sensitive?": True, "ascii-fold?": True,
             "meta": {"email": "test@example.com"}},
            {"text": "test text", "id": "test-id", "synonyms": ["def"],
             "case-sensitive?": True, "ascii-fold?": True,
             "meta": {"email": "bobby@example.com"}},
            {"text": "test text", "id": "test-id", "synonyms": ["XXXX"],
             "case-sensitive?": True, "ascii-fold?": True,
             "meta": {"email": "test@example.com", "abc": "123"}},
        ]
    )
    assert len(agg) == 2
    assert set(agg[0]["synonyms"]) == {"abc", "XXXX"}
    assert agg[0]["meta"] == {"email": "test@example.com", "abc": "123"}
    assert set(agg[1]["synonyms"]) == {"def"}


def test_dry_run_suggestions():  # optimization_suggestions_test.clj
    dictionary = [
        {"text": "A", "case-sensitive?": True},
        {"text": "A", "case-sensitive?": True},
        {"text": "B"},
    ]
    suggestions = dry_run(dictionary)
    assert len(suggestions) == 1
    assert len(suggestions[0]["dictionary_items"]) == 2


# ---------------------------------------------------------------------------
# readers (readers_test.clj; CSV semantics readers.clj:18-47)
# ---------------------------------------------------------------------------
def test_read_csv_semantics():
    csv_text = (
        "text,type,id,synonyms,case-sensitive?,meta\n"
        'test phrase,TYPE,id1,syn1;syn2,true,k1;v1;k2;v2\n'
        "other, ,id2,,false,oddkey\n"
        'quoted "x",T,,s1, TRUE ,\n'
    )
    out = read_csv(io.StringIO(csv_text))
    assert out[0]["text"] == "test phrase"
    assert out[0]["synonyms"] == ["syn1", "syn2"]
    assert out[0]["case-sensitive?"] is True
    assert out[0]["meta"] == {"k1": "v1", "k2": "v2"}
    # blank cells dropped; Boolean/valueOf: non-"true" -> False
    assert "type" not in out[1]
    assert out[1]["case-sensitive?"] is False
    # odd trailing meta key dropped
    assert "meta" not in out[1] or out[1]["meta"] == {}
    assert out[2]["case-sensitive?"] is True  # trimmed, case-insensitive parse


def test_read_json():
    out = read_json(io.StringIO('[{"text": "a", "id": "1"}, {"text": "b"}]'))
    assert out == [{"text": "a", "id": "1"}, {"text": "b"}]


def test_read_edn():
    out = read_edn(io.StringIO(
        '[{:text "a" :id "1" :synonyms ["x" "y"] :case-sensitive? false}'
        ' {:text "b" :slop 2}]'
    ))
    assert out[0]["text"] == "a"
    assert out[0]["synonyms"] == ["x", "y"]
    assert out[0]["case-sensitive?"] is False
    assert out[1] == {"text": "b", "slop": 2}


# ---------------------------------------------------------------------------
# validator (validator_test.clj)
# ---------------------------------------------------------------------------
def test_validator():
    assert valid_dictionary([{"text": "a"}])
    assert not valid_dictionary([])
    assert not valid_dictionary([{"text": ""}])
    assert not valid_dictionary([{"text": "  "}])
    assert not valid_dictionary([{"id": "1"}])  # text required
    assert validate_dictionary([{"text": "a", "slop": -1}])
    assert validate_dictionary([{"text": "a", "synonyms": ["", "x"]}])
    assert validate_dictionary([{"text": "a", "tokenizer": "bogus"}])
    assert not validate_dictionary(
        [{"text": "a", "tokenizer": "whitespace", "stemmer": "lithuanian",
          "slop": 3, "case-sensitive?": False, "meta": {"k": "v"}}]
    )
    with pytest.raises(ValueError):
        validate_dictionary([{"text": None}], raise_on_error=True)


def test_validator_cli(tmp_path):
    from beagle_spark.dictionary.validator import main

    good = tmp_path / "good.csv"
    good.write_text("text,id\nhello,1\n")
    bad = tmp_path / "bad.json"
    bad.write_text('[{"id": "no-text"}]')
    assert main([str(good), "csv"]) == 0
    assert main([str(bad), "json"]) == 1
    assert main([str(good)]) == 1  # odd arg count
    assert main([str(good), "xml"]) == 1  # unsupported type


def test_compile_error_isolation():
    """A bad dictionary entry is logged and skipped; the rest compile
    (reference: monitor.clj:34-46 per-query fallback)."""
    from beagle_spark.matcher import compile_dictionary

    class Exploding:
        def __str__(self):
            raise RuntimeError("boom")

    cd = compile_dictionary(
        [
            {"text": "good entry", "id": "ok"},
            {"text": "x", "id": Exploding()},  # str(id) raises in compile
            {"text": "", "id": "blank"},  # 0 tokens -> discarded with warning
        ]
    )
    assert cd.n_queries == 1
    from beagle_spark.matcher import match_text

    assert match_text("a good entry here", cd)[0]["dict_entry_id"] == "ok"
