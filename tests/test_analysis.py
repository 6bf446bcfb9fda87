"""Ported from reference test/beagle/text_analysis_test.clj plus
tokenizer offset invariants."""

import pytest

from beagle_spark.analysis import (
    AnalysisConfig,
    analyze,
    ascii_fold,
    field_name,
    merge_config,
    text_to_token_strings,
)
from beagle_spark.analysis.stem import porter_stem
from beagle_spark.analysis.tokenizers import get_tokenizer


def fname(entry, defaults=None):
    return field_name(merge_config(entry, defaults or {}))


def test_field_name_construction():  # text_analysis_test.clj:6-23
    assert fname({}) == "text.standard-tokenizer"
    assert fname({"case_sensitive": True}) == "text.standard-tokenizer"
    assert fname({"case_sensitive": False}) == "text.standard-tokenizer.lowercased"
    assert fname({"ascii_fold": True}) == "text.standard-tokenizer.ascii-folded"
    assert fname({"stem": True}) == "text.standard-tokenizer.stemmed-english"
    assert (
        fname({"stem": True, "stemmer": "lithuanian"})
        == "text.standard-tokenizer.stemmed-lithuanian"
    )
    assert (
        fname({"ascii_fold": True, "case_sensitive": False, "stem": True,
               "stemmer": "lithuanian"})
        == "text.standard-tokenizer.ascii-folded-lowercased-stemmed-lithuanian"
    )


def test_token_stream():  # text_analysis_test.clj:25-46
    txt = "These are tests."
    cs = merge_config({"case_sensitive": True}, {})
    assert text_to_token_strings(txt, cs) == ["These", "are", "tests"]
    ci = merge_config({"case_sensitive": False}, {})
    assert text_to_token_strings(txt, ci) == ["these", "are", "tests"]
    folded = merge_config({"case_sensitive": False, "ascii_fold": True}, {})
    assert text_to_token_strings(txt, folded) == ["these", "are", "tests"]
    stemmed = merge_config(
        {"case_sensitive": False, "ascii_fold": True, "stem": True}, {}
    )
    assert text_to_token_strings(txt, stemmed) == ["these", "are", "test"]
    # whitespace tokenizer keeps the trailing period; stemmer leaves it
    # (the reference notes this as "surprising but correct")
    ws = merge_config(
        {"case_sensitive": False, "ascii_fold": True, "stem": True},
        {"tokenizer": "whitespace"},
    )
    assert text_to_token_strings(txt, ws) == ["these", "are", "tests."]


def test_tokenizer_offsets():
    txt = 'Hello, "wörld"! 3.14 don\'t x'
    for name in ("standard", "whitespace", "letter", "strict", "classic"):
        for t in get_tokenizer(name)(txt):
            assert txt[t.begin : t.end] == t.text, name


def test_keyword_tokenizer():
    toks = get_tokenizer("keyword")("Some full string")
    assert len(toks) == 1
    assert toks[0].text == "Some full string"
    assert (toks[0].begin, toks[0].end) == (0, 16)


def test_standard_numbers():
    toks = get_tokenizer("standard")("pi is 3.14 and 1,000 units")
    assert [t.text for t in toks] == ["pi", "is", "3.14", "and", "1,000", "units"]


def test_strict_tokenizer():
    # strict keeps [](){}<>#+=@&' runs (text_analysis.clj:58-60)
    toks = get_tokenizer("strict")("[URGENT!] a@b #tag c++")
    assert [t.text for t in toks] == ["[URGENT", "]", "a@b", "#tag", "c++"]


def test_standard_uax29_mid_joins():
    """Lucene StandardTokenizer (UAX#29 WB6/7, WB11/12): apostrophes and
    dots join letters; dots/commas join digits; wrong-neighbor joiners
    split."""
    std = get_tokenizer("standard")
    assert [t.text for t in std("John's book")] == ["John's", "book"]
    assert [t.text for t in std("U.S.A. forces")] == ["U.S.A", "forces"]
    assert [t.text for t in std("visit example.com now")] == ["visit", "example.com", "now"]
    assert [t.text for t in std("a,b and R2D2.com")] == ["a", "b", "and", "R2D2", "com"]
    assert [t.text for t in std("don’t")] == ["don’t"]


def test_whitespace_vs_unicode_whitespace():
    """Lucene distinction: WhitespaceTokenizer (java isWhitespace) does
    NOT split on no-break space; UnicodeWhitespaceTokenizer does."""
    s = "a b normal"
    assert [t.text for t in get_tokenizer("whitespace")(s)] == ["a b", "normal"]
    assert [t.text for t in get_tokenizer("unicode-whitespace")(s)] == ["a", "b", "normal"]


def test_standard_cjk_segmentation():
    """Lucene StandardTokenizer CJK behavior: Han ideographs and
    hiragana are single-char tokens; katakana and hangul form runs."""
    std = get_tokenizer("standard")
    assert [t.text for t in std("日本語のテキスト and English")] == [
        "日", "本", "語", "の", "テキスト", "and", "English",
    ]
    assert [t.text for t in std("한국어 텍스트")] == ["한국어", "텍스트"]
    assert [t.text for t in std("mixed日本text")] == ["mixed", "日", "本", "text"]
    for t in std("日本語のテキスト and English"):
        assert "日本語のテキスト and English"[t.begin : t.end] == t.text


def test_classic_filter_default_chain():
    """ClassicFilter parity (reference text_analysis.clj:77-81 + Lucene
    ClassicFilter): applied only when stem?=false and the chain is the
    bare tokenizer; acts only on ClassicTokenizer's ACRONYM/APOSTROPHE
    types — a no-op for the standard tokenizer."""
    # default config (standard tokenizer): no stripping — "John's" stays
    assert text_to_token_strings("John's in the U.S.A. now", merge_config({})) == [
        "John's", "in", "the", "U.S.A", "now",
    ]
    # classic tokenizer, default flags: possessive + acronym stripping,
    # offsets keep the original token span
    toks = analyze("John's in the U.S.A. now", merge_config({"tokenizer": "classic"}))
    assert [(t.text, t.begin, t.end) for t in toks] == [
        ("John", 0, 6), ("in", 7, 9), ("the", 10, 13), ("USA", 14, 20), ("now", 21, 24),
    ]
    # classic + lowercase: chain has LowerCaseFilter, so NO ClassicFilter
    # (reference applies it only to a bare-tokenizer chain)
    assert text_to_token_strings(
        "John's in the U.S.A. now",
        merge_config({"tokenizer": "classic", "case_sensitive": False}),
    ) == ["john's", "in", "the", "u.s.a.", "now"]


def test_ascii_fold():
    assert ascii_fold("wörd") == "word"
    assert ascii_fold("Schön") == "Schon"
    assert ascii_fold("déjà-vu") == "deja-vu"
    assert ascii_fold("plain") == "plain"


def test_porter_stem():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "falling": "fall",
        "hissing": "hiss", "failing": "fail", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
        "formality": "formal", "sensitivity": "sensit", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electricity": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "activate": "activ",
        "angularity": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "dogs": "dog", "running": "run", "tests": "test",
    }
    for w, expected in cases.items():
        assert porter_stem(w) == expected, w


def test_config_cascade_three_way():
    # entry > highlighter defaults > library defaults
    conf = merge_config({"case_sensitive": True}, {"case_sensitive": False})
    assert conf.case_sensitive is True
    conf = merge_config({}, {"case_sensitive": False})
    assert conf.case_sensitive is False
    conf = merge_config({}, {})
    assert conf.case_sensitive is True  # library default: case-SENSITIVE
    assert conf.tokenizer == "standard"
    assert conf.stem is False


def test_analyze_offsets_survive_filters():
    conf = AnalysisConfig(case_sensitive=False, ascii_fold=True, stem=True)
    txt = "The Dögs were RUNNING fast"
    for t in analyze(txt, conf):
        assert 0 <= t.begin < t.end <= len(txt)
    assert [t.text for t in analyze(txt, conf)] == ["the", "dog", "were", "run", "fast"]


def test_german_stemmer():
    from beagle_spark.analysis.snowball_de import german2_stem, german_stem

    cases = {
        "häuser": "haus", "hauses": "haus", "haus": "haus",
        "aufeinander": "aufeinand", "abende": "abend", "abends": "abend",
        "kategorien": "kategori", "deutschen": "deutsch",
        "schönheit": "schonheit", "arbeiten": "arbeit",
        "bücher": "buch", "mädchen": "madch",
        "ergebnisse": "ergebnis",  # niss rule
    }
    for w, expected in cases.items():
        assert german_stem(w) == expected, w
    # german2 folds ae/oe to umlauts first
    assert german2_stem("haeuser") == german_stem("häuser")


def test_german_matching_end_to_end():
    from beagle_spark import highlighter

    hl = highlighter([{"text": "Haus", "id": "1", "stem?": True,
                       "stemmer": "german", "case-sensitive?": False}])
    anns = hl("die häuser dort")
    assert len(anns) == 1 and anns[0]["text"] == "häuser"


def test_spanish_stemmer():
    from beagle_spark.analysis.snowball_es import spanish_stem

    cases = {
        "canciones": "cancion", "corriendo": "corr", "tocando": "toc",
        "fácilmente": "facil", "rápidamente": "rapid",
        "trabajador": "trabaj", "trabajadores": "trabaj",
        "trabajando": "trabaj", "biología": "biolog", "lógica": "logic",
        "casas": "cas", "libros": "libr", "española": "español",
        "actividades": "activ", "teniéndoselo": "ten",
        # R2 guards: suffix present but NOT in R2 -> only accent strip
        "solución": "solucion", "presencia": "presenci",
    }
    for w, expected in cases.items():
        assert spanish_stem(w) == expected, (w, spanish_stem(w))
    # matching consistency: dict term and doc token stem identically
    assert spanish_stem("cantando") == spanish_stem("cantando")


def test_spanish_matching_end_to_end():
    from beagle_spark import highlighter

    hl = highlighter([{"text": "trabajador", "id": "1", "stem?": True,
                       "stemmer": "spanish", "case-sensitive?": False}])
    anns = hl("los trabajadores aquí")
    assert len(anns) == 1 and anns[0]["text"] == "trabajadores"


def test_classic_tokenizer_host_email_company_types():
    """Lucene ClassicTokenizer's pre-UAX#29 grammar: HOST/EMAIL/COMPANY
    are single typed tokens; dotless U.S.A is a HOST by longest match
    while dotted U.S.A. stays an ACRONYM; 3.14 stays a NUM."""
    from beagle_spark.analysis.tokenizers import tokenize_classic_typed as tc

    def types(s):
        return [(t.text, ty) for t, ty in tc(s)]

    assert types("example.com") == [("example.com", "HOST")]
    assert types("U.S.A") == [("U.S.A", "HOST")]
    assert types("U.S.A.") == [("U.S.A.", "ACRONYM")]
    assert types("foo@bar.com") == [("foo@bar.com", "EMAIL")]
    assert types("AT&T") == [("AT&T", "COMPANY")]
    assert types("3.14") == [("3.14", "NUM")]


def test_ascii_fastpath_equivalence():
    """The stdlib-re ASCII twin of the standard/letter tokenizers must
    produce exactly the tokens of the full UAX#29 regex-module pattern
    on every pure-ASCII input (non-ASCII input takes the slow path by
    construction). Deterministic fuzz over the joiner-heavy alphabet
    plus the documented edge strings."""
    import random

    from beagle_spark.analysis.tokenizers import (
        _ASCII_TWINS,
        _PATTERNS,
        _scan,
        get_tokenizer,
    )

    cases = [
        "", " ", "a", "John's U.S.A U.S.A. 3.14 1,000 a,b R2D2.com x.y.z",
        "don't can't 'quoted' trail' .lead mul..ti 1..2 1.2.3 a.b.c",
        "#hash *star 1# 2* a'b'c'd a'' ''b '' . , .. ', -",
        "a-b_c", "0.0.0.0", "a." * 300, "'" * 50, "1,2,3 4.5,6",
    ]
    rng = random.Random(7)
    alphabet = "abcXYZ019'., #\t\n-_*"
    cases += ["".join(rng.choice(alphabet) for _ in range(160)) for _ in range(300)]
    for name, twin in _ASCII_TWINS.items():
        full = _PATTERNS[name]
        for s in cases:
            assert s.isascii()
            assert _scan(twin, s) == _scan(full, s), (name, s)

    # fused-lower scanner == scan-then-lower, offsets from original text
    std = get_tokenizer("standard")
    std_lower = get_tokenizer("standard", lower=True)
    for s in cases + ["Mixed CASE Wörds Straße ÄÖÜ É 3.14 John's"]:
        plain = std(s)
        lowered = std_lower(s)
        assert [(t.text.lower(), t.begin, t.end) for t in plain] == list(lowered), s
