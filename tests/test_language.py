"""Language scalar parity tests (language.rb semantics incl. Ruby float
division edge cases)."""

import math

from pdfextract_ray.kernel import language
from pdfextract_ray.kernel.names import detect_names
from pdfextract_ray.kernel.spatial import score


def test_letter_ratio_counts_class():
    # class: A-Z 0-9 - [ ] , . " ' ( )
    assert language.letter_ratio("AB(1).x") == 6 / 7.0
    assert language.letter_ratio("abc") == 0.0
    assert math.isnan(language.letter_ratio(""))


def test_cap_ratio_skips_sentence_starts():
    # "Hello World. Foo bar" → H starts text (skipped), W counted,
    # F after '.' (skipped) → 1 cap / 4 words
    assert language.cap_ratio("Hello World. Foo bar") == 1 / 4.0
    assert math.isnan(language.cap_ratio(""))
    assert language.cap_ratio("ABC") == 2 / 1.0  # A starts, B,C counted


def test_year_ratio_needs_flanked_year():
    assert language.year_ratio("(1987) 2004 x2004y") == 2 / 3.0
    assert language.year_ratio("plain words only") == 0.0
    assert math.isnan(language.year_ratio(""))


def test_word_count():
    assert language.word_count("  a  b\tc\n") == 3


def test_transliterate():
    assert language.transliterate("ﬁle  “x”—y") == 'file "x"-y'


def test_detect_names_gazetteer():
    gaz = {"Smith": False, "Brown": True, "Smith-Jones": False}
    # 2 words, one unambiguous hit
    assert detect_names("smith runs", gaz) == 0.5
    # ambiguous weighs 0 → sum 0 → 0
    assert detect_names("brown runs", gaz) == 0.0
    # hyphen capitalization (names.rb:33-35)
    assert detect_names("smith-jones", gaz) == 1.0
    assert detect_names("", gaz) == 0.0


def test_score_per_doc_normalization():
    items = [{"f": 0.1}, {"f": 0.5}]
    score(items, {"f": (0.1, 10)}, "s")
    assert items[0]["s"] == 10        # exact match → full weight
    assert items[1]["s"] == 0         # max diff → 0
    # NaN diff counts as 1 (spatial.rb:160)
    items = [{"f": float("nan")}, {"f": 0.1}]
    score(items, {"f": (0.1, 10)}, "s")
    assert items[0]["s"] == 0 and items[1]["s"] == 10


def test_names_detector_pluggable(gazetteer):
    """names.rb:76-86 Names.detector= analogue."""
    from pdfextract_ray.kernel import names as N
    content = "Smith and Jones wrote this"
    base = N.detect_names(content, gazetteer)
    try:
        N.set_detector(N.NoDetection)
        assert N.detect_names(content, gazetteer) == 0.0

        class Constant:
            @staticmethod
            def detect_names(content, gazetteer=None):
                return 0.42
        N.set_detector(Constant)
        assert N.detect_names(content, gazetteer) == 0.42

        # service backend: no server on that port -> rescue path -> 0.0
        N.NamesService.timeout = 0.2
        N.set_detector(N.NamesService)
        assert N.detect_names(content, gazetteer) == 0.0
    finally:
        N.set_detector(N.NamesDatabase)
    assert N.detect_names(content, gazetteer) == base


def test_transliterate_translate_matches_scalar_loop():
    # differential: str.translate fast path vs the literal per-char scan
    # (language.rb:5-38), over every mapped char plus unicode edge cases
    from hypothesis import given, settings as hsettings
    from hypothesis import strategies as st

    mapped = "".join(language._TRANSLIT)

    def scalar(s: str) -> str:
        out = []
        for c in s:
            out.append(language._TRANSLIT.get(c, c))
        return language._WS_RE.sub(" ", "".join(out))

    @hsettings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.one_of(
        st.sampled_from(mapped + " \t\n  "),
        st.characters()), max_size=80))
    def check(s):
        assert language.transliterate(s) == scalar(s)

    check()
