"""Reference-splitting unit tests (references.rb:32-184 semantics)."""

from pdfextract_ray.kernel import references as R
from pdfextract_ray.settings import DEFAULT_SETTINGS as S


def test_numeric_sequence_detection():
    txt = "[1] aaa [2] bbb [3] ccc [4] ddd"
    assert R.numeric_sequence(txt, S)
    # needs >= 3 increments
    assert not R.numeric_sequence("[1] a [2] b [3] c", S)
    # first number must appear within first 31 chars
    late = ("x" * 40) + " 1 a 2 b 3 c 4 d"
    assert not R.numeric_sequence(late, S)
    # years >= max_reference_order are ignored
    txt_years = "1 a (1999) 2 b (2000) 3 c (2001) 4 d"
    assert R.numeric_sequence(txt_years, S)


def test_split_by_delimiter_bracket_style():
    refs = R.split_by_delimiter("[1] Alpha beta. [2] Gamma delta. [3] Epsilon.", S)
    assert [r["order"] for r in refs] == [1, 2, 3]
    assert refs[0]["content"] == "Alpha beta."
    assert refs[2]["content"] == "Epsilon."


def test_split_by_delimiter_dotted_style():
    refs = R.split_by_delimiter("1. Alpha beta 2. Gamma delta 3. Epsilon zeta", S)
    assert [r["order"] for r in refs] == [1, 2, 3]
    assert refs[1]["content"] == "Gamma delta"


def test_split_by_delimiter_rejects_odd_delims():
    # learned before/after chars outside the accepted sets → []
    assert R.split_by_delimiter("{1} a {2} b {3} c {4} d", S) == []


def test_split_by_delimiter_nonsequential_numbers_stay_in_content():
    refs = R.split_by_delimiter("[1] Vol 7 pages 99 [2] second [3] third", S)
    assert refs[0]["content"] == "Vol 7 pages 99"


def test_split_by_margin_hanging_indent():
    lines = [
        {"content": "Ref one first", "x_offset": 0.0, "spacing": 0.0},
        {"content": "continuation a", "x_offset": 18.0, "spacing": 2.0},
        {"content": "Ref two first", "x_offset": 0.0, "spacing": 2.0},
        {"content": "continuation b", "x_offset": 18.0, "spacing": 2.0},
    ]
    parts = R.split_by_margin(lines)
    assert [p["content"] for p in parts] == [
        "Ref one first continuation a",
        "Ref two first continuation b",
    ]


def test_split_by_margin_drops_leading_nondelimiter_lines():
    # delimiter = SECOND most frequent floor(x_offset)
    lines = [
        {"content": "stray", "x_offset": 5.0, "spacing": 0.0},
        {"content": "A", "x_offset": 0.0, "spacing": 0.0},
        {"content": "cont", "x_offset": 18.0, "spacing": 0.0},
        {"content": "cont2", "x_offset": 18.0, "spacing": 0.0},
        {"content": "B", "x_offset": 0.0, "spacing": 0.0},
        {"content": "cont3", "x_offset": 18.0, "spacing": 0.0},
    ]
    parts = R.split_by_margin(lines)
    # 18 is most frequent, 0 second → delimiting offset 0; leading 'stray' dropped
    assert [p["content"] for p in parts] == ["A cont cont2", "B cont3"]


def test_split_by_spacing():
    lines = [
        {"content": "A", "x_offset": 0.0, "spacing": 8.0},
        {"content": "a2", "x_offset": 0.0, "spacing": 2.0},
        {"content": "B", "x_offset": 0.0, "spacing": 8.0},
        {"content": "b2", "x_offset": 0.0, "spacing": 2.0},
        {"content": "b3", "x_offset": 0.0, "spacing": 2.0},
    ]
    parts = R.split_by_line_spacing(lines)
    assert [p["content"] for p in parts] == ["A a2", "B b2 b3"]


def test_pseudo_reference_filter():
    sections = [{
        "reference_score": 10.0, "lateness": 1.0, "year_ratio": 0.1,
        "lines": [], "content": "References 1. x (1999) 2. y (2000) 3. z (2001) 4. w",
    }]
    refs = R.build_references(sections, S)
    # the "References" header pseudo-ref is dropped
    assert all("references" not in r["content"].lower() for r in refs)


def test_build_references_filters_early_and_yearless():
    base = {"reference_score": 10.0, "lines": [],
            "content": "1. a 2. b 3. c 4. d"}
    early = dict(base, lateness=0.2, year_ratio=0.5)
    yearless = dict(base, lateness=1.0, year_ratio=0.0)
    assert R.build_references([early], S) == []
    assert R.build_references([yearless], S) == []
