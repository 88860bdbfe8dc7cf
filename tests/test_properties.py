"""Property-based tests (hypothesis) for kernel primitives and
determinism invariants (FIXTURES.md §5)."""

import math

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

from pdfextract_ray.kernel import language
from pdfextract_ray.kernel.multirange import MultiRange
from pdfextract_ray.kernel.spatial import concat_lines, get_text_content, merge


ranges_strategy = st.lists(
    st.tuples(st.floats(0, 1000, allow_nan=False),
              st.floats(0, 1000, allow_nan=False)).map(
        lambda t: (min(t), max(t))),
    min_size=1, max_size=20,
)


@given(ranges_strategy)
@hsettings(max_examples=200, deadline=None)
def test_multirange_covers_all_inputs(rs):
    m = MultiRange()
    for lo, hi in rs:
        m.append(lo, hi)
    # every input endpoint is inside some stored range
    for lo, hi in rs:
        assert any(rlo <= lo <= rhi for rlo, rhi in m.ranges)
        assert any(rlo <= hi <= rhi for rlo, rhi in m.ranges)
    # stored ranges are pairwise non-incident (fully merged)
    for i, a in enumerate(m.ranges):
        for b in m.ranges[i + 1:]:
            assert a[1] < b[0] or b[1] < a[0]
    assert m.min == min(lo for lo, _ in rs)
    assert m.max == max(hi for _, hi in rs)
    assert m.covered <= (m.max - m.min) + 1e-9


@given(st.text(max_size=40), st.text(max_size=40))
@hsettings(max_examples=200, deadline=None)
def test_concat_lines_hyphen_rule(a, b):
    out = concat_lines(a, b)
    if a.endswith("-"):
        assert out == a[:-1] + b
    else:
        assert out == a + " " + b


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=300))
@hsettings(max_examples=300, deadline=None)
def test_cap_ratio_regex_equals_state_machine(s):
    a = language.cap_ratio(s)
    b = language.cap_ratio_scan(s)
    assert (math.isnan(a) and math.isnan(b)) or a == b


@given(st.text(max_size=200))
@hsettings(max_examples=200, deadline=None)
def test_language_ratios_bounded(s):
    lr = language.letter_ratio(s)
    assert math.isnan(lr) or 0.0 <= lr <= 1.0
    yr = language.year_ratio(s)
    assert math.isnan(yr) or 0.0 <= yr <= 1.0
    assert language.word_count(s) == len(s.split())


def _box(x, y, w, h, content="x"):
    return {"x": x, "y": y, "width": w, "height": h, "content": content,
            "font": "F", "line_height": 10.0, "page": 1,
            "page_width": 612.0, "page_height": 792.0}


coords = st.floats(0, 500, allow_nan=False)
dims = st.floats(1, 100, allow_nan=False)


@given(coords, coords, dims, dims, coords, coords, dims, dims)
@hsettings(max_examples=200, deadline=None)
def test_merge_bbox_is_union(ax, ay, aw, ah, bx, by, bw, bh):
    a = _box(ax, ay, aw, ah, "aa")
    b = _box(bx, by, bw, bh, "b")
    m = merge(a, b)
    assert m["x"] == min(ax, bx)
    assert m["y"] == min(ay, by)
    assert abs(m["x"] + m["width"] - max(ax + aw, bx + bw)) < 1e-9
    assert abs(m["y"] + m["height"] - max(ay + ah, by + bh)) < 1e-9
    # dominant side: longer text content wins, ties to b
    assert m["font"] == "F"
    assert m["content"] == "aab"


ref_body = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll"), max_codepoint=127),
    min_size=8, max_size=40).map(lambda s: s + " (1999).")


@given(st.lists(ref_body, min_size=5, max_size=12))
@hsettings(max_examples=60, deadline=None)
def test_split_by_delimiter_roundtrip(bodies):
    """'[n] body' sequences split back into exactly the input bodies in
    order (digit-free bodies → no delimiter confusion)."""
    from pdfextract_ray.kernel.references import numeric_sequence, split_by_delimiter
    from pdfextract_ray.settings import DEFAULT_SETTINGS as S

    text = " ".join("[%d] %s" % (i + 1, b) for i, b in enumerate(bodies))
    assert numeric_sequence(text, S)
    refs = split_by_delimiter(text, S)
    assert [r["order"] for r in refs] == list(range(1, len(bodies) + 1))
    assert [r["content"] for r in refs] == [b.strip() for b in bodies]


def test_corpus_subset_determinism():
    """Any subset of document rows generates identical pages regardless
    of partitioning (per-row seeding)."""
    import pyarrow.parquet as pq
    from pdfextract_ray.sources.corpus import corpus_batch

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    full = corpus_batch(docs.slice(0, 20))
    part = corpus_batch(docs.slice(10, 5))
    for i in range(5):
        assert part.column("html")[i].as_py() == full.column("html")[10 + i].as_py()
        assert part.column("url")[i].as_py() == full.column("url")[10 + i].as_py()


def test_extraction_deterministic_across_processes():
    """Goldens pin cross-run determinism; here pin same-process rerun of
    the full kernel incl. gazetteer scoring."""
    from pdfextract_ray.kernel.document import run_document
    from pdfextract_ray.kernel.names import load_gazetteer
    from pdfextract_ray.sources.corpus import corpus_table_local

    t = corpus_table_local("/root/testdata/sf0.001", limit=3)
    gaz = load_gazetteer()
    for i in range(3):
        h = t.column("html")[i].as_py()
        a, b = run_document(h, gazetteer=gaz), run_document(h, gazetteer=gaz)
        assert a.text == b.text
        assert a.sections == b.sections
