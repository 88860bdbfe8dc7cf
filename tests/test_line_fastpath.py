"""The line-level chunk fast path must equal the glyph-level reference
sweep exactly (the equivalence argument in layout._emit_line)."""

from pdfextract_ray.kernel.chunks import build_chunks, build_chunks_from_lines
from pdfextract_ray.kernel.layout import to_glyphs, tokenize
from pdfextract_ray.settings import DEFAULT_SETTINGS as S
from pdfextract_ray.sources.corpus import corpus_table_local


def test_line_path_equals_glyph_path():
    corpus = corpus_table_local("/root/testdata/sf0.001", limit=8)
    for i in range(corpus.num_rows):
        lines = tokenize(corpus.column("html")[i].as_py())
        pages: dict[int, list] = {}
        for line in lines:
            pages.setdefault(line["page"], []).append(line)
        for page_lines in pages.values():
            glyphs = [g for line in page_lines for g in to_glyphs(line)]
            fast = build_chunks_from_lines(page_lines, S)
            slow = build_chunks(glyphs, S)
            assert len(fast) == len(slow)
            for f, s in zip(fast, slow):
                for k in ("x", "y", "width", "height", "content", "font",
                          "line_height", "page"):
                    assert f[k] == s[k], (i, k, f.get("content"), s.get("content"))


from hypothesis import given, settings as hsettings
from hypothesis import strategies as st


word_st = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                  min_size=1, max_size=8)
line_st = st.tuples(
    st.lists(word_st, min_size=1, max_size=6),          # words
    st.sampled_from([72.0, 100.0, 236.0, 400.0, 410.5]),  # x0
    st.sampled_from([700.0, 700.4, 712.0, 726.0]),        # y (collisions likely)
    st.sampled_from([(8.0, 9.6), (10.0, 12.0), (14.0, 16.8), (22.0, 26.4)]),
)


@given(st.lists(line_st, min_size=1, max_size=8))
@hsettings(max_examples=150, deadline=None)
def test_fuzzed_lines_glyph_equivalence(lines_spec):
    """Randomized line layouts: the line-level sweep must equal the
    glyph-level reference sweep (the equivalence claim in _emit_line).

    Constrained to the layout engine's invariant: same-y lines never
    overlap in x (column x-ranges are disjoint and a column's y-cursor
    strictly decreases) — for OVERLAPPING same-y lines the glyph
    interleaving genuinely differs and the fast path doesn't apply."""
    from hypothesis import assume
    from pdfextract_ray.kernel.layout import _emit_line, to_glyphs

    lines = []
    for words, x0, y, (size, lh) in lines_spec:
        _emit_line(lines, words, x0, y, "F%g" % size, size, lh, 1)

    # enforce the non-overlap invariant per y
    by_y: dict = {}
    for l in lines:
        by_y.setdefault(l["y"], []).append((l["x"], l["x"] + l["width"]))
    for spans in by_y.values():
        spans.sort()
        for (a1, a2), (b1, b2) in zip(spans, spans[1:]):
            assume(a2 < b1)  # strictly disjoint

    glyphs = [g for line in lines for g in to_glyphs(line)]
    fast = build_chunks_from_lines(list(lines), S)
    slow = build_chunks(glyphs, S)
    assert len(fast) == len(slow)
    for f, s in zip(fast, slow):
        for k in ("x", "y", "width", "height", "content", "font",
                  "line_height", "page"):
            assert f[k] == s[k], (k, f.get("content"), s.get("content"))
