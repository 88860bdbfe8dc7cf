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
