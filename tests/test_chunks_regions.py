"""Geometric clustering unit tests on hand-built token layouts
(chunks.rb / regions.rb semantics)."""

from pdfextract_ray.kernel.chunks import build_chunks
from pdfextract_ray.kernel.regions import build_regions
from pdfextract_ray.kernel.spatial import get_text_content
from pdfextract_ray.settings import DEFAULT_SETTINGS as S


def tok(ch, x, y, w=5.0, h=10.0, lh=12.0, font="Serif", page=1):
    return {"x": x, "y": y, "width": w, "height": h, "line_height": lh,
            "content": ch, "page": page, "font": font,
            "page_width": 612.0, "page_height": 792.0}


def word(s, x, y, **kw):
    return [tok(c, x + i * 5.0, y, **kw) for i, c in enumerate(s)]


def test_chars_glue_into_words():
    # adjacent glyphs (gap 0 <= char_slop*width) glue without separator
    chunks = build_chunks(word("cat", 100, 700), S)
    assert len(chunks) == 1
    assert chunks[0]["content"] == "cat"
    assert chunks[0]["x"] == 100 and chunks[0]["width"] == 15.0


def test_words_join_with_space():
    # gap of one space-width (5pt = 1*char_width <= word_slop*cw) → ' ' join
    toks = word("cat", 100, 700) + word("dog", 120, 700)
    chunks = build_chunks(toks, S)
    assert len(chunks) == 1
    assert chunks[0]["content"] == "cat dog"


def test_distant_words_same_row_still_merge_in_overlap_pass():
    # Reference quirk (chunks.rb:85-107): the cross-row overlap pass has
    # NO x-gap check ("TODO follow char / word slop rules"), so two
    # sort-adjacent chunks on the same visual row merge with no
    # separator even across a gap wider than word_slop. Replicated.
    toks = word("cat", 100, 700) + word("dog", 140, 700)
    chunks = build_chunks(toks, S)
    assert [c["content"] for c in chunks] == ["catdog"]


def test_distant_words_with_interposed_row_stay_separate():
    # ...but when another row's chunk sorts between them, the pair is
    # never adjacent and both survive (how multi-column pages keep
    # their columns apart in practice).
    toks = (word("cat", 100, 700) + word("mid", 112, 652)
            + word("dog", 140, 700))
    chunks = build_chunks(toks, S)
    assert sorted(c["content"] for c in chunks) == ["cat", "dog", "mid"]


def test_overlapping_rows_merge():
    # same visual line at slightly different y (overlap >= 0.9)
    toks = word("cat", 100, 700.0) + word("dog", 120, 700.4)
    chunks = build_chunks(toks, S)
    assert len(chunks) == 1


def test_whitespace_only_chunks_dropped():
    chunks = build_chunks(word(" ", 100, 700), S)
    assert chunks == []


def test_regions_merge_adjacent_lines():
    toks = word("toprow", 100, 712) + word("botrow", 100, 700)
    chunks = build_chunks(toks, S)
    regions = build_regions(chunks, S)
    assert len(regions) == 1
    # reading order: top line first
    assert [l["content"] for l in regions[0]["lines"]] == ["toprow", "botrow"]
    assert get_text_content(regions[0]) == "toprow botrow"


def test_regions_split_on_gap():
    toks = word("para1", 100, 740) + word("para2", 100, 700)
    regions = build_regions(build_chunks(toks, S), S)
    assert len(regions) == 2
    # sorted by descending y
    assert regions[0]["y"] > regions[1]["y"]


def test_regions_hyphen_join():
    toks = word("hyphen-", 100, 712) + word("ated", 100, 700)
    regions = build_regions(build_chunks(toks, S), S)
    assert get_text_content(regions[0]) == "hyphenated"


def test_region_line_offsets_and_spacing():
    toks = word("abc", 100, 712) + word("defg", 105, 700)
    regions = build_regions(build_chunks(toks, S), S)
    r = regions[0]
    top, bottom = r["lines"]
    assert top["x_offset"] == 0.0
    assert bottom["x_offset"] == 5.0
    assert top["spacing"] == 0.0          # first line flush with region top
    assert bottom["spacing"] == 2.0       # 12pt pitch - 10pt glyph height


def test_x_disjoint_columns_not_merged():
    toks = word("left", 100, 712) + word("right", 300, 700)
    regions = build_regions(build_chunks(toks, S), S)
    assert len(regions) == 2
