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


def _naive_build_regions(page_chunks, settings):
    """Literal transcription of the reference scan (regions.rb:45-113):
    insertion sort + del-from-front + scan-to-the-end, generic
    spatial.merge — no pruning bound, no head pointer, no cached text
    lengths. The differential oracle for kernel.regions.build_regions."""
    from pdfextract_ray.kernel import spatial as sp

    chunks = []
    for chunk in page_chunks:
        c = dict(chunk)
        i = 0
        while i < len(chunks) and chunks[i]["y"] < c["y"]:
            i += 1
        chunks.insert(i, c)
    for c in chunks:
        c["lines"] = [sp.as_line(c)]
        del c["content"]

    regions = []
    compare_index = 1
    while len(chunks) > compare_index:
        b = chunks[0]
        t = chunks[compare_index]
        line_slop = min(b["line_height"], t["height"]) * settings.line_slop
        incident = False
        lx1, lx2 = b["x"], b["x"] + b["width"]
        rx1, rx2 = t["x"], t["x"] + t["width"]
        if (lx1 <= rx1 <= lx2) or (lx1 <= rx2 <= lx2) \
                or (rx1 <= lx1 <= rx2) or (rx1 <= lx2 <= rx2):
            incident = True
        if (b["y"] + b["height"] + line_slop) >= t["y"] and incident:
            chunks[0] = sp.merge(t, b, lines=True)
            del chunks[compare_index]
            compare_index = 1
        elif compare_index < len(chunks) - 1:
            compare_index += 1
        else:
            regions.append(chunks.pop(0))
            compare_index = 1
    if chunks:
        regions.append(chunks[0])

    for region in regions:
        for line in region["lines"]:
            line["x_offset"] = line["x"] - region["x"]
            line["y_offset"] = line["y"] - region["y"]
        height_taken = 0.0
        for line in region["lines"]:
            from_top = region["height"] - (line["y_offset"] + line["height"])
            line["spacing"] = from_top - height_taken
            height_taken = from_top + line["height"]
        region["lines"] = [{"content": l["content"], "x_offset": l["x_offset"],
                            "y_offset": l["y_offset"], "spacing": l["spacing"]}
                           for l in region["lines"]]
    regions.sort(key=lambda o: -o["y"])
    return regions


_chunk_strategy = st.builds(
    lambda gx, gy, w, h, body, hyph: {
        # coarse grids force y-ties and x-incidence collisions
        "x": gx * 15.0, "y": gy * 6.0, "width": w * 10.0, "height": 8.0 + h,
        "line_height": 10.0, "font": "F", "page": 1,
        "page_width": 612.0, "page_height": 792.0,
        "content": body + ("-" if hyph else ""),
    },
    st.integers(0, 6), st.integers(0, 10), st.integers(1, 8),
    st.floats(0, 6, allow_nan=False),
    st.text(alphabet="abcdef gh", min_size=1, max_size=12).map(
        lambda s: (s.strip() or "x")),
    st.booleans(),
)


@given(st.lists(_chunk_strategy, min_size=0, max_size=30))
@hsettings(max_examples=150, deadline=None)
def test_build_regions_differential_vs_naive_reference_scan(page_chunks):
    """The optimized build_regions (tie-aware sort, head pointer, reach
    pruning, cached text lengths) is output-identical to the literal
    reference algorithm on randomized chunk layouts."""
    from pdfextract_ray.kernel.regions import build_regions
    from pdfextract_ray.settings import DEFAULT_SETTINGS

    fast = build_regions([dict(c) for c in page_chunks], DEFAULT_SETTINGS)
    naive = _naive_build_regions([dict(c) for c in page_chunks], DEFAULT_SETTINGS)
    assert len(fast) == len(naive)
    for f, n in zip(fast, naive):
        for k in ("x", "y", "width", "height", "font", "line_height", "page"):
            assert f[k] == n[k], k
        assert f["lines"] == n["lines"]


@given(st.lists(st.text(alphabet="abcdefghij", min_size=1, max_size=140),
                min_size=0, max_size=40),
       st.sampled_from([22.0, 14.0, 12.0, 11.0, 10.0, 9.0, 8.0]),
       st.sampled_from([1, 2, 3]),
       st.booleans())
@hsettings(max_examples=200, deadline=None)
def test_wrap_words_int_fastpath_equals_float_loop(words, size, ncols, hang):
    """The integer char-unit wrap (space_w == char_w) is output-identical
    to the reference float loop for every (font size, column count,
    indent) combination the layout emits — including the oversized-word
    hyphenation path (140-char words overflow every column width)."""
    from pdfextract_ray.kernel.layout import (CONTENT_X0, CONTENT_X1,
                                              COLUMN_GUTTER, HANG_INDENT,
                                              CHAR_RATIO, _wrap_words,
                                              _wrap_words_float)
    char_w = CHAR_RATIO * size
    col_w = (CONTENT_X1 - CONTENT_X0 - COLUMN_GUTTER * (ncols - 1)) / ncols
    cont_w = col_w - (HANG_INDENT if hang else 0.0)
    assert _wrap_words(list(words), col_w, cont_w, char_w, char_w) == \
        _wrap_words_float(list(words), col_w, cont_w, char_w, char_w)


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


@given(st.lists(st.text(alphabet="abcdefgh ijkl.", min_size=0, max_size=400),
                min_size=1, max_size=5),
       st.integers(0, 4))
@hsettings(max_examples=40, deadline=None)
def test_exploded_chain_local_differential_vs_run_document(texts, threshold):
    """The full exploded chain (ExplodeAssemble → process_residue_pages
    → assemble_group), run LOCALLY without Ray, equals run_document for
    every synthetic doc at every routing threshold — fuzzing the
    completeness check, page ordering, and residue reassembly across
    both routes (threshold 0 forces all-residue; 4 mixes routes)."""
    import pyarrow as pa
    from pdfextract_ray.kernel.document import run_document
    from pdfextract_ray.kernel.names import load_gazetteer
    from pdfextract_ray.pipelines.exploded import (ExplodeAssemble,
                                                   assemble_group,
                                                   process_residue_pages)
    from pdfextract_ray.sources.corpus import synth_page

    rows = [synth_page(i, t, "en", "alpha") for i, t in enumerate(texts)]
    batch = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "html": pa.array([r["html"].encode() if isinstance(r["html"], str)
                          else r["html"] for r in rows], pa.binary()),
    })
    routed = ExplodeAssemble(page_threshold=threshold)(batch)
    final = assemble_group(process_residue_pages(routed))

    gaz = load_gazetteer()
    got = {u: (t, n) for u, t, n in zip(final["url"].to_pylist(),
                                        final["text"].to_pylist(),
                                        final["n_pages"].to_pylist())}
    assert len(got) == len(rows)
    for r in rows:
        ref = run_document(r["html"], gazetteer=gaz)
        assert got[r["url"]][0] == ref.text
        assert got[r["url"]][1] == ref.n_pages
