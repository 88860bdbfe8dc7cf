"""Full XmlView renderer tests: per-spatial-type golden fixtures +
render-option knobs (xml_view.rb:34-109 semantics)."""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "xml")


@pytest.fixture(scope="module")
def doc_result(gazetteer):
    from pdfextract_ray.kernel.document import run_document
    from pdfextract_ray.sources.corpus import corpus_table_local
    t = corpus_table_local("/root/testdata/sf0.001", limit=6)
    return run_document(t.column("html")[2].as_py(), gazetteer=gazetteer)


def _render(result, types, **kw):
    from pdfextract_ray.views import collect_objects, render_spatials_xml
    return render_spatials_xml(collect_objects(result, types), **kw)


@pytest.mark.parametrize("typ", ["titles", "regions", "zones",
                                 "sections", "references"])
def test_per_type_golden(doc_result, typ):
    with open(os.path.join(GOLDEN, "%s.xml" % typ), encoding="utf-8") as f:
        assert _render(doc_result, (typ,)) == f.read()


def test_precision_and_lines_knobs(doc_result):
    with open(os.path.join(GOLDEN, "regions_p3_nolines.xml"),
              encoding="utf-8") as f:
        got = _render(doc_result, ("regions",), precision=3, lines=False)
        assert got == f.read()
    assert "<line " not in got          # lines=False inlines text
    assert "line_height=\"9.6\"" in got


def test_outline_drops_text(doc_result):
    with open(os.path.join(GOLDEN, "regions_outline.xml"),
              encoding="utf-8") as f:
        got = _render(doc_result, ("regions",), outline=True)
        assert got == f.read()
    # attributes survive, text content does not
    assert "<line " in got
    assert "src2.example.org" not in got


def test_numeric_rounding_rule():
    """Only listed numeric attrs and *_score round; others print raw
    (xml_view.rb:24-29)."""
    from pdfextract_ray.views import render_spatials_xml
    objs = {"sections": [{"letter_ratio": 0.125456, "lateness": 0.125456,
                          "reference_score": 2.71828}]}
    xml = render_spatials_xml(objs)
    assert 'letter_ratio="0.13"' in xml
    assert 'lateness="0.125456"' in xml
    assert 'reference_score="2.72"' in xml


def test_singular_names():
    from pdfextract_ray.views import singular_name
    assert singular_name("regions") == "region"
    assert singular_name("bodies") == "body"
    assert singular_name("lines") == "line"


def test_ruby_round_half_away():
    from pdfextract_ray.views import _ruby_round
    assert _ruby_round(0.125, 2) == 0.13     # Python round() gives 0.12
    assert _ruby_round(-0.125, 2) == -0.13


def test_xml_spatials_stage(ray_session):
    """Actor-pool stage over a tiny corpus Dataset."""
    import ray.data
    from pdfextract_ray.sources.corpus import corpus_table_local
    from pdfextract_ray.views import XmlSpatials
    t = corpus_table_local("/root/testdata/sf0.001", limit=8)
    ds = ray.data.from_arrow(t).map_batches(
        XmlSpatials, batch_format="pyarrow", batch_size=4, concurrency=1,
        fn_constructor_kwargs=dict(types=("regions", "titles")))
    rows = ds.take_all()
    assert len(rows) == 8
    assert all(r["xml"].startswith("<pdf>") for r in rows)
    assert any("<region " in r["xml"] for r in rows)


def test_cli_xml_command(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main
    from pdfextract_ray.sources.corpus import ensure_corpus
    corpus = ensure_corpus("/root/testdata/sf0.001")
    out = str(tmp_path / "xml_out")
    rc = main(["xml", corpus, "--out", out,
               "--spatials", "zones,titles", "--precision", "1"])
    assert rc == 0
    import pyarrow.parquet as pq
    import glob
    files = glob.glob(os.path.join(out, "*.parquet"))
    t = pq.read_table(files)
    assert t.num_rows == 500
    xml = t.column("xml")[0].as_py()
    assert xml.startswith("<pdf>")


def test_mark_svg_overlay():
    """PdfView 'mark' analogue: translucent rect per span, PDF y-axis
    flipped into SVG coordinates, per-type auto-colors."""
    from pdfextract_ray.views import MARK_COLORS, render_mark_svg
    spans = [
        {"kind": "region", "page": 1, "x": 72.0, "y": 700.0,
         "width": 100.0, "height": 20.0},
        {"kind": "header", "page": 2, "x": 10.0, "y": 768.0,
         "width": 50.0, "height": 8.0},
    ]
    svg = render_mark_svg(spans, page_width=612.0, page_height=792.0)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert '<g id="page1">' in svg and '<g id="page2">' in svg
    # page 1 region: y_svg = 792 - (700 + 20) = 72
    assert 'x="72" y="72" width="100" height="20"' in svg
    # page 2 header offset by one page height: 792 + 792 - 776 = 808
    assert 'y="808"' in svg
    assert 'fill="#%s"' % MARK_COLORS[0] in svg
    assert 'fill="#%s"' % MARK_COLORS[1] in svg
    assert 'fill-opacity="0.2"' in svg
    assert render_mark_svg([]) == '\n'.join(
        ['<svg xmlns="http://www.w3.org/2000/svg" width="612" height="0">',
         '</svg>'])
