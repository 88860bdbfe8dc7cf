"""Golden-fixture suite: kernel output is byte-identical to the frozen
snapshots (FIXTURES.md §3; mirrors test/catalog:87-100 accept-as-golden)."""

import hashlib
import json
import os

import pytest

from pdfextract_ray.kernel.document import run_document

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def summary():
    with open(os.path.join(GOLDEN_DIR, "summary.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def results(tiny_corpus, gazetteer):
    out = {}
    for i in range(tiny_corpus.num_rows):
        url = tiny_corpus.column("url")[i].as_py()
        html = tiny_corpus.column("html")[i].as_py()
        out[url] = run_document(html, gazetteer=gazetteer)
    return out


def test_text_byte_identical(results, summary):
    for url, g in summary.items():
        r = results[url]
        with open(os.path.join(GOLDEN_DIR, "text", g["key"] + ".txt"), "rb") as f:
            expected = f.read()
        assert r.text.encode("utf-8") == expected, "text drift for %s" % url
        assert hashlib.md5(r.text.encode()).hexdigest() == g["text_md5"]


def test_titles_and_counts(results, summary):
    for url, g in summary.items():
        r = results[url]
        assert r.title == g["title"], url
        assert r.title_font == g["title_font"], url
        assert r.n_pages == g["n_pages"], url
        assert r.n_tokens == g["n_tokens"], url
        assert r.n_chunks == g["n_chunks"], url
        assert len(r.regions) == g["n_regions"], url


def test_references_exact(results, summary):
    for url, g in summary.items():
        got = [{"content": x["content"], "order": x.get("order")}
               for x in results[url].references]
        exp = [{"content": x["content"], "order": x.get("order")}
               for x in g["references"]]
        assert got == exp, url


def test_section_stats(results, summary):
    for url, g in summary.items():
        secs = results[url].sections
        assert len(secs) == len(g["sections"]), url
        for s, e in zip(secs, g["sections"]):
            for k, v in e.items():
                assert round(s[k], 9) == v, (url, k)


def test_region_spans(results, summary):
    for url, g in summary.items():
        regs = results[url].regions
        assert len(regs) == len(g["region_spans"]), url
        for reg, e in zip(regs, g["region_spans"]):
            assert reg["page"] == e["page"]
            assert round(reg["x"], 2) == e["x"]
            assert round(reg["y"], 2) == e["y"]
            assert round(reg["width"], 2) == e["width"]
            assert round(reg["height"], 2) == e["height"]
            assert len(reg["lines"]) == e["n_lines"]


def test_zones(results, summary):
    for url, g in summary.items():
        zs = results[url].zones
        assert len(zs) == len(g["zones"]), url
        for z, e in zip(zs, g["zones"]):
            for k, v in e.items():
                got = z[k]
                assert (round(got, 2) if isinstance(got, float) else got) == v, (url, k)


def test_rerun_idempotent(tiny_corpus, gazetteer):
    html = tiny_corpus.column("html")[1].as_py()
    a = run_document(html, gazetteer=gazetteer)
    b = run_document(html, gazetteer=gazetteer)
    assert a.text == b.text and a.references == b.references


def test_extract_accuracy_scoreboard(ray_session):
    """test/catalog `stats` analogue: at golden parity every catalog
    doc's extracted reference count matches ground truth exactly —
    the histogram is the single row (diff=0, n_docs=48)."""
    from pdfextract_ray.pipelines.queries import q_extract_accuracy
    out = q_extract_accuracy("/root/testdata/sf0.001")
    assert list(out.columns) == ["ref_count_diff", "n_docs"]
    assert out.values.tolist() == [[0, 48]]
