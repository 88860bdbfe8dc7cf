"""Registry (extension surface), resolver chain, XML/BibTeX views."""

import pyarrow as pa
import pytest

from pdfextract_ray.registry import Registry, default_registry
from pdfextract_ray.stages.resolve import (MockResolver, NoResolution,
                                           ResolveReferences, render_bibtex_batch)
from pdfextract_ray.views import render_xml_row


def test_registry_order_depth_first():
    reg = Registry()
    for name, deps in [("a", ()), ("b", ("a",)), ("c", ("a", "b")), ("d", ("c",))]:
        reg.register(name, lambda ds, ctx: ds, deps)
    assert reg.order(["d"]) == ["a", "b", "c", "d"]
    assert reg.order(["b", "d"]) == ["a", "b", "c", "d"]


def test_registry_cycle_and_unknown():
    reg = Registry()
    reg.register("x", lambda ds, ctx: ds, ("y",))
    reg.register("y", lambda ds, ctx: ds, ("x",))
    with pytest.raises(ValueError):
        reg.order(["x"])
    with pytest.raises(KeyError):
        reg.order(["nope"])


def test_default_registry_shape():
    reg = default_registry()
    assert reg.order(["bibtex"]) == ["extract", "references",
                                     "resolved_references", "bibtex"]
    assert reg.order(["xml"]) == ["extract", "xml"]


def test_resolver_chain_fallback():
    rr = ResolveReferences(resolvers=[NoResolution(), MockResolver()])
    batch = pa.table({"ref_content": [
        "Evans I., Perry C. Modern streaming hardware. PPQ 17, pp. 519-558 (1989).",
        "short",  # unresolvable
    ]})
    out = rr(batch).to_pandas()
    assert out["doi"][0].startswith("10.5555/")
    assert out["resolved_by"][0] == "mock"
    assert out["doi"][1] is None and out["resolved_by"][1] is None
    # deterministic
    out2 = rr(batch).to_pandas()
    assert out["doi"][0] == out2["doi"][0] and out["score"][0] == out2["score"][0]


def test_bibtex_rendering_threshold():
    t = pa.table({
        "ref_content": ["Evans I. Title of work. Journal 1, pp. 1-9 (1989).",
                        "Smith J. Another (2001)."],
        "doi": ["10.5555/abc", "10.5555/def"],
        "score": [2.0, 0.5],  # second below the score>=1 cut (bib_view.rb:17)
    })
    out = render_bibtex_batch(t).to_pandas()
    assert out["bibtex"][0].startswith("@article{abc,")
    assert "year = {1989}" in out["bibtex"][0]
    assert out["bibtex"][1] is None


def test_xml_row_rendering():
    xml = render_xml_row(
        title="A <Title> & Co",
        references=[{"content": "Ref one", "order": 1},
                    {"content": "Ref two", "order": None}],
        spans=[{"kind": "region", "page": 1, "x": 72.0, "y": 700.123,
                "width": 140.0, "height": 10.5}],
    )
    assert "<title>A &lt;Title&gt; &amp; Co</title>" in xml
    assert '<reference order="1">Ref one</reference>' in xml
    assert "<reference>Ref two</reference>" in xml
    assert '<region x="72" y="700.12" width="140" height="10.5"/>' in xml


def test_custom_user_stage_plugs_in(ray_session, tiny_corpus):
    """User-extension surface: any fn(ds, ctx)->ds registers and chains."""
    import pyarrow as pa
    import ray.data
    from pdfextract_ray.registry import default_registry

    reg = default_registry()

    def s_truncate(ds, ctx):
        n = ctx.get("truncate_chars", 40)

        def tr(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.set_column(t.schema.get_field_index("text"), "text",
                                pc.utf8_slice_codeunits(t["text"], 0, n))
        return ds.map_batches(tr, batch_format="pyarrow")

    reg.register("truncate", s_truncate, deps=("extract",),
                 description="clip extracted text")
    ds = ray.data.from_arrow(tiny_corpus.slice(0, 4))
    out = reg.build(ds, ["truncate"], {"truncate_chars": 10,
                                       "concurrency": 2}).to_pandas()
    assert all(len(t) <= 10 for t in out["text"].fillna(""))
