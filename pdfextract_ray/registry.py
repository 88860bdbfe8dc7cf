"""Stage registry — the user-extension surface.

The reference lets users register pipeline stages with declared
dependencies (``pdf.spatials name, :depends_on => [...]`` +
``add_parser`` / ``add_view``, ``lib/pdf/extract.rb:22-28``,
``lib/pdf/extract/pdf.rb:188-190``); calling a stage pulls its deps in
depth-first order (``pdf.rb:227-238``, ``250-261``). The Ray-native
equivalent: a registry of named Dataset transforms
``fn(ds, ctx) -> ds`` with deps, compiled into a topologically ordered
``Dataset`` chain. Any callable conforming to the signature plugs in.

``ctx`` is a plain dict (settings, knobs) threaded to every stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Stage:
    name: str
    fn: Callable[[Any, dict], Any]
    deps: tuple[str, ...] = ()
    description: str = ""


@dataclass
class Registry:
    stages: dict[str, Stage] = field(default_factory=dict)

    def register(self, name: str, fn: Callable, deps: tuple[str, ...] | list = (),
                 description: str = "") -> None:
        self.stages[name] = Stage(name, fn, tuple(deps), description)

    def order(self, explicit: list[str]) -> list[str]:
        """Depth-first dependency expansion (pdf.rb:227-238 semantics):
        each stage's deps run before it; duplicates collapse to the
        first occurrence."""
        out: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in seen:
                return
            if name in visiting:
                raise ValueError("dependency cycle at %r" % name)
            if name not in self.stages:
                raise KeyError("unknown stage %r (registered: %s)"
                               % (name, sorted(self.stages)))
            visiting.add(name)
            for dep in self.stages[name].deps:
                visit(dep)
            visiting.discard(name)
            seen.add(name)
            out.append(name)

        for name in explicit:
            visit(name)
        return out

    def build(self, source: Any, explicit: list[str], ctx: dict | None = None) -> Any:
        """Chain the ordered stages over ``source`` (usually a Dataset)."""
        ctx = ctx or {}
        ds = source
        for name in self.order(explicit):
            ds = self.stages[name].fn(ds, ctx)
        return ds


def default_registry() -> Registry:
    """Built-in stages mirroring the reference's parser/view registry."""
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset
    from pdfextract_ray.settings import DEFAULT_SETTINGS

    reg = Registry()

    def s_extract(ds, ctx):
        return extract_dataset(
            ds,
            settings=ctx.get("settings", DEFAULT_SETTINGS),
            with_spans=ctx.get("with_spans", True),
            concurrency=ctx.get("concurrency"),
            skew_threshold=ctx.get("skew_threshold", 256 * 1024),
        )

    def s_references(ds, ctx):
        import pyarrow as pa

        def explode(t: pa.Table) -> pa.Table:
            urls, orders, contents = [], [], []
            for url, refs in zip(t["url"].to_pylist(), t["references"].to_pylist()):
                for ref in refs or []:
                    urls.append(url)
                    orders.append(ref["order"])
                    contents.append(ref["content"])
            return pa.table({"url": pa.array(urls, pa.string()),
                             "ref_order": pa.array(orders, pa.int64()),
                             "ref_content": pa.array(contents, pa.string())})
        return ds.map_batches(explode, batch_format="pyarrow")

    def s_resolve(ds, ctx):
        from pdfextract_ray.stages.resolve import ResolveReferences
        return ds.map_batches(ResolveReferences, batch_format="pyarrow",
                              concurrency=ctx.get("resolver_pool", (1, 4)),
                              num_cpus=0.25)

    def s_bibtex(ds, ctx):
        from pdfextract_ray.stages.resolve import render_bibtex_batch
        return ds.map_batches(render_bibtex_batch, batch_format="pyarrow")

    def s_xml(ds, ctx):
        from pdfextract_ray.views import render_xml_batch
        return ds.map_batches(render_xml_batch, batch_format="pyarrow")

    reg.register("extract", s_extract, (), "corpus → extraction rows")
    reg.register("references", s_references, ("extract",),
                 "exploded citation rows")
    reg.register("resolved_references", s_resolve, ("references",),
                 "+doi/score via resolver chain (mock offline)")
    reg.register("bibtex", s_bibtex, ("resolved_references",),
                 "+bibtex rendering (BibView analogue)")
    reg.register("xml", s_xml, ("extract",), "+xml rendering (XmlView analogue)")
    return reg
