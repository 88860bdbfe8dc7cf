"""Render sinks: XML views of extraction results.

Two renderers:

- :func:`render_xml_row` — the compact span projection kept for the
  ``extract_xml`` query and CLI ``--xml`` (title/references/bbox spans).
- :func:`render_spatials_xml` — the full ``XmlView`` analogue
  (``view/xml_view.rb:34-109``): renders ANY explicitly-requested
  spatial type with per-object attributes, numeric rounding to a
  configurable ``precision`` (``:round``, xml_view.rb:41), optional
  ``lines`` inlining (xml_view.rb:36-40) and ``outline`` mode
  (attributes only, no text — xml_view.rb:93), pageless objects first
  then per-``<page>`` grouping (xml_view.rb:49-68), nested hash/array
  values rendered recursively under singularized element names
  (xml_view.rb:90-107, abstract_view.rb:26-29).

Formatting deviation (documented): integral floats print without a
trailing ``.0`` (``72`` not ``72.0``); golden fixtures are frozen from
this renderer, not from Ruby output.
"""

from __future__ import annotations

import math
import re

from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

PRECISION = 2

# xml_view.rb:13-15
NUMERIC_ATTRIBUTES = frozenset([
    "x", "y", "width", "height", "line_height", "page_height",
    "page_width", "x_offset", "y_offset", "spacing", "letter_ratio",
    "cap_ratio", "year_ratio",
])
_SCORE_RE = re.compile(r".+_score")
IGNORED_ATTRIBUTES = frozenset(["content"])          # xml_view.rb:9
PARENT_IGNORED_ATTRIBUTES = frozenset(["page", "page_width", "page_height"])


def singular_name(name: str) -> str:
    """abstract_view.rb:26-29 (ies → y, trailing s dropped)."""
    if name.endswith("ies"):
        return name[:-3] + "y"
    if name.endswith("s"):
        return name[:-1]
    return name


def _ruby_round(v: float, precision: int) -> float:
    """Ruby Float#round: half away from zero (Python round is half-even)."""
    m = 10.0 ** precision
    return math.floor(abs(v) * m + 0.5) / m * (1.0 if v >= 0 else -1.0)


def _fmt(v, precision: int = PRECISION) -> str:
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        r = _ruby_round(v, precision)
        return str(int(r)) if r == int(r) else repr(r)
    return str(v)


def render_xml_row(title: str | None, references: list | None,
                   spans: list | None) -> str:
    """Compact span projection (title + references + bbox spans)."""
    out = ["<pdf>"]
    if title:
        out.append("  <title>%s</title>" % escape(title))
    refs = references or []
    if refs:
        out.append("  <references>")
        for ref in refs:
            order = ref.get("order")
            attr = " order=%s" % quoteattr(str(order)) if order is not None else ""
            out.append("    <reference%s>%s</reference>"
                       % (attr, escape(ref.get("content") or "")))
        out.append("  </references>")
    by_page: dict[int, list] = {}
    for s in spans or []:
        by_page.setdefault(s["page"], []).append(s)
    for page in sorted(by_page):
        out.append("  <page number=%s>" % quoteattr(str(page)))
        for s in by_page[page]:
            out.append('    <%s x=%s y=%s width=%s height=%s/>'
                       % (s["kind"], quoteattr(_fmt(s["x"])), quoteattr(_fmt(s["y"])),
                          quoteattr(_fmt(s["width"])), quoteattr(_fmt(s["height"]))))
        out.append("  </page>")
    out.append("</pdf>")
    return "\n".join(out)


def render_xml_batch(batch: pa.Table) -> pa.Table:
    xmls = []
    titles = batch["title"].to_pylist()
    refs = batch["references"].to_pylist() if "references" in batch.column_names \
        else [None] * batch.num_rows
    spans = batch["spans"].to_pylist() if "spans" in batch.column_names \
        else [None] * batch.num_rows
    for t, r, s in zip(titles, refs, spans):
        xmls.append(render_xml_row(t, r, s))
    return batch.append_column("xml", pa.array(xmls, pa.string()))


# ------------------------------------------------------- full XmlView

ALL_SPATIAL_TYPES = ("titles", "regions", "zones", "sections", "references")


def collect_objects(result, types=ALL_SPATIAL_TYPES) -> dict[str, list[dict]]:
    """ExtractResult → {type: [spatial objects]} for the requested
    types (the analogue of AbstractView#objects' explicit-call filter,
    abstract_view.rb:15-17)."""
    out: dict[str, list[dict]] = {}
    for t in types:
        if t == "titles":
            if getattr(result, "title", None) is not None:
                obj = {"content": result.title,
                       "line_height": getattr(result, "title_line_height", None),
                       "font": result.title_font}
                out["titles"] = [{k: v for k, v in obj.items() if v is not None}]
        elif t == "regions":
            out["regions"] = result.regions
        elif t == "zones":
            out["zones"] = result.zones
        elif t == "sections":
            out["sections"] = result.sections
        elif t == "references":
            out["references"] = result.references
        else:
            raise ValueError("unknown spatial type: %r" % (t,))
    return {k: v for k, v in out.items() if v}


def _write_obj(out: list[str], obj: dict, name: str, indent: int,
               precision: int, lines: bool, outline: bool,
               parent: bool = True) -> None:
    """xml_view.rb:90-107 (write_obj_to_xml)."""
    from pdfextract_ray.kernel.language import transliterate
    from pdfextract_ray.kernel.spatial import get_text_content

    pad = "  " * indent
    attrs = []
    for k, v in obj.items():
        if k in IGNORED_ATTRIBUTES or isinstance(v, (dict, list)):
            continue
        if parent and k in PARENT_IGNORED_ATTRIBUTES:
            continue
        if (k in NUMERIC_ATTRIBUTES or _SCORE_RE.match(k)) and v is not None:
            attrs.append((k, _fmt(float(v), precision)))
        else:
            # bools route through _fmt so a boolean attribute renders
            # 'true'/'false' like everywhere else, not 'True'/'False';
            # None renders as the EMPTY string (Ruby nil.to_s), never
            # the literal 'None'
            attrs.append((k, _fmt(v) if isinstance(v, bool)
                          else ("" if v is None else str(v))))
    attr_s = "".join(" %s=%s" % (k, quoteattr(v)) for k, v in attrs)

    text = None
    if not outline:
        if not lines:
            text = transliterate(get_text_content(obj))
        elif obj.get("content") is not None:
            text = transliterate(str(obj["content"]))

    nested = [(k, v) for k, v in obj.items() if isinstance(v, (dict, list))]
    if not lines:
        nested = [(k, v) for k, v in nested if k != "lines"]

    if not nested and not text:
        out.append("%s<%s%s/>" % (pad, name, attr_s))
        return
    out.append("%s<%s%s>" % (pad, name, attr_s))
    if text:
        out.append("%s  %s" % (pad, escape(text)))
    for k, v in nested:
        en = singular_name(k)
        if isinstance(v, dict):
            _write_obj(out, v, en, indent + 1, precision, lines, outline,
                       parent=False)
        else:
            for item in v:
                _write_obj(out, item, en, indent + 1, precision, lines,
                           outline, parent=False)
    out.append("%s</%s>" % (pad, name))


def render_spatials_xml(objects: dict[str, list[dict]],
                        precision: int = PRECISION, lines: bool = True,
                        outline: bool = False) -> str:
    """Full XmlView render (xml_view.rb:34-88): pageless objects first,
    then per-page groups in first-seen page order, each object with its
    full rounded attribute set and nested children."""
    pages: dict[int, list[tuple[str, dict]]] = {}
    page_params: dict[int, dict] = {}
    pageless: list[tuple[str, dict]] = []
    for type_, objs in objects.items():
        en = singular_name(type_)
        for obj in objs:
            if "page" in obj:
                pages.setdefault(obj["page"], []).append((en, obj))
                page_params.setdefault(obj["page"], {
                    "width": obj.get("page_width"),
                    "height": obj.get("page_height"),
                    "number": obj["page"],
                })
            else:
                pageless.append((en, obj))

    out = ["<pdf>"]
    for en, obj in pageless:
        _write_obj(out, obj, en, 1, precision, lines, outline)
    for page_number, typed in pages.items():
        p = page_params[page_number]
        attr_s = "".join(
            " %s=%s" % (k, quoteattr(_fmt(v, precision)
                                     if isinstance(v, float) else str(v)))
            for k, v in p.items() if v is not None)
        out.append("  <page%s>" % attr_s)
        for en, obj in typed:
            _write_obj(out, obj, en, 2, precision, lines, outline)
        out.append("  </page>")
    out.append("</pdf>")
    return "\n".join(out)


class XmlSpatials:
    """Actor-pool stage: corpus rows → (url, xml) with the FULL XmlView
    render of the requested spatial types. Gazetteer + settings load
    once per actor (reference: process-global state, names.rb:18)."""

    def __init__(self, types=("regions",), precision: int = PRECISION,
                 lines: bool = True, outline: bool = False,
                 settings=None) -> None:
        from pdfextract_ray.kernel.names import load_gazetteer
        from pdfextract_ray.settings import DEFAULT_SETTINGS
        self.types = tuple(types)
        self.precision = precision
        self.lines = lines
        self.outline = outline
        self.settings = settings or DEFAULT_SETTINGS
        self.gazetteer = load_gazetteer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pdfextract_ray.kernel.document import run_document
        xmls = []
        for html in batch["html"].to_pylist():
            try:
                r = run_document(html if html is not None else b"",
                                 self.settings, self.gazetteer)
                xmls.append(render_spatials_xml(
                    collect_objects(r, self.types), self.precision,
                    self.lines, self.outline))
            except Exception as exc:  # per-row isolation
                xmls.append("<pdf><error>%s</error></pdf>"
                            % escape("%s: %s" % (type(exc).__name__, exc)))
        return pa.table({"url": batch["url"],
                         "xml": pa.array(xmls, pa.string())})


# --------------------------------------------------- PdfView "mark" overlay

# pdf_view.rb auto_colors (abstract_view.rb:4-6): one color per spatial
# type, in request order
MARK_COLORS = ("ff0000", "00ff00", "0000ff", "ffff00",
               "ff7f00", "ffc0cb", "800080", "f0e68c", "a52a2a")


def render_mark_svg(spans: list[dict], page_width: float = 612.0,
                    page_height: float = 792.0) -> str:
    """Visual analogue of the reference's PdfView "mark" sink
    (``view/pdf_view.rb:7-39``): one SVG per document, one ``<g>`` per
    page, a 0.2-opacity filled rectangle per spatial object, colored by
    type in the reference's auto-color order. The PDF y-axis points UP;
    SVG's points down, so ``y_svg = page_height - (y + height)``.
    (The reference draws into the source PDF with Prawn; an SVG
    overlay is the renderable equivalent without a PDF writer.)"""
    by_page: dict[int, list[dict]] = {}
    kinds: list[str] = []
    for s in spans or []:
        by_page.setdefault(s["page"], []).append(s)
        if s["kind"] not in kinds:
            kinds.append(s["kind"])
    color_of = {k: MARK_COLORS[i % len(MARK_COLORS)]
                for i, k in enumerate(kinds)}
    n_pages = max(by_page) if by_page else 0
    out = ['<svg xmlns="http://www.w3.org/2000/svg" width="%s" height="%s">'
           % (_fmt(page_width), _fmt(float(n_pages) * page_height))]
    for page in sorted(by_page):
        oy = (page - 1) * page_height
        out.append('  <g id="page%d">' % page)
        out.append('    <rect x="0" y="%s" width="%s" height="%s" '
                   'fill="none" stroke="#888"/>'
                   % (_fmt(oy), _fmt(page_width), _fmt(page_height)))
        for s in by_page[page]:
            y = oy + page_height - (s["y"] + s["height"])
            out.append(
                '    <rect x="%s" y="%s" width="%s" height="%s" '
                'fill="#%s" fill-opacity="0.2" data-kind="%s"/>'
                % (_fmt(s["x"]), _fmt(y), _fmt(s["width"]),
                   _fmt(s["height"]), color_of[s["kind"]], s["kind"]))
        out.append("  </g>")
    out.append("</svg>")
    return "\n".join(out)


def render_mark_batch(batch: pa.Table) -> pa.Table:
    svgs = [render_mark_svg(s) for s in batch["spans"].to_pylist()]
    return pa.table({"url": batch["url"],
                     "svg": pa.array(svgs, pa.string())})


class ExtractViews(XmlSpatials):
    """Actor-pool stage: corpus rows → (url, title, xml, svg) — every
    render sink of the reference in ONE ``run_document`` pass per row.

    Merges the three per-sink queries (``extract_titles``,
    ``extract_xml_spatials``, ``extract_mark_svg``) into a single
    driver-registry entry: the title pick (titles.rb live path), the
    full per-type XmlView render (xml_view.rb:34-109, all five types),
    and the PdfView "mark" overlay (pdf_view.rb:7-39) share one kernel
    extraction instead of three. The svg spans use the flagship's span
    construction (region rows + zone rows — stages/extract.py) so the
    overlay is identical to ``render_mark_batch`` over flagship output."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pdfextract_ray.kernel.document import run_document
        titles, xmls, svgs = [], [], []
        for html in batch["html"].to_pylist():
            try:
                r = run_document(html if html is not None else b"",
                                 self.settings, self.gazetteer)
                titles.append(r.title)
                xmls.append(render_spatials_xml(
                    collect_objects(r, self.types), self.precision,
                    self.lines, self.outline))
                spans = [
                    {"kind": "region", "page": g["page"], "x": g["x"],
                     "y": g["y"], "width": g["width"], "height": g["height"]}
                    for g in r.regions
                ] + [
                    {"kind": z["zone"], "page": z["page"], "x": z["x"],
                     "y": z["y"], "width": z["width"], "height": z["height"]}
                    for z in r.zones
                ]
                svgs.append(render_mark_svg(spans))
            except Exception as exc:  # per-row isolation
                titles.append(None)
                xmls.append("<pdf><error>%s</error></pdf>"
                            % escape("%s: %s" % (type(exc).__name__, exc)))
                svgs.append(render_mark_svg([]))
        return pa.table({"url": batch["url"],
                         "title": pa.array(titles, pa.string()),
                         "xml": pa.array(xmls, pa.string()),
                         "svg": pa.array(svgs, pa.string())})
