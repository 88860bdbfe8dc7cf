"""Whole-document kernel: html bytes → extraction result.

Chains the per-page and per-document stages in the reference's
topological order (``lib/pdf/extract/pdf.rb:250-261``; SURVEY.md §3.1):
tokenize → chunks → regions → margins → zones → columns → titles →
sections → references — everything per-document, no cross-document
state (SURVEY.md §1.4), which is what makes the Ray layer embarrassingly
parallel over rows.

The main-content ``text`` is this engine's flagship output (north rule:
byte-identical per url): regions contained in each page's body zone,
read column-by-column left→right, top→down within a column, then
unassigned body regions top→down, pages ascending, regions joined with
a newline and flattened with ``Spatial.get_text_content``
(spatial.rb:98-112). Header/footer zone content is thereby stripped.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pdfextract_ray.kernel import spatial
from pdfextract_ray.kernel.chunks import build_chunks_from_lines
from pdfextract_ray.kernel.columns import build_columns
from pdfextract_ray.kernel.layout import tokenize
from pdfextract_ray.kernel.margins import build_margins
from pdfextract_ray.kernel.references import build_references
from pdfextract_ray.kernel.regions import build_regions
from pdfextract_ray.kernel.sections import build_sections
from pdfextract_ray.kernel.titles import build_title
from pdfextract_ray.kernel.zones import build_zones
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings


@dataclass
class ExtractResult:
    text: str = ""
    title: str | None = None
    title_font: str | None = None
    title_line_height: float | None = None
    references: list[dict] = field(default_factory=list)
    sections: list[dict] = field(default_factory=list)
    regions: list[dict] = field(default_factory=list)
    zones: list[dict] = field(default_factory=list)
    n_pages: int = 0
    n_tokens: int = 0
    n_chunks: int = 0


def _page_body_text(page_regions: list[dict], page_columns: list[dict]) -> list[str]:
    """Reading-order text of one page's body-contained regions."""
    cols = sorted(page_columns, key=lambda c: c["x"])
    assigned: list[list[dict]] = [[] for _ in cols]
    rest: list[dict] = []
    for region in page_regions:
        for ci, col in enumerate(cols):
            if spatial.contains(col, region, 1):
                assigned[ci].append(region)
                break
        else:
            rest.append(region)
    parts: list[str] = []
    for group in assigned:
        group.sort(key=lambda r: -r["y"])
        parts.extend(spatial.get_text_content(r) for r in group)
    rest.sort(key=lambda r: -r["y"])
    parts.extend(spatial.get_text_content(r) for r in rest)
    return parts


def layout_pages(html: bytes | str) -> dict[int, list[dict]]:
    """Tokenize and group lines by page (first-seen order = ascending)."""
    pages: dict[int, list[dict]] = {}
    for line in tokenize(html):
        pages.setdefault(line["page"], []).append(line)
    return pages


def process_page(page_lines: list[dict], settings: Settings = DEFAULT_SETTINGS) -> dict:
    """All per-page stages for one page: chunks → regions → margins →
    zones → columns → body reading-order text parts. Pure; the unit of
    work for the page-exploded pipeline variant."""
    chunks = build_chunks_from_lines(page_lines, settings)
    regions = build_regions(chunks, settings)
    out = {"n_glyphs": sum(l["n_glyphs"] for l in page_lines),
           "n_chunks": len(chunks), "regions": regions, "columns": [],
           "zones": [], "text_parts": []}
    if not regions:
        return out
    margins = build_margins(regions)
    zones = build_zones(regions, margins, settings)
    body = zones["bodies"][-1] if zones["bodies"] else None
    columns = build_columns(regions, body, settings)
    out["columns"] = columns
    for ztype in ("headers", "footers", "bodies"):
        for z in zones[ztype]:
            out["zones"].append({"zone": ztype[:-1] if ztype != "bodies" else "body",
                                 **{k: z[k] for k in ("page", "x", "y", "width", "height")}})
    body_regions = [r for r in regions if body is not None and spatial.contains(body, r)]
    out["text_parts"] = _page_body_text(body_regions, columns)
    return out


def assemble_document(page_results: list[dict], settings: Settings = DEFAULT_SETTINGS,
                      gazetteer: dict[str, bool] | None = None) -> ExtractResult:
    """Document-scoped stages over per-page results IN PAGE ORDER:
    title pick, section assembly, reference split, text join. The
    reassembly point of the exploded pipeline (groupby(url) shuffle)."""
    gazetteer = gazetteer if gazetteer is not None else {}
    res = ExtractResult()
    res.n_pages = len(page_results)

    all_regions: list[dict] = []
    all_columns: list[dict] = []
    text_parts: list[str] = []
    for pr in page_results:
        res.n_tokens += pr["n_glyphs"]
        res.n_chunks += pr["n_chunks"]
        all_regions.extend(pr["regions"])
        all_columns.extend(pr["columns"])
        res.zones.extend(pr["zones"])
        text_parts.extend(pr["text_parts"])

    res.text = "\n".join(text_parts)
    res.regions = all_regions

    title = build_title(all_regions, settings)
    if title is not None:
        res.title = title["content"]
        res.title_font = title["font"]
        res.title_line_height = title["line_height"]

    res.sections = build_sections(all_regions, all_columns, settings, gazetteer)
    res.references = build_references(res.sections, settings)
    return res


def run_document(html: bytes | str, settings: Settings = DEFAULT_SETTINGS,
                 gazetteer: dict[str, bool] | None = None) -> ExtractResult:
    pages = layout_pages(html)
    if not pages:
        return ExtractResult()
    return assemble_document([process_page(pl, settings) for pl in pages.values()],
                             settings, gazetteer)
