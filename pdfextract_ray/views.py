"""Render sinks: XML view of extraction rows.

Analogue of the reference's ``XmlView`` (``view/xml_view.rb:41-109``):
pageless objects (title) render first, then per-``<page>`` spatial
objects with numeric attributes rounded (xml_view.rb:24-29 rounds to a
``--precision``; default 2 here), text content escaped. The canonical
sink remains Parquet — XML is a projection column for fixture parity
and interop, written with ``write_json``/``write_parquet`` or saved
per-doc by the CLI.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

PRECISION = 2


def _fmt(v: float) -> str:
    r = round(v, PRECISION)
    return str(int(r)) if r == int(r) else str(r)


def render_xml_row(title: str | None, references: list | None,
                   spans: list | None, n_pages: int) -> str:
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
    n_pages = batch["n_pages"].to_pylist()
    for t, r, s, n in zip(titles, refs, spans, n_pages):
        xmls.append(render_xml_row(t, r, s, n))
    return batch.append_column("xml", pa.array(xmls, pa.string()))
