"""Spatial-object helpers: bbox merge, line assembly, text flattening.

Parity with the reference's ``PdfExtract::Spatial``
(``lib/pdf/extract/spatial.rb``). ``get_text_content`` is the
byte-identical-text kernel (spatial.rb:98-112): hyphen-elided line joins
and the trailing strip must match exactly. ``Spatial.collapse`` /
``overlap?`` (spatial.rb:116-154) are dead code in the reference (undefined
local / typo) and are deliberately NOT ported (SURVEY.md §2.3).

Spatial objects are plain dicts.
"""

from __future__ import annotations

import math
import re
from typing import Any

SPATIAL_ATTRIBS = ("x", "y", "width", "height", "page_width", "page_height", "page")

_WS_RE = re.compile(r"\s+")


def concat_lines(top: str, bottom: str) -> str:
    # spatial.rb:12-18 — trailing hyphen elides the joining space.
    if top.endswith("-"):
        return top[:-1] + bottom
    return top + " " + bottom


def drop_spatial(obj: dict) -> dict:
    # spatial.rb:20-22
    return {k: v for k, v in obj.items() if k not in SPATIAL_ATTRIBS}


def get_dimensions(obj: dict) -> dict:
    # spatial.rb:80-90
    return {
        "x": obj["x"],
        "y": obj["y"],
        "width": obj["width"],
        "height": obj["height"],
        "page": obj["page"],
        "page_width": obj["page_width"],
        "page_height": obj["page_height"],
    }


def as_line(obj: dict) -> dict:
    # spatial.rb:92-94
    line = get_dimensions(obj)
    line["content"] = obj["content"]
    return line


def merge_lines(a: dict, b: dict, so: dict) -> dict:
    # spatial.rb:24-40 — a's lines first, then b's; non-line objects are
    # wrapped with as_line.
    lines: list[dict] = []
    if "lines" in a:
        lines.extend(a["lines"])
    else:
        lines.append(as_line(a))
    if "lines" in b:
        lines.extend(b["lines"])
    else:
        lines.append(as_line(b))
    so["lines"] = lines
    return so


def get_text_content(obj: dict) -> str:
    # spatial.rb:96-109 — THE byte-identical-text kernel.
    lines = obj.get("lines")
    if lines:
        if len(lines) == 1:
            # single-line fast path: identical to join+strip below (the
            # appended trailing space is stripped anyway)
            c = lines[0]["content"]
            return (c[:-1] if c.endswith("-") else c).strip()
        parts = []
        for line in lines:
            c = line["content"]
            if c.endswith("-"):
                parts.append(c[:-1])
            else:
                parts.append(c + " ")
        return "".join(parts).strip()
    if obj.get("content") is not None:
        return obj["content"]
    return ""


def merge(a: dict, b: dict, separator: str = "", lines: bool = False) -> dict:
    # spatial.rb:42-76 — bbox union; content concat with whitespace
    # collapsed to single spaces (no strip); dominant font/line_height from
    # the side whose text content is LONGER (strictly greater → a wins).
    blx = min(a["x"], b["x"])
    bly = min(a["y"], b["y"])
    trx = max(a["x"] + a["width"], b["x"] + b["width"])
    try_ = max(a["y"] + a["height"], b["y"] + b["height"])

    so = dict(a)
    so.update(b)
    so["x"] = blx
    so["y"] = bly
    so["width"] = trx - blx
    so["height"] = try_ - bly

    if lines:
        merge_lines(a, b, so)
    else:
        content = a["content"] + separator + b["content"]
        so["content"] = _WS_RE.sub(" ", content)

    if len(get_text_content(a)) > len(get_text_content(b)):
        so["font"] = a["font"]
        so["line_height"] = a["line_height"]
    else:
        so["font"] = b["font"]
        so["line_height"] = b["line_height"]
    return so


def contains(a: dict, b: dict, padding: float = 0.0) -> bool:
    # spatial.rb:130-142 — NB the reference pads asymmetrically
    # (x1 - padding but x2 + 2*padding); replicated verbatim.
    a_x1 = a["x"] - padding
    a_x2 = a["x"] + a["width"] + (padding * 2)
    a_y1 = a["y"] - padding
    a_y2 = a["y"] + a["height"] + (padding * 2)

    b_x1 = b["x"]
    b_x2 = b["x"] + b["width"]
    b_y1 = b["y"]
    b_y2 = b["y"] + b["height"]

    return b_x1 >= a_x1 and b_x2 <= a_x2 and b_y1 >= a_y1 and b_y2 <= a_y2


def score(items: list[dict], ideals: dict[str, tuple[float, float]], name: str) -> None:
    """Ideal-point scorer (spatial.rb:156-175).

    Mutates ``items``: accumulates per-feature weighted closeness into
    ``item[name]``. ``max_diff`` normalizes across THIS document's items
    (per-document normalization — SURVEY.md §7.4), NaN diffs count as 1.
    """
    for f, (ideal, weight) in ideals.items():
        diffs = []
        for item in items:
            d = abs(item[f] - ideal)
            diffs.append(1.0 if math.isnan(d) else d)
        if not diffs:
            continue
        max_diff = max(diffs)
        for item, d in zip(items, diffs):
            if d == 0:
                s = weight
            else:
                s = (1 - (d / max_diff)) * weight
            item[name] = item.get(name, 0) + s
