"""Per-page margin strips from region extents.

Parity with ``lib/pdf/extract/analysis/margins.rb``: a MultiRange union
of region extents per axis; top margin is the strip above ``y_mask.max``,
bottom below ``y_mask.min``, left/right likewise on x
(margins.rb:46-80). Page geometry comes from the FIRST region seen on
the page (margins.rb:22-27). Pages with no regions emit no margins.
"""

from __future__ import annotations

from pdfextract_ray.kernel.multirange import MultiRange


def build_margins(page_regions: list[dict]) -> dict[str, dict] | None:
    """Return {"top":…, "bottom":…, "left":…, "right":…} for one page."""
    if not page_regions:
        return None

    first = page_regions[0]
    page = first["page"]
    page_width = first["page_width"]
    page_height = first["page_height"]

    x_mask = MultiRange()
    y_mask = MultiRange()
    for r in page_regions:
        x_mask.append(r["x"], r["x"] + r["width"])
        y_mask.append(r["y"], r["y"] + r["height"])

    base = {"page": page, "page_width": page_width, "page_height": page_height}
    return {
        "top": {**base, "x": 0, "y": y_mask.max, "width": page_width,
                "height": page_height - y_mask.max},
        "bottom": {**base, "x": 0, "y": 0, "width": page_width, "height": y_mask.min},
        "left": {**base, "x": 0, "y": 0, "width": x_mask.min, "height": page_height},
        "right": {**base, "x": x_mask.max, "y": 0, "width": page_width - x_mask.max,
                  "height": page_height},
    }
