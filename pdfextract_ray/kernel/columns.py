"""Per-page column detection via scanline sampling.

Parity with ``lib/pdf/extract/analysis/columns.rb:28-87``: sample
``column_sample_count`` horizontal scanlines through the body zone; each
scanline's x-mask unions the x-extents of body-contained regions
incident with it (columns.rb:16-26); reject masks with zero coverage,
more than ``max_column_count`` runs, or a widest run under 25% of body
width; keep the masks with the highest run count, then the widest
average; emit one column bbox per surviving run, in mask order.
"""

from __future__ import annotations

from pdfextract_ray.kernel import spatial
from pdfextract_ray.kernel.multirange import MultiRange
from pdfextract_ray.settings import Settings


def _columns_at(y: float, body_regions: list[dict]) -> MultiRange:
    # columns.rb:16-26
    x_mask = MultiRange()
    for region in body_regions:
        if region["y"] <= y and (region["y"] + region["height"]) >= y:
            x_mask.append(region["x"], region["x"] + region["width"])
    return x_mask


def build_columns(page_regions: list[dict], body: dict | None,
                  settings: Settings) -> list[dict]:
    if body is None:
        return []
    body_regions = [r for r in page_regions if spatial.contains(body, r)]

    column_sample_count = int(settings.column_sample_count)
    step = 1.0 / (column_sample_count + 1)

    column_ranges = [
        _columns_at(body["y"] + (body["height"] * i * step), body_regions)
        for i in range(1, column_sample_count + 1)
    ]

    # rejection cascade (columns.rb:60-68)
    column_ranges = [r for r in column_ranges if r.count and r.covered != 0]
    column_ranges = [r for r in column_ranges if r.count <= settings.max_column_count]
    column_ranges = [r for r in column_ranges if r.widest >= (0.25 * body["width"])]

    if not column_ranges:
        return []

    most = max(r.count for r in column_ranges)
    column_ranges = [r for r in column_ranges if r.count == most]

    widest = max(r.avg for r in column_ranges)
    column_ranges = [r for r in column_ranges if r.avg >= widest]

    winner = column_ranges[0]
    return [{**body, "x": lo, "width": hi - lo} for lo, hi in winner.ranges]
