"""Document title pick.

Parity with ``lib/pdf/extract/analysis/titles.rb:12-56``: filter regions
(content ≥2 chars; top half of page; line_height within ``title_slop`` of
the tallest; earliest page with text), then the highest-y survivor wins.
All sorts are stable, matching Ruby ``sort_by!``.
"""

from __future__ import annotations

from pdfextract_ray.kernel import spatial
from pdfextract_ray.settings import Settings


def build_title(all_regions: list[dict], settings: Settings) -> dict | None:
    titles = [r for r in all_regions
              if len(spatial.get_text_content(r).strip()) >= 2]
    titles = [r for r in titles if r["y"] >= (r["page_height"] / 2.0)]

    titles.sort(key=lambda r: -r["line_height"])
    if titles:
        tallest = titles[0]["line_height"]
        floor_height = tallest - (tallest * settings.title_slop)
        titles = [r for r in titles if r["line_height"] >= floor_height]

    titles.sort(key=lambda r: r["page"])
    if titles:
        first_page = titles[0]["page"]
        titles = [r for r in titles if r["page"] == first_page]

    titles.sort(key=lambda r: -r["y"])
    if not titles:
        return None
    return {
        "content": spatial.get_text_content(titles[0]),
        "line_height": titles[0]["line_height"],
        "font": titles[0]["font"],
    }
