"""Reading-order section assembly + content stats + reference scoring.

Parity with ``lib/pdf/extract/analysis/sections.rb:87-177``:

- regions are assigned to the FIRST registered column (across all pages,
  column emission order) that spatially contains them with padding 1
  (sections.rb:96-103);
- per column, regions sort top-down; columns group by page (page order =
  first-seen order) and sort left→right within a page
  (sections.rb:107-121);
- a linear scan in that reading order folds candidate regions
  (width/column-width ≥ ``width_ratio``, sections.rb:24-32) into the open
  section while ``match?`` holds (widths within 10% of their average AND
  line_height equal at 2dp, sections.rb:15-22); a ``possible_header?``
  region (narrower but at least as wide as tall, sections.rb:34-42)
  closes the open section; other regions are ignored;
- content stats (letter/year/cap/name ratios, word_count,
  lateness = last_component_page / pages_with_columns,
  sections.rb:72-85) and the ideal-point reference score
  (sections.rb:163-172, ``Spatial.score`` with per-document
  normalization) are appended.

The dormant k-means clustering path (sections.rb:44-70, kmeans.rb) is
not in the live path and is not ported (SURVEY.md §2.5).
"""

from __future__ import annotations

from pdfextract_ray.kernel import language, names, spatial
from pdfextract_ray.settings import Settings

REF_IDEALS = {
    # sections.rb:163-170
    "name_ratio": (0.14, 1),
    "letter_ratio": (0.23, 6),
    "year_ratio": (0.05, 10),
    "cap_ratio": (0.49, 10),
    "lateness": (0.96, 6),
}


def _match(a: dict, b: dict) -> bool:
    # sections.rb:15-22
    avg_width = (a["width"] + b["width"]) / 2.0
    matched_width = abs(a["width"] - b["width"]) <= avg_width * 0.1
    matched_font_size = round(a["line_height"], 2) == round(b["line_height"], 2)
    return matched_width and matched_font_size


def _candidate(region: dict, column: dict, settings: Settings) -> bool:
    # sections.rb:24-32
    within_column = region["width"] <= column["width"]
    return within_column and (region["width"] / column["width"]) >= settings.width_ratio


def _possible_header(region: dict, column: dict) -> bool:
    # sections.rb:34-42
    within_column = region["width"] <= column["width"]
    return within_column and region["width"] >= region["height"]


def _add_content_stats(sections: list[dict], page_count: int,
                       gazetteer: dict[str, bool],
                       names_backend: str | None = None) -> list[dict]:
    # sections.rb:72-85; the Ruby `components.max {|c| c[:page]}` abuses a
    # one-arg block as a comparator — components arrive in reading order
    # (ascending page), so the effective result is the max page.
    out = []
    for section in sections:
        last_page = max(c["page"] for c in section["components"])
        content = spatial.get_text_content(section)
        stats = spatial.drop_spatial(section)
        # split once — year/cap/name/word_count all consume the same
        # content.split() (language.rb splits per scalar; values identical)
        words = content.split()
        n_words = len(words)
        stats.update({
            "letter_ratio": language.letter_ratio(content),
            "year_ratio": language.year_ratio(content, words),
            "cap_ratio": language.cap_ratio(content, n_words),
            "name_ratio": names.detect_names(content, gazetteer,
                                             backend=names_backend,
                                             words=words),
            "word_count": n_words,
            "lateness": last_page / float(page_count),
        })
        out.append(stats)
    return out


def build_sections(all_regions: list[dict], all_columns: list[dict],
                   settings: Settings, gazetteer: dict[str, bool]) -> list[dict]:
    # column registration order is emission order (sections.rb:92-94)
    columns = [{"column": c, "regions": []} for c in all_columns]

    # assign each region to the first containing column (sections.rb:96-103)
    for region in all_regions:
        for c in columns:
            column = c["column"]
            if column["page"] == region["page"] and spatial.contains(column, region, 1):
                c["regions"].append(region)
                break

    # top-down within column (sections.rb:107-109)
    for c in columns:
        c["regions"].sort(key=lambda r: -r["y"])

    # group by page in first-seen order, columns left→right (sections.rb:112-121)
    pages: dict[int, list[dict]] = {}
    for c in columns:
        pages.setdefault(c["column"]["page"], []).append(c)
    for page_columns in pages.values():
        page_columns.sort(key=lambda c: c["column"]["x"])

    sections: list[dict] = []
    merging_region: dict | None = None

    for page_columns in pages.values():
        for container in page_columns:
            column = container["column"]
            for region in container["regions"]:
                if _candidate(region, column, settings):
                    if merging_region is not None and _match(merging_region, region):
                        spatial.merge_lines(merging_region, region, merging_region)
                        merging_region["components"].append(spatial.get_dimensions(region))
                    elif merging_region is not None:
                        sections.append(merging_region)
                        merging_region = {**region,
                                          "components": [spatial.get_dimensions(region)]}
                    else:
                        merging_region = {**region,
                                          "components": [spatial.get_dimensions(region)]}
                elif _possible_header(region, column):
                    if merging_region is not None:
                        sections.append(merging_region)
                    merging_region = None

    if merging_region is not None:
        sections.append(merging_region)

    sections = _add_content_stats(sections, len(pages), gazetteer,
                                  names_backend=settings.names_backend)
    spatial.score(sections, REF_IDEALS, "reference_score")
    return sections
