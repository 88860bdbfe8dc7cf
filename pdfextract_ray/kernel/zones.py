"""Per-page header/footer/body zone classification.

Parity with ``lib/pdf/extract/analysis/zones.rb:14-128``: the page's
region y-extents plus an injected central band (``body_ratio`` of the
marginless height, zones.rb:48-51) form a y-mask; 1 run → all body,
2 runs → taller segment is body and the other is header or footer,
≥3 runs → header above the top gap, footer below the bottom gap, body
between.

Returns ``{"headers": [...], "footers": [...], "bodies": [...]}`` — the
reference's ``:group`` rerouting (pdf.rb:119-123) expressed as three
lists.
"""

from __future__ import annotations

from pdfextract_ray.kernel.multirange import MultiRange
from pdfextract_ray.settings import Settings


def build_zones(page_regions: list[dict], margins: dict[str, dict],
                settings: Settings) -> dict[str, list[dict]]:
    t_margin = margins["top"]
    b_margin = margins["bottom"]
    left_margin_x = margins["left"]["x"] + margins["left"]["width"]
    right_margin_x = margins["right"]["x"]

    y_mask = MultiRange()
    for r in page_regions:
        y_mask.append(r["y"], r["y"] + r["height"])

    # central body band (zones.rb:48-51)
    marginless_height = t_margin["y"] - (b_margin["y"] + b_margin["height"])
    a = (marginless_height - (marginless_height * settings.body_ratio)) / 2
    y_mask.append(b_margin["y"] + b_margin["height"] + a, t_margin["y"] - a)

    objs: list[dict] = []
    if y_mask.count < 2:
        objs.append({
            "group": "bodies",
            "x": left_margin_x,
            "y": b_margin["y"] + b_margin["height"],
            "width": right_margin_x - left_margin_x,
            "height": t_margin["y"] - (b_margin["y"] + b_margin["height"]),
        })
    elif y_mask.count < 3:
        top = {
            "x": left_margin_x,
            "y": y_mask.max_excluded,
            "width": right_margin_x - left_margin_x,
            "height": t_margin["y"] - y_mask.max_excluded,
        }
        bottom = {
            "x": left_margin_x,
            "y": b_margin["y"] + b_margin["height"],
            "width": right_margin_x - left_margin_x,
            "height": top["y"] - (b_margin["y"] + b_margin["height"]),
        }
        if top["height"] > bottom["height"]:
            top["group"] = "bodies"
            bottom["group"] = "footers"
        else:
            top["group"] = "headers"
            bottom["group"] = "bodies"
        objs.extend([top, bottom])
    else:
        header = {
            "group": "headers",
            "x": left_margin_x,
            "y": y_mask.max_excluded,
            "width": right_margin_x - left_margin_x,
            "height": t_margin["y"] - y_mask.max_excluded,
        }
        footer = {
            "group": "footers",
            "x": left_margin_x,
            "y": b_margin["y"] + b_margin["height"],
            "width": right_margin_x - left_margin_x,
            "height": y_mask.min_excluded - (b_margin["y"] + b_margin["height"]),
        }
        body = {
            "group": "bodies",
            "x": left_margin_x,
            "y": footer["y"] + footer["height"],
            "width": right_margin_x - left_margin_x,
            "height": header["y"] - (footer["y"] + footer["height"]),
        }
        objs.extend([header, body, footer])

    page_base = {
        "page": t_margin["page"],
        "page_width": t_margin["page_width"],
        "page_height": t_margin["page_height"],
    }

    out: dict[str, list[dict]] = {"headers": [], "footers": [], "bodies": []}
    for o in objs:
        group = o.pop("group")
        out[group].append({**page_base, **o})
    return out
