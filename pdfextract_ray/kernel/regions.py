"""Chunk → region (paragraph) agglomeration for one page.

Parity with ``lib/pdf/extract/model/regions.rb:45-113``: chunks are
insertion-sorted ascending by ``y`` (ties insert before equals,
regions.rb:58-63), converted to single-line regions, then a
restart-at-1 scan repeatedly merges the bottom region with any chunk
within ``line_slop·min(line_height, candidate.height)`` vertically whose
x-range is incident (regions.rb:77-98, incidence regions.rb:15-25).
Merged line order is top-of-page first (``Spatial.merge(t, b, lines=True)``
puts t's lines before b's). Output regions carry per-line
``x_offset/y_offset`` (regions.rb:27-33) and inter-line ``spacing``
(regions.rb:35-43), line spatial attribs dropped, regions sorted by
descending ``y`` (regions.rb:111).
"""

from __future__ import annotations

from pdfextract_ray.kernel import spatial
from pdfextract_ray.settings import Settings


def _incident(l: dict, r: dict) -> bool:
    # regions.rb:15-25 — closed-interval x-range incidence.
    lx1, lx2 = l["x"], l["x"] + l["width"]
    rx1, rx2 = r["x"], r["x"] + r["width"]
    return (lx1 <= rx1 <= lx2) or (lx1 <= rx2 <= lx2) or (rx1 <= lx1 <= rx2) or (rx1 <= lx2 <= rx2)


def _tc_term(content: str) -> int:
    # one line's contribution to get_text_content length (spatial.rb:98-109):
    # hyphen-ending lines join with the hyphen elided, others add a space
    return len(content) - 1 if content.endswith("-") else len(content) + 1


def _tc_len(region: dict) -> int:
    # total text-content length; the trailing space of a non-hyphen FINAL
    # (= bottom-most, top-first order) line is stripped. Lines are stored
    # bottom-first inside build_regions (see _merge_regions), so the
    # final line is index 0.
    return region["_tcS"] - (0 if region["lines"][0]["content"].endswith("-") else 1)


def _merge_regions(t: dict, b: dict) -> dict:
    """spatial.merge(t, b, lines=True) with cached text lengths — the
    dominant-font rule (spatial.rb:63-69) needs only the LENGTHS of both
    sides' text content, which accumulate additively over lines.

    Mutates and returns ``b`` (the caller discards ``t`` and rebinds
    ``b`` to the result): both sides carry the identical key set, and
    the reference's ``{**t, **b}`` merge keeps b's values for every
    shared key, so in-place update of b is value-identical without the
    per-merge dict copy.

    Line-order invariant: ``t`` is always a single-line candidate (the
    scan only ever merges INTO the head ``b``; candidates are untouched
    originals), and the reference puts t's lines BEFORE b's (top-first).
    Storing the accumulator's lines bottom-first turns that prepend into
    an O(1) ``append`` — the reference's ``t.lines + b.lines`` copies
    the accumulated list on every merge, O(k²) per k-line region. The
    flush pass in build_regions restores top-first order."""
    if t["x"] < b["x"]:
        blx = t["x"]
    else:
        blx = b["x"]
    bly = t["y"] if t["y"] < b["y"] else b["y"]
    trx = max(t["x"] + t["width"], b["x"] + b["width"])
    try_ = max(t["y"] + t["height"], b["y"] + b["height"])

    if _tc_len(t) > _tc_len(b):  # before _tcS accumulates
        b["font"] = t["font"]
        b["line_height"] = t["line_height"]
    b["x"] = blx
    b["y"] = bly
    b["width"] = trx - blx
    b["height"] = try_ - bly
    b["lines"].append(t["lines"][0])
    b["_tcS"] = t["_tcS"] + b["_tcS"]
    return b


def build_regions(page_chunks: list[dict], settings: Settings) -> list[dict]:
    if not page_chunks:
        return []
    line_slop_setting = settings.line_slop

    # ascending-y insertion sort, ties before equals (regions.rb:58-63):
    # sequential bisect_left insertion puts each later equal-y chunk
    # BEFORE earlier ones, i.e. equal-y runs end up in reversed input
    # order — exactly the stable sort by (y, -input_index), O(n log n)
    # stable sort over REVERSED indices by y alone ≡ sort by (y, -i)
    # without building a key tuple per chunk
    order = sorted(range(len(page_chunks) - 1, -1, -1),
                   key=lambda i: page_chunks[i]["y"])
    chunks: list[dict] = [dict(page_chunks[i]) for i in order]

    # chunks become single-line carriers (regions.rb:70-74)
    for chunk in chunks:
        chunk["lines"] = [spatial.as_line(chunk)]
        chunk["_tcS"] = _tc_term(chunk["content"])
        del chunk["content"]

    regions: list[dict] = []
    # head pointer h replaces the reference's del-from-front (regions.rb
    # shifts the array; a pointer bump is O(1) and order-identical)
    h = 0
    compare_index = 1  # relative to h
    n = len(chunks)
    # parallel hot-field lists: the scan reads each candidate's
    # y/height/x/width once per iteration, and list indexing beats four
    # dict lookups; entries for non-head chunks never change (merges
    # only mutate chunks[h], whose fields are cached from the dict), so
    # the lists just mirror the dels
    c_y = [c["y"] for c in chunks]
    c_h = [c["height"] for c in chunks]
    c_x = [c["x"] for c in chunks]
    c_w = [c["width"] for c in chunks]
    # b (= chunks[h]) only changes on merge/flush — cache its hot fields
    b = chunks[0] if chunks else None
    b_lh = b_top = b_x1 = b_x2 = b_reach = 0.0
    fresh_b = True
    while n - h > compare_index:
        if fresh_b:
            b_lh = b["line_height"]
            b_top = b["y"] + b["height"]
            b_x1 = b["x"]
            b_x2 = b_x1 + b["width"]
            # pruning bound: chunks[h+1:] stay ascending in y, and the slop
            # is at most b_lh*line_slop (min(b_lh, t_h) <= b_lh) — once a
            # candidate's y exceeds this reach, no later candidate can be
            # y-incident either, so the scan's outcome is a flush.
            # Strictly equivalent to the reference's scan-to-the-end
            # (regions.rb:77-98); bound valid for non-negative slops.
            b_reach = (b_top + b_lh * line_slop_setting) \
                if line_slop_setting >= 0 else float("inf")
            fresh_b = False

        j = h + compare_index
        t_y = c_y[j]
        if b_reach < t_y:
            regions.append(b)
            h += 1
            compare_index = 1
            b = chunks[h] if h < n else None
            fresh_b = True
            continue
        t_h = c_h[j]
        line_slop = (b_lh if b_lh < t_h else t_h) * line_slop_setting

        if (b_top + line_slop) >= t_y:
            t_x1 = c_x[j]
            t_x2 = t_x1 + c_w[j]
            if (t_x1 <= b_x1 <= t_x2) or (t_x1 <= b_x2 <= t_x2) \
                    or (b_x1 <= t_x1 <= b_x2) or (b_x1 <= t_x2 <= b_x2):
                b = chunks[h] = _merge_regions(chunks[j], b)
                del chunks[j], c_y[j], c_h[j], c_x[j], c_w[j]
                n -= 1
                compare_index = 1
                fresh_b = True
                continue
        if compare_index < n - h - 1:
            compare_index += 1
        else:
            regions.append(b)
            h += 1
            compare_index = 1
            b = chunks[h] if h < n else None
            fresh_b = True

    if h < n:
        regions.append(chunks[h])

    for region in regions:
        region.pop("_tcS", None)
        # fused line offsets (regions.rb:27-33) + spacing (regions.rb:35-43)
        # + specialized drop_spatial (spatial.rb:20-22 reduces to this projection —
        # same keys, same insertion order: content, x_offset, y_offset,
        # spacing) in ONE pass, iterating the bottom-first accumulator
        # in reverse to restore the reference's top-first line order
        rx = region["x"]
        ry = region["y"]
        rh = region["height"]
        height_taken = 0.0
        out = []
        for l in reversed(region["lines"]):
            y_off = l["y"] - ry
            from_top = rh - (y_off + l["height"])
            out.append({"content": l["content"], "x_offset": l["x"] - rx,
                        "y_offset": y_off, "spacing": from_top - height_taken})
            height_taken = from_top + l["height"]
        region["lines"] = out

    regions.sort(key=lambda obj: -obj["y"])  # stable, regions.rb:111
    return regions
