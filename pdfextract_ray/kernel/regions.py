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


# One line's contribution to get_text_content length (spatial.rb:98-109):
# hyphen-ending lines join with the hyphen elided, others add a space —
# i.e. term(c) = len(c) - 1 if c.endswith("-") else len(c) + 1. Computed
# inline in build_regions' setup loop (the hot per-chunk pass).


# The merge itself (spatial.merge(t, b, lines=True), spatial.rb:42-76) is
# applied INLINE on cached locals inside build_regions' scan loop; the
# dominant-font rule (spatial.rb:63-69) needs only the LENGTHS of both
# sides' text content, which accumulate additively over lines:
# _tc_len(side) = side._tcS - (0 if its FINAL line ends with '-' else 1),
# and the final (= bottom-most) line is the accumulator's lines[0],
# because lines are stored bottom-first — the reference's top-first
# prepend (t.lines + b.lines) copies the accumulated list every merge,
# O(k²) per k-line region; a bottom-first append is O(1) and the flush
# pass restores top-first order.


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

    # chunks become single-line carriers (regions.rb:70-74).
    # c_tc mirrors _tc_len for the (always single-line) candidates: the
    # dominant-font rule only ever compares a candidate's adjusted text
    # length against the accumulator's, so both are precomputed once.
    # spatial.as_line + _tc_term are inlined (the loop runs once per
    # chunk on every page; same keys in the same insertion order).
    c_tc: list[int] = []
    for chunk in chunks:
        content = chunk["content"]
        chunk["lines"] = [{
            "x": chunk["x"], "y": chunk["y"], "width": chunk["width"],
            "height": chunk["height"], "page": chunk["page"],
            "page_width": chunk["page_width"],
            "page_height": chunk["page_height"], "content": content,
        }]
        if content.endswith("-"):
            ts = len(content) - 1
            c_tc.append(ts)
        else:
            ts = len(content) + 1
            c_tc.append(ts - 1)
        chunk["_tcS"] = ts
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
    # b (= chunks[h]) only changes on merge/flush — its hot fields live
    # in locals, and merges are applied INLINE to the locals (the
    # _merge_regions body, float-operation-identical: every bbox value
    # round-trips through width/height exactly as the dict-based merge
    # does, so IEEE results match the reference bit-for-bit — guarded by
    # the differential property test vs the literal naive scan). The
    # dict is only written back on flush, and only when dirty.
    b = chunks[0] if chunks else None
    b_lh = b_top = b_x1 = b_x2 = b_reach = b_y = b_w = b_h = 0.0
    b_tcS = b_sub = 0
    b_dirty = False
    fresh_b = True
    while n - h > compare_index:
        if fresh_b:
            b_lh = b["line_height"]
            b_y = b["y"]
            b_w = b["width"]
            b_h = b["height"]
            b_top = b_y + b_h
            b_x1 = b["x"]
            b_x2 = b_x1 + b_w
            b_tcS = b["_tcS"]
            b_sub = b_tcS - c_tc[h]  # head is always an untouched chunk
            b_dirty = False
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
            if b_dirty:
                b["x"] = b_x1
                b["width"] = b_w
                b["height"] = b_h
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
                # inline spatial.merge(t, b, lines=True) on the locals.
                # t is a single-line untouched original; bly = b_y always
                # (candidates stay ascending in y, so t_y >= the head's
                # original y, which merges never lower).
                t = chunks[j]
                if c_tc[j] > b_tcS - b_sub:  # dominant-font rule
                    b["font"] = t["font"]
                    b_lh = t["line_height"]
                    b["line_height"] = b_lh
                blx = t_x1 if t_x1 < b_x1 else b_x1
                trx = t_x2 if t_x2 > b_x2 else b_x2
                t_top = t_y + t_h
                try_ = t_top if t_top > b_top else b_top
                b_w = trx - blx
                b_h = try_ - b_y
                # round-trip through width/height like the dict merge:
                # the NEXT merge reads x+width / y+height, not trx/try_
                b_x1 = blx
                b_x2 = blx + b_w
                b_top = b_y + b_h
                b["lines"].append(t["lines"][0])
                b_tcS += t["_tcS"]
                b_dirty = True
                b_reach = (b_top + b_lh * line_slop_setting) \
                    if line_slop_setting >= 0 else float("inf")
                del chunks[j], c_y[j], c_h[j], c_x[j], c_w[j], c_tc[j]
                n -= 1
                compare_index = 1
                continue
        if compare_index < n - h - 1:
            compare_index += 1
        else:
            if b_dirty:
                b["x"] = b_x1
                b["width"] = b_w
                b["height"] = b_h
            regions.append(b)
            h += 1
            compare_index = 1
            b = chunks[h] if h < n else None
            fresh_b = True

    if h < n:
        if b_dirty and not fresh_b:
            b["x"] = b_x1
            b["width"] = b_w
            b["height"] = b_h
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
