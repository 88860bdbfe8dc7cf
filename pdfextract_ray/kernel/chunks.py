"""Token → chunk (word/line-fragment) clustering for one page.

Parity with ``lib/pdf/extract/model/chunks.rb:26-114``:

1. bucket tokens by EXACT ``y`` (dict preserves first-seen row order,
   like the Ruby hash), insertion-sorted by ``x`` with ties inserting
   BEFORE existing equals (``chunks.rb:39-44``);
2. sweep each row left→right: gap ≤ ``char_slop·char_width`` → glue,
   ≤ ``word_slop·char_width`` → join with a space; the running
   ``char_width`` updates to the right member's width only when its
   stripped content is entirely alphanumeric (``chunks.rb:66,71``);
3. stable-sort all chunks by ``x`` and merge pairs whose y-overlap
   ratio ≥ ``overlap_slop`` (``chunks.rb:85-107``);
4. drop whitespace-only chunks (``chunks.rb:111``).

The row sweep is the hot loop (one call per glyph) and is implemented
as an accumulator that reproduces ``Spatial.merge`` semantics exactly
for the within-row case: same-y merges keep ``y``; height is the bbox
union; content concatenates (glyphs are non-whitespace so the
reference's ``\\s+``→" " collapse is a no-op); the dominant-font rule
(spatial.rb:63-69 — longer side wins, ties to the right) reduces to
"second glyph's font, then sticky". Cross-row merges (step 3) use the
generic :func:`spatial.merge`.
"""

from __future__ import annotations

import re
from bisect import bisect_left

from pdfextract_ray.kernel import spatial
from pdfextract_ray.settings import Settings

_NON_ALNUM_RE = re.compile(r"[^A-Za-z0-9]")


class _Acc:
    """Row-sweep accumulator replicating iterated Spatial.merge."""

    __slots__ = ("x", "y", "right", "top", "height", "font", "line_height",
                 "parts", "n_merges", "extra")

    def __init__(self, tok: dict) -> None:
        self.x = tok["x"]
        self.y = tok["y"]
        self.right = tok["x"] + tok["width"]
        self.top = tok["y"] + tok["height"]
        self.font = tok["font"]
        self.line_height = tok["line_height"]
        self.parts = [tok["content"]]
        self.n_merges = 0
        self.extra = tok  # carries page/page_width/page_height

    def absorb(self, tok: dict, separator: str) -> None:
        # bbox union (same row ⇒ y equal; x ordered ⇒ left edge fixed)
        r = tok["x"] + tok["width"]
        if r > self.right:
            self.right = r
        t = tok["y"] + tok["height"]
        if t > self.top:
            self.top = t
        if separator:
            self.parts.append(separator)
        self.parts.append(tok["content"])
        # dominant-font rule: first merge compares 1-vs-1 glyph (tie → b
        # wins, spatial.rb:63-69); afterwards the accumulated side is
        # always longer, so font/line_height stick.
        if self.n_merges == 0:
            self.font = tok["font"]
            self.line_height = tok["line_height"]
        self.n_merges += 1

    def to_chunk(self) -> dict:
        so = dict(self.extra)
        so["x"] = self.x
        so["y"] = self.y
        so["width"] = self.right - self.x
        so["height"] = self.top - self.y
        so["content"] = "".join(self.parts)
        so["font"] = self.font
        so["line_height"] = self.line_height
        return so


class _LineAcc:
    """Row-sweep accumulator over LINE records (see layout._emit_line for
    the equivalence argument). Replicates the glyph-level sweep exactly
    at line boundaries; within-line decisions are precomputed."""

    __slots__ = ("x", "y", "right", "top", "font", "line_height", "parts",
                 "n_glyphs", "extra")

    def __init__(self, line: dict) -> None:
        self.x = line["x"]
        self.y = line["y"]
        self.right = line["x"] + line["width"]
        self.top = line["y"] + line["height"]
        self.font = line["font"]
        self.line_height = line["line_height"]
        self.parts = [line["content"]]
        self.n_glyphs = line["n_glyphs"]
        self.extra = line

    def absorb(self, line: dict, separator: str) -> None:
        r = line["x"] + line["width"]
        if r > self.right:
            self.right = r
        t = line["y"] + line["height"]
        if t > self.top:
            self.top = t
        if separator:
            self.parts.append(separator)
        self.parts.append(line["content"])
        if self.n_glyphs == 1:
            # first glyph-level merge ties 1-vs-1 → right side's font wins
            self.font = line["font"]
            self.line_height = line["line_height"]
        self.n_glyphs += line["n_glyphs"]

    def to_chunk(self) -> dict:
        e = self.extra
        return {
            "x": self.x, "y": self.y,
            "width": self.right - self.x, "height": self.top - self.y,
            "content": "".join(self.parts),
            "font": self.font, "line_height": self.line_height,
            "page": e["page"], "page_width": e["page_width"],
            "page_height": e["page_height"],
        }


def build_chunks_from_lines(lines: list[dict], settings: Settings) -> list[dict]:
    """Fast path: the same sweep over laid-out line records."""
    if not lines:
        return []
    char_slop = settings.char_slop
    word_slop = settings.word_slop

    rows: dict[float, tuple[list[dict], list[float]]] = {}
    for line in lines:
        entry = rows.get(line["y"])
        if entry is None:
            rows[line["y"]] = ([line], [line["x"]])
            continue
        row, xs = entry
        x = line["x"]
        if x > xs[-1]:
            row.append(line)
            xs.append(x)
        else:
            i = bisect_left(xs, x)
            row.insert(i, line)
            xs.insert(i, x)

    text_chunks: list[dict] = []
    for row, _ in rows.values():
        if len(row) == 1:
            # single-line row: the sweep degenerates to one chunk whose
            # fields are the line's, with width/height round-tripped
            # through the accumulator's (x+w)-x / (y+h)-y float path so
            # the result is bit-identical to _LineAcc(...).to_chunk()
            l = row[0]
            x = l["x"]
            y = l["y"]
            text_chunks.append({
                "x": x, "y": y,
                "width": (x + l["width"]) - x,
                "height": (y + l["height"]) - y,
                "content": l["content"],
                "font": l["font"], "line_height": l["line_height"],
                "page": l["page"], "page_width": l["page_width"],
                "page_height": l["page_height"],
            })
            continue
        acc = _LineAcc(row[0])
        char_width = row[0]["char_w"]
        for k in range(1, len(row)):
            right = row[k]
            edge = acc.right
            if edge + (char_width * char_slop) >= right["x"]:
                acc.absorb(right, "")
            elif edge + (char_width * word_slop) >= right["x"]:
                acc.absorb(right, " ")
            else:
                text_chunks.append(acc.to_chunk())
                acc = _LineAcc(right)
                char_width = right["char_w"]
                continue
            if right["last_alnum_w"] is not None:
                char_width = right["last_alnum_w"]
        text_chunks.append(acc.to_chunk())

    return _overlap_merge(text_chunks, settings.overlap_slop)


def _overlap_merge(text_chunks: list[dict], overlap_slop: float) -> list[dict]:
    # -- cross-row overlap merge (chunks.rb:85-107). The reference's
    # head-of-list loop (compare [0] vs [1]; merge into [0] or flush [0])
    # is exactly a linear fold over the x-sorted list — same pair
    # comparisons in the same order, without O(n^2) list shifting.
    text_chunks.sort(key=lambda obj: obj["x"])  # stable, like sort_by!
    merged: list[dict] = []
    acc = text_chunks[0]
    for k in range(1, len(text_chunks)):
        right = text_chunks[k]
        min_h = min(acc["height"], right["height"])
        overlap = (min_h - abs(acc["y"] - right["y"])) / min_h
        if overlap >= overlap_slop:
            acc = spatial.merge(acc, right)
        else:
            merged.append(acc)
            acc = right
    merged.append(acc)

    # -- drop whitespace-only chunks (chunks.rb:111)
    return [c for c in merged if c["content"].strip() != ""]


def build_chunks(tokens: list[dict], settings: Settings) -> list[dict]:
    if not tokens:
        return []

    char_slop = settings.char_slop
    word_slop = settings.word_slop
    overlap_slop = settings.overlap_slop

    # -- bucket by exact y, sorted by x with ties-before-equals
    # (chunks.rb:35-45); bisect_left lands at the same index the Ruby
    # `index { x <= obj.x }` insertion produces. Tokens usually arrive in
    # x order, so appending is the fast path.
    rows: dict[float, tuple[list[dict], list[float]]] = {}
    for tok in tokens:
        entry = rows.get(tok["y"])
        if entry is None:
            rows[tok["y"]] = ([tok], [tok["x"]])
            continue
        row, xs = entry
        x = tok["x"]
        if x > xs[-1]:
            row.append(tok)
            xs.append(x)
        else:
            i = bisect_left(xs, x)
            row.insert(i, tok)
            xs.insert(i, x)

    # -- per-row left→right merge sweep (chunks.rb:53-82)
    text_chunks: list[dict] = []
    for row, _ in rows.values():
        acc = _Acc(row[0])
        char_width = row[0]["width"]
        for k in range(1, len(row)):
            right = row[k]
            edge = acc.right
            if edge + (char_width * char_slop) >= right["x"]:
                acc.absorb(right, "")
            elif edge + (char_width * word_slop) >= right["x"]:
                acc.absorb(right, " ")
            else:
                text_chunks.append(acc.to_chunk())
                acc = _Acc(right)
                char_width = right["width"]
                continue
            if not _NON_ALNUM_RE.search(right["content"].strip()):
                char_width = right["width"]
        text_chunks.append(acc.to_chunk())

    return _overlap_merge(text_chunks, overlap_slop)
