"""Deterministic HTML layout front-end: html bytes → positioned glyph tokens.

This is the webtext analogue of the reference's PDF content-stream
interpreter + font metrics (``lib/pdf/extract/model/characters.rb:139-343``,
``lib/pdf/extract/font_metrics.rb:28-67``): it turns one page payload into
the same token record shape the downstream geometric stages consume —
``{x, y, width, height, line_height, content (1 glyph), page, font,
page_width, page_height}`` (characters.rb:102-113) — using a fixed
per-tag font/line-height metrics table (the AFM-table analogue) and a
deterministic greedy line-wrap + pagination model.

Geometry is PDF-points-like: 612×792 page, origin bottom-left, y grows
upward (titles must sit in the top half of the page,
``analysis/titles.rb:26``). ``<header>``/``<footer>`` elements become
per-page furniture strips (the repeated site chrome the zone stage later
classifies as header/footer and strips); body blocks flow into
``data-columns`` columns with greedy word wrap and deterministic
hyphenation (exercising the hyphen-elision path of
``Spatial.get_text_content``, spatial.rb:98-112).

The layout model is intentionally simple but total: unknown tags get
default paragraph metrics, scripts/styles/head are skipped, entity refs
decode via html.parser.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from html.parser import HTMLParser
from itertools import accumulate
from operator import add

PAGE_WIDTH = 612.0
PAGE_HEIGHT = 792.0
CONTENT_X0 = 72.0
CONTENT_X1 = 540.0
CONTENT_TOP = 736.0
CONTENT_BOTTOM = 56.0
HEADER_TOKEN_Y = 768.0   # header glyph box bottom (top 776)
FOOTER_TOKEN_Y = 16.0    # footer glyph box bottom (top 24)
COLUMN_GUTTER = 24.0
HANG_INDENT = 18.0
CHAR_RATIO = 0.5         # glyph advance = CHAR_RATIO * font_size
_ASCII_ALNUM_RE = re.compile(r"[0-9A-Za-z]")

# tag → (font name, font size, line height) — the FontMetrics analogue.
TAG_METRICS: dict[str, tuple[str, float, float]] = {
    "h1": ("SerifBold", 22.0, 26.4),
    "h2": ("SerifBold", 14.0, 16.8),
    "h3": ("SerifBold", 12.0, 14.4),
    "h4": ("SerifBold", 11.0, 13.2),
    "p": ("Serif", 10.0, 12.0),
    "li": ("Serif", 10.0, 12.0),
    "div": ("Serif", 10.0, 12.0),
    "blockquote": ("SerifItalic", 10.0, 12.0),
    "pre": ("Mono", 9.0, 10.8),
    "header": ("Sans", 8.0, 9.6),
    "footer": ("Sans", 8.0, 9.6),
}
DEFAULT_METRICS = TAG_METRICS["p"]

# vertical gap appended after a block (before the next block's first line)
TAG_GAP = {"h1": 14.0, "h2": 12.0, "h3": 10.0, "h4": 10.0}
DEFAULT_GAP = 10.0
CLASS_GAP = {"tight": 6.0, "hang": 0.0}

BLOCK_TAGS = frozenset(TAG_METRICS) | {"h5", "h6", "td", "th", "caption", "figcaption", "dt", "dd"}
SKIP_TAGS = frozenset({"script", "style", "head", "title", "noscript", "svg", "template"})
FURNITURE_TAGS = frozenset({"header", "footer"})


class _BlockCollector(HTMLParser):
    """Flatten HTML into an ordered list of text blocks.

    Produces ``{"tag", "classes", "text"}`` dicts in document order;
    ``<header>``/``<footer>`` subtree blocks are routed to furniture
    lists. Inline markup is stripped (text accumulates into the enclosing
    block); bare text outside any block opens an implicit ``<p>``.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.body_blocks: list[dict] = []
        self.header_blocks: list[dict] = []
        self.footer_blocks: list[dict] = []
        self.columns = 1
        self._skip_depth = 0
        self._furniture: str | None = None
        self._cur: dict | None = None

    def parse_html_declaration(self, i: int) -> int:
        # CPython's _markupbase raises bare AssertionError ("expected
        # name token") on malformed marked sections like '<![0' — a
        # crash a 10^12-page crawl WILL hit (found by the hypothesis
        # differential fuzz, round 5). Recover the way browsers treat
        # a bogus declaration: skip to the next '>' (or end of input).
        # The fast scanner bails to THIS parser for every '<!', so
        # both routes share the recovery and parity holds.
        try:
            return super().parse_html_declaration(i)
        except AssertionError:
            j = self.rawdata.find(">", i)
            return len(self.rawdata) if j < 0 else j + 1

    def _flush(self) -> None:
        cur = self._cur
        if cur is not None and cur["text"].split():
            if self._furniture == "header":
                self.header_blocks.append(cur)
            elif self._furniture == "footer":
                self.footer_blocks.append(cur)
            else:
                self.body_blocks.append(cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        attrs = dict(attrs)
        if tag == "body":
            try:
                self.columns = max(1, int(attrs.get("data-columns", 1)))
            except (TypeError, ValueError):
                self.columns = 1
            return
        if tag in FURNITURE_TAGS:
            self._flush()
            self._furniture = tag
        if tag in BLOCK_TAGS:
            self._flush()
            classes = tuple((attrs.get("class") or "").split())
            self._cur = {"tag": tag, "classes": classes, "text": ""}

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in FURNITURE_TAGS:
            self._furniture = None

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._cur is None:
            if not data.split():
                return
            self._cur = {"tag": "p", "classes": (), "text": ""}
        self._cur["text"] += data

    def close(self):
        super().close()
        self._flush()


# ---- fast tag scanner -------------------------------------------------
# html.parser's goahead/parse_starttag machinery costs ~19% of kernel
# time (round-3 profile). This scanner drives the SAME _BlockCollector
# handlers over the regular-HTML subset the corpus grammar emits
# (lowercase alnum tag names, double-quoted or bare attributes,
# no comments/PIs/declarations) and BAILS to the stdlib parser on the
# first construct outside that subset, so parity is guaranteed by
# construction for anything it doesn't provably handle. Byte-parity
# with html.parser over the subset is enforced by a differential
# harness (tests/test_fast_parse.py: every golden doc, the sf0.001
# corpus, and hypothesis-fuzzed HTML, fast vs stdlib, equal output).
_FAST_STARTTAG_RE = re.compile(
    r'<([a-zA-Z][a-zA-Z0-9]*)'
    # every attribute must be name="value": a bare (valueless) attr is
    # (name, None) to html.parser but invisible to _FAST_ATTR_RE, a
    # silent parity gap — push <p hidden> etc. down the stdlib bail
    r'((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*\s*=\s*"[^"<>]*")*)'
    r'\s*(/?)>')
_FAST_ENDTAG_RE = re.compile(r'</([a-zA-Z][a-zA-Z0-9]*)\s*>')
_FAST_ATTR_RE = re.compile(r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*"([^"<>]*)"')
_CDATA_CLOSE_RE = {t: re.compile(r'</\s*%s\s*>' % t, re.IGNORECASE)
                   for t in ("script", "style")}
_ATTR_TAGS = BLOCK_TAGS | {"body"}


def _fast_feed(html: str, c: _BlockCollector) -> bool:
    """Drive ``c``'s handlers over the regular-HTML subset; return False
    to bail to the stdlib parser (collector state is then discarded).

    Mirrors html.parser semantics exactly within the subset: text runs
    between tags are unescaped as one segment (goahead does the same
    via ``unescape(rawdata[i:j])``), script/style enter CDATA mode (raw
    data up to ``</\\s*tag\\s*>``, unterminated content silently dropped
    like goahead's cdata break), a stray ``<`` becomes one data char,
    and self-closing tags fire start+end without CDATA mode."""
    from html import unescape

    pos, n = 0, len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            seg = html[pos:]
            c.handle_data(unescape(seg) if "&" in seg else seg)
            return True
        if lt > pos:
            seg = html[pos:lt]
            c.handle_data(unescape(seg) if "&" in seg else seg)
        nxt = html[lt + 1:lt + 2]
        if nxt == "":
            # '<' at EOF: goahead breaks, then the end-flush emits it
            c.handle_data("<")
            return True
        if nxt == "/":
            m = _FAST_ENDTAG_RE.match(html, lt)
            if m is None:
                return False  # </>, bogus comment, nonsubset name
            c.handle_endtag(m.group(1).lower())
            pos = m.end()
        elif ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
            m = _FAST_STARTTAG_RE.match(html, lt)
            if m is None:
                return False  # unquoted/single-quoted attrs, weird name
            tag = m.group(1).lower()
            attrs_s = m.group(2)
            attrs: list = []
            if attrs_s and tag in _ATTR_TAGS:
                attrs = [(k.lower(), unescape(v) if "&" in v else v)
                         for k, v in _FAST_ATTR_RE.findall(attrs_s)]
            pos = m.end()
            if m.group(3):  # XHTML self-close: start+end, no CDATA mode
                c.handle_starttag(tag, attrs)
                c.handle_endtag(tag)
                continue
            c.handle_starttag(tag, attrs)
            if tag in ("script", "style"):
                mm = _CDATA_CLOSE_RE[tag].search(html, pos)
                if mm is None:
                    # goahead: cdata with no close → content dropped,
                    # no endtag fires
                    pos = n
                    continue
                if mm.start() > pos:
                    c.handle_data(html[pos:mm.start()])  # raw, per cdata
                c.handle_endtag(tag)
                pos = mm.end()
        elif nxt in "!?":
            return False  # comments / PIs / declarations: stdlib
        else:
            c.handle_data("<")
            pos = lt + 1
    return True


def parse_blocks(html: str) -> _BlockCollector:
    c = _BlockCollector()
    if _fast_feed(html, c):
        c._flush()  # close() minus the goahead machinery
        return c
    c = _BlockCollector()  # bail: fresh collector, exact stdlib parse
    c.feed(html)
    c.close()
    return c


def _wrap_words(words: list[str], width: float, cont_width: float,
                char_w: float, space_w: float) -> list[list[str]]:
    """Greedy wrap into lines of word strings; oversized words hyphenate
    deterministically (split to fit, trailing '-').

    Integer char-unit fast path when ``space_w == char_w`` (every call
    site here): the float quantities are all exact multiples of
    ``char_w`` (char_w ∈ {k/2} and word widths are int×char_w, both
    exactly representable), so ``used + need <= budget`` ⟺
    ``chars_used + chars_need <= floor(budget/char_w)`` — proven
    equivalent by the differential test against the float loop.

    The greedy word loop collapses to ONE bisect per line: with
    ``A[j] = Σ_{k≤j} (len(words[k]) + 1)``, the line starting at ``s``
    holds words ``s..e-1`` where ``e`` is the first index with
    ``A[e] > A[s-1] + budget + 1`` (the +1 cancels the uncounted
    leading space). Hyphenation shortens ``words[s]`` in place; instead
    of rebuilding the prefix sums, the constant shortfall is carried in
    ``adj`` (every later ``A[j]`` overstates by exactly the total
    chars hyphenated off so far)."""
    if space_w == char_w:
        # kmax = largest k with k*char_w <= budget, robust at the float
        # boundary (k*char_w is exact, so the <= check is exact)
        kmax = int(width / char_w)
        if (kmax + 1) * char_w <= width:
            kmax += 1
        elif kmax * char_w > width:
            kmax -= 1
        kmax_cont = int(cont_width / char_w)
        if (kmax_cont + 1) * char_w <= cont_width:
            kmax_cont += 1
        elif kmax_cont * char_w > cont_width:
            kmax_cont -= 1
        n = len(words)
        # A[j] = Σ len + (j+1): all-C-speed via map(add, cumsum, 1..n)
        prefix = list(map(add, accumulate(map(len, words)), range(1, n + 1)))
        lines: list[list[str]] = []
        s = 0
        prev = 0  # effective A[s-1]
        adj = 0   # chars hyphenated off so far (A[j] - adj is effective)
        budget_k = kmax
        copied = False
        while s < n:
            e = bisect_right(prefix, prev + adj + budget_k + 1, s)
            if e > s:
                lines.append(words[s:e])
                prev = prefix[e - 1] - adj
                s = e
            else:
                # oversized word on an empty line → hyphenate to fit
                w = words[s]
                fit = budget_k - 1
                if fit < 1:
                    fit = 1
                if fit >= len(w):
                    fit = len(w) - 1
                lines.append([w[:fit] + "-"])
                if not copied:
                    words = list(words)
                    copied = True
                words[s] = w[fit:]
                adj += fit
            budget_k = kmax_cont
        return lines
    return _wrap_words_float(words, width, cont_width, char_w, space_w)


def _wrap_words_float(words: list[str], width: float, cont_width: float,
                      char_w: float, space_w: float) -> list[list[str]]:
    """Reference float implementation (kept as the differential oracle
    and the general-space_w path)."""
    lines: list[list[str]] = []
    cur: list[str] = []
    budget = width
    used = 0.0
    i = 0
    n = len(words)
    copied = False  # copy-on-write: only the rare hyphenation path mutates
    while i < n:
        w = words[i]
        w_width = len(w) * char_w
        need = w_width if not cur else w_width + space_w
        if used + need <= budget:
            cur.append(w)
            used += need
            i += 1
        elif not cur:
            # oversized word on an empty line → hyphenate to fit
            avail = budget - used
            fit = max(1, int(avail / char_w) - 1)
            if fit >= len(w):
                fit = len(w) - 1
            head, tail = w[:fit] + "-", w[fit:]
            lines.append([head])
            if not copied:
                words = list(words)
                copied = True
            words[i] = tail
            cur = []
            used = 0.0
            budget = cont_width
        else:
            lines.append(cur)
            cur = []
            used = 0.0
            budget = cont_width
    if cur:
        lines.append(cur)
    return lines


def _emit_line(tokens: list[dict], words: list[str], x0: float, y: float,
               font: str, size: float, line_height: float, page: int) -> None:
    """Emit one laid-out LINE record (the fast path consumed by
    ``chunks.build_chunks_from_lines``).

    The reference's row sweep operates on single glyphs; for glyphs of
    uniform advance within a line, its glue/space decisions are
    invariant to the running char_width for any font size in
    [2.5, 50) pt (glue threshold 0.2·cw is always < one space advance;
    word threshold 4·cw is always ≥ one space advance), so a whole
    emitted line always collapses to exactly one space-joined chunk.
    We therefore emit the collapsed line plus the glyph-level state the
    sweep needs at LINE BOUNDARIES: first-glyph width (Ruby
    ``row.first[:width]``), last-alnum-glyph width (the running
    char_width after the line), and the glyph count. ``to_glyphs``
    reconstructs the exact per-glyph stream for parity tests.

    Assumption (holds by construction here): same-y lines never overlap
    in x — columns have disjoint x-ranges and a column's y-cursor
    strictly decreases — so a row's glyphs group contiguously by line.
    The fuzzed equivalence test enforces exactly this invariant."""
    char_w = CHAR_RATIO * size
    content = " ".join(words)
    # spaces advance but carry no glyph: advances == len(content) exactly
    n_advances = len(content)
    n_glyphs = n_advances - (len(words) - 1)
    # width of the last glyph whose content is alphanumeric (None if none);
    # every alnum glyph in a line has the same width, so only EXISTENCE
    # matters — one C-level regex scan instead of a per-char Python loop
    last_alnum = char_w if _ASCII_ALNUM_RE.search(content) else None
    tokens.append({
        "x": x0, "y": y, "width": n_advances * char_w, "height": size,
        "line_height": line_height, "content": content, "page": page,
        "font": font, "page_width": PAGE_WIDTH, "page_height": PAGE_HEIGHT,
        "char_w": char_w, "n_glyphs": n_glyphs, "last_alnum_w": last_alnum,
    })


def to_glyphs(line: dict) -> list[dict]:
    """Expand a line record back into the reference's per-glyph tokens."""
    out = []
    x = line["x"]
    char_w = line["char_w"]
    for ch in line["content"]:
        if ch == " ":
            x += char_w
            continue
        out.append({
            "x": x, "y": line["y"], "width": char_w, "height": line["height"],
            "line_height": line["line_height"], "content": ch,
            "page": line["page"], "font": line["font"],
            "page_width": line["page_width"], "page_height": line["page_height"],
        })
        x += char_w
    return out


def tokenize(html: str | bytes) -> list[dict]:
    """Render one HTML payload into positioned glyph tokens."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    doc = parse_blocks(html)

    n_cols = doc.columns
    col_width = (CONTENT_X1 - CONTENT_X0 - COLUMN_GUTTER * (n_cols - 1)) / n_cols
    col_x = [CONTENT_X0 + i * (col_width + COLUMN_GUTTER) for i in range(n_cols)]

    tokens: list[dict] = []
    page = 1
    col = 0
    y_cursor = CONTENT_TOP
    at_column_top = True
    prev_classes: tuple | None = None

    # Leading <h1> blocks span the full content width above the column
    # flow (like a real article title band) — a title wrapped inside a
    # narrow column would y-align with neighbouring columns' lines and
    # be merged away by the overlap pass (chunks.rb:85-107 has no x-gap
    # check), losing its line-height to the title heuristic.
    body_blocks = list(doc.body_blocks)
    span_bottom = CONTENT_TOP
    while body_blocks and body_blocks[0]["tag"] == "h1":
        block = body_blocks.pop(0)
        font, size, lh = TAG_METRICS["h1"]
        char_w = CHAR_RATIO * size
        full_w = CONTENT_X1 - CONTENT_X0
        for line_words in _wrap_words(block["text"].split(), full_w, full_w,
                                      char_w, char_w):
            _emit_line(tokens, line_words, CONTENT_X0, y_cursor - size,
                       font, size, lh, page)
            y_cursor -= lh
        y_cursor -= TAG_GAP["h1"]
        span_bottom = y_cursor
    first_page_top = span_bottom

    def emit_furniture(p: int) -> None:
        for block, y in ((doc.header_blocks, HEADER_TOKEN_Y),
                         (doc.footer_blocks, FOOTER_TOKEN_Y)):
            for b in block[:1]:  # one furniture line per strip
                font, size, lh = TAG_METRICS[b["tag"]] if b["tag"] in FURNITURE_TAGS \
                    else TAG_METRICS["header"]
                _emit_line(tokens, b["text"].split(), CONTENT_X0, y, font, size, lh, p)

    emit_furniture(page)

    at_column_top = True
    for block in body_blocks:
        tag = block["tag"]
        font, size, lh = TAG_METRICS.get(tag, DEFAULT_METRICS)
        classes = block["classes"]
        hang = "hang" in classes
        # class-based tight gaps apply only BETWEEN consecutive blocks of
        # the same class (so a heading above a run of hang/tight refs
        # stays its own region instead of merging into the run)
        gap = None
        if prev_classes == classes:
            for cls in classes:
                if cls in CLASS_GAP:
                    gap = CLASS_GAP[cls]
                    break
        if gap is None:
            gap = TAG_GAP.get(tag, DEFAULT_GAP)
        prev_classes = classes

        char_w = CHAR_RATIO * size
        indent = HANG_INDENT if hang else 0.0
        lines = _wrap_words(block["text"].split(), col_width,
                            col_width - indent, char_w, char_w)

        if not at_column_top:
            y_cursor -= gap
        for li, line_words in enumerate(lines):
            if y_cursor - lh < CONTENT_BOTTOM:
                col += 1
                if col >= n_cols:
                    page += 1
                    col = 0
                    emit_furniture(page)
                y_cursor = first_page_top if page == 1 else CONTENT_TOP
            x0 = col_x[col] + (indent if li > 0 else 0.0)
            token_y = y_cursor - size
            _emit_line(tokens, line_words, x0, token_y, font, size, lh, page)
            y_cursor -= lh
            at_column_top = False

    return tokens
