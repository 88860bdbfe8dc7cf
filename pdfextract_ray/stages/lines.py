"""C4-style line-level cleaning + page heuristics.

The cleaning pass that made C4 out of Common Crawl (Raffel et al.
2020, "Exploring the Limits of Transfer Learning", public
methodology): work at LINE granularity inside each page —

- keep a line only if it ends in a terminal punctuation mark
  (period / exclamation / question mark / quotation mark — the set
  the public C4 reproductions use: ``. ! ? " '``),
- keep a line only if it has at least ``min_words`` words (paper: 3),
- drop any line containing a marker word (paper: "javascript" —
  boilerplate cookie/JS banners),

then at PAGE granularity drop pages that are left with fewer than
``min_sentences`` sentences (paper: 5) or that contain a banned
substring anywhere (paper: "lorem ipsum", "{" — template/code
pages). The three-sentence-span dedup the paper also applies is a
separate operator here (``dedup-paragraphs`` / ``dedup-spans``).

Pinned semantics (what the tests assert):

- lines are ``text.split("\\n")``; the cleaned text is the kept
  lines joined with ``"\\n"`` (leading/trailing whitespace of a kept
  line is preserved — only the terminal-punct check looks at the
  ``rstrip()``-ed form);
- words are :func:`pdfextract_ray.stages.textstats.ascii_words` —
  the one tokenizer contract every text operator in this package
  shares;
- marker / ban matching is case-insensitive substring containment;
- ``n_sentences`` is the count of ``. ! ?`` characters in the
  CLEANED text — the documented approximation (a real sentence
  splitter is model-territory; terminal-punct counting is what the
  public reproductions do);
- the operator is IDEMPOTENT: every kept line still satisfies every
  line rule, so cleaning a cleaned corpus changes nothing
  (hypothesis-fuzzed).

Scale shape: stateless per-batch map, no shuffle, no driver state.
The per-document line loop is inherent (the unit of work IS the
line, like the kernel's per-document algorithms); everything around
it — the page-level ban scan — is an Arrow kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pdfextract_ray.stages.textstats import ascii_words

# the public C4 reproductions' terminal set
TERMINALS = frozenset({".", "!", "?", '"', "'"})
LINE_MARKERS = ("javascript",)
PAGE_BANS = ("lorem ipsum", "{")


def _clean_one(text: str, min_words: int, markers: tuple) -> tuple:
    """(cleaned_text, n_lines, n_kept) for one document."""
    lines = text.split("\n")
    kept = []
    for line in lines:
        stripped = line.rstrip()
        if not stripped or stripped[-1] not in TERMINALS:
            continue
        low = line.lower()
        if any(m in low for m in markers):
            continue
        if len(ascii_words(line)) < min_words:
            continue
        kept.append(line)
    return "\n".join(kept), len(lines), len(kept)


def clean_lines_batch(t: pa.Table, text_col: str = "text",
                      min_words: int = 3, min_sentences: int = 5,
                      line_markers: tuple = LINE_MARKERS,
                      page_bans: tuple = PAGE_BANS) -> pa.Table:
    """Rewrite ``text_col`` with the kept lines and append the audit
    and verdict columns: n_lines, n_lines_kept, n_sentences, keep.
    ``keep`` is the PAGE verdict (enough sentences remain AND no
    banned substring anywhere in the original page); the caller
    decides whether to filter on it or carry it (the CLI does either).
    Null text → null cleaned text, keep = false."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    cleaned = [None] * n
    n_lines = np.zeros(n, np.int64)
    n_kept = np.zeros(n, np.int64)
    for i, s in enumerate(texts):
        if s is None:
            continue
        cleaned[i], n_lines[i], n_kept[i] = \
            _clean_one(s, min_words, line_markers)
    carr = pa.array(cleaned, pa.string())
    # sentence count over the CLEANED text (see module docstring)
    n_sent = pc.fill_null(pc.cast(
        pc.count_substring_regex(carr, r"[.!?]"), pa.int64()), 0)
    # page bans scan the ORIGINAL text, case-insensitively
    low = pc.utf8_lower(t[text_col])
    banned = None
    for b in page_bans:
        hit = pc.match_substring(low, b)
        banned = hit if banned is None else pc.or_(banned, hit)
    if banned is None:
        banned = pa.array([False] * n, pa.bool_())
    keep = pc.and_(pc.greater_equal(n_sent, min_sentences),
                   pc.invert(pc.fill_null(banned, True)))
    keep = pc.fill_null(keep, False)

    idx = t.schema.get_field_index(text_col)
    out = t.set_column(idx, text_col, carr)
    return (out.append_column("n_lines", pa.array(n_lines))
               .append_column("n_lines_kept", pa.array(n_kept))
               .append_column("n_sentences", n_sent)
               .append_column("keep", keep))


def clean_lines(docs, text_col: str = "text", min_words: int = 3,
                min_sentences: int = 5, drop_pages: bool = False,
                line_markers: tuple = LINE_MARKERS,
                page_bans: tuple = PAGE_BANS):
    """Corpus with C4 line cleaning applied. ``drop_pages=True``
    additionally filters to keep=true rows (and drops the verdict
    column, since it is then constant)."""
    out = docs.map_batches(
        lambda t: clean_lines_batch(
            t, text_col=text_col, min_words=min_words,
            min_sentences=min_sentences, line_markers=line_markers,
            page_bans=page_bans),
        batch_format="pyarrow")
    if not drop_pages:
        return out

    def keep_only(t: pa.Table) -> pa.Table:
        return t.filter(t["keep"]).drop_columns(["keep"])

    return out.map_batches(keep_only, batch_format="pyarrow")
