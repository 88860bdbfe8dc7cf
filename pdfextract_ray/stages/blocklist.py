"""Blocklist page filtering (the C4 "bad words" gate, list supplied
by the user).

C4 (Raffel et al. 2020) drops any page containing a word from a
blocklist; Dolma and FineWeb variants do the same with their own
lists. The list itself is a policy input — this module deliberately
ships NONE and takes the phrases from the caller (the CLI reads a
newline-delimited file), because which list to use is a release
decision, not an engine default.

Matching semantics (pinned by tests):

- case-insensitive (the page is lowercased once; phrases are
  lowercased at compile time);
- WORD-BOUNDARY anchored: a phrase edge that is a word character
  must sit on a word boundary, so a blocklist entry never fires
  inside a longer word ("ass" does not match "class" or "assets");
  an edge that is punctuation ("$9.99") is matched literally with
  no boundary requirement (RE2's ``\b`` cannot exist next to a
  non-word char); multi-word phrases
  match with their internal whitespace normalized to single spaces
  in the phrase and matched against literal single spaces in the
  text (the common corpus convention);
- a page is dropped if ANY phrase matches; ``annotate=True`` writes
  ``n_blocked_terms`` (total match count across phrases) + ``keep``
  instead of filtering.

Scale shape: the whole list compiles to ONE RE2 alternation run by
``pc.count_substring_regex`` — one vectorized scan per batch
regardless of list size (RE2 compiles alternations to a DFA; a
1000-entry list costs the same pass as a 10-entry one). Stateless,
no shuffle. The compiled pattern travels with the closure (a few KB),
not via any driver-side broadcast.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def compile_blocklist(phrases) -> str:
    """One word-boundary-anchored RE2 alternation for the list.
    Raises on an empty/blank list — a blocklist filter with nothing
    to block is a caller bug, not a keep-everything pass."""
    norm = []
    for p in phrases:
        p = " ".join(str(p).lower().split())
        if p:
            norm.append(p)
    if not norm:
        raise ValueError("blocklist is empty")
    # longest-first so an entry that prefixes another ("bad", "bad
    # actor") counts the specific phrase where both could start
    norm.sort(key=len, reverse=True)

    def anchored(p: str) -> str:
        # \b only exists next to a word character (RE2 \w is ASCII
        # [0-9A-Za-z_]); anchoring a phrase that starts/ends with
        # punctuation ("$9.99") on \b would make it unmatchable —
        # anchor each edge only when that edge is a word char
        wset = "0123456789_abcdefghijklmnopqrstuvwxyz"
        pre = r"\b" if p[0] in wset else ""
        suf = r"\b" if p[-1] in wset else ""
        return pre + re.escape(p) + suf

    return "(?:%s)" % "|".join(anchored(p) for p in norm)


def blocklist_verdicts_batch(t: pa.Table, pattern: str,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> pa.Table:
    """(id, n_blocked_terms, keep) per document. Null text → 0, keep
    (nothing to match; an upstream hygiene stage owns null policy)."""
    low = pc.utf8_lower(t[text_col])
    n = pc.fill_null(pc.cast(
        pc.count_substring_regex(low, pattern), pa.int64()), 0)
    return pa.table({
        id_col: t[id_col],
        "n_blocked_terms": n,
        "keep": pc.equal(n, 0),
    })


def blocklist_filter(docs, phrases, text_col: str = "text",
                     id_col: str = "doc_id", annotate: bool = False):
    """Corpus with blocklist-hit pages dropped (default), or the
    verdict table with ``annotate=True``."""
    pattern = compile_blocklist(phrases)
    if annotate:
        return docs.map_batches(
            lambda t: blocklist_verdicts_batch(
                t, pattern, text_col=text_col, id_col=id_col),
            batch_format="pyarrow")

    def keep_batch(t: pa.Table) -> pa.Table:
        v = blocklist_verdicts_batch(t, pattern, text_col=text_col,
                                     id_col=id_col)
        return t.filter(v["keep"])

    return docs.map_batches(keep_batch, batch_format="pyarrow")
