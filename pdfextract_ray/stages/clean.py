"""Text normalization: the pre-tokenizer hygiene pass of a web
corpus (CCNet normalizes before hashing; C4/Gopher strip control
garbage before filtering):

- Unicode normalization (NFC default; NFKC opt-in — it folds
  compatibility forms like ﬁ → fi, width variants, superscripts,
  which most dedup keys want but faithful rendering does not),
- control-character removal (C0 except \\t/\\n, DEL, C1, plus the
  zero-width troublemakers ZWSP/ZWNJ/ZWJ/BOM and the bidi-isolate
  range U+2066-2069 — common crawl artifacts that split tokens
  invisibly),
- optional whitespace collapse (runs of whitespace → one space;
  off by default because it erases line structure).

Everything per-row but C-backed (``str.translate`` with one
precomputed table, ``unicodedata.normalize``, one compiled regex) —
the same budget class as the md5 the dedup stages already pay.
Deterministic and idempotent (property-tested): cleaning twice equals
cleaning once, so resumed or re-run shards agree.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa

# C0 minus \t(9)\n(10), DEL, C1, zero-widths, BOM, bidi isolates
_STRIP_CODEPOINTS = (
    [c for c in range(0x00, 0x20) if c not in (0x09, 0x0A)]
    + [0x7F] + list(range(0x80, 0xA0))
    + [0x200B, 0x200C, 0x200D, 0xFEFF]
    + list(range(0x2066, 0x206A))
)
_STRIP_TABLE = {c: None for c in _STRIP_CODEPOINTS}
# \r is in C0: CRLF becomes bare LF via the table, no special case
_WS_RUN_RE = re.compile(r"\s+")


def clean_text(text: str, *, form: str = "NFC",
               collapse_whitespace: bool = False) -> str:
    """Normalize one string (see module docstring). Total: None and
    non-string-safe at the batch layer; here ``text`` is a str."""
    s = unicodedata.normalize(form, text or "")
    s = s.translate(_STRIP_TABLE)
    # normalize AGAIN: stripping can join characters into sequences
    # whose NFC differs (e.g. "e" + ZWSP + combining acute → after the
    # strip, "e" + acute, which NFC composes to é) — without this the
    # function is not idempotent (hypothesis-found in development)
    s = unicodedata.normalize(form, s)
    if collapse_whitespace:
        s = _WS_RUN_RE.sub(" ", s).strip()
    return s


def clean_batch(t: pa.Table, text_col: str = "text", form: str = "NFC",
                collapse_whitespace: bool = False) -> pa.Table:
    """Replace ``text_col`` with its cleaned form and append
    ``n_removed_chars`` (a cheap signal column: heavily-stripped docs
    are binary junk a quality filter wants to see)."""
    texts = t[text_col].to_pylist()
    cleaned = [clean_text(x, form=form,
                          collapse_whitespace=collapse_whitespace)
               if x is not None else None for x in texts]
    removed = [len(x or "") - len(c or "")
               for x, c in zip(texts, cleaned)]
    i = t.schema.get_field_index(text_col)
    out = t.set_column(i, text_col, pa.array(cleaned, pa.string()))
    return out.append_column("n_removed_chars",
                             pa.array(removed, pa.int64()))


def clean_documents(docs, text_col: str = "text", form: str = "NFC",
                    collapse_whitespace: bool = False):
    """Dataset version: stateless map_batches, no shuffle."""
    import functools

    return docs.map_batches(
        functools.partial(clean_batch, text_col=text_col, form=form,
                          collapse_whitespace=collapse_whitespace),
        batch_format="pyarrow")
