"""PII detection and masking over the document corpus.

Training-data releases scrub personally identifiable information
before distribution: Dolma (Soldaini et al. 2024, public methodology)
masks emails / phone numbers / IP addresses with ``|||...|||``
sentinel tokens; CCNet/C4-style pipelines additionally COUNT the
hits as a per-document quality signal (a page dense in emails and
phone numbers is usually a directory/scraper page, not prose).

Both operations here are fully vectorized: the patterns are written
in the RE2 subset (no backreferences, no lookaround), so the SAME
pattern string drives

- ``pyarrow.compute.count_substring_regex`` (the stats signal),
- ``pyarrow.compute.replace_substring_regex`` (the masking pass), and
- the DuckDB oracle's ``regexp_extract_all`` / ``regexp_replace``
  (DuckDB also embeds RE2) — which is what lets ``doc_quality``'s
  PII columns be HASH-verified against SQL rather than rows-only.

No Python-level row loop anywhere: at 100 TB this stage is a pure
per-batch Arrow kernel chain with no shuffle, no state, and no
driver involvement — the cheapest possible Ray Data stage shape
(TaskPoolMapOperator over scanner blocks).

Pattern scope (documented, deliberately conservative):

- EMAIL: the standard practical form ``local@domain.tld`` (one or
  more dot-separated labels, 2+ alpha TLD). No quoted local parts.
- IPV4: four octets with range-checked values (``999.1.2.3`` does
  NOT match), word-bounded so version strings like ``1.2.3.4.5``
  still match their first four octets only when boundaries allow.
- PHONE: North-American-style forms that carry SEPARATORS
  (``555-867-5309``, ``(212) 555 0198``, optional ``+1``), NOT bare
  10-digit integers — an undelimited digit run is far more often an
  id than a phone number, and a masking pass must not eat ids.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# The single source of truth for the three patterns — queries.py
# interpolates these same strings into the DuckDB oracle SQL.
EMAIL_RE = (
    r"[A-Za-z0-9._%+-]+@"
    r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*"
    r"\.[A-Za-z]{2,}"
)
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
)
# Leading anchoring is per-alternative because RE2 has no lookbehind
# and \b cannot sit before '+'/'(': a '+1 ' or '(' start needs no
# boundary, a bare digit start takes \b — otherwise the pattern would
# match MID-digit-run and mask the tail of separator-formatted ids
# ("serial 12345-678-9012" → "serial 12|||...|||").
PHONE_RE = (
    r"(?:\+1[-. ]|\b1[-. ])?"
    r"(?:\([0-9]{3}\)|\b[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b"
)

# Dolma's public masking convention.
EMAIL_TOKEN = "|||EMAIL_ADDRESS|||"
PHONE_TOKEN = "|||PHONE_NUMBER|||"
IP_TOKEN = "|||IP_ADDRESS|||"

# Masking order is part of the contract: emails first (an email can
# contain digit runs), then IPs (range-checked, so the phone pattern
# can't mis-eat an address), then phones.
_REDACT_CHAIN = ((EMAIL_RE, EMAIL_TOKEN), (IPV4_RE, IP_TOKEN),
                 (PHONE_RE, PHONE_TOKEN))


def pii_stats_batch(t: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_emails, n_phones, n_ips) — non-overlapping match
    counts per document, one Arrow kernel per pattern."""
    text = t[text_col]
    return pa.table({
        id_col: t[id_col],
        "n_emails": pc.cast(
            pc.count_substring_regex(text, EMAIL_RE), pa.int64()),
        "n_phones": pc.cast(
            pc.count_substring_regex(text, PHONE_RE), pa.int64()),
        "n_ips": pc.cast(
            pc.count_substring_regex(text, IPV4_RE), pa.int64()),
    })


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace every PII match in ``text_col`` with its sentinel
    token (email → IP → phone, see ``_REDACT_CHAIN``), preserving all
    other columns. Also appends ``n_redactions`` (int64) so callers
    can audit masking density without re-scanning.

    ``n_redactions`` is the APPLIED-masking count: each later pattern
    counts on text already rewritten by earlier ones, so a span
    matching two patterns (e.g. a digit/dash local part like
    ``555-867-5309@x.com``) is masked and counted ONCE. The
    independent per-pattern counts from :func:`pii_stats_batch` scan
    the RAW text per pattern and can exceed it when matches overlap —
    the two columns answer different questions (masks applied vs
    pattern hits) and are not expected to reconcile."""
    text = t[text_col]
    total = None
    for pattern, token in _REDACT_CHAIN:
        n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        total = n if total is None else pc.add(total, n)
        # count BEFORE each replace: a sentinel token never re-matches
        # a later pattern (no digits/@ in the tokens), but counting
        # first keeps the audit column independent of token content
        text = pc.replace_substring_regex(text, pattern, token)
    idx = t.schema.get_field_index(text_col)
    out = t.set_column(idx, text_col, text)
    return out.append_column("n_redactions", total)


def pii_stats(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document PII counts over a corpus Dataset."""
    return docs.map_batches(
        lambda t: pii_stats_batch(t, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")


def redact_pii(docs, text_col: str = "text"):
    """Corpus with ``text_col`` masked (and ``n_redactions`` added)."""
    return docs.map_batches(
        lambda t: redact_batch(t, text_col=text_col),
        batch_format="pyarrow")
