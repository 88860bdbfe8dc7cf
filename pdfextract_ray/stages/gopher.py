"""Gopher quality-filter rules (Rae et al. 2021, public methodology).

The composite page-quality gate most modern curation stacks run
(FineWeb, Dolma, RefinedWeb all carry a variant): a document passes
only if ALL of the following hold —

1. ``50 <= word count <= 100_000``
2. ``3 <= mean word length <= 10``
3. symbol-to-word ratio (``#`` and ellipsis) ``<= 0.1``
4. fraction of lines starting with a bullet ``< 0.9``
5. fraction of lines ending with an ellipsis ``< 0.3``
6. fraction of words containing an alphabetic character ``>= 0.8``
7. at least 2 distinct words from a small English stop list
   (``the be to of and that have with``) appear

The paper's REPETITION rules (duplicate line/paragraph fractions,
top-n-gram mass) are the separate :func:`textstats.repetition_batch`
/ ``doc_repetition`` operator — compose both for the full Gopher
gate.

Pinned semantics (tests assert these):

- words are :func:`textstats.ascii_words` on the lowercased text —
  the package-wide tokenizer contract;
- mean word length is over those words' character lengths;
- symbol counts are occurrences of ``#`` and of an ellipsis (``…`` or
  the three-dot run ``...``, non-overlapping), each counted via its
  own RE2 scan and thresholded SEPARATELY per Rae et al. 2021 — a
  page is dropped when EITHER symbol-to-word ratio exceeds 0.1;
- lines are ``text.split("\\n")``; bullets are the common glyph set
  ``- * • ‣ ◦ ⁃ ∙``; an ellipsis ending is
  ``...`` or ``…`` after ``rstrip()``;
- empty documents fail (rule 1), null text fails all rules.

Scale shape: stateless per-batch map, no shuffle. Rule 3's symbol
scan is an Arrow RE2 kernel; the word/line statistics are the same
inherent per-document loops every text-stat stage pays, fused into
one pass over the words.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pdfextract_ray.stages.textstats import ascii_words

STOPWORDS = frozenset(
    {"the", "be", "to", "of", "and", "that", "have", "with"})
BULLETS = ("-", "*", "•", "‣", "◦", "⁃", "∙")
# Rae et al. 2021 apply the 0.1 symbol-to-word threshold PER symbol
# type ("either the hash symbol or the ellipsis"), so the two counts
# are scanned and thresholded separately — a page at 0.06 + 0.06 is
# kept (a combined-ratio test would wrongly drop it).
_HASH_RE = r"#"
_ELLIPSIS_RE = r"…|\.\.\."

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MIN_ALPHA_FRAC = 0.8
MIN_STOPWORDS = 2

_RULES = ("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
          "bullet_frac_ok", "ellipsis_frac_ok", "alpha_frac_ok",
          "stopwords_ok")


def gopher_rules_batch(t: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document rule verdicts + the combined ``keep``. One boolean
    column per rule so corpus reports can show WHICH gate rejects —
    the number curation runs actually debug with."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    valid = np.zeros(n, bool)
    n_words = np.zeros(n, np.int64)
    mean_len = np.zeros(n, np.float64)
    alpha_frac = np.zeros(n, np.float64)
    n_stop = np.zeros(n, np.int64)
    bullet_frac = np.zeros(n, np.float64)
    ellipsis_frac = np.zeros(n, np.float64)
    for i, s in enumerate(texts):
        if s is None:
            continue
        valid[i] = True
        words = ascii_words(s.lower())
        n_words[i] = len(words)
        if words:
            mean_len[i] = sum(len(w) for w in words) / len(words)
            alpha_frac[i] = sum(
                1 for w in words if any(c.isalpha() for c in w)
            ) / len(words)
            n_stop[i] = len(STOPWORDS.intersection(words))
        lines = s.split("\n")
        nb = ne = 0
        for line in lines:
            ls = line.lstrip()
            if ls.startswith(BULLETS):
                nb += 1
            rs = line.rstrip()
            if rs.endswith("...") or rs.endswith("…"):
                ne += 1
        bullet_frac[i] = nb / len(lines)
        ellipsis_frac[i] = ne / len(lines)

    n_hash = pc.fill_null(pc.cast(
        pc.count_substring_regex(t[text_col], _HASH_RE),
        pa.int64()), 0).to_numpy(zero_copy_only=False)
    n_ellipsis = pc.fill_null(pc.cast(
        pc.count_substring_regex(t[text_col], _ELLIPSIS_RE),
        pa.int64()), 0).to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        hash_ratio = np.where(n_words > 0, n_hash / n_words, np.inf)
        ellipsis_ratio = np.where(n_words > 0, n_ellipsis / n_words,
                                  np.inf)

    rules = {
        "word_count_ok": valid & (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS),
        "mean_word_len_ok": valid & (mean_len >= MIN_MEAN_LEN)
        & (mean_len <= MAX_MEAN_LEN),
        "symbol_ratio_ok": valid & (hash_ratio <= MAX_SYMBOL_RATIO)
        & (ellipsis_ratio <= MAX_SYMBOL_RATIO),
        "bullet_frac_ok": valid & (bullet_frac < MAX_BULLET_FRAC),
        "ellipsis_frac_ok": valid & (ellipsis_frac < MAX_ELLIPSIS_FRAC),
        "alpha_frac_ok": valid & (alpha_frac >= MIN_ALPHA_FRAC),
        "stopwords_ok": valid & (n_stop >= MIN_STOPWORDS),
    }
    keep = np.ones(n, bool)
    cols = {id_col: t[id_col]}
    for name in _RULES:
        keep &= rules[name]
        cols[name] = pa.array(rules[name], pa.bool_())
    cols["keep"] = pa.array(keep, pa.bool_())
    return pa.table(cols)


def gopher_filter(docs, text_col: str = "text", id_col: str = "doc_id",
                  annotate: bool = False):
    """Corpus filtered to Gopher-passing rows (default), or — with
    ``annotate=True`` — the verdict table (id + one column per rule +
    keep) for reporting, leaving the corpus untouched."""
    if annotate:
        return docs.map_batches(
            lambda t: gopher_rules_batch(t, text_col=text_col,
                                         id_col=id_col),
            batch_format="pyarrow")

    def keep_batch(t: pa.Table) -> pa.Table:
        v = gopher_rules_batch(t, text_col=text_col, id_col=id_col)
        return t.filter(v["keep"])

    return docs.map_batches(keep_batch, batch_format="pyarrow")
