"""Per-LINE language segmentation (CCNet-style, Wenzek et al. 2020:
language identification at sub-document granularity so mixed-language
pages can be split or cleaned rather than dropped whole).

Reuses the package's pinned marker-word heuristic and tokenizer
contract (``textstats.LangId`` — ASCII-whitespace split matching the
DuckDB oracle's RE2 class exactly). Lines are ``text.split("\\n")``
(the ``clean-lines``/``dedup-lines`` line unit); each line gets the
same first-wins-argmax verdict as the doc-level stage ("und" on zero
marker hits), and the per-doc aggregate emits line counts per
language plus the majority language and its line fraction.

Two consumers:

- :func:`lang_segments` → (doc_id, n_lines, n_en, n_de, n_fr, n_es,
  n_und, majority_lang, majority_frac) — ORACLED (the whole
  computation is one SQL mirror: unnest lines → per-line verdict CASE
  → per-doc counts → greatest/CASE majority, tie order en,de,fr,es,
  und on both sides);
- :func:`keep_majority_lines` → the corpus with each doc's text
  rewritten to only its majority-language lines (the CCNet clean
  step; idempotent — a second pass keeps every line).

Scale shape: stateless-after-init actor stage, zero shuffle; the
whole per-batch path is vectorized two-level list flattening (doc →
lines → words) with ``pc.is_in`` + ``np.bincount`` per language —
no Python loop over lines or words.

NULL text is treated as "" (one empty line, verdict und) on BOTH
engines (``coalesce(text, '')`` in the mirror), so every input row
gets an output row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdfextract_ray.stages.textstats import _LANG_MARKERS

_ORDER = list(_LANG_MARKERS) + ["und"]   # en, de, fr, es, und


class LangLines:
    """Actor stage: per-line verdict counts per document."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.langs = list(_LANG_MARKERS)
        self.marker_sets = {k: pa.array(sorted(v), pa.string())
                            for k, v in _LANG_MARKERS.items()}

    def line_verdicts(self, batch: pa.Table):
        """(line_parent_doc_index, per-line verdict index into _ORDER,
        n_docs) — the shared kernel for both the aggregate and the
        rewrite stages."""
        import pyarrow.compute as pc

        n = batch.num_rows
        texts = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        lines = pc.split_pattern(texts, "\n")
        flat_lines = pc.list_flatten(lines)
        line_doc = pc.list_parent_indices(lines) \
            .to_numpy(zero_copy_only=False)
        n_l = len(flat_lines)

        words = pc.ascii_split_whitespace(pc.utf8_lower(flat_lines))
        flat_w = pc.list_flatten(words)
        w_line = pc.list_parent_indices(words)
        nonempty = pc.not_equal(flat_w, "")
        flat_w = flat_w.filter(nonempty)
        w_par = w_line.filter(nonempty).to_numpy(zero_copy_only=False)

        hits = np.zeros((len(self.langs), n_l), dtype=np.int64)
        for i, lang in enumerate(self.langs):
            m = pc.is_in(flat_w, value_set=self.marker_sets[lang]) \
                .to_numpy(zero_copy_only=False)
            if m.any():
                hits[i] = np.bincount(w_par[m], minlength=n_l)
        best_idx = hits.argmax(axis=0)       # first index wins ties
        best = hits[best_idx, np.arange(n_l)]
        # zero marker hits -> und (index len(langs))
        verdict = np.where(best > 0, best_idx, len(self.langs))
        return line_doc, verdict, n, flat_lines

    def __call__(self, batch: pa.Table) -> pa.Table:
        line_doc, verdict, n, _ = self.line_verdicts(batch)
        n_lines = np.bincount(line_doc, minlength=n).astype(np.int64)
        counts = np.zeros((len(_ORDER), n), dtype=np.int64)
        for i in range(len(_ORDER)):
            m = verdict == i
            if m.any():
                counts[i] = np.bincount(line_doc[m], minlength=n)
        maj_idx = counts.argmax(axis=0)      # tie order en,de,fr,es,und
        maj = counts[maj_idx, np.arange(n)]
        cols = {self.id_col: batch[self.id_col],
                "n_lines": pa.array(n_lines, pa.int64())}
        for i, lang in enumerate(_ORDER):
            cols["n_%s" % lang] = pa.array(counts[i], pa.int64())
        cols["majority_lang"] = pa.array(
            [_ORDER[i] for i in maj_idx], pa.string())
        # Python round: correctly-rounded decimal, same as the oracle
        # (halfway cases cannot occur: denominator n_lines << 2^52)
        cols["majority_frac"] = pa.array(
            [round(int(m) / int(t), 6) if t else 0.0
             for m, t in zip(maj, n_lines)], pa.float64())
        return pa.table(cols)


class KeepMajorityLines:
    """Rewrite stage: keep only each doc's majority-language lines
    (all other columns ride through). Idempotent: the surviving text
    is single-language, so a second pass keeps every line."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.inner = LangLines(id_col=id_col, text_col=text_col)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        line_doc, verdict, n, flat_lines = \
            self.inner.line_verdicts(batch)
        counts = np.zeros((len(_ORDER), n), dtype=np.int64)
        for i in range(len(_ORDER)):
            m = verdict == i
            if m.any():
                counts[i] = np.bincount(line_doc[m], minlength=n)
        maj_idx = counts.argmax(axis=0)
        keep = verdict == maj_idx[line_doc]
        lines_py = flat_lines.to_pylist()
        texts = [[] for _ in range(n)]
        for li, (d, k) in enumerate(zip(line_doc.tolist(),
                                        keep.tolist())):
            if k:
                texts[d].append(lines_py[li])
        new_text = pa.array(["\n".join(t) for t in texts], pa.string())
        idx = batch.schema.get_field_index(self.text_col)
        return batch.set_column(idx, self.text_col, new_text)


def lang_segments(docs, id_col: str = "doc_id", text_col: str = "text",
                  concurrency=(1, 8)):
    """Per-doc per-line language counts + majority (oracled query)."""
    return docs.select_columns([id_col, text_col]).map_batches(
        LangLines, fn_constructor_kwargs={"id_col": id_col,
                                          "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)


def keep_majority_lines(docs, id_col: str = "doc_id",
                        text_col: str = "text", concurrency=(1, 8)):
    """Corpus with minority-language lines removed per document."""
    return docs.map_batches(
        KeepMajorityLines, fn_constructor_kwargs={"id_col": id_col,
                                                  "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
