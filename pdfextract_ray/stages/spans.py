"""Exact duplicate-SPAN detection/removal over overlapping windows.

``paragraph_dedup`` (stages/dedup.py) hashes NON-overlapping 16-word
windows — the C4 unit, cheap (one row per 16 words) but blind to
duplicated text that straddles a window boundary. This module is the
substring-level complement (the problem Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better", solve
with suffix arrays): a sliding window of ``window`` words at stride 1
hashes EVERY word position, so any duplicated run of ≥ ``window``
words is detected exactly, wherever it starts.

Cost model, honestly: the explode emits one int row per word
(~token count of the corpus) instead of one per 16 words — that is
the price of exactness without a distributed suffix array. ``stride``
is the recall dial: stride s emits 1/s the rows but hashes windows
only at in-doc offsets ≡ 0 (mod s), so a duplicate run of
≥ window + s − 1 words is caught only when the copies are
phase-aligned (start offsets congruent mod s) — for arbitrary-phase
copies detection degrades to ~1/s per run. Exactness requires
stride=1 (the default); any larger stride is a sampled scan. All
shuffles move ints;
document text moves only through the single rebuild join, exactly
like ``remove_duplicate_paragraphs``.

Semantics (brute-force-mirrored in tests/test_spans.py):

- A window occurrence is DUPLICATED when its hash occurs ≥ 2 times
  corpus-wide (within-doc repeats count).
- The global FIRST occurrence of each duplicated hash (min
  (doc_id, widx)) is keep-marked; every other occurrence drop-marked.
- Removal: a word is deleted iff ≥ 1 drop-marked window covers it and
  no keep-marked window does — the canonical first copy survives
  intact, every other copy is cut, and the boundary words a kept and
  a dropped span share stay with the kept copy.

"Duplicated" means hash-equal: the 64-bit window hash budgets ~n²/2^65
birthday collisions — negligible through 10^9 windows, ~30k spurious
window pairs at 10^12 (a 100 TB corpus), each costing ≤ ``window``
wrongly-removed words in one doc. Exact-match verification would need
a text-bearing join per candidate pair (the cost this design avoids);
a pipeline that cannot tolerate that error rate should run the
suffix-array construction instead.
"""

from __future__ import annotations

import functools
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages import dedup as D
from pdfextract_ray.stages.dedup import _mask
from pdfextract_ray.stages.textstats import ascii_words

SPAN_WINDOW = 16

# polynomial base for the 64-bit window hash (odd → invertible mod
# 2^64, good positional mixing); 64 bits matter here: a 32-bit window
# hash birthday-collides in the hundreds at 10^6 windows and in the
# millions at web scale, each collision a FALSE duplicate span —
# unlike paragraph_dedup, whose crc32 is pinned by its SQL oracle,
# this module is free to pick the right width
_POLY_B = np.uint64(1099511628211)


def _window_hash_arrays(text: str, window: int, stride: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(widx, h64) arrays of every ``window``-word sliding window of
    the lowercased ASCII-tokenized text: h = Σ crc32(word_j)·B^(W−1−j)
    (uint64 wraparound), vectorized — one crc32 per WORD, not one
    string join per window. A doc shorter than ``window`` emits its
    whole text as one window (mirrors paragraph_hashes's remainder
    rule so short exact-dup docs are still caught)."""
    words = ascii_words((text or "").lower())
    n = len(words)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    c = np.fromiter((zlib.crc32(w.encode("utf-8")) for w in words),
                    dtype=np.uint64, count=n)
    w = min(window, n)
    # modular pow in Python ints: identical to uint64 wraparound but
    # without numpy's per-worker RuntimeWarning on scalar overflow
    powers = np.array([pow(int(_POLY_B), e, 1 << 64)
                       for e in range(w - 1, -1, -1)], np.uint64)
    if n < window:
        return (np.zeros(1, np.int64),
                np.array([(c * powers).sum()], np.uint64))
    sw = np.lib.stride_tricks.sliding_window_view(c, window)[::stride]
    # chunk the (windows × W) product so a mega-doc's temporary stays
    # ~32 MB instead of windows×W×8 bytes (a 10M-word doc would
    # otherwise materialize 1.3 GB here)
    h = np.empty(len(sw), np.uint64)
    step = 1 << 18
    for s in range(0, len(sw), step):
        h[s:s + step] = (sw[s:s + step] * powers[None, :]) \
            .sum(axis=1, dtype=np.uint64)
    idx = np.arange(0, n - window + 1, stride, dtype=np.int64)
    return idx, h


def span_window_hashes(text: str, window: int = SPAN_WINDOW,
                       stride: int = 1) -> list[tuple[int, int]]:
    """(word_offset, h64) list view of :func:`_window_hash_arrays`
    (the tests' brute-force mirror builds on this)."""
    idx, h = _window_hash_arrays(text, window, stride)
    return list(zip(idx.tolist(), h.tolist()))


def span_explode_batch(batch: pa.Table, window: int = SPAN_WINDOW,
                       stride: int = 1,
                       shard_mask: int | None = None) -> pa.Table:
    """One int row per (doc, window occurrence), sharded by hash so a
    shard group sees EVERY occurrence of its hashes."""
    shard_mask = _mask(shard_mask)
    ids_parts: list[np.ndarray] = []
    w_parts: list[np.ndarray] = []
    h_parts: list[np.ndarray] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        idx, h = _window_hash_arrays(text, window, stride)
        ids_parts.append(np.full(len(idx), doc_id, np.int64))
        w_parts.append(idx)
        h_parts.append(h)
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    ws = np.concatenate(w_parts) if w_parts else np.empty(0, np.int64)
    hs = np.concatenate(h_parts) if h_parts else np.empty(0, np.uint64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "widx": pa.array(ws, pa.int64()),
        "h64": pa.array(hs.view(np.int64), pa.int64()),
        "shard": pa.array(
            (hs & np.uint64(shard_mask)).view(np.int64), pa.int64()),
    })


def dup_occurrences_shard(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-shard group: emit only DUPLICATED occurrences (hash
    count ≥ 2 — complete within the group because shard = h64 & mask),
    each flagged ``keep`` for the global first (min (doc_id, widx)) of
    its hash. Output is the duplicate minority, ints only."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "widx": pd.Series(dtype="int64"),
                             "keep": pd.Series(dtype="int64")})
    d = df.sort_values(["h64", "doc_id", "widx"], kind="stable")
    sizes = d.groupby("h64")["h64"].transform("size")
    d = d.loc[sizes.to_numpy() > 1]
    if len(d) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "widx": pd.Series(dtype="int64"),
                             "keep": pd.Series(dtype="int64")})
    keep = (~d["h64"].duplicated(keep="first")).astype(np.int64)
    return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(),
                         "widx": d["widx"].to_numpy(),
                         "keep": keep.to_numpy()}).astype("int64")


def _merge_intervals(widxs: np.ndarray, window: int,
                     n_words: int | None = None
                     ) -> list[tuple[int, int]]:
    """Union of [w, w+window) intervals, sorted & merged; clipped to
    ``n_words`` when given."""
    spans: list[tuple[int, int]] = []
    for w in np.sort(widxs):
        s, e = int(w), int(w) + window
        if n_words is not None:
            e = min(e, n_words)
        if spans and s <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], e))
        else:
            spans.append((s, e))
    return spans


def span_stats_group(df: pd.DataFrame, window: int = SPAN_WINDOW
                     ) -> pd.DataFrame:
    """Per-doc rollup of its duplicated occurrences: merged span count,
    covered word count (un-clipped upper bound for tail windows), and
    the spans themselves as "s-e;s-e"."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_dup_spans": pd.Series(dtype="int64"),
                             "dup_words": pd.Series(dtype="int64"),
                             "spans": pd.Series(dtype="object")})
    out = []
    for doc_id, g in df.groupby("doc_id", sort=False):
        spans = _merge_intervals(g["widx"].to_numpy(), window)
        out.append((int(doc_id), len(spans),
                    int(sum(e - s for s, e in spans)),
                    ";".join("%d-%d" % se for se in spans)))
    r = pd.DataFrame(out, columns=["doc_id", "n_dup_spans",
                                   "dup_words", "spans"])
    return r.astype({"doc_id": "int64", "n_dup_spans": "int64",
                     "dup_words": "int64"})


def duplicate_span_stats(docs, window: int = SPAN_WINDOW,
                         stride: int = 1,
                         shard_mask: int | None = None):
    """Detection only: (doc_id, n_dup_spans, dup_words, spans) for
    every doc containing at least one duplicated window. Two int-only
    shuffles (hash-shard, then doc-keyed), text never leaves stage 1."""
    mask = _mask(shard_mask)
    exploded = docs.map_batches(
        functools.partial(span_explode_batch, window=window,
                          stride=stride, shard_mask=mask),
        batch_format="pyarrow")
    dups = exploded.groupby("shard") \
        .map_groups(dup_occurrences_shard, batch_format="pandas")
    return dups.groupby("doc_id").map_groups(
        functools.partial(span_stats_group, window=window),
        batch_format="pandas")


def _rebuild_span_batch(batch: pa.Table, window: int) -> pa.Table:
    """Rebuild each joined row's text with drop-covered words removed
    (keep-covered words shield overlaps). Case preservation mirrors
    dedup._rebuild_clean_batch: ASCII-whitespace tokenization is
    case-insensitive, so original-case words align 1:1 with the hashed
    lowercase windows."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    # a left_outer block from an empty right partition can arrive
    # WITHOUT the right-side column at all (Ray 2.49): no occurrences
    occs_col = batch["occs"].to_pylist() \
        if "occs" in batch.column_names else [None] * len(batch)
    out_text: list[str] = []
    n_words_out: list[int] = []
    n_removed: list[int] = []
    for text, occs in zip(texts, occs_col):
        words = ascii_words(text or "")
        lowered = ascii_words((text or "").lower())
        if len(words) != len(lowered):
            words = lowered
        n = len(words)
        if not occs:
            out_text.append(" ".join(words))
            n_words_out.append(n)
            n_removed.append(0)
            continue
        drop_cov = np.zeros(n, bool)
        keep_cov = np.zeros(n, bool)
        for item in occs.split(","):
            widx_s, flag_s = item.split(":")
            widx = int(widx_s)
            end = min(widx + window, n)
            (keep_cov if flag_s == "1" else drop_cov)[widx:end] = True
        remove = drop_cov & ~keep_cov
        kept = [w for w, r in zip(words, remove) if not r]
        out_text.append(" ".join(kept))
        n_words_out.append(n)
        n_removed.append(int(remove.sum()))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "clean_text": pa.array(out_text, pa.string()),
        "n_words": pa.array(n_words_out, pa.int64()),
        "n_removed": pa.array(n_removed, pa.int64()),
    })


def remove_duplicate_spans(docs, window: int = SPAN_WINDOW,
                           stride: int = 1,
                           shard_mask: int | None = None):
    """Removal: returns (doc_id, clean_text, n_words, n_removed) with
    whitespace normalized to single spaces, duplicated spans cut per
    the module-docstring semantics.

    Distributed plan (the remove_duplicate_paragraphs skeleton with
    keep/drop flags instead of drops-only): indexed explode (ints) →
    hash-shard groups emit flagged duplicated occurrences → per-doc
    occurrence lists → shared tier tail
    (:func:`dedup.occurrence_lists_tail`: empty-bypass / map-side
    attach / ONE left-outer join) → per-doc coverage-mask rebuild."""
    mask = _mask(shard_mask)
    exploded = docs.map_batches(
        functools.partial(span_explode_batch, window=window,
                          stride=stride, shard_mask=mask),
        batch_format="pyarrow")
    dups = exploded.groupby("shard") \
        .map_groups(dup_occurrences_shard, batch_format="pandas")

    def to_items(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("widx")
        return pd.DataFrame({
            "doc_id": d["doc_id"],
            "item": d["widx"].astype(str) + ":" + d["keep"].astype(str)})

    rebuild = functools.partial(_rebuild_span_batch, window=window)
    return D.occurrence_lists_tail(docs, dups, "occs", rebuild,
                                   to_items)
