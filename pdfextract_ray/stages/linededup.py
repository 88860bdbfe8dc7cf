"""Cross-document LINE-level dedup (CCNet-style boilerplate removal).

CCNet (Wenzek et al. 2020) deduplicates web text at PARAGRAPH/LINE
granularity across the whole corpus — the pass that strips nav menus,
cookie banners, and footers, because those repeat verbatim on every
page of a site. This package's window-based ops
(``dedup-paragraphs``/``dedup-spans``) are blind to exactly that
content: a line SHORTER than the 16-word window never forms a window,
and boilerplate lines are almost always short. This operator closes
that hole.

Pinned semantics (tests assert these):

- units are ``text.split("\\n")`` lines; a line's KEY is the line
  lowercased with ASCII whitespace normalized (strip + collapse to
  single spaces) — "  Footer  Text " and "footer text" are the same
  line; whitespace-only lines are STRUCTURE, never keyed, never
  removed;
- a key is a duplicate when it occurs ``>= min_count`` times across
  the corpus (within-doc repeats count); default 2;
- ``keep_first=True`` (default): every occurrence of a duplicate key
  except the global first — ordered by ``(doc_id, lidx)`` — is
  removed (the C4/keep-one convention the sibling removal ops use);
  ``keep_first=False``: ALL occurrences are removed (the Dolma-style
  boilerplate stance: with ``min_count`` high, even the "first"
  cookie banner is junk);
- output is ``(doc_id, clean_text, n_lines, n_removed)`` with kept
  lines byte-identical to the originals (case and inner whitespace
  preserved — only the KEY is normalized), joined with ``"\\n"``.

Hash: 63 bits of an md5 digest per line — the same birthday-collision
budget reasoning that moved ``dedup-spans`` to 64 bits: at 10^11
distinct corpus lines a 32-bit key collides constantly, silently
deleting innocent lines. (NOT two crc32 halves: ``crc32(b + suffix)``
is a deterministic function of ``crc32(b)`` — CRC is a 32-bit running
state — so a crc-pair "64-bit" key still has only 32 bits of entropy;
a review pass caught exactly that construction here.)

Distributed plan (identical shape to ``remove_duplicate_paragraphs``,
whose helpers it reuses): indexed int explode → hash-shard groups
emit only the DROPPED (doc_id, lidx) pairs (complete per shard
because shard = h64 & mask) → per-doc drop-lists → map-side attach
when the duplicate minority is bounded, else ONE left_outer hash
join (the only text shuffle) → per-doc rebuild.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages.dedup import _mask, occurrence_lists_tail
from pdfextract_ray.stages.textstats import ascii_words, text_key_hash63


def line_key_hashes(text: str) -> list:
    """(lidx, h64) for every keyed (non-whitespace) line."""
    out = []
    for i, line in enumerate(text.split("\n")):
        words = ascii_words(line.lower())
        if not words:
            continue
        b = " ".join(words).encode("utf-8")
        out.append((i, text_key_hash63(b)))
    return out


def line_explode_indexed_batch(batch: pa.Table,
                               shard_mask: int | None = None
                               ) -> pa.Table:
    shard_mask = _mask(shard_mask)
    ids_out: list[int] = []
    l_out: list[int] = []
    h_out: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        for lidx, h in line_key_hashes(text or ""):
            ids_out.append(doc_id)
            l_out.append(lidx)
            h_out.append(h)
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "lidx": pa.array(l_out, pa.int64()),
        "h64": pa.array(h_out, pa.int64()),
        "shard": pa.array([h & shard_mask for h in h_out], pa.int64()),
    })


def line_drops_shard(df: pd.DataFrame, min_count: int,
                     keep_first: bool) -> pd.DataFrame:
    """One hash-shard group: occurrences of keys seen >= min_count
    times are drops (all of them, or all but the global (doc_id, lidx)
    first). Complete within the group because shard = h64 & mask.
    Emits only the dropped pairs — the duplicate minority."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "lidx": pd.Series(dtype="int64")})
    d = df.sort_values(["h64", "doc_id", "lidx"], kind="stable")
    counts = d.groupby("h64", sort=False)["h64"].transform("size")
    dup = counts >= min_count
    if keep_first:
        dup &= d["h64"].duplicated(keep="first")
    drops = d.loc[dup, ["doc_id", "lidx"]]
    return drops.astype({"doc_id": "int64", "lidx": "int64"})


def _rebuild_lines_batch(batch: pa.Table) -> pa.Table:
    """Drop each doc's listed line indices; kept lines byte-identical."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    # left_outer blocks from empty right partitions can lack the
    # right-side column entirely (Ray 2.49)
    drops_col = batch["dropped"].to_pylist() \
        if "dropped" in batch.column_names else [None] * len(batch)
    clean = []
    n_lines = []
    n_removed = []
    for text, dropped in zip(texts, drops_col):
        lines = (text or "").split("\n")
        n_lines.append(len(lines))
        if not dropped:
            clean.append(text)
            n_removed.append(0)
            continue
        drop = set(map(int, dropped.split(",")))
        clean.append("\n".join(
            ln for i, ln in enumerate(lines) if i not in drop))
        n_removed.append(len(drop))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "clean_text": pa.array(clean, pa.string()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_removed": pa.array(n_removed, pa.int64()),
    })


def remove_duplicate_lines(docs, min_count: int = 2,
                           keep_first: bool = True,
                           shard_mask: int | None = None):
    """(doc_id, clean_text, n_lines, n_removed) — see module
    docstring for the pinned semantics and the distributed plan."""
    import functools

    if min_count < 2:
        raise ValueError("min_count must be >= 2, got %d" % min_count)
    mask = _mask(shard_mask)
    exploded = docs.map_batches(
        functools.partial(line_explode_indexed_batch, shard_mask=mask),
        batch_format="pyarrow")
    drops = exploded.groupby("shard").map_groups(
        functools.partial(line_drops_shard, min_count=min_count,
                          keep_first=keep_first),
        batch_format="pandas")

    def to_items(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("lidx")
        return pd.DataFrame({"doc_id": d["doc_id"],
                             "item": d["lidx"].astype(str)})

    return occurrence_lists_tail(docs, drops, "dropped",
                                 _rebuild_lines_batch, to_items)
