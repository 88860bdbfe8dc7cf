"""Incremental NEAR-duplicate detection against a corpus snapshot.

The near-dup complement of :mod:`bloom`'s exact incremental dedup:
given a NEW delivery and an EXISTING corpus (or — the cheap path — a
previously written ``(doc_id, sig)`` MinHash-signature snapshot), flag
every new document whose estimated Jaccard similarity to SOME old
document clears a threshold. Web-corpus refreshes need this because a
recrawl rarely byte-matches (timestamps, ads, minor edits), so the
Bloom pass alone under-removes; a full old∪new self-join would
re-pay the old corpus's pairwise work on every delivery.

Incremental semantics, pinned by tests: ONLY new-vs-old similarity is
flagged here. New-vs-new near-dup (and old-vs-old, which a previous
run already resolved) is deliberately out of scope — run the standard
``dedup_minhash`` clustering within the delivery for that.

Scale shape: both sides band with the SAME LSH parameters as
``stages.dedup`` (16 bands x 4 rows over 64 perms), so the shuffle
moves (shard, band ints, id, 512 B sig) — never text; buckets group
under the cluster-derived shard mask; per-bucket work compares each
new signature only against that bucket's old signatures (bounded by
``max_bucket`` per side, the same boilerplate-mega-bucket cap the
batch dedup uses); and the old side can be a REUSED snapshot so a
10^12-doc corpus is never re-shingled for a 10^8-doc delivery.
Snapshots compose across runs: ``--write-new-sigs`` writes the
DELIVERY's own ``(doc_id, sig)`` snapshot (:func:`signatures`) into a
subdirectory of the snapshot dir, so the next delivery dedups against
old+new without re-shingling either. (``--write-sigs`` is the
bootstrap flag: it converts a raw-document ``--against`` corpus into
its signature snapshot on the first run.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages.dedup import (NUM_PERM, _mask,
                                         bands_from_sig_batch,
                                         minhash_bands_batch,
                                         minhash_signature)

SIG_BYTES = NUM_PERM * 8


def signatures(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, sig) — the 512 B MinHash signature per document, the
    reusable snapshot a later delivery bands against without touching
    this corpus's text again."""
    def batch(t: pa.Table) -> pa.Table:
        sigs = [minhash_signature(s or "").astype("<u8").tobytes()
                for s in t[text_col].to_pylist()]
        return pa.table({"doc_id": t[id_col],
                         "sig": pa.array(sigs, pa.binary())})
    return docs.map_batches(batch, batch_format="pyarrow")


def _matches_shard(df: pd.DataFrame, threshold: float,
                   max_bucket: int) -> pd.DataFrame:
    """One shard-group: for each (band_id, band_hash) bucket holding
    BOTH sides, estimate Jaccard (signature agreement) for every
    new x old pair and emit those >= threshold."""
    empty = pd.DataFrame({"new_id": pd.Series(dtype="int64"),
                          "old_id": pd.Series(dtype="int64"),
                          "est_jaccard": pd.Series(dtype="float64")})
    if len(df) == 0:
        return empty
    out = []
    for _, bucket in df.groupby(["band_id", "band_hash"], sort=False):
        new = bucket[bucket["side"] == 1]
        old = bucket[bucket["side"] == 0]
        if len(new) == 0 or len(old) == 0:
            continue
        # deterministic truncation of boilerplate mega-buckets; a
        # capped OLD side can miss a match (documented recall trade,
        # same cap as batch dedup), a capped NEW side just defers
        # those rows to the buckets their other 15 bands land in
        new = new.sort_values("doc_id").head(max_bucket)
        old = old.sort_values("doc_id").head(max_bucket)
        ns = np.stack([np.frombuffer(s, dtype="<u8")
                       for s in new["sig"]])
        os_ = np.stack([np.frombuffer(s, dtype="<u8")
                        for s in old["sig"]])
        est = (ns[:, None, :] == os_[None, :, :]).mean(axis=2)
        ni, oi = np.nonzero(est >= threshold)
        if len(ni):
            out.append(pd.DataFrame({
                "new_id": new["doc_id"].to_numpy()[ni],
                "old_id": old["doc_id"].to_numpy()[oi],
                "est_jaccard": np.round(est[ni, oi], 6)}))
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def neardup_matches(new_docs=None, old_docs=None, old_sigs=None,
                    threshold: float = 0.5, max_bucket: int = 50,
                    id_col: str = "doc_id", text_col: str = "text",
                    shard_mask: int | None = None, new_sigs=None):
    """(new_id, old_id, est_jaccard) — the best old match per flagged
    new document (max estimate; ties to the smallest old_id, so the
    output is deterministic). Only new docs with a match appear.
    Either side can arrive as raw documents or as a precomputed
    ``(doc_id, sig)`` snapshot (``new_sigs`` lets the caller shingle
    the delivery ONCE and reuse it for both this match and the
    snapshot it writes for the next delivery)."""
    mask = _mask(shard_mask)

    def side_col(v: int):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(len(t), v, np.int8)))
        return add

    if old_sigs is not None:
        old_bands = old_sigs.map_batches(
            lambda t: bands_from_sig_batch(t, shard_mask=mask),
            batch_format="pyarrow")
    elif old_docs is not None:
        old_bands = old_docs.map_batches(
            lambda t: minhash_bands_batch(t, id_col=id_col,
                                          text_col=text_col,
                                          shard_mask=mask),
            batch_format="pyarrow")
    else:
        raise ValueError("need old_docs or old_sigs")
    if new_sigs is not None:
        new_bands = new_sigs.map_batches(
            lambda t: bands_from_sig_batch(t, shard_mask=mask),
            batch_format="pyarrow")
    elif new_docs is not None:
        new_bands = new_docs.map_batches(
            lambda t: minhash_bands_batch(t, id_col=id_col,
                                          text_col=text_col,
                                          shard_mask=mask),
            batch_format="pyarrow")
    else:
        raise ValueError("need new_docs or new_sigs")

    both = old_bands.map_batches(side_col(0), batch_format="pyarrow") \
        .union(new_bands.map_batches(side_col(1), batch_format="pyarrow"))

    matches = both.groupby("shard").map_groups(
        lambda df: _matches_shard(df, threshold, max_bucket),
        batch_format="pandas")

    # the same pair surfaces from up to 16 bands; reduce to one row per
    # new doc (max estimate, ties to smallest old_id). Grouped by a
    # hash SHARD of new_id, not per new_id — per-key map_groups would
    # be one Python call per matched doc at web scale; within a shard
    # the dedupe is one vectorized sort + drop_duplicates, and a shard
    # holds every row of its keys so the max is exact.
    def reshard(t: pa.Table) -> pa.Table:
        shard = np.bitwise_and(
            t["new_id"].to_numpy(zero_copy_only=False), mask)
        return t.append_column("gshard", pa.array(shard, pa.int64()))

    def best_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "new_id": pd.Series(dtype="int64"),
                "old_id": pd.Series(dtype="int64"),
                "est_jaccard": pd.Series(dtype="float64")})
        df = df.sort_values(["new_id", "est_jaccard", "old_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.drop_duplicates("new_id", keep="first") \
            .drop(columns=["gshard"])

    return matches.map_batches(reshard, batch_format="pyarrow") \
        .groupby("gshard").map_groups(best_shard, batch_format="pandas")


def neardup_incremental(new_docs=None, old_docs=None, old_sigs=None,
                        threshold: float = 0.5, max_bucket: int = 50,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_broadcast: int = 2_000_000,
                        shard_mask: int | None = None, new_sigs=None):
    """Per-new-document verdicts: (doc_id, near_dup_of_old,
    matched_old_id, est_jaccard, keep) with keep = NOT near_dup_of_old.
    Every delivery row gets a verdict row. The match set (bounded by
    the delivery's near-dup rate) broadcasts back onto the delivery as
    a dict lookup when it fits ``max_broadcast``; beyond that it joins
    distributed (left_outer on doc_id)."""
    import ray

    matches = neardup_matches(
        new_docs=new_docs, old_docs=old_docs, old_sigs=old_sigs,
        threshold=threshold, max_bucket=max_bucket, id_col=id_col,
        text_col=text_col, shard_mask=shard_mask,
        new_sigs=new_sigs).materialize()
    n = matches.count()
    # the verdict annotate only needs the delivery's id list — a sig
    # snapshot carries it, so raw delivery text is never re-read
    if new_docs is None:
        new_docs, id_col = new_sigs, "doc_id"

    if n <= max_broadcast:
        m = matches.to_pandas()
        # Ray 2.49: to_pandas on an all-empty dataset drops the columns
        table = (dict(zip(m["new_id"],
                          zip(m["old_id"], m["est_jaccard"])))
                 if "new_id" in m.columns else {})
        ref = ray.put(table)

        def flag_batch(t: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            ids = t[id_col].to_pylist()
            hit = [lut.get(i) for i in ids]
            is_dup = np.array([h is not None for h in hit], bool)
            return pa.table({
                "doc_id": t[id_col],
                "near_dup_of_old": pa.array(is_dup, pa.bool_()),
                "matched_old_id": pa.array(
                    [h[0] if h else None for h in hit], pa.int64()),
                "est_jaccard": pa.array(
                    [h[1] if h else None for h in hit], pa.float64()),
                "keep": pa.array(~is_dup, pa.bool_()),
            })

        return new_docs.select_columns([id_col]) \
            .map_batches(flag_batch, batch_format="pyarrow")

    from pdfextract_ray.pipelines.relational import (coalesce_for_join,
                                                     join_partitions)
    ids = new_docs.select_columns([id_col])
    if id_col != "new_id":
        ids = ids.rename_columns({id_col: "new_id"})
    joined = ids.join(coalesce_for_join(matches), join_type="left_outer",
                      on=("new_id",), num_partitions=join_partitions())

    def finish(t: pa.Table) -> pa.Table:
        # blocks from empty right partitions can lack the right-side
        # columns entirely (Ray 2.49 trap); treat as no-match
        names = t.schema.names
        n_rows = len(t)
        if "est_jaccard" in names:
            est = t["est_jaccard"]
            old = t["old_id"]
        else:
            est = pa.array([None] * n_rows, pa.float64())
            old = pa.array([None] * n_rows, pa.int64())
        is_dup = pa.compute.is_valid(est)
        return pa.table({
            "doc_id": t["new_id"],
            "near_dup_of_old": is_dup,
            "matched_old_id": old,
            "est_jaccard": est,
            "keep": pa.compute.invert(is_dup),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
