"""Deterministic corpus shuffle + fixed-shard training export.

The last assembly step before training: scatter the curated corpus
pseudo-randomly across a FIXED number of output shards, reproducibly.
Trainers want (a) every shard to be an unbiased sample of the corpus
(no source/time locality from the input layout), (b) reruns and
resumed runs to produce the same shard membership, and (c) one
directory per shard so a failed export can re-write a single shard.

Design for 10^12 rows: shard assignment is a stateless per-row hash of
``(id, seed)`` — **no all-to-all shuffle at all**. ``write_parquet``
with ``partition_cols=["shard"]`` splits each streaming block into the
per-shard directories as it arrives, so the export is a single
map-and-write pass with backpressure; a ``random_shuffle()``-based
export would move every byte through the object store instead.
Within-shard ORDER is whatever block order the writer saw (Ray file
layout is not deterministic) — the carried ``order_key`` column makes
order reproducible where it matters: a reader sorts its one shard
(1/``shards`` of the corpus, the natural unit that fits a loader) by
``order_key`` to get the canonical permutation; shard CONTENT is
deterministic by construction.

The hash is the splitmix64 finalizer (Steele et al., public domain —
the same mix PCG/SplitMix RNGs use), which is a bijection on uint64:
distinct ids never collide on ``order_key`` for a fixed seed, so the
canonical within-shard order is total.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64; a bijection for any
    fixed seed (add, xorshift, and odd-multiply are each invertible
    mod 2^64)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + (np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
                                   * _SM64_GAMMA + _SM64_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM64_M1
        z = (z ^ (z >> np.uint64(27))) * _SM64_M2
        return z ^ (z >> np.uint64(31))


def assign_shards(ds, shards: int, seed: int = 0, id_col: str = "doc_id"):
    """Append ``shard`` (int32 in [0, shards)) and ``order_key``
    (int64 — the full mixed hash, reinterpreted; order comparisons on
    it are made on the uint64 value via an offset flip) to every row.
    Pure per-row arithmetic: no shuffle, deterministic per (id, seed).
    """
    if shards < 1:
        raise ValueError("shards must be >= 1, got %d" % shards)

    def flag(t: pa.Table) -> pa.Table:
        for c in ("shard", "order_key"):
            if c in t.schema.names:
                # re-sharding a previous export without dropping its
                # assignment columns would silently produce duplicate
                # column names (pyarrow allows them; hive partitioning
                # and pandas readers then mangle or crash)
                raise ValueError(
                    "assign_shards: input already has a %r column — "
                    "drop or rename the previous export's assignment "
                    "columns before re-sharding" % c)
        if len(t) == 0:
            return t.append_column(
                "shard", pa.array([], pa.int32())).append_column(
                "order_key", pa.array([], pa.int64()))
        col = t[id_col]
        if col.null_count:
            raise ValueError(
                "assign_shards: id column %r has %d null(s); shard "
                "assignment needs a total id" % (id_col, col.null_count))
        ids = col.to_numpy(zero_copy_only=False)
        h = mix64(ids.astype(np.int64).view(np.uint64), seed)
        shard = (h % np.uint64(shards)).astype(np.int32)
        # flip the sign bit so int64 ordering == uint64 ordering of h
        # (order_key is a sortable total order, not a hash to re-use)
        order = (h ^ np.uint64(1 << 63)).view(np.int64)
        return t.append_column(
            "shard", pa.array(shard, pa.int32())).append_column(
            "order_key", pa.array(order, pa.int64()))

    return ds.map_batches(flag, batch_format="pyarrow")


def shuffle_export(ds, out: str, shards: int, seed: int = 0,
                   id_col: str = "doc_id") -> None:
    """Export ``ds`` to ``out/shard=K/*.parquet`` for K in [0, shards).
    One streaming pass, no all-to-all (see module docstring). Rerunning
    with the same seed reproduces shard membership exactly, so a failed
    export can be completed per-shard: re-run with the same seed and a
    post-assignment filter on ``shard`` to regenerate only the missing
    directories."""
    assign_shards(ds, shards, seed=seed, id_col=id_col) \
        .write_parquet(out, partition_cols=["shard"])
