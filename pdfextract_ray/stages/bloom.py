"""Incremental exact dedup via a distributed Bloom filter.

The batch-dedup operators (``dedup_exact``, ``remove_duplicate_
paragraphs``) re-shuffle the WHOLE corpus every run. On a curated
100 TB corpus that receives periodic shard deliveries, the incremental
question is cheaper: "which of these NEW documents already exist?" —
and it never needs the old corpus's hashes co-located with the new
ones.

Plan (one streaming pass over each side, no all-to-all):

1. **Hash pass** over the existing corpus: md5 of the raw text per doc
   (the same hash ``dedup_exact`` groups on), 64-bit prefix as the
   probe key. In production this pass is run once and its output kept
   as a snapshot artifact (the CLI writes/reuses one); re-hashing
   100 TB per delivery would defeat the point.
2. **Bloom build**: ``Dataset.aggregate`` with a bitmap accumulator —
   each block ORs its hashes' k probe bits into a per-block bitmap,
   merge is ``bitwise_or`` (associative/commutative, so Ray's tree
   combine applies), no hash ever leaves its block. Bits are sized
   from the corpus count (power of two, ≥1 KiB) for the requested
   false-positive rate.
3. **Broadcast + scan**: the bitmap goes to the object store once
   (``ray.put``); an actor-pool stage probes every NEW doc
   (vectorized k-probe double hashing). Bloom answers are one-sided:
   a negative is DEFINITELY new (no false negatives), a positive is a
   candidate duplicate at the configured FP rate.
4. **Exact verify** (optional): positives are a minority (true dups +
   eps), so their md5s fit a broadcast set; ONE filtered pass over the
   old hash snapshot (``pc.is_in`` against that set — a semi-join with
   a broadcast small side, not a shuffle join) resolves each candidate
   exactly. Both driver-side sets are bounded by the NEW delivery's
   size, never the corpus.

Scale note: a 10^9-doc corpus at 1 % FP needs ~1.2 GB of bits — one
object-store copy per node (workers map it zero-copy), which is why
the bitmap is broadcast instead of re-shipped per task. Beyond that,
shard the filter by hash prefix and probe only the slice a batch
needs; the sizing helper caps ``m_bits`` at 2^33 and the docstring of
:func:`bloom_params` records the cap's reasoning.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M_BITS_CAP = 1 << 33  # 1 GiB of bits; past this, shard by hash prefix


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for ``n_items`` at ``fp_rate``: the standard
    m = -n·ln p / ln²2 rounded UP to a power of two (so probe
    positions reduce with a mask, not a modulo), k = m/n·ln 2 clamped
    to [1, 16]. Rounding m up only lowers the real FP rate. m is
    floored at 8192 bits (1 KiB) and capped at 2^33 — a single
    broadcast object must stay node-RAM-sized; a corpus needing more
    should shard the filter by hash prefix instead of growing m."""
    n_items = max(1, n_items)
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1): %r" % fp_rate)
    m = -n_items * math.log(fp_rate) / (math.log(2) ** 2)
    m_bits = 8192
    while m_bits < m and m_bits < _M_BITS_CAP:
        m_bits <<= 1
    k = max(1, min(16, round(m_bits / n_items * math.log(2))))
    return m_bits, k


def md5_hex(text: str) -> str:
    """The exact-dedup content hash (raw text md5 — mirrors
    ``q_dedup_exact`` / DuckDB ``md5(text)``)."""
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def hash_docs(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, md5, h64) per document. ``h64`` is the first 8 md5
    bytes as an int64 bit-view — the Bloom probe key; exactness always
    comes from the full md5, never from h64 alone."""
    def batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        digests = [hashlib.md5((x or "").encode("utf-8")).digest()
                   for x in texts]
        h64 = np.frombuffer(b"".join(d[:8] for d in digests),
                            dtype=">u8").astype(np.uint64) \
            if digests else np.empty(0, np.uint64)
        return pa.table({
            "doc_id": t[id_col].cast(pa.int64()),
            "md5": pa.array([d.hex() for d in digests], pa.string()),
            "h64": pa.array(h64.view(np.int64), pa.int64()),
        })
    return docs.map_batches(batch, batch_format="pyarrow")


def probe_positions(h64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = h1 + i·h2
    (mod m). h2 is forced odd so, with m a power of two, the k probes
    of one key never collapse onto one position."""
    h = h64.astype(np.uint64)
    h1 = h
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) & np.uint64(m_bits - 1)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    idx = (pos >> np.uint64(3)).astype(np.int64).ravel()
    masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).ravel()
    # repeated byte indices within one batch must all land — plain
    # fancy-index |= writes each duplicate index once
    np.bitwise_or.at(bitmap, idx, masks)


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    idx = (pos >> np.uint64(3)).astype(np.int64)
    masks = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    return ((bitmap[idx] & masks) != 0).all(axis=1)


def bloom_aggregate(m_bits: int, k: int):
    """Ray Data ``AggregateFn`` building the bitmap: per-block
    accumulate sets the block's probe bits locally; merge is a
    ``bitwise_or`` tree. The only data movement is the m/8-byte
    partials — hashes never leave their block."""
    from ray.data.aggregate import AggregateFn

    def acc_block(acc: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            h = block["h64"].to_numpy(zero_copy_only=False)
        else:  # pandas
            h = block["h64"].to_numpy()
        if len(h):
            _set_bits(acc, probe_positions(
                h.astype(np.int64).view(np.uint64), m_bits, k))
        return acc

    return AggregateFn(
        init=lambda _: np.zeros(m_bits // 8, dtype=np.uint8),
        accumulate_block=acc_block,
        merge=lambda a, b: np.bitwise_or(a, b),
        name="bloom")


def build_bloom(hashes_ds, n_items: int | None = None,
                fp_rate: float = 0.01) -> tuple[np.ndarray, int, int]:
    """(bitmap, m_bits, k) over a (…, h64) Dataset. ``n_items``
    defaults to ``hashes_ds.count()`` — for parquet inputs that's file
    metadata, not a scan."""
    if n_items is None:
        n_items = hashes_ds.count()
    m_bits, k = bloom_params(n_items, fp_rate)
    out = hashes_ds.aggregate(bloom_aggregate(m_bits, k))
    bitmap = out["bloom"] if isinstance(out, dict) else out
    if bitmap is None:  # empty old corpus: aggregate yields nothing
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    return np.asarray(bitmap, dtype=np.uint8), m_bits, k


class BloomScan:
    """Actor-pool stage: probe each NEW doc against the broadcast
    bitmap. Bitmap fetched once per actor (zero-copy plasma read), the
    per-batch work is md5 (C speed) + one vectorized probe-matrix
    test. Emits (doc_id, md5, h64, bloom_positive)."""

    def __init__(self, bitmap_ref, m_bits: int, k: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray
        self.bitmap = ray.get(bitmap_ref)
        self.m_bits, self.k = m_bits, k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        digests = [hashlib.md5((x or "").encode("utf-8")).digest()
                   for x in texts]
        if digests:
            h64 = np.frombuffer(b"".join(d[:8] for d in digests),
                                dtype=">u8").astype(np.uint64)
            hit = _test_bits(self.bitmap,
                             probe_positions(h64, self.m_bits, self.k))
        else:
            h64 = np.empty(0, np.uint64)
            hit = np.empty(0, bool)
        return pa.table({
            "doc_id": t[self.id_col].cast(pa.int64()),
            "md5": pa.array([d.hex() for d in digests], pa.string()),
            "h64": pa.array(h64.view(np.int64), pa.int64()),
            "bloom_positive": pa.array(hit, pa.bool_()),
        })


def dedup_incremental(new_docs, old_docs=None, old_hashes=None,
                      fp_rate: float = 0.01, verify: bool = True,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Incremental exact dedup of a NEW delivery against an EXISTING
    corpus. Returns a Dataset
    (doc_id, md5, bloom_positive, dup_vs_old, first_in_new, keep):

    - ``dup_vs_old``: verified-exact duplicate of an old doc when
      ``verify=True`` (via the broadcast semi-join described in the
      module docstring); equals ``bloom_positive`` (FP-rate-bounded
      over-flag) when ``verify=False``.
    - ``first_in_new``: first occurrence (min doc_id) of its md5
      WITHIN the delivery — new-vs-new exact dedup, a groupby over
      (md5, doc_id) ints/strings only.
    - ``keep = first_in_new AND NOT dup_vs_old``.

    Pass ``old_hashes`` (a (…, md5, h64) Dataset, e.g. a parquet
    snapshot written by a previous run) to skip re-hashing the old
    corpus; otherwise ``old_docs`` is hashed on the fly.
    """
    import ray
    from ray.data.aggregate import Min

    if old_hashes is None:
        if old_docs is None:
            raise ValueError("need old_docs or old_hashes")
        old_hashes = hash_docs(old_docs, id_col, text_col)
    old_hashes = old_hashes.materialize()  # two consumers: build + verify

    bitmap, m_bits, k = build_bloom(old_hashes, fp_rate=fp_rate)
    bitmap_ref = ray.put(bitmap)
    scanned = new_docs.map_batches(
        BloomScan, fn_constructor_args=(bitmap_ref, m_bits, k,
                                        id_col, text_col),
        batch_format="pyarrow", concurrency=(1, 8),
        batch_size=256).materialize()

    # new-vs-new: min doc_id per md5 within the delivery, broadcast
    # back as a set of (md5 → min id) — bounded by the delivery size
    firsts = scanned.groupby("md5") \
        .aggregate(Min("doc_id", alias_name="first_id")).to_pandas()
    # empty-delivery guard: Ray 2.49's to_pandas drops the columns of
    # an all-empty dataset (same trap as the positives collect below)
    first_of = ray.put(dict(zip(firsts["md5"], firsts["first_id"]))
                       if "md5" in firsts.columns else {})

    if verify:
        def positives_batch(t: pa.Table) -> pa.Table:
            return t.filter(t["bloom_positive"]).select(["md5"])

        pos = scanned.map_batches(positives_batch,
                                  batch_format="pyarrow").to_pandas()
        # Ray 2.49's to_pandas drops the columns of an all-empty
        # dataset (zero positives — a fully-fresh delivery)
        pos_set = set(pos["md5"]) if "md5" in pos.columns \
            else set()  # delivery-bounded
        if pos_set:
            pos_ref = ray.put(pa.array(sorted(pos_set), pa.string()))

            def old_present_batch(t: pa.Table) -> pa.Table:
                keys = ray.get(pos_ref)
                mask = pc.is_in(t["md5"], value_set=keys)
                return t.filter(mask).select(["md5"])

            present = old_hashes.map_batches(
                old_present_batch, batch_format="pyarrow").to_pandas()
            # all-FP deliveries leave every block empty, and Ray 2.49's
            # to_pandas drops the columns of an all-empty dataset
            present_set = set(present["md5"]) \
                if "md5" in present.columns else set()
        else:
            present_set = set()
        present_ref = ray.put(present_set)
    else:
        present_ref = None

    def finish(t: pa.Table) -> pa.Table:
        fo = ray.get(first_of)
        md5s = t["md5"].to_pylist()
        ids = t["doc_id"].to_pylist()
        first_in_new = np.array(
            [fo.get(m, i) == i for m, i in zip(md5s, ids)], bool)
        if present_ref is not None:
            ps = ray.get(present_ref)
            dup_old = np.array([m in ps for m in md5s], bool)
        else:
            dup_old = t["bloom_positive"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "md5": t["md5"],
            "bloom_positive": t["bloom_positive"],
            "dup_vs_old": pa.array(dup_old, pa.bool_()),
            "first_in_new": pa.array(first_in_new, pa.bool_()),
            "keep": pa.array(first_in_new & ~dup_old, pa.bool_()),
        })

    return scanned.map_batches(finish, batch_format="pyarrow")
