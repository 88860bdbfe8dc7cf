"""Deduplication operators: exact, MinHash+LSH, SimHash.

Training-data-pipeline dedup over a text column, Ray-Data-first:

- **Exact**: vectorized content hash per batch → ``groupby(hash)`` →
  keep the min doc_id per group. The only shuffle moves (hash, doc_id)
  pairs, never the text.
- **MinHash + LSH**: per batch, word-shingle each doc → 64 minhashes
  (numpy, one (perms × shingles) min-reduce per doc) → emit
  ``bands`` rows (band_id, band_hash, doc_id, signature) →
  ``groupby(band_id, band_hash)`` → within-bucket pairwise signature
  agreement estimates Jaccard → verified candidate pairs →
  connected components → (doc_id, cluster representative).
  The shuffle key is (band_id, band_hash); hot buckets are bounded by
  ``max_bucket`` (oversized buckets are boilerplate clusters — sampled
  pairwise, logged, never quadratic).
- **SimHash**: 64-bit weighted feature hash; 4×16-bit sub-bands bucket
  candidates (Hamming ≤ 3 guarantee by pigeonhole); verify exact
  Hamming distance within buckets.

Connected components run on the driver over the (small) verified-pair
set at test scale (``connected_components``); the cluster-scale path is
:func:`label_propagation_components` — join-free min-label propagation
with union + groupby(min) rounds, equivalence-tested against union-find.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages.textstats import ascii_words

NUM_PERM = 64
NUM_BANDS = 16           # 16 bands x 4 rows
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
_MERSENNE = (1 << 61) - 1

# fixed, deterministic permutation parameters
_rng = np.random.RandomState(12345)
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def default_shard_mask() -> int:
    """Ray-group count for the band/propagation shuffles, derived from
    cluster size: ~4 groups per CPU (task-balance headroom), power of
    two, clamped to [16, 65536) groups. One 32-CPU node → 128 groups;
    a 256-node × 32-CPU cluster → 32768 groups, keeping every
    shard-group one-map_groups-task-sized. Fewer groups at small scale
    matters too: each Ray group is a task invocation, so a fixed 256
    was pure overhead on a 4-CPU run (measured; see SCALING.md)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    groups = 16
    while groups < cpus * 4 and groups < 65536:
        groups <<= 1
    return groups - 1


def _mask(shard_mask: int | None) -> int:
    return default_shard_mask() if shard_mask is None else shard_mask


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (crc32 of the joined shingle).

    Words split under the pinned ASCII-whitespace tokenizer contract
    (textstats.ascii_words) so the DuckDB oracle mirrors — whose RE2
    split cannot match Python str.split()'s Unicode set — tokenize
    identically on non-ASCII-whitespace text."""
    words = ascii_words(text.lower())
    if len(words) < k:
        base = [" ".join(words)] if words else [""]
    else:
        base = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.array(
        sorted({zlib.crc32(s.encode("utf-8")) for s in base}), dtype=np.uint64
    )


def minhash_signature(text: str) -> np.ndarray:
    h = _shingle_hashes(text)
    # (a*h + b) mod p, min over shingles, per permutation
    vals = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands_batch(batch: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text",
                        shard_mask: int | None = None) -> pa.Table:
    """Emit one row per (doc, band): the LSH explode stage.

    Deliberately per-doc numpy, NOT one batch-wide matrix: signature
    math is a rounding error next to shingling, and this sandbox's VM
    makes FRESH large allocations pathologically slow (~400us/page
    first-touch fault; measured: a 50 MB fresh-alloc numpy add costs
    ~5 s while the same add into prefaulted memory costs 16 ms), so a
    batch-wide (64 x total_shingles) work matrix loses badly unless it
    reuses a preallocated buffer. Per-doc arrays recycle glibc arenas
    and never fault."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    sig_list = [minhash_signature(t or "").astype("<u8").tobytes()
                for t in texts]
    return _band_rows(ids, sig_list, shard_mask)


def bands_from_sig_batch(batch: pa.Table, id_col: str = "doc_id",
                         sig_col: str = "sig",
                         shard_mask: int | None = None) -> pa.Table:
    """LSH explode over PRE-COMPUTED signature bytes (512 B per doc).

    Lets a composed pipeline compute the MinHash signature once in its
    first full-text pass, drop the text, and band later stages from the
    carried signature — no second shuffle or re-read of raw text
    (curate_neardup's exact-dedup shuffle moves sig bytes, never text)."""
    return _band_rows(batch[id_col].to_pylist(), batch[sig_col].to_pylist(),
                      shard_mask)


def _band_rows(ids: list, sig_list: list[bytes],
               shard_mask: int | None) -> pa.Table:
    shard_mask = _mask(shard_mask)
    band_ids: list[int] = []
    band_hashes: list[int] = []
    out_ids: list[int] = []
    sigs: list[bytes] = []
    for doc_id, sig_bytes in zip(ids, sig_list):
        for b in range(NUM_BANDS):
            bh = zlib.crc32(sig_bytes[b * ROWS_PER_BAND * 8:
                                      (b + 1) * ROWS_PER_BAND * 8])
            band_ids.append(b)
            band_hashes.append(bh)
            out_ids.append(doc_id)
            sigs.append(sig_bytes)
    # "shard" groups many (band_id, band_hash) buckets into one Ray group:
    # a groupby over millions of mostly-singleton buckets pays Ray's
    # per-group overhead, so the within-shard bucket grouping runs
    # vectorized in pandas instead. shard_mask sizes the Ray-level
    # group count and defaults to cluster-derived (default_shard_mask:
    # ~4 groups/CPU) so each shard-group stays one-task-sized at any
    # cluster size without paying per-group overhead at small scale.
    shards = [(bh ^ bi) & shard_mask for bi, bh in zip(band_ids, band_hashes)]
    return pa.table({
        "shard": pa.array(shards, pa.int32()),
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.int64()),
        "doc_id": pa.array(out_ids, pa.int64()),
        "sig": pa.array(sigs, pa.binary()),
    })


def shard_pairs_group(df: pd.DataFrame, threshold: float = 0.5,
                      max_bucket: int = 50) -> pd.DataFrame:
    """One shard-group: iterate its real (band_id, band_hash) buckets,
    skipping singletons, and emit verified pairs."""
    out = []
    sizes = df.groupby(["band_id", "band_hash"], sort=False).size()
    multi = sizes[sizes > 1]
    if len(multi) == 0:
        return _EMPTY_PAIRS.copy()
    grouped = df.groupby(["band_id", "band_hash"], sort=False)
    for key in multi.index:
        out.append(bucket_pairs_group(grouped.get_group(key), threshold, max_bucket))
    return pd.concat(out, ignore_index=True)


_EMPTY_PAIRS = pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})


def bucket_pairs_group(df: pd.DataFrame, threshold: float = 0.5,
                       max_bucket: int = 50) -> pd.DataFrame:
    """Within one LSH bucket: pairwise signature-agreement Jaccard
    estimate, emit verified pairs (a < b). Buckets larger than
    ``max_bucket`` are truncated after a deterministic sort (boilerplate
    mega-clusters; a capped pass still links the cluster transitively)."""
    if len(df) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    df = df.sort_values("doc_id").head(max_bucket)
    ids = df["doc_id"].to_numpy()
    sigs = np.stack([np.frombuffer(s, dtype="<u8") for s in df["sig"]])
    n = len(ids)
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    iu, ju = np.triu_indices(n, k=1)
    keep = eq[iu, ju] >= threshold
    return pd.DataFrame({
        "a": ids[iu[keep]], "b": ids[ju[keep]],
        "est_jaccard": np.round(eq[iu, ju][keep], 6),
    })


def connected_components(pairs: "pd.DataFrame") -> dict[int, int]:
    """Union-find over verified pairs (driver-side; the pair set is the
    post-LSH, post-verify residue. At 10^12 scale: iterate min-label
    propagation with groupby instead)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in list(parent)}


def label_propagation_components(pairs_ds, max_iters: int = 8,
                                 shard_mask: int | None = None, hops: int = 1,
                                 num_parts: int | None = None):
    """Distributed connected components over a pair Dataset (a, b):
    iterative min-label propagation — the 10^12-doc alternative to
    driver-side union-find (ray_guide "Aggregation at scale").

    Join-free formulation (Ray 2.49's hash join mishandles empty
    partitions in iterated plans): each round unions the label rows
    with the adjacency rows, groups by a NODE-HASH SHARD (≤256 Ray
    groups — per-node groups would pay Ray's per-group overhead once
    per node per round), and runs the propose/reduce steps as
    vectorized pandas inside each shard: every node's current min
    label is broadcast to its neighbors via one merge, and proposals
    are folded with a groupby-min keyed by the TARGET node's shard.

    Three round-count levers (measured at sf0.1: these cut the wall
    time of ``dedup_minhash`` from ~10 s to the bands+pairs cost plus
    ~2 propagation rounds):

    - **Batch-local star contraction** in ``explode``: each input
      batch's pairs are collapsed with an in-memory union-find and
      re-emitted as node↔root star edges — identical connectivity,
      fewer edges, and the effective diameter drops to the number of
      batches a component spans, not its raw chain length.
    - **Free first hop** in ``init_labels``: a node's adjacency rows
      all live in its own shard, so the initial label is
      min(node, min neighbor) — one hop before the loop starts.
    - **Exact convergence**: every reduce emits a per-node ``changed``
      flag (new label strictly below the node's previous label); the
      loop stops when ``sum(changed) == 0``. This replaces the old
      sum-of-labels checksum, which could in principle alias across a
      2^64 wrap at cluster scale. If ``max_iters`` is exhausted while
      labels are still changing (diameter > max_iters·hops chains), a
      warning is logged — callers treating label==node as "component
      representative" would otherwise silently over-keep.

    Scale knobs: ``num_parts`` (adjacency partition count) defaults to
    cluster CPUs // 4 (min 4) and ``shard_mask`` sizes the Ray-level
    group count, defaulting to cluster-derived (``default_shard_mask``:
    ~4 groups per CPU) so each shard-group stays one-task-sized at any
    cluster size — see SCALING.md.

    Returns a Dataset of (node, label), label = min node id in the
    component.
    """
    import logging
    import numpy as np
    import pandas as pd

    shard_mask = _mask(shard_mask)
    if num_parts is None:
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        num_parts = max(4, cpus // 4)

    def explode(t: pa.Table) -> pa.Table:
        a = pc_cast(t["a"]).to_numpy(zero_copy_only=False)
        b = pc_cast(t["b"]).to_numpy(zero_copy_only=False)
        # batch-local star contraction: union-find over this batch's
        # pairs, then emit node<->root edges only (same connectivity,
        # fewer edges, diameter ~= #batches the component spans)
        comp = connected_components(pd.DataFrame({"a": a, "b": b}))
        nodes = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
        roots = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
        m = nodes != roots
        node = np.concatenate([nodes[m], roots[m]])
        dst = np.concatenate([roots[m], nodes[m]])
        # -1 sentinels, NOT nulls: a nullable int64 column becomes
        # float64 in the map_groups pandas conversion, silently
        # corrupting ids above 2^53 (doc ids here are 63-bit hashes)
        return pa.table({
            "shard": pa.array((node & shard_mask).astype(np.int32), pa.int32()),
            "node": pa.array(node, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "label": pa.array(np.full(len(node), -1, dtype=np.int64)),
            "changed": pa.array(np.zeros(len(node), dtype=np.int64)),
        })

    adjacency = pairs_ds.map_batches(explode, batch_format="pyarrow") \
        .repartition(num_parts).materialize()

    def _pack(node: np.ndarray, label: np.ndarray,
              changed: np.ndarray | None = None) -> pa.Table:
        """Typed state rows (dst all-sentinel) — identical schema to
        the adjacency table so union blocks always unify."""
        node = np.asarray(node, dtype=np.int64)
        if changed is None:
            changed = np.zeros(len(node), dtype=np.int64)
        return pa.table({
            "shard": pa.array((node & shard_mask).astype(np.int32), pa.int32()),
            "node": pa.array(node, pa.int64()),
            "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
            "label": pa.array(np.asarray(label, dtype=np.int64), pa.int64()),
            "changed": pa.array(np.asarray(changed, dtype=np.int64), pa.int64()),
        })

    _EMPTY_STATE = _pack(np.array([], dtype=np.int64),
                         np.array([], dtype=np.int64))

    def init_labels(df: pd.DataFrame) -> pa.Table:
        """label = min(node, min neighbor): the free first hop — all of
        a node's adjacency rows live in its own shard."""
        if not len(df):
            return _EMPTY_STATE
        g = df.groupby("node", as_index=False)["dst"].min()
        lab = np.minimum(g["node"].to_numpy(dtype=np.int64),
                         g["dst"].to_numpy(dtype=np.int64))
        return _pack(g["node"].to_numpy(dtype=np.int64), lab)

    labels = adjacency.groupby("shard") \
        .map_groups(init_labels, batch_format="pandas")

    def propose_shard(df: pd.DataFrame) -> pa.Table:
        """One shard of labels ∪ adjacency → label proposals keyed by
        the target node's shard (all vectorized). The node's own
        current label is re-emitted with changed=1 as a marker so the
        reduce can compute an exact changed flag."""
        if not len(df):
            return _EMPTY_STATE
        lab = df[df["label"] >= 0][["node", "label"]]
        cur = lab.groupby("node", as_index=False)["label"].min()
        adj = df[df["label"] < 0][["node", "dst"]]
        to_nbr = adj.merge(cur, on="node")[["dst", "label"]] \
            .rename(columns={"dst": "node"})
        n_cur, n_nbr = len(cur), len(to_nbr)
        out = pd.concat([cur, to_nbr], ignore_index=True)
        marker = np.concatenate([np.ones(n_cur, dtype=np.int64),
                                 np.zeros(n_nbr, dtype=np.int64)])
        return _pack(out["node"].to_numpy(dtype=np.int64),
                     out["label"].to_numpy(dtype=np.int64), marker)

    def reduce_shard(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _EMPTY_STATE
        newmin = df.groupby("node", as_index=False)["label"].min()
        old = df[df["changed"] == 1][["node", "label"]] \
            .rename(columns={"label": "old"})
        m = newmin.merge(old, on="node", how="left")
        changed = (m["old"].isna().to_numpy()
                   | (m["label"].to_numpy() < m["old"].fillna(0).to_numpy())
                   ).astype(np.int64)
        return _pack(m["node"].to_numpy(dtype=np.int64),
                     m["label"].to_numpy(dtype=np.int64), changed)

    def one_hop(lbls):
        state = lbls.union(adjacency)
        proposals = state.groupby("shard") \
            .map_groups(propose_shard, batch_format="pandas")
        return proposals.groupby("shard") \
            .map_groups(reduce_shard, batch_format="pandas")

    converged = False
    for _ in range(max(1, max_iters // hops)):
        # ``hops`` propagation hops per materialized execution.
        # Measured at sf0.1: hops=1 wins (2.0s vs 3.5s at hops=2) —
        # star-contracted near-dup graphs converge in ~1-2 rounds, so
        # extra chained groupbys cost more than saved convergence checks.
        chained = labels
        for _h in range(hops):
            chained = one_hop(chained)
        labels = chained.materialize()
        if not (labels.sum("changed") or 0):
            converged = True
            break
    if not converged:
        logging.getLogger(__name__).warning(
            "label_propagation_components: max_iters=%d exhausted before "
            "convergence — components wider than %d hops keep >1 "
            "representative", max_iters, max_iters * (hops + 1))
    return labels.map_batches(
        lambda t: pa.table({"node": pc_cast(t["node"]),
                            "label": pc_cast(t["label"])}),
        batch_format="pyarrow")


def pc_cast(arr):
    import pyarrow.compute as pc
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.cast(arr, pa.int64())


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (md5-derived feature bits).
    Words split under the pinned ASCII-whitespace tokenizer contract."""
    words = ascii_words(text.lower())
    if not words:
        return 0
    hs = np.array(
        [struct.unpack("<Q", hashlib.md5(w.encode("utf-8")).digest()[:8])[0]
         for w in words], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)   # (words, 64)
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text",
                  shard_mask: int | None = None) -> pa.Table:
    """Emit (doc_id, simhash, band_id, band_key) rows — 4×16-bit bands;
    two docs within Hamming distance 3 share ≥1 exact band."""
    shard_mask = _mask(shard_mask)
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_ids, hashes, band_ids, band_keys = [], [], [], []
    for doc_id, text in zip(ids, texts):
        h = simhash64(text or "")
        for b in range(4):
            out_ids.append(doc_id)
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 view
            band_ids.append(b)
            band_keys.append((h >> (16 * b)) & 0xFFFF)
    shards = [(bk ^ bi) & shard_mask for bi, bk in zip(band_ids, band_keys)]
    return pa.table({
        "shard": pa.array(shards, pa.int32()),
        "doc_id": pa.array(out_ids, pa.int64()),
        "simhash": pa.array(hashes, pa.int64()),
        "band_id": pa.array(band_ids, pa.int32()),
        "band_key": pa.array(band_keys, pa.int32()),
    })


def simhash_shard_group(df: pd.DataFrame, max_hamming: int = 3
                        ) -> pd.DataFrame:
    """One shard-group of simhash band rows → verified low-Hamming pairs."""
    out = []
    sizes = df.groupby(["band_id", "band_key"], sort=False).size()
    multi = sizes[sizes > 1]
    if len(multi) == 0:
        return _EMPTY_SIM.copy()
    grouped = df.groupby(["band_id", "band_key"], sort=False)
    for key in multi.index:
        out.append(simhash_pairs_group(grouped.get_group(key), max_hamming))
    return pd.concat(out, ignore_index=True)


_EMPTY_SIM = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "hamming": pd.Series(dtype="int64")})

# byte-popcount lookup: vectorizes 64-bit Hamming as 8 table lookups
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_pairs_group(df: pd.DataFrame, max_hamming: int = 3
                        ) -> pd.DataFrame:
    """Verified low-Hamming pairs within one band bucket — EXACT: no
    head() cap (a cap of 50 silently LOST pairs the moment a bucket
    grew past it; caught by the sf0.1 oracle sweep, round 5). Memory
    stays bounded by chunking the pair triangle to ``_PAIR_CHUNK``
    live index pairs; oversized boilerplate buckets are logged (the
    verified pair OUTPUT of a near-identical cluster is inherently
    quadratic — same contract as the All-Pairs join above)."""
    if len(df) < 2:
        return _EMPTY_SIM.copy()
    df = df.drop_duplicates("doc_id").sort_values("doc_id")
    ids = df["doc_id"].to_numpy()
    hs = df["simhash"].to_numpy().astype(np.uint64)
    n = len(ids)
    if n > HOT_TOKEN_LOG_SIZE:
        import logging
        logging.getLogger(__name__).warning(
            "hot simhash band bucket: %d docs (exact chunked verify)", n)
    a_out, b_out, h_out = [], [], []
    counts = np.arange(n - 1, -1, -1)          # row i pairs with i+1..n-1
    csum = np.concatenate(([0], np.cumsum(counts)))
    start = 0
    while start < n:
        stop = int(np.searchsorted(csum, csum[start] + _PAIR_CHUNK,
                                   side="left"))
        stop = min(max(stop, start + 1), n)
        c = counts[start:stop]
        tot = int(c.sum())
        if tot == 0:
            break
        rows = np.arange(start, stop)
        iu = np.repeat(rows, c)
        offs = np.concatenate(([0], np.cumsum(c)))[:-1]
        ju = (np.arange(tot) - np.repeat(offs, c)
              + np.repeat(rows + 1, c))
        x = np.ascontiguousarray(hs[iu] ^ hs[ju])
        ham = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        keep = ham <= max_hamming
        if keep.any():
            a_out.append(ids[iu[keep]])
            b_out.append(ids[ju[keep]])
            h_out.append(ham[keep].astype(np.int64))
        start = stop
    if not a_out:
        return _EMPTY_SIM.copy()
    return pd.DataFrame({"a": np.concatenate(a_out),
                         "b": np.concatenate(b_out),
                         "hamming": np.concatenate(h_out)})


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verify kernel for candidate pairs)."""
    sa = set(map(int, _shingle_hashes(a, k)))
    sb = set(map(int, _shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / float(len(sa | sb))


def shingle_bytes(text: str, k: int = 3) -> bytes:
    """``_shingle_hashes`` packed as uint64 bytes — the precomputed
    form the pair-verify joins ship instead of raw text (each doc is
    shingled ONCE instead of once per candidate pair)."""
    return _shingle_hashes(text, k).tobytes()


def ngram_jaccard_packed(a: bytes, b: bytes) -> float:
    """``ngram_jaccard`` over two :func:`shingle_bytes` payloads.
    Bit-identical: the arrays are the same unique sorted hash sets, so
    |∩| via ``intersect1d`` and |∪| = na + nb − |∩| are the same two
    integers the set version divides."""
    sa = np.frombuffer(a or b"", dtype=np.uint64)
    sb = np.frombuffer(b or b"", dtype=np.uint64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / float(len(sa) + len(sb) - inter)


# ------------------------------------------------------------------
# Exact n-gram-Jaccard set-similarity self-join (All-Pairs / PPJoin
# family: Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity
# Search", WWW'07; Xiao et al., WWW'08). Unlike the MinHash path this
# finds EXACTLY the pairs with shingle-set Jaccard >= t — no estimator
# — by the prefix-filter theorem: order every doc's shingle set by one
# GLOBAL total order (document frequency, rarest first, ties by hash)
# and keep only the first p = n - ceil(t*n) + 1 tokens; two docs with
# J >= t must share at least one prefix token, so grouping by prefix
# token generates a complete candidate set. Frequency ordering (not
# hash ordering) is what keeps boilerplate shingles — the ones shared
# by every page — OUT of prefixes, so token groups stay small.
#
# Dataflow (each step one shuffle, all keys low-cardinality-bounded by
# the shard masks): explode (doc, shingle) inverted index →
# groupby(token-shard) attach global doc-frequency → groupby(doc-shard)
# per-doc prefix selection → groupby(token-shard) within-token pair
# generation with the exact-integer length filter (t_den*min(na,nb) >=
# t_num*max(na,nb), a necessary condition since J <= min/max) →
# dedupe → hash-join both sides against documents → exact
# ngram_jaccard verify. Thresholds are exact integer fractions
# (t = t_num/t_den); ceil(t*n) = (t_num*n + t_den - 1) // t_den, so
# the prefix is never shortened by float rounding.
#
# A corpus heavy in LITERAL duplicates makes the verified pair set
# itself quadratic in each duplicate cluster — inherent to the exact
# problem statement, not to this algorithm; run exact dedup
# (q_dedup_exact) first on such corpora.

def shingle_explode_batch(batch: pa.Table, id_col: str = "doc_id",
                          text_col: str = "text",
                          shard_mask: int | None = None) -> pa.Table:
    """Inverted-index explode: one row per (doc, DISTINCT shingle crc32),
    sharded by token hash for the frequency-attach groupby."""
    shard_mask = _mask(shard_mask)
    ids_out: list[int] = []
    h_out: list[int] = []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        hs = _shingle_hashes(text or "")
        ids_out.extend([doc_id] * len(hs))
        h_out.extend(int(v) for v in hs)
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "h32": pa.array(h_out, pa.int64()),
        "shard": pa.array([h & shard_mask for h in h_out], pa.int64()),
    })


def token_freq_shard(df: pd.DataFrame, shard_mask: int | None = None
                     ) -> pd.DataFrame:
    """One token-shard group: attach each token's GLOBAL document
    frequency (complete within the group — shard = h32 & mask) and the
    next stage's doc-shard key. map_groups may hand us an EMPTY block:
    return a typed empty."""
    shard_mask = _mask(shard_mask)
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "h32": pd.Series(dtype="int64"),
                             "freq": pd.Series(dtype="int64"),
                             "dshard": pd.Series(dtype="int64")})
    out = df[["doc_id", "h32"]].copy()
    out["freq"] = out.groupby("h32")["doc_id"].transform("size").astype("int64")
    out["dshard"] = out["doc_id"].to_numpy() & shard_mask
    return out


def prefix_tokens_shard(df: pd.DataFrame, t_num: int, t_den: int,
                        shard_mask: int | None = None) -> pd.DataFrame:
    """One doc-shard group: per doc, keep the p rarest tokens under the
    global (freq, h32) order, p = n - ceil(t*n) + 1 (exact integer
    ceil). Emits (h32, doc_id, n, pos, tshard) for pair generation —
    ``pos`` is the token's 0-based position in the doc's FULL
    (freq, h32)-sorted token list, the input to the PPJoin positional
    filter in :func:`prefix_pairs_shard`."""
    shard_mask = _mask(shard_mask)
    if len(df) == 0:
        return pd.DataFrame({"h32": pd.Series(dtype="int64"),
                             "doc_id": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64"),
                             "tshard": pd.Series(dtype="int64")})
    # fully vectorized: one (doc_id, freq, h32) sort, per-doc n via
    # transform(size), pos via cumcount, then a single pos < p mask
    s = df.sort_values(["doc_id", "freq", "h32"],
                       kind="mergesort", ignore_index=True)
    grp = s.groupby("doc_id", sort=False)
    n = grp["h32"].transform("size").to_numpy().astype(np.int64)
    pos = grp.cumcount().to_numpy().astype(np.int64)
    p = n - (t_num * n + t_den - 1) // t_den + 1
    keep = pos < p
    out = pd.DataFrame({"h32": s["h32"].to_numpy()[keep],
                        "doc_id": s["doc_id"].to_numpy()[keep],
                        "n": n[keep], "pos": pos[keep]})
    out["tshard"] = out["h32"].to_numpy() & shard_mask
    return out


# A token whose prefix-posting list exceeds this is a "hot token":
# pair generation is still EXACT (length-window + positional filter),
# but the group's size is logged so skewed corpora are observable.
HOT_TOKEN_LOG_SIZE = 4096
# Candidate pairs are materialized in chunks of at most this many index
# pairs at a time, so one hot token can never allocate O(group^2)
# memory in a single shot.
_PAIR_CHUNK = 1 << 20


def _window_pairs(ids: np.ndarray, ns: np.ndarray, pos: np.ndarray,
                  t_num: int, t_den: int,
                  a_out: list[np.ndarray], b_out: list[np.ndarray]) -> None:
    """Candidate pairs within one token's posting list, sorted by
    (n, doc_id) ascending. Each row i pairs only with rows in its
    LENGTH WINDOW [i+1, end_i) where n_j <= floor(n_i * t_den / t_num)
    (the exact-integer length filter, applied via searchsorted instead
    of materializing the full triangle), then the PPJoin positional
    filter prunes by remaining-token upper bound. Pairs are emitted in
    bounded chunks (<= _PAIR_CHUNK index pairs live at once)."""
    m = len(ids)
    # length window per row: partners j > i with t_num*n_j <= t_den*n_i
    hi_bound = (t_den * ns) // t_num
    win_end = np.searchsorted(ns, hi_bound, side="right")
    counts = np.maximum(win_end - np.arange(1, m + 1), 0)
    total = int(counts.sum())
    if total == 0:
        return
    # chunk boundaries over rows so each slab stays <= _PAIR_CHUNK
    csum = np.concatenate(([0], np.cumsum(counts)))
    start = 0
    while start < m:
        stop = int(np.searchsorted(csum, csum[start] + _PAIR_CHUNK,
                                   side="left"))
        stop = min(max(stop, start + 1), m)
        c = counts[start:stop]
        tot = int(c.sum())
        if tot == 0:
            start = stop
            continue
        rows = np.arange(start, stop)
        iu = np.repeat(rows, c)
        offs = np.concatenate(([0], np.cumsum(c)))[:-1]
        ju = (np.arange(tot) - np.repeat(offs, c)
              + np.repeat(rows + 1, c))
        na, nb = ns[iu], ns[ju]
        ia, jb = pos[iu], pos[ju]
        # PPJoin positional filter: at the FIRST token two prefixes
        # share, no common token precedes it in either doc (an earlier
        # common token would sit at strictly smaller positions, hence
        # inside both prefixes, contradicting firstness), so
        # overlap <= ub = 1 + min(n_a-i-1, n_b-j-1). A qualifying pair
        # (|∩| >= alpha = ceil(t*(n_a+n_b)/(1+t))) therefore passes at
        # that occurrence; pruning other occurrences loses nothing.
        ub = 1 + np.minimum(na - ia - 1, nb - jb - 1)
        keep = (t_num + t_den) * ub >= t_num * (na + nb)
        if keep.any():
            a_ids = ids[iu[keep]]
            b_ids = ids[ju[keep]]
            a_out.append(np.minimum(a_ids, b_ids))
            b_out.append(np.maximum(a_ids, b_ids))
        start = stop


def prefix_pairs_shard(df: pd.DataFrame, t_num: int, t_den: int
                       ) -> pd.DataFrame:
    """One token-shard group: within each prefix token, emit candidate
    pairs (a < b) passing the exact-integer length filter AND the
    PPJoin positional filter (Xiao et al., WWW'08) — both necessary
    conditions, so the candidate set stays COMPLETE (property-tested
    against brute force, incl. an adversarial shared-hot-token corpus).

    Scale posture: generation is length-windowed (sort by n +
    searchsorted, never a full np.triu triangle) and chunked to
    ``_PAIR_CHUNK`` live index pairs, so a hot token costs bounded
    memory; groups larger than ``HOT_TOKEN_LOG_SIZE`` are logged. The
    positional filter is what defuses the skew case — a mid-frequency
    boilerplate shingle shared by thousands of otherwise-dissimilar
    docs sorts LATE in each doc's (freq, h32) order, so its
    remaining-token bound is far below alpha and the group emits ~no
    pairs."""
    if len(df) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for h32, g in df.groupby("h32", sort=False):
        if len(g) < 2:
            continue
        if len(g) > HOT_TOKEN_LOG_SIZE:
            import logging
            logging.getLogger(__name__).warning(
                "hot prefix token h32=%s: %d docs (exact length-window "
                "generation, bounded chunks)", h32, len(g))
        g = g.sort_values(["n", "doc_id"], kind="mergesort")
        _window_pairs(g["doc_id"].to_numpy(), g["n"].to_numpy(),
                      g["pos"].to_numpy(), t_num, t_den, a_out, b_out)
    if not a_out:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(a_out).astype(np.int64),
                         "b": np.concatenate(b_out).astype(np.int64)})


# ----------------------------------------------------- decontamination

def eval_shingle_batch(batch: pa.Table, eval_mod: int | None = 37
                       ) -> pa.Table:
    """Pass 1 of the decontamination scan: the DISTINCT word-3-gram
    crc32 shingles of this batch's EVAL rows (doc_id % eval_mod == 0 —
    the deterministic stand-in for a benchmark suite; in production the
    benchmark side is external, bounded input, never corpus-sized —
    pass ``eval_mod=None`` over a standalone eval table to take EVERY
    row — the CLI ``decontaminate --eval`` path; only ``text`` is
    required then (an external benchmark suite has no doc_id)."""
    acc: set[int] = set()
    if eval_mod is None:
        for text in batch["text"].to_pylist():
            acc.update(int(v) for v in _shingle_hashes(text or ""))
    else:
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            if doc_id % eval_mod == 0:
                acc.update(int(v) for v in _shingle_hashes(text or ""))
    return pa.table({"h32": pa.array(sorted(acc), pa.int64())})


class DecontaminateScan:
    """Pass 2: actor-pool membership scan of every NON-eval doc's
    shingle set against the broadcast eval-shingle array (``ray.put``
    once, ``ray.get`` once per actor in ``__init__`` — the same
    bounded-small-side pattern as VocabCoverage). Integer outputs only,
    so the driver's oracle hash has no float-aggregation exposure.
    ``eval_mod=None`` (external eval set) scans every corpus row."""

    def __init__(self, eval_ref, eval_mod: int | None = 37) -> None:
        import ray
        self.eval_sorted = np.asarray(ray.get(eval_ref), dtype=np.int64)
        self.eval_mod = eval_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        n_sh: list[int] = []
        n_hit: list[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            if self.eval_mod is not None and doc_id % self.eval_mod == 0:
                continue
            hs = _shingle_hashes(text or "").astype(np.int64)
            hits = np.isin(hs, self.eval_sorted, assume_unique=True)
            ids_out.append(doc_id)
            n_sh.append(len(hs))
            n_hit.append(int(hits.sum()))
        n_hit_arr = pa.array(n_hit, pa.int64())
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_contaminated": n_hit_arr,
            "is_contaminated": pc.greater(n_hit_arr, 0),
        })


# ------------------------------------------- paragraph-level exact dedup

PARA_WORDS = 16


def paragraph_hashes(text: str, words_per_para: int = PARA_WORDS
                     ) -> list[int]:
    """crc32 of each non-overlapping ``words_per_para``-word window of
    the lowercased ASCII-tokenized text (last window = remainder) — the
    C4-style span-dedup unit, sized in words because the corpus has no
    sentence punctuation. NOT deduplicated per doc: within-doc repeats
    count toward a span's global occurrence count."""
    words = ascii_words((text or "").lower())
    return [zlib.crc32(" ".join(words[i:i + words_per_para]).encode("utf-8"))
            for i in range(0, len(words), words_per_para)]


def paragraph_explode_batch(batch: pa.Table,
                            shard_mask: int | None = None) -> pa.Table:
    """One row per (doc, paragraph-window crc32), sharded by hash so a
    shard group sees EVERY occurrence of its hashes."""
    shard_mask = _mask(shard_mask)
    ids_out: list[int] = []
    h_out: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        hs = paragraph_hashes(text)
        ids_out.extend([doc_id] * len(hs))
        h_out.extend(hs)
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "h32": pa.array(h_out, pa.int64()),
        "shard": pa.array([h & shard_mask for h in h_out], pa.int64()),
    })


def paragraph_flags_shard(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-shard group: attach each occurrence's global duplicate
    verdict (its hash occurs >= 2 times anywhere — complete within the
    group because shard = h32 & mask), pre-aggregated per doc to
    (doc_id, n_paras, n_dup_paras) partials so the final doc-keyed
    groupby moves three ints per (doc, shard)."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_paras": pd.Series(dtype="int64"),
                             "n_dup_paras": pd.Series(dtype="int64")})
    dup = df.groupby("h32")["h32"].transform("size") > 1
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                        "dup": dup.to_numpy().astype(np.int64)})
    agg = out.groupby("doc_id", sort=False).agg(
        n_paras=("dup", "size"), n_dup_paras=("dup", "sum")).reset_index()
    return agg.astype({"doc_id": "int64", "n_paras": "int64",
                       "n_dup_paras": "int64"})


# ----------------------------- paragraph-level removal (C4 clean step)

def paragraph_explode_indexed_batch(batch: pa.Table,
                                    shard_mask: int | None = None
                                    ) -> pa.Table:
    """Like ``paragraph_explode_batch`` but carries each window's
    position (``widx``) so a downstream stage can decide keep/drop per
    OCCURRENCE (the removal variant needs global-first order; the stats
    variant doesn't and saves the extra int column)."""
    shard_mask = _mask(shard_mask)
    ids_out: list[int] = []
    w_out: list[int] = []
    h_out: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        hs = paragraph_hashes(text)
        ids_out.extend([doc_id] * len(hs))
        w_out.extend(range(len(hs)))
        h_out.extend(hs)
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "widx": pa.array(w_out, pa.int64()),
        "h32": pa.array(h_out, pa.int64()),
        "shard": pa.array([h & shard_mask for h in h_out], pa.int64()),
    })


def paragraph_drops_shard(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-shard group: every occurrence that is NOT the global
    first of its hash (first = lexicographic min (doc_id, widx) —
    complete within the group because shard = h32 & mask) is a DROP.
    Emits only the dropped (doc_id, widx) pairs — the duplicate
    minority — so the join back to documents is as small as the
    duplication rate."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "widx": pd.Series(dtype="int64")})
    d = df.sort_values(["h32", "doc_id", "widx"], kind="stable")
    first = ~d["h32"].duplicated(keep="first")
    drops = d.loc[~first, ["doc_id", "widx"]]
    return drops.astype({"doc_id": "int64", "widx": "int64"})


def _rebuild_clean_batch(batch: pa.Table) -> pa.Table:
    """Rebuild each joined row's text from its KEPT windows.

    The window unit hashes the LOWERCASED text (see paragraph_hashes)
    but the rebuilt text preserves original case: ASCII-whitespace
    tokenization is case-insensitive (lowercasing never creates or
    destroys ASCII whitespace), so original-case words align 1:1 with
    the hashed windows; a length-mismatch guard falls back to the
    lowered words (non-ASCII full-casefold pathologies)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    # a left_outer block from an empty right partition can arrive
    # WITHOUT the right-side column at all (Ray 2.49): no drop-list
    drops_col = batch["dropped"].to_pylist() \
        if "dropped" in batch.column_names else [None] * len(batch)
    out_text: list[str] = []
    n_paras: list[int] = []
    n_removed: list[int] = []
    for text, dropped in zip(texts, drops_col):
        words = ascii_words(text or "")
        lowered = ascii_words((text or "").lower())
        if len(words) != len(lowered):
            words = lowered
        n = (len(words) + PARA_WORDS - 1) // PARA_WORDS
        drop_set = set(map(int, dropped.split(","))) if dropped else set()
        kept: list[str] = []
        for i in range(n):
            if i not in drop_set:
                kept.extend(words[i * PARA_WORDS:(i + 1) * PARA_WORDS])
        out_text.append(" ".join(kept))
        n_paras.append(n)
        n_removed.append(len(drop_set))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "clean_text": pa.array(out_text, pa.string()),
        "n_paras": pa.array(n_paras, pa.int64()),
        "n_removed": pa.array(n_removed, pa.int64()),
    })


_MAPSIDE_DOC_LIMIT = 500_000
_MAPSIDE_BYTE_LIMIT = 256 << 20  # per-actor dict cap; lists replicate


def mapside_fits(lists_ds, n_rows: int) -> bool:
    """True when the per-doc list table is small enough for the
    map-side tier: row count AND materialized bytes both bounded —
    span occurrence strings are unbounded per doc, so a row-count
    gate alone could admit a multi-GB dict replicated into every
    actor heap."""
    if n_rows > _MAPSIDE_DOC_LIMIT:
        return False
    try:
        size = lists_ds.size_bytes()
    except Exception:
        return False
    return size is not None and size <= _MAPSIDE_BYTE_LIMIT


def attach_mapside(docs, lists_ds, col: str, finish_fn):
    """Map-side replacement for the removal ops' corpus×drop-minority
    ``left_outer`` join: the per-doc list table (duplicate-minority-
    sized, pre-checked ≤ ``_MAPSIDE_DOC_LIMIT`` rows) stays in plasma
    as Arrow refs — the driver holds refs only — and each actor
    indexes it once in ``__init__``; the corpus streams through with
    the ``col`` string attached (None where absent, matching the left
    join's null) straight into ``finish_fn``. Skips the join
    operator's ~1-2 s fixed cost AND the corpus-side repartition+
    materialize its empty-block guard required."""
    import ray

    refs = lists_ds.to_arrow_refs()

    class _Attach:
        def __init__(self, refs, col, finish):
            self.col, self.finish = col, finish
            self.m: dict = {}
            for blk in ray.get(list(refs)):
                # map_groups upstreams emit some EMPTY blocks with no
                # columns (pandas) — skip them; blocks may arrive as
                # pandas OR arrow depending on the producing stage
                if isinstance(blk, pa.Table):
                    if "doc_id" not in blk.column_names:
                        continue
                    self.m.update(zip(blk["doc_id"].to_pylist(),
                                      blk[col].to_pylist()))
                else:
                    if "doc_id" not in blk.columns:
                        continue
                    self.m.update(zip(blk["doc_id"].tolist(),
                                      blk[col].tolist()))

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = [self.m.get(d) for d in t["doc_id"].to_pylist()]
            return self.finish(t.append_column(
                self.col, pa.array(vals, pa.string())))

    return docs.map_batches(
        _Attach, fn_constructor_args=(refs, col, finish_fn),
        batch_format="pyarrow", concurrency=(1, 8), batch_size=256)


def occurrence_lists_tail(docs, occ, col: str, rebuild_fn, to_items):
    """The SHARED tail of every occurrence-removal op
    (``remove_duplicate_paragraphs`` / ``spans.remove_duplicate_spans``
    / ``linededup.remove_duplicate_lines``): per-doc comma-joined
    occurrence STRINGS (Arrow's hash join rejects list-typed payload
    columns) → empty-bypass (a fully empty map_groups output yields
    schema-less blocks the hash join cannot resolve the key against)
    → map-side attach when the duplicate minority is bounded → ONE
    ``left_outer`` join otherwise → per-doc rebuild.

    ``to_items(df)`` returns a DataFrame with ``doc_id`` and a string
    ``item`` column in final within-doc order; the Ray-version-
    specific workarounds live HERE, once, instead of in three copies.
    """
    from pdfextract_ray.pipelines.relational import (coalesce_for_join,
                                                     join_partitions)

    def to_lists(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             col: pa.array([], pa.string())})
        d = to_items(df)
        g = d.groupby("doc_id", sort=False)["item"] \
            .agg(",".join).reset_index()
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         col: pa.array(g["item"], pa.string())})

    lists = occ.groupby("doc_id") \
        .map_groups(to_lists, batch_format="pandas").materialize()
    n = lists.count()
    if n == 0:
        def passthrough(t: pa.Table) -> pa.Table:
            return rebuild_fn(t.append_column(
                col, pa.array([None] * len(t), pa.string())))
        return docs.map_batches(passthrough, batch_format="pyarrow")
    if mapside_fits(lists, n):
        return attach_mapside(docs, lists, col, rebuild_fn)
    joined = coalesce_for_join(docs, n=join_partitions()).join(
        coalesce_for_join(lists), join_type="left_outer",
        on=("doc_id",), num_partitions=join_partitions())
    return joined.map_batches(rebuild_fn, batch_format="pyarrow")


def remove_duplicate_paragraphs(docs, shard_mask: int | None = None):
    """C4-style span REMOVAL over a (doc_id, text) Dataset: every
    occurrence of a 16-word window except its global first (ordered by
    (doc_id, widx)) is deleted; returns (doc_id, clean_text, n_paras,
    n_removed) with whitespace normalized to single spaces in
    clean_text (the same normalization the fingerprint column uses).

    Distributed plan: indexed explode (ints) → hash-shard groups emit
    only the DROPPED (doc_id, widx) pairs → per-doc drop-lists
    (groupby over the duplicate minority) → hash join back to
    documents (text moves through exactly ONE shuffle, and only here)
    → vectorless per-doc rebuild. Docs with no drops pass through the
    left join with a null drop-list. The tier plumbing is the shared
    :func:`occurrence_lists_tail`."""
    import functools

    mask = _mask(shard_mask)
    exploded = docs.map_batches(
        functools.partial(paragraph_explode_indexed_batch, shard_mask=mask),
        batch_format="pyarrow")
    drops = exploded.groupby("shard") \
        .map_groups(paragraph_drops_shard, batch_format="pandas")

    def to_items(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("widx")
        return pd.DataFrame({"doc_id": d["doc_id"],
                             "item": d["widx"].astype(str)})

    return occurrence_lists_tail(docs, drops, "dropped",
                                 _rebuild_clean_batch, to_items)


def decontaminate_corpus(docs, eval_ds):
    """External-eval decontamination (the production interface the
    registered ``decontaminate`` query stands in for): union the eval
    table's DISTINCT 3-gram shingles — benchmark-sized input, so the
    driver-side union is bounded by the EVAL suite, never the corpus —
    broadcast once, then scan every corpus row. Returns (doc_id,
    n_shingles, n_contaminated, is_contaminated)."""
    import functools

    import ray

    ev = eval_ds.map_batches(
        functools.partial(eval_shingle_batch, eval_mod=None),
        batch_format="pyarrow").to_pandas()
    eval_sorted = np.unique(ev["h32"].to_numpy(dtype=np.int64))
    eval_ref = ray.put(eval_sorted)
    return docs.map_batches(
        DecontaminateScan, fn_constructor_args=(eval_ref, None),
        batch_format="pyarrow", concurrency=(1, 8), batch_size=256)
