"""Training-set assembly operators: mixture sampling + token packing.

After curation (dedup, quality, decontamination) a training corpus
still needs ASSEMBLY — decide how much of each source to take, and
group documents into fixed-token-budget shards for the trainer:

- :func:`mixture_sample` — hit a target source-mixture (e.g. web 60%,
  books 25%, code 15%) with maximum data retention: one tiny count
  groupby, a driver-side rate computation over |sources| rows (a
  handful — never corpus-sized), then a stateless deterministic
  per-row keep decision. No corpus shuffle.
- :func:`soft_dedup_weights` — SoftDeDup-style duplicate DOWNWEIGHTING
  instead of removal (Muennighoff et al. 2023 "Scaling Data-
  Constrained Language Models" motivates keeping duplicates at
  reduced sampling weight when data is scarce): every document gets
  ``weight = 1 / n_copies`` over its byte-exact text duplicate set,
  so a trainer sampling by weight sees each distinct text with equal
  total mass. Scale shape: per-batch partial hash counts → one
  int-only groupby → the DUPLICATE-MINORITY count table (hashes with
  n ≥ 2 only — unique docs default to weight 1 without appearing
  anywhere) broadcast via ``ray.put`` when bounded, else a
  hash-keyed ``left_outer`` join of int pairs. Text never shuffles.
- :func:`pack_documents` — greedy first-fit packing of documents into
  ~``budget`` token groups, batch-local so it streams: each
  map_batches task packs its own batch and emits globally-unique pack
  ids without coordination (a pack's id is the min doc_id inside it —
  unique because docs are). Packing quality is bounded by batch size
  (at most one underfull pack per batch) — the standard trade of
  distributed bin packing; the trainer's sequence packing only needs
  approximate budget fill, not optimality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth multiplicative hash on 64-bit ids → uniform [0, 2^32); the
# same deterministic-sampling primitive stratified_sample uses.
_KNUTH = np.uint64(2654435761)


def _id_unit(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform [0,1) per id."""
    h = (ids.astype(np.uint64) * _KNUTH) & np.uint64(0xFFFFFFFF)
    return h.astype(np.float64) / float(1 << 32)


def mixture_rates(counts: dict[str, int],
                  targets: dict[str, float]) -> dict[str, float]:
    """Per-source keep rates achieving ``targets`` proportions with
    maximum retention: scale the total sample T up until the binding
    source is fully used (T = min over s of n_s / p_s), then
    rate_s = T * p_s / n_s ≤ 1. Sources absent from ``targets`` get
    rate 0 (explicitly excluded); target weights are normalized, so
    {web: 3, code: 1} means 75/25."""
    total_w = sum(w for s, w in targets.items() if counts.get(s, 0) > 0)
    if total_w <= 0:
        return {s: 0.0 for s in counts}
    p = {s: w / total_w for s, w in targets.items()}
    t_max = min(counts[s] / p[s] for s in p
                if counts.get(s, 0) > 0 and p[s] > 0)
    return {s: (t_max * p[s] / counts[s] if counts.get(s, 0) > 0
                and s in p and p[s] > 0 else 0.0)
            for s in counts}


def mixture_sample(docs, targets: dict[str, float],
                   id_col: str = "doc_id", source_col: str = "source"):
    """Sample ``docs`` to the target source mixture. Returns the
    input columns + ``keep`` (deterministic per id — reruns and
    resumes agree). Pass 1 is a count-per-source groupby whose output
    is |sources| rows on the driver (a true dimension, like the
    nation table — NOT corpus-derived data in the forbidden sense);
    pass 2 is a stateless vectorized filter flag."""
    import ray

    counts_df = docs.groupby(source_col).count().to_pandas()
    if source_col not in counts_df.columns:   # empty corpus
        counts = {}
    else:
        counts = dict(zip(counts_df[source_col],
                          counts_df["count()"].astype(int)))
    rates = mixture_rates(counts, targets)
    rates_ref = ray.put(rates)

    def flag(t: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t[source_col].to_pylist()
        thresh = np.array([r.get(s, 0.0) for s in srcs], np.float64)
        keep = _id_unit(ids) < thresh
        return t.append_column("keep", pa.array(keep, pa.bool_()))

    return docs.map_batches(flag, batch_format="pyarrow")


def pack_batch(t: pa.Table, budget: int, id_col: str = "doc_id",
               tokens_col: str = "n_tokens") -> pa.Table:
    """Greedy first-fit-decreasing packing of ONE batch: sort the
    batch's docs by token count descending, drop each into the first
    open pack with room, close packs at ``budget``. A single doc
    STRICTLY over budget becomes its own pack, flagged ``oversized``
    (the trainer truncates or splits those; a doc of exactly
    ``budget`` tokens perfectly fills a normal pack). Emits (doc_id,
    n_tokens, pack_id, pack_tokens, oversized); pack_id = min doc_id
    in the pack."""
    n = len(t)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64()),
            "pack_tokens": pa.array([], pa.int64()),
            "oversized": pa.array([], pa.bool_()),
        })
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = t[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-toks, kind="stable")
    packs: list[list[int]] = []       # member row indices
    loads: list[int] = []
    for i in order:
        tk = int(toks[i])
        if tk > budget:
            packs.append([int(i)])
            loads.append(tk)
            continue
        for j in range(len(packs)):
            if loads[j] + tk <= budget:
                packs[j].append(int(i))
                loads[j] += tk
                break
        else:
            packs.append([int(i)])
            loads.append(tk)
    pack_id = np.empty(n, np.int64)
    pack_tok = np.empty(n, np.int64)
    oversized = np.zeros(n, bool)
    for members, load in zip(packs, loads):
        pid = int(min(ids[m] for m in members))
        for m in members:
            pack_id[m] = pid
            pack_tok[m] = load
            oversized[m] = len(members) == 1 and load > budget
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(toks, pa.int64()),
        "pack_id": pa.array(pack_id, pa.int64()),
        "pack_tokens": pa.array(pack_tok, pa.int64()),
        "oversized": pa.array(oversized, pa.bool_()),
    })


def pack_documents(docs, budget: int, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   batch_size: int = 4096):
    """Assign every doc to a ~``budget``-token pack (see
    :func:`pack_batch`). Batch-local and coordination-free: with B
    docs per batch averaging w tokens, waste is at most one open pack
    per (batch × distinct fill level), so choose ``batch_size`` ≫
    budget / median-doc-tokens (the default 4096 covers budgets into
    the millions of tokens at web-scale doc lengths)."""
    import functools

    return docs.select_columns([id_col, tokens_col]).map_batches(
        functools.partial(pack_batch, budget=budget, id_col=id_col,
                          tokens_col=tokens_col),
        batch_size=batch_size, batch_format="pyarrow")


def _text_hash_batch(t: pa.Table, id_col: str, text_col: str
                     ) -> pa.Table:
    """(id, h, nul) per row — the shared 63-bit content key
    (:func:`textstats.text_key_hash63`) of the RAW text bytes.
    NULL-text rows are flagged: absent content is not duplicate
    content, so they are excluded from duplicate grouping downstream
    (weight 1.0) instead of being down-weighted against each other or
    against genuinely-empty-string docs."""
    from pdfextract_ray.stages.textstats import text_key_hash63

    texts = t[text_col].to_pylist()
    hs = [text_key_hash63((s or "").encode("utf-8")) for s in texts]
    return pa.table({id_col: t[id_col],
                     "h": pa.array(hs, pa.int64()),
                     "nul": pa.array([s is None for s in texts],
                                     pa.bool_())})


def soft_dedup_weights(docs, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_broadcast: int = 2_000_000):
    """(id, n_copies, weight) per document with
    ``weight = 1 / n_copies`` over byte-exact text duplicates (see
    module docstring). Every input row gets an output row; unique
    docs carry ``n_copies = 1, weight = 1.0``. NULL-text rows are
    never grouped (with each other or with empty-string docs): absent
    content is not duplicate content, so they always emit
    ``n_copies = 1, weight = 1.0``."""
    import functools

    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    hashed = docs.select_columns([id_col, text_col]).map_batches(
        functools.partial(_text_hash_batch, id_col=id_col,
                          text_col=text_col),
        batch_format="pyarrow").materialize()
    # materialized because TWO consumers read it (the counts pipeline
    # and the finish/join branch) — without this, Ray re-executes the
    # lineage per consumer and the corpus text is read + md5-hashed
    # twice; the materialized table is (int64, int64) only, so the
    # cost is trivial next to a second full text scan

    # partial counts per batch BEFORE the groupby: the shuffle moves
    # one (h, n) int row per (block, distinct hash), never per doc
    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        t = t.filter(pc.invert(t["nul"]))  # null text never groups
        s = pd.Series(t["h"].to_numpy(zero_copy_only=False)) \
            .value_counts()
        return pa.table({"h": pa.array(s.index, pa.int64()),
                         "n": pa.array(s.to_numpy(), pa.int64())})

    counts = hashed.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="n"))
    dup_counts = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["n"] if "n" in t.column_names else t["sum(n)"], 2)),
        batch_format="pyarrow").materialize()
    n_dup = dup_counts.count()

    def finish(t: pa.Table, lut_ref) -> pa.Table:
        lut = ray.get(lut_ref) if lut_ref is not None else {}
        ns = [1 if nul else lut.get(h, 1)
              for h, nul in zip(t["h"].to_pylist(),
                                t["nul"].to_pylist())]
        return pa.table({
            id_col: t[id_col],
            "n_copies": pa.array(ns, pa.int64()),
            "weight": pa.array([1.0 / n for n in ns], pa.float64()),
        })

    if n_dup == 0:
        return hashed.map_batches(
            functools.partial(finish, lut_ref=None),
            batch_format="pyarrow")
    if n_dup <= max_broadcast:
        df = dup_counts.to_pandas()
        # Ray 2.49: to_pandas on an all-empty dataset drops columns
        # (n_dup > 0 here); column may surface as n or sum(n)
        ncol = "n" if "n" in df.columns else "sum(n)"
        lut_ref = ray.put(dict(zip(df["h"], df[ncol])))
        return hashed.map_batches(
            functools.partial(finish, lut_ref=lut_ref),
            batch_format="pyarrow")
    from pdfextract_ray.pipelines.relational import (coalesce_for_join,
                                                     join_partitions)
    joined = coalesce_for_join(hashed, n=join_partitions()).join(
        coalesce_for_join(dup_counts), join_type="left_outer",
        on=("h",), num_partitions=join_partitions())

    def finish_joined(t: pa.Table) -> pa.Table:
        names = t.column_names
        # blocks from empty right partitions may lack the n column
        ncol = "n" if "n" in names else ("sum(n)" if "sum(n)" in names
                                         else None)
        raw = t[ncol].to_pylist() if ncol else [None] * len(t)
        ns = [1 if nul else (v if v is not None else 1)
              for v, nul in zip(raw, t["nul"].to_pylist())]
        return pa.table({
            id_col: t[id_col],
            "n_copies": pa.array(ns, pa.int64()),
            "weight": pa.array([1.0 / n for n in ns], pa.float64()),
        })

    return joined.map_batches(finish_joined, batch_format="pyarrow")
