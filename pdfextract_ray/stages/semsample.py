"""Semantic diversity sampling — cluster-balanced corpus subsetting
(the SemDeDup family: Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"; also the
cluster-balanced sampling used by DataComp-style curation).

Idea: embed every document, coarse-cluster the embedding space with
the IVF machinery's seeded k-means, then cap how many documents any
one semantic cell contributes — dense blobs of near-identical content
(boilerplate, mirrors, template pages) are down-sampled while sparse
regions survive untouched. Within a cell, the kept K are the docs
FARTHEST from the centroid (maximal intra-cell diversity, SemDeDup's
keep-the-outliers rule), ties broken by doc_id — fully deterministic.

Scale shape (the whole point):

- embedding is the stateless vectorized ``embed_docs`` map;
- the centroid table is trained DRIVER-SIDE on a bounded
  pushdown-filtered sample and broadcast once via ``ray.put``
  (identical posture to ``q_knn_ivf``);
- the only shuffle moves (cell, doc_id, dist) — three scalars per
  doc, never text or vectors;
- per-cell ranking groups by ``cell`` (cell count ~sqrt(N) via
  ``derive_nlist``, so groups are balanced by construction — k-means
  cells are the anti-skew device here);
- the verdict applies via the standard broadcast/left-anti two tier
  (``relational.anti_filter``) on the DROPPED minority.

Output is a verdict table (doc_id, cell, dist, keep) so callers can
audit which cell rejected a page — same contract as ``domain_cap``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pdfextract_ray.stages.embed import embed_text
from pdfextract_ray.stages.ivf import derive_nlist, train_centroids
from pdfextract_ray.stages.similarity import _normalize


def _assign_dist_batch(t: pa.Table, centroids_ref, id_col: str = "doc_id",
                       text_col: str = "text",
                       with_emb: bool = False) -> pa.Table:
    """(doc_id, cell, dist[, emb]) per row: embed + nearest centroid +
    cosine distance to it. Embedding happens HERE (fused); the shuffle
    carries the packed float32 vector ONLY when the within-cell
    near-dup prune needs it (``with_emb``), else three scalars."""
    import ray
    centroids = ray.get(centroids_ref) \
        if not isinstance(centroids_ref, np.ndarray) else centroids_ref
    mat = np.stack([embed_text(s)
                    for s in t[text_col].to_pylist()]) \
        if t.num_rows else np.empty((0, centroids.shape[1]))
    mat = _normalize(mat)
    sims = mat @ centroids.T
    cells = sims.argmax(axis=1).astype(np.int32) if len(sims) else \
        np.empty(0, np.int32)
    best = sims[np.arange(len(sims)), cells] if len(sims) else \
        np.empty(0)
    cols = {
        id_col: t[id_col],
        "cell": pa.array(cells, pa.int32()),
        # round: the rank key must be identical across retries/platforms
        "dist": pa.array(np.round(1.0 - best, 9), pa.float64()),
    }
    if with_emb:
        cols["emb"] = pa.array(
            [mat[i].astype("<f4").tobytes() for i in range(len(mat))],
            pa.binary())
    return pa.table(cols)


_EMPTY_VERDICT = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                               "cell": pd.Series(dtype="int32"),
                               "dist": pd.Series(dtype="float64"),
                               "keep": pd.Series(dtype="bool")})


def _cell_group(df: pd.DataFrame, cap: int,
                dedup_cos: float | None = None) -> pd.DataFrame:
    """One cell's rows → keep verdicts. Order: farthest-from-centroid
    first (dist desc), ties by doc_id asc — deterministic. With
    ``dedup_cos``, the SemDeDup within-cell prune runs FIRST: walk the
    order greedily and drop any doc whose cosine to an already-kept
    doc >= the threshold (near-identical boilerplate collapses to one
    survivor per semantic clump); the cap then applies to survivors."""
    if len(df) == 0:
        return _EMPTY_VERDICT.copy()
    df = df.sort_values(["dist", "doc_id"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    n = len(df)
    keep = np.zeros(n, dtype=bool)
    if dedup_cos is None:
        keep[:cap] = True
    else:
        vecs = np.stack([np.frombuffer(b, dtype="<f4")
                         for b in df["emb"]]).astype(np.float64)
        kept_rows: list[int] = []
        for i in range(n):
            if len(kept_rows) >= cap:
                break
            if kept_rows:
                sims = vecs[kept_rows] @ vecs[i]
                if float(sims.max()) >= dedup_cos:
                    continue
            kept_rows.append(i)
            keep[i] = True
    out = df.drop(columns=[c for c in ("emb",) if c in df.columns])
    out = out.copy()
    out["keep"] = keep
    return out


def semantic_sample_verdicts(docs, cap_per_cell: int,
                             n_cells: int | None = None,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             train_limit: int | None = None,
                             dedup_cos: float | None = None):
    """(doc_id, cell, dist, keep) verdicts for a cluster-balanced
    subset keeping at most ``cap_per_cell`` docs per semantic cell,
    optionally after the SemDeDup within-cell near-duplicate prune
    (``dedup_cos``: greedily drop docs within that cosine of an
    already-kept doc — near-identical clumps collapse to one survivor
    even when k-means spreads them over several cells).

    ``n_cells`` defaults to ``derive_nlist`` of the corpus count (from
    ``docs.count()`` if not given — callers with parquet metadata
    should pass it to avoid the count pass). The centroid sample is
    the first ``train_limit`` (default ``4 * n_cells``) docs by id —
    dense-id pushdown, the q_knn_ivf convention. The per-cell prune is
    O(kept × cell) vector dots with cells ~sqrt(N)-sized by
    construction — the published SemDeDup cost shape."""
    import ray

    if n_cells is None:
        n_cells = derive_nlist(docs.count())
    if train_limit is None:
        train_limit = max(256, 4 * n_cells)

    import pyarrow.compute as pc
    sample_rows = docs.select_columns([id_col, text_col]).map_batches(
        lambda t: t.filter(pc.less(t[id_col], train_limit)),
        batch_format="pyarrow").take_all()
    texts = [r[text_col] for r in
             sorted(sample_rows, key=lambda r: r[id_col])]
    if not texts:
        raise ValueError(
            "semantic-sample centroid training found no rows with "
            "%s < %d — the dense-ids-from-0 convention does not hold "
            "for this table; pass train_limit above the smallest id"
            % (id_col, train_limit))
    sample = np.stack([embed_text(s) for s in texts])
    centroids_ref = ray.put(train_centroids(sample, nlist=n_cells))

    import functools
    assigned = docs.select_columns([id_col, text_col]).map_batches(
        functools.partial(_assign_dist_batch, centroids_ref=centroids_ref,
                          id_col=id_col, text_col=text_col,
                          with_emb=dedup_cos is not None),
        batch_format="pyarrow")
    return assigned.groupby("cell").map_groups(
        functools.partial(_cell_group, cap=cap_per_cell,
                          dedup_cos=dedup_cos),
        batch_format="pandas")


def semantic_sample_filter(docs, cap_per_cell: int,
                           n_cells: int | None = None,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           dedup_cos: float | None = None,
                           max_broadcast: int = 2_000_000):
    """The corpus filtered to the cluster-balanced subset: verdicts →
    DROPPED-id minority → ``relational.anti_filter`` two-tier apply
    (text never shuffles for the verdict computation)."""
    import pyarrow.compute as pc

    from pdfextract_ray.pipelines.relational import anti_filter

    verdicts = semantic_sample_verdicts(
        docs, cap_per_cell, n_cells=n_cells, id_col=id_col,
        text_col=text_col, dedup_cos=dedup_cos)
    drops = verdicts.map_batches(
        lambda t: t.filter(pc.invert(t["keep"])).select([id_col]),
        batch_format="pyarrow")
    return anti_filter(docs, drops, id_col, max_broadcast=max_broadcast)
