"""Similarity search over an embedding column (``list<float>``).

- **Brute-force cosine top-k** (the baseline): the query matrix is
  broadcast ONCE via ``ray.put`` and read in each task (never re-shipped
  per batch); each batch computes a (batch × queries) matmul and emits
  only its per-query top-k partials; a final tiny ``groupby(query_id)``
  merge yields the global top-k. Only (n_queries × k × n_blocks) partial
  rows ever shuffle.
- **LSH-bucketed near-duplicate pairs** (the scale path): random
  hyperplane signs bucket vectors; exact cosine verifies within buckets
  — the same explode→groupby→verify shape as MinHash dedup, so no
  all-pairs pass at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HP_RNG_SEED = 777
N_TABLES = 8          # LSH tables (bands)
BITS_PER_TABLE = 12   # hyperplanes per table; recall at cos≥0.95 ≈ 0.93


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def batch_matrix(batch: pa.Table, col: str = "embedding",
                 dim: int | None = None) -> np.ndarray:
    """Stack a list<float> column into an (n, dim) float64 matrix.

    A ZERO-ROW block (empty parquet fragment, a filter that drained a
    block) would crash np.stack ('need at least one array to stack');
    return the typed (0, dim) empty instead so every vector stage
    passes empties through like the pandas group fns do."""
    if batch.num_rows == 0:
        return np.empty((0, dim or 0), dtype=np.float64)
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.stack(arr.to_numpy(zero_copy_only=False)).astype(np.float64)


class TopKPartial:
    """map_batches task: cosine of batch vs broadcast queries → top-k rows."""

    def __init__(self, queries_ref, k: int = 5) -> None:
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.q_ids, qmat = q
        self.qn = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(batch_matrix(batch, dim=self.qn.shape[1]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = mat @ self.qn.T  # (batch, queries)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi, q_id in enumerate(self.q_ids):
            col = sims[:, qi]
            # partial top-k with deterministic (-sim, vec_id) tie-break
            order = np.lexsort((ids, -col))[:k]
            out_q.extend([q_id] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })


_EMPTY_TOPK = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                            "vec_id": pd.Series(dtype="int64"),
                            "cosine": pd.Series(dtype="float64"),
                            "rank": pd.Series(dtype="int64")})


def topk_merge_group(df: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Final per-query merge of partial top-k rows (tiny groups).
    Ray 2.49 map_groups may invoke the fn on an EMPTY block; returning
    a TYPED empty frame keeps every output block's schema identical
    (untyped empties trigger 'RefBundle with a different schema'
    warnings and downstream schema loss)."""
    if not len(df):
        return _EMPTY_TOPK.copy()
    df = df.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    df = df.reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    # grid-snap (see relational.grid_round): both engines divide the same
    # integer by 1e6 → bit-identical doubles vs SQL round(c*1e6,0)/1e6
    df["cosine"] = (df["cosine"] * 1e6).round() / 1e6
    return df


_HP_PLANES_MEMO: dict[int, np.ndarray] = {}


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic hyperplane matrix, computed ONCE per process per
    dim (it was rebuilt per batch on the hot LSH path — pure waste;
    the seed makes the memoized value identical everywhere)."""
    planes = _HP_PLANES_MEMO.get(dim)
    if planes is None:
        rng = np.random.RandomState(_HP_RNG_SEED)
        planes = rng.standard_normal((dim, N_TABLES * BITS_PER_TABLE))
        _HP_PLANES_MEMO[dim] = planes
    return planes


def hyperplane_bucket_batch(batch: pa.Table, dim: int) -> pa.Table:
    """LSH explode: one row per (vector, table) with a sign-pattern bucket
    key — multiple independent tables recover recall that a single
    hyperplane signature loses (p_bucket = (1-θ/π)^bits per table)."""
    planes = _hyperplanes(dim)
    mat = _normalize(batch_matrix(batch, dim=dim))
    bits = (mat @ planes) > 0
    n = len(mat)
    table_ids = np.repeat(np.arange(N_TABLES, dtype=np.int32), n)
    keys = np.zeros((N_TABLES, n), dtype=np.int64)
    for t in range(N_TABLES):
        for i in range(BITS_PER_TABLE):
            keys[t] |= bits[:, t * BITS_PER_TABLE + i].astype(np.int64) << i
    vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    emb_rep = pa.concat_arrays([emb] * N_TABLES)
    return pa.table({
        "table_id": pa.array(table_ids, pa.int32()),
        "bucket": pa.array(keys.reshape(-1), pa.int64()),
        "vec_id": pa.array(np.tile(vec_ids, N_TABLES), pa.int64()),
        "embedding": emb_rep,
    })


def cosine_pairs_group(df: pd.DataFrame, threshold: float = 0.95,
                       max_bucket: int = 200) -> pd.DataFrame:
    """Exact cosine verification within one LSH bucket."""
    if len(df) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    df = df.sort_values("vec_id").head(max_bucket)
    ids = df["vec_id"].to_numpy()
    mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = sims[iu, ju] >= threshold
    return pd.DataFrame({
        "a": ids[iu[keep]], "b": ids[ju[keep]],
        "cosine": np.round(sims[iu, ju][keep], 6),
    })
