"""Deterministic hashing-trick text embedder — the end-to-end bridge
from the documents table to every vector operator (brute kNN, IVF ANN,
hyperplane-LSH near-dup).

Public technique only: feature hashing (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009) over character
3-grams. Each doc's lowercased UTF-8 bytes yield overlapping 3-byte
codes; a splitmix64-style integer mix maps each code to a bucket in
[0, dim) and a ±1 sign; signed counts accumulate and the vector is
L2-normalized. No model, no training, no RNG at run time — the
embedding is a pure function of the text bytes, so the whole
text→embedding→ANN chain is deterministic and cluster-size-invariant.

Why character 3-grams: byte-local, so near-duplicate texts (small
edits) land at high cosine while unrelated texts decorrelate — the
right geometry for near-dup detection and a reasonable one for topical
kNN over web text.

Scale shape: stateless ``map_batches`` (no actor needed — there is no
model to load); per doc the gram→bucket pipeline is pure vectorized
numpy (rolling 3-byte codes via shifted slices, one ``np.add.at``
scatter). Output schema matches the embeddings table contract
(``vec_id:int64, embedding:list<float>``) so every existing vector
stage consumes it unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMBED_DIM = 64

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain construction): a strong,
    vectorizable integer mix — numpy uint64 arithmetic wraps mod 2^64
    exactly as required."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _M1
    x = (x ^ (x >> np.uint64(27))) * _M2
    return x ^ (x >> np.uint64(31))


def embed_text(text: str | None, dim: int = EMBED_DIM) -> np.ndarray:
    """One text → L2-normalized float64 vector (zero vector for
    null/too-short text)."""
    vec = np.zeros(dim, dtype=np.float64)
    if not text:
        return vec
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(b) < 3:
        # pad tiny texts so they still embed deterministically
        b = np.concatenate([b, np.zeros(3 - len(b), dtype=np.uint8)])
    codes = ((b[:-2].astype(np.uint64) << np.uint64(16))
             | (b[1:-1].astype(np.uint64) << np.uint64(8))
             | b[2:].astype(np.uint64))
    h = _mix64(codes)
    idx = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0)
    np.add.at(vec, idx, sign)
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def embed_batch(t: pa.Table, dim: int = EMBED_DIM,
                id_col: str = "doc_id", text_col: str = "text",
                out_id: str = "vec_id") -> pa.Table:
    """(vec_id, embedding) per row — the map_batches kernel. Emits
    ``list<float>`` (float32 elements) to match the embeddings-table
    schema contract.

    Deliberately a PER-DOC numpy loop: a whole-batch variant
    (concatenate bytes, mask cross-doc windows, one signed bincount
    scatter over doc*dim+bucket) was built and MEASURED 5x slower on
    5 KB docs (0.375 s vs 0.074 s per 1024 docs) — the 8-byte uint64
    position temporaries are memory-bandwidth-bound while the per-doc
    ``np.add.at`` stays cache-hot. Don't re-batch this."""
    vecs = [embed_text(s, dim).astype(np.float32)
            for s in t[text_col].to_pylist()]
    return pa.table({
        out_id: t[id_col].cast(pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })


def embed_docs(docs, dim: int = EMBED_DIM, id_col: str = "doc_id",
               text_col: str = "text", out_id: str = "vec_id"):
    """Documents Dataset → (vec_id, embedding) Dataset."""
    import functools
    return docs.select_columns([id_col, text_col]).map_batches(
        functools.partial(embed_batch, dim=dim, id_col=id_col,
                          text_col=text_col, out_id=out_id),
        batch_format="pyarrow")
