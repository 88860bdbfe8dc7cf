"""Multimodal (image/audio) column plumbing — decode stages.

Media payloads are opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages with SMALL batch sizes
(large blobs × concurrency must fit worker heaps — ray_guide
"Memory-aware").

The actual codec libraries (PIL/ffmpeg) are not in this container, so
the decode kernel is STUBBED: ``DecodeMedia`` tries the real import and
falls back to a clearly-marked deterministic fake (header parse +
hash-derived feature vector). The Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested; swapping
in a real decoder touches only ``_decode_real``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio
    ("payload", pa.binary()),
])

DECODED_TYPE = pa.list_(pa.float32())


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media payloads derived from documents rows
    (test scaffolding: a 16-byte header `PXIM`/`PXAU` + w/h + blob)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    kinds, payloads = [], []
    for doc_id, text in zip(ids, texts):
        kind = "image" if doc_id % 2 == 0 else "audio"
        magic = b"PXIM" if kind == "image" else b"PXAU"
        w = 16 + (doc_id % 64)
        h = 16 + (doc_id % 48)
        body = hashlib.sha256(text.encode("utf-8")).digest() * 4
        payloads.append(magic + struct.pack("<II", w, h) + body)
        kinds.append(kind)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class DecodeMedia:
    """Actor-pool decode stage: payload → (width, height, features)."""

    def __init__(self) -> None:
        try:  # real decoder path — not present in this container
            import PIL.Image  # noqa: F401
            self._real = True
        except ImportError:
            self._real = False

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg (not in this container); "
            "the deterministic stub below exercises the pipeline plumbing"
        )

    def _decode_stub(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if len(payload) < 12 or payload[:2] != b"PX":
            return 0, 0, np.zeros(FEATURE_DIM, dtype=np.float32)
        w, h = struct.unpack("<II", payload[4:12])
        digest = hashlib.sha256(payload[12:]).digest()
        feats = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16)
        return w, h, (feats.astype(np.float32) / 65535.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, ok = [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                w, h, f = (self._decode_real(payload) if self._real
                           else self._decode_stub(payload))
                widths.append(w)
                heights.append(h)
                feats.append([round(float(x), 6) for x in f])
                ok.append(True)
            except Exception:
                widths.append(0)
                heights.append(0)
                feats.append([0.0] * FEATURE_DIM)
                ok.append(False)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array(feats, DECODED_TYPE),
            "decoded": pa.array(ok, pa.bool_()),
        })
