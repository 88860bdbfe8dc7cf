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


class ResizeImages:
    """Actor-pool resize stage for image rows: payload → payload' with a
    target max dimension. Real kernel stubbed (needs PIL); the
    deterministic fake rewrites the header dims preserving aspect ratio,
    leaving the blob untouched — the Ray plumbing (schema in/out, small
    batch sizes for large blobs) is real."""

    def __init__(self, max_dim: int = 32) -> None:
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, out_w, out_h = [], [], []
        for kind, payload in zip(batch["kind"].to_pylist(),
                                 batch["payload"].to_pylist()):
            if kind != "image" or len(payload) < 12 or payload[:2] != b"PX":
                out_payloads.append(payload)
                out_w.append(0)
                out_h.append(0)
                continue
            w, h = struct.unpack("<II", payload[4:12])
            scale = min(1.0, self.max_dim / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            out_payloads.append(payload[:4] + struct.pack("<II", nw, nh) + payload[12:])
            out_w.append(nw)
            out_h.append(nh)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out_payloads, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
        })


class SampleFrames:
    """Actor-pool frame sampler for audio/video rows: payload → one row
    per sampled frame (``n_frames`` evenly spaced byte-windows). The
    real codec is stubbed; the explode shape (one input row → many
    output rows, each a small slice) is the part that matters for the
    Ray pipeline (memory-bounded batches of large blobs)."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 32) -> None:
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, fidx, frames = [], [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind == "image" or len(payload) <= 12:
                continue
            body = payload[12:]
            step = max(1, (len(body) - self.frame_bytes) // max(1, self.n_frames - 1))
            for k in range(self.n_frames):
                off = min(k * step, max(0, len(body) - self.frame_bytes))
                ids.append(mid)
                kinds.append(kind)
                fidx.append(k)
                frames.append(body[off:off + self.frame_bytes])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })
