"""Multimodal (image/audio) column plumbing — decode stages.

Media payloads are opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages with SMALL batch sizes
(large blobs × concurrency must fit worker heaps — ray_guide
"Memory-aware").

Codec tiers, probed per payload by magic bytes:

1. **PIL**, when importable (not in this container) — arbitrary image
   formats; the swap point is :meth:`DecodeMedia._decode_pil`.
2. **Pure-Python real codecs** (always available): uncompressed 24-bit
   BMP, non-interlaced 8-bit PNG (gray/RGB/RGBA, all five scanline
   filters — zlib is stdlib), and 16-bit PCM WAV — real formats decode,
   resize, and frame-sample without any external library.
3. **Deterministic ``PX`` stub** — exercises the pipeline plumbing for
   formats outside 1–2 (clearly marked; header parse + hash features).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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


# ------------------------------------------------- pure-Python codecs

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up rows, BGR, 4-byte row padding)."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        bgr = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += bgr + b"\x00" * pad
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed 24-bit BMP → (w, h, (h, w, 3) RGB)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    offset, = struct.unpack_from("<I", payload, 10)
    dib_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if dib_size < 40 or bpp != 24 or comp != 0 or w <= 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24-bit)")
    flipped = h > 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = (h - 1 - i) if flipped else i
        start = offset + i * stride
        bgr = np.frombuffer(payload, dtype=np.uint8, count=row,
                            offset=start).reshape(w, 3)
        px[y] = bgr[:, ::-1]
    return w, h, px


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 samples as a mono 16-bit PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit PCM WAV → (rate, int16 samples)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("need 16-bit PCM")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return rate, samples


def image_features(px: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: per-channel mean+std (6) + 10-bin
    normalized grayscale histogram."""
    f = np.empty(FEATURE_DIM, dtype=np.float64)
    flat = px.reshape(-1, 3).astype(np.float64)
    f[0:3] = flat.mean(axis=0) / 255.0
    f[3:6] = flat.std(axis=0) / 255.0
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=10, range=(0.0, 255.0001))
    f[6:16] = hist / max(1, len(gray))
    return f.astype(np.float32)


def audio_features(samples: np.ndarray) -> np.ndarray:
    """16-dim audio descriptor: rms + zero-cross rate + 14 frame RMS."""
    f = np.zeros(FEATURE_DIM, dtype=np.float64)
    if len(samples):
        x = samples.astype(np.float64) / 32768.0
        f[0] = np.sqrt((x * x).mean())
        f[1] = (np.diff(np.signbit(x)) != 0).mean() if len(x) > 1 else 0.0
        frames = np.array_split(x, 14)
        f[2:16] = [np.sqrt((fr * fr).mean()) if len(fr) else 0.0
                   for fr in frames]
    return f.astype(np.float32)


def synth_real_media_batch(batch: pa.Table) -> pa.Table:
    """REAL media payloads derived from documents rows: even doc_ids
    get a deterministic gradient/hash-pattern image (PNG every third
    even id, BMP otherwise), odd doc_ids a two-tone sine WAV."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    kinds, payloads = [], []
    for doc_id, text in zip(ids, texts):
        seed = np.frombuffer(
            hashlib.sha256((text or "").encode("utf-8")).digest()[:8],
            dtype=np.uint64)[0]
        if doc_id % 2 == 0:
            w = 16 + (doc_id % 64)
            h = 16 + (doc_id % 48)
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([
                ((xx * 255) // max(1, w - 1)).astype(np.uint8),
                ((yy * 255) // max(1, h - 1)).astype(np.uint8),
                ((xx ^ yy) + int(seed % 251)).astype(np.uint8),
            ], axis=-1)
            payloads.append(encode_png(px) if doc_id % 6 == 0
                            else encode_bmp(px))
            kinds.append("image")
        else:
            n = 800 + (doc_id % 800)
            t = np.arange(n, dtype=np.float64)
            f1 = 100.0 + float(seed % 200)
            sig = (np.sin(2 * np.pi * f1 * t / 8000.0) * 12000.0
                   + np.sin(2 * np.pi * 2 * f1 * t / 8000.0) * 6000.0)
            payloads.append(encode_wav(sig.astype(np.int16)))
            kinds.append("audio")
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class DecodeMedia:
    """Actor-pool decode stage: payload → (width, height, features).

    Routes per payload by magic bytes: PIL (if importable) → BMP/WAV
    pure-Python codecs → deterministic PX stub."""

    def __init__(self) -> None:
        try:  # optional richer decoder — absent in this container
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_pil(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        import PIL.Image
        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        px = np.asarray(img, dtype=np.uint8)
        return img.width, img.height, image_features(px)

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if payload[:2] == b"BM":
            w, h, px = decode_bmp(payload)
            return w, h, image_features(px)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, px = decode_png(payload)
            return w, h, image_features(px)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            _rate, samples = decode_wav(payload)
            return len(samples), 1, audio_features(samples)
        if self._pil:
            return self._decode_pil(payload)
        return self._decode_stub(payload)

    def _decode_stub(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if len(payload) < 12 or payload[:2] != b"PX":
            raise ValueError("undecodable payload")
        w, h = struct.unpack("<II", payload[4:12])
        digest = hashlib.sha256(payload[12:]).digest()
        feats = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16)
        return w, h, (feats.astype(np.float32) / 65535.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, ok = [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                w, h, f = self._decode(payload)
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

    def _resize(self, payload: bytes, decode, encode) -> tuple:
        """REAL resize: decode → nearest-neighbor subsample → re-encode.
        Catch EVERYTHING a corrupt payload can raise (zlib.error on a
        bad IDAT, struct.error on a truncated header, IndexError on
        short pixel data — none are ValueError) and fall back to
        passing the payload through: one poisoned blob must never kill
        the block (same rule as DecodeMedia)."""
        try:
            w, h, px = decode(payload)
            scale = min(1.0, self.max_dim / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            xi = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
            yi = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
            return encode(px[yi][:, xi]), nw, nh
        except Exception:
            return payload, 0, 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, out_w, out_h = [], [], []
        for kind, payload in zip(batch["kind"].to_pylist(),
                                 batch["payload"].to_pylist()):
            if kind == "image" and payload[:8] == b"\x89PNG\r\n\x1a\n":
                p, nw, nh = self._resize(payload, decode_png, encode_png)
                out_payloads.append(p)
                out_w.append(nw)
                out_h.append(nh)
                continue
            if kind == "image" and payload[:2] == b"BM":
                p, nw, nh = self._resize(payload, decode_bmp, encode_bmp)
                out_payloads.append(p)
                out_w.append(nw)
                out_h.append(nh)
                continue
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
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                # REAL sample-accurate windows from decoded PCM
                try:
                    _rate, samples = decode_wav(payload)
                except (ValueError, wave.Error):
                    continue
                n_samp = self.frame_bytes // 2
                step = max(1, (len(samples) - n_samp)
                           // max(1, self.n_frames - 1))
                for k in range(self.n_frames):
                    off = min(k * step, max(0, len(samples) - n_samp))
                    ids.append(mid)
                    kinds.append(kind)
                    fidx.append(k)
                    frames.append(samples[off:off + n_samp]
                                  .astype("<i2").tobytes())
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


# --------------------------------------------------- pure-Python PNG codec

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a non-interlaced 8-bit PNG
    (filter 0 scanlines, one zlib IDAT)."""
    import zlib as _z
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a non-interlaced 8-bit PNG (gray / RGB / RGBA; all five
    scanline filters) → (w, h, (h, w, 3) RGB)."""
    import zlib as _z
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError("unsupported PNG variant")
            nch = {0: 1, 2: 3, 6: 4}[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = _z.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:    # Up
            cur = (line + prev) & 0xFF
        else:               # Sub / Average / Paeth need left-pixel recursion
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else c)
                else:
                    raise ValueError("bad PNG filter %d" % ftype)
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    elif nch == 4:
        px = px[:, :, :3]
    return w, h, np.ascontiguousarray(px)


class MultimodalSuite:
    """Actor-pool stage fusing the three media ops — decode,
    nearest-neighbor resize, frame sampling — into ONE pass per
    payload: one row per media with the per-stage outputs as columns
    (nulls where a stage doesn't apply to the modality).

    Merges the three per-stage driver queries (``multimodal_decode``,
    ``multimodal_resize``, ``multimodal_frames``) into a single
    registry entry without losing any stage's evidence: ``decoded``/
    ``width``/``height`` pin the decode, ``resized_md5`` pins the
    re-encoded resized image bytes, and ``n_frames``/``frames_md5``
    pin the exact sampled PCM windows (md5 over the concatenated
    frames in index order). Each sub-stage is the SAME code path as
    its standalone class (composition, not reimplementation)."""

    def __init__(self, max_dim: int = 32, n_frames: int = 4,
                 frame_bytes: int = 32) -> None:
        self._decode = DecodeMedia()
        self._resize = ResizeImages(max_dim=max_dim)
        self._frames = SampleFrames(n_frames=n_frames,
                                    frame_bytes=frame_bytes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = self._decode(batch)
        r = self._resize(batch)
        f = self._frames(batch)
        # group the frame explosion back per media (in-batch, ordered)
        frame_acc: dict[int, list[bytes]] = {}
        for mid, frame in zip(f["media_id"].to_pylist(),
                              f["frame"].to_pylist()):
            frame_acc.setdefault(mid, []).append(frame)
        kinds = batch["kind"].to_pylist()
        res_w, res_h, res_md5 = [], [], []
        n_frames, frames_md5 = [], []
        for i, (mid, kind) in enumerate(
                zip(batch["media_id"].to_pylist(), kinds)):
            if kind == "image":
                res_w.append(r["width"][i].as_py())
                res_h.append(r["height"][i].as_py())
                res_md5.append(hashlib.md5(r["payload"][i].as_py())
                               .hexdigest())
                n_frames.append(None)
                frames_md5.append(None)
            else:
                res_w.append(None)
                res_h.append(None)
                res_md5.append(None)
                frames = frame_acc.get(mid, [])
                n_frames.append(len(frames))
                frames_md5.append(
                    hashlib.md5(b"".join(frames)).hexdigest()
                    if frames else None)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "width": d["width"],
            "height": d["height"],
            "decoded": d["decoded"],
            "resized_width": pa.array(res_w, pa.int32()),
            "resized_height": pa.array(res_h, pa.int32()),
            "resized_md5": pa.array(res_md5, pa.string()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "frames_md5": pa.array(frames_md5, pa.string()),
        })
