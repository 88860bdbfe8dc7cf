"""Real-codec multimodal tests: pure-Python BMP and WAV round-trips,
real resize, and sample-accurate frame windows (no PIL/ffmpeg)."""

import numpy as np
import pyarrow as pa

from pdfextract_ray.stages import multimodal as M


def test_bmp_roundtrip():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)  # odd dims → padding
    blob = M.encode_bmp(px)
    assert blob[:2] == b"BM"
    w, h, out = M.decode_bmp(blob)
    assert (w, h) == (21, 13)
    assert np.array_equal(out, px)


def test_wav_roundtrip():
    sig = (np.sin(np.linspace(0, 40 * np.pi, 1600)) * 20000).astype(np.int16)
    blob = M.encode_wav(sig, rate=8000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, out = M.decode_wav(blob)
    assert rate == 8000
    assert np.array_equal(out, sig)


def test_decode_media_routes_real_codecs():
    docs = pa.table({"doc_id": pa.array([2, 3], pa.int64()),
                     "text": ["image doc", "audio doc"]})
    media = M.synth_real_media_batch(docs)
    payloads = media["payload"].to_pylist()
    assert payloads[0][:2] == b"BM"
    assert payloads[1][:4] == b"RIFF"
    out = M.DecodeMedia()(media).to_pandas()
    assert list(out["decoded"]) == [True, True]
    img = out.iloc[0]
    assert (img["width"], img["height"]) == (18, 18)
    # image features: means in [0,1], histogram sums to 1
    f = np.array(img["features"])
    assert 0.0 <= f[0] <= 1.0 and abs(f[6:16].sum() - 1.0) < 1e-5
    aud = out.iloc[1]
    assert aud["height"] == 1 and aud["width"] == 800 + 3 % 800
    fa = np.array(aud["features"])
    assert fa[0] > 0.1  # rms of a loud sine


def test_decode_is_deterministic():
    docs = pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                     "text": ["aa", "bb"]})
    a = M.DecodeMedia()(M.synth_real_media_batch(docs)).to_pandas()
    b = M.DecodeMedia()(M.synth_real_media_batch(docs)).to_pandas()
    assert list(a["features"].iloc[0]) == list(b["features"].iloc[0])


def test_real_bmp_resize_subsamples_pixels():
    yy, xx = np.mgrid[0:40, 0:60]
    px = np.stack([xx % 256, yy % 256, (xx + yy) % 256],
                  axis=-1).astype(np.uint8)
    media = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": ["image"],
                      "payload": pa.array([M.encode_bmp(px)], pa.binary())})
    out = M.ResizeImages(max_dim=30)(media).to_pandas().iloc[0]
    assert max(out["width"], out["height"]) == 30
    w2, h2, small = M.decode_bmp(out["payload"])
    assert (w2, h2) == (out["width"], out["height"])
    # nearest-neighbor: pixel (0,0) preserved; scale factor 2 → (1,1)
    # of the small image equals (2,2) of the original
    assert np.array_equal(small[0, 0], px[0, 0])
    assert np.array_equal(small[1, 1], px[2, 2])


def test_wav_frames_are_pcm_slices():
    sig = np.arange(1000, dtype=np.int16)
    media = pa.table({"media_id": pa.array([9], pa.int64()),
                      "kind": ["audio"],
                      "payload": pa.array([M.encode_wav(sig)], pa.binary())})
    fr = M.SampleFrames(n_frames=3, frame_bytes=32)(media).to_pandas()
    assert list(fr["frame_index"]) == [0, 1, 2]
    first = np.frombuffer(fr["frame"].iloc[0], dtype="<i2")
    assert np.array_equal(first, sig[:16])
    last = np.frombuffer(fr["frame"].iloc[2], dtype="<i2")
    assert np.array_equal(last, sig[984:1000])


def test_garbage_payload_isolated():
    media = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                      "kind": ["image", "audio"],
                      "payload": pa.array([b"BMgarbage", b"RIFFxxxxWAVEbroken"],
                                          pa.binary())})
    out = M.DecodeMedia()(media).to_pandas()
    assert list(out["decoded"]) == [False, False]


def test_png_roundtrip_and_decode_route():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(9, 14, 3), dtype=np.uint8)
    blob = M.encode_png(px)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, out = M.decode_png(blob)
    assert (w, h) == (14, 9)
    assert np.array_equal(out, px)
    media = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": ["image"],
                      "payload": pa.array([blob], pa.binary())})
    dec = M.DecodeMedia()(media).to_pandas().iloc[0]
    assert dec["decoded"] and (dec["width"], dec["height"]) == (14, 9)


def test_png_all_filters_and_colortypes():
    """Hand-built scanlines exercise filters Sub/Up/Average/Paeth and
    gray + RGBA color types."""
    import struct as st
    import zlib as z

    def png(color, nch, raw, w, h):
        ihdr = st.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + M._png_chunk(b"IHDR", ihdr)
                + M._png_chunk(b"IDAT", z.compress(raw))
                + M._png_chunk(b"IEND", b""))

    # 2x2 RGB with each row a different filter
    row0 = bytes([10, 20, 30, 40, 50, 60])
    # filter 1 (Sub): raw deltas; reconstructed: px= prev_pixel + delta
    raw = (b"\x01" + bytes([10, 20, 30, 5, 5, 5])
           + b"\x02" + bytes([1, 1, 1, 2, 2, 2]))     # filter 2 (Up)
    w, h, px = M.decode_png(png(2, 3, raw, 2, 2))
    assert np.array_equal(px[0, 0], [10, 20, 30])
    assert np.array_equal(px[0, 1], [15, 25, 35])      # Sub
    assert np.array_equal(px[1, 0], [11, 21, 31])      # Up
    assert np.array_equal(px[1, 1], [17, 27, 37])

    # filter 3 (Average) + 4 (Paeth) on a 2x2 gray image
    raw = (b"\x03" + bytes([100, 10]) + b"\x04" + bytes([1, 2]))
    w, h, px = M.decode_png(png(0, 1, raw, 2, 2))
    # row0: avg: p0=100+(0+0)//2=100; p1=10+(100+0)//2=60
    assert px[0, 0, 0] == 100 and px[0, 1, 0] == 60
    # row1 paeth: p0: a=0,b=100,c=0 -> pred=100 -> 101
    #             p1: a=101,b=60,c=100 -> p=61; closest is b(1)<a(40)? pa=40,pb=1,pc=39 -> b=60 -> 62
    assert px[1, 0, 0] == 101 and px[1, 1, 0] == 62
    # gray expanded to 3 channels
    assert px.shape == (2, 2, 3)

    # RGBA: alpha dropped
    raw = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 128])
    w, h, px = M.decode_png(png(6, 4, raw, 2, 1))
    assert np.array_equal(px[0, 0], [1, 2, 3])
    assert np.array_equal(px[0, 1], [4, 5, 6])


def test_png_resize():
    yy, xx = np.mgrid[0:20, 0:40]
    px = np.stack([xx % 256, yy % 256, (xx * yy) % 256],
                  axis=-1).astype(np.uint8)
    media = pa.table({"media_id": pa.array([1], pa.int64()),
                      "kind": ["image"],
                      "payload": pa.array([M.encode_png(px)], pa.binary())})
    out = M.ResizeImages(max_dim=20)(media).to_pandas().iloc[0]
    assert (out["width"], out["height"]) == (20, 10)
    w2, h2, small = M.decode_png(out["payload"])
    assert np.array_equal(small[0, 0], px[0, 0])
    assert np.array_equal(small[1, 1], px[2, 2])


def test_png_bmp_property_roundtrip():
    """Property: encode→decode is identity for arbitrary RGB images."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 40),
           seed=st.integers(0, 2**31 - 1))
    def check(w, h, seed):
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8)
        for enc, dec in ((M.encode_png, M.decode_png),
                         (M.encode_bmp, M.decode_bmp)):
            w2, h2, out = dec(enc(px))
            assert (w2, h2) == (w, h)
            assert np.array_equal(out, px)

    check()


def test_wav_property_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 5000), seed=st.integers(0, 2**31 - 1))
    def check(n, seed):
        sig = np.random.RandomState(seed).randint(
            -32768, 32768, size=n).astype(np.int16)
        rate, out = M.decode_wav(M.encode_wav(sig))
        assert np.array_equal(out, sig)

    check()


def test_resize_survives_corrupt_payloads():
    """A corrupt PNG (zlib.error from a bad IDAT, struct.error from a
    truncated header — neither is ValueError) must pass through as an
    unresized row, never kill the block."""
    import pyarrow as pa
    from pdfextract_ray.stages.multimodal import ResizeImages, encode_png
    import numpy as np

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    bad_idat = good[:40] + b"\x00" * (len(good) - 40)  # corrupt stream
    truncated = good[:20]
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["image"] * 3, pa.string()),
        "payload": pa.array([good, bad_idat, truncated], pa.binary()),
    })
    out = ResizeImages(max_dim=2)(t)
    assert out.num_rows == 3
    w = out["width"].to_pylist()
    assert w[0] == 2 and w[1] == 0 and w[2] == 0  # corrupt → pass-through
