"""Stdlib media codecs: PNG round-trip + all five scanline filters
(RFC 2083 §6) against an independent filter-side encoder, WAV
round-trip, resize/feature kernels."""

import struct
import zlib

import numpy as np
import pytest

from deepie_spark.functions import codecs as C


def _encode_png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG writer applying the given per-row filter cycle —
    exercises decode paths encode_png (always filter 0) never hits."""
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        enc = line.copy()
        if f == 1:
            for i in range(w * c - 1, c - 1, -1):
                enc[i] = (line[i] - line[i - c]) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            for i in range(w * c):
                a = line[i - c] if i >= c else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(w * c):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(c):
    rng = np.random.default_rng(42 + c)
    px = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
    assert (C.decode_png(C.encode_png(px)) == px).all()


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_every_scanline_filter(filters):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert (C.decode_png(_encode_png_with_filters(px, filters)) == px).all()


def test_png_unsupported_depth_raises():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(C.encode_png(px))
    data[24] = 16  # IHDR bit depth byte -> 16-bit
    with pytest.raises(C.UnsupportedMediaError):
        C.decode_png(bytes(data))


def test_png_bad_signature_raises():
    with pytest.raises(ValueError):
        C.decode_png(b"not a png at all")


def test_wav_roundtrip_and_features():
    s = (np.sin(np.arange(8000) / 20) * 20000).astype(np.int16)
    rate, nch, got = C.decode_wav(C.encode_wav(s, 16000, 1))
    assert rate == 16000 and nch == 1 and (got[:, 0] == s).all()
    feats = C.audio_energy_features(got, n_windows=8)
    assert feats.shape == (8,) and (feats > 0).all() and (feats <= 1).all()


def test_wav_stereo_roundtrip():
    s = np.stack(
        [np.arange(100, dtype=np.int16), -np.arange(100, dtype=np.int16)],
        axis=1,
    )
    rate, nch, got = C.decode_wav(C.encode_wav(s, 8000, 2))
    assert nch == 2 and (got == s).all()


def test_resize_nearest_and_grid_features():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :4] = 255  # bright top-left quadrant
    small = C.resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    f = C.image_grid_features(px, grid=2)
    assert f.shape == (4,) and f[0] == 1.0 and f[3] == 0.0
