"""Pure-stdlib media codecs: PNG (zlib + public PNG spec) and WAV
(stdlib ``wave``).  No Pillow/pyav in this container, but these two
formats need nothing beyond the standard library, so the multimodal
operators get REAL decode/encode paths for them; other formats remain
behind the library-gated hook (operators/multimodal.py).

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+
alpha), 6 (RGBA), non-interlaced — the shapes a synthetic-data or
thumbnail pipeline produces.  All five scanline filters (None/Sub/Up/
Average/Paeth) are implemented per the spec (RFC 2083 §6).  Exotic
PNGs (16-bit, palette, interlaced) raise ``UnsupportedMediaError`` so
callers can fall back or mark the row failed — never silently wrong.

WAV support: PCM 16-bit via the stdlib ``wave`` module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Payload is valid media but outside the stdlib codec's envelope."""


# ---- PNG ---------------------------------------------------------------


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array [H, W, C]."""
    data = bytes(data)
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise UnsupportedMediaError(
            f"PNG depth={depth} color={color} interlace={interlace} "
            f"outside the stdlib envelope (8-bit gray/RGB/GA/RGBA, "
            f"non-interlaced)"
        )
    c = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(c, stride):
                line[i] = (int(line[i]) + int(line[i - c])) & 0xFF
        elif f == 2:  # Up
            line += prev  # uint8 wrap == mod-256 per spec
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, c)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 [H, W, C] (C in 1/2/3/4) -> PNG bytes (filter 0 rows)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize [H,W,C] -> [out_h,out_w,C] (pure numpy
    index maps — the thumbnailing kernel)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys[:, None], xs[None, :]]


def image_grid_features(pixels: np.ndarray, grid: int = 4) -> np.ndarray:
    """Mean-pooled grid luminance features, float32 [grid*grid] in
    [0,1] — the deterministic embed-a-thumbnail kernel."""
    lum = pixels[:, :, :3].mean(axis=2) if pixels.shape[2] >= 3 else (
        pixels[:, :, 0].astype(np.float64)
    )
    cell = resize_nearest(lum[:, :, None].astype(np.uint8), grid, grid)
    return (cell[:, :, 0].astype(np.float32) / 255.0).reshape(-1)


# ---- WAV ---------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, int16 samples [N, C])."""
    with wave.open(io.BytesIO(bytes(data)), "rb") as f:
        if f.getsampwidth() != 2:
            raise UnsupportedMediaError(
                f"WAV sampwidth={f.getsampwidth()} (only 16-bit PCM)"
            )
        rate, nch = f.getframerate(), f.getnchannels()
        frames = f.readframes(f.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return rate, nch, samples


def encode_wav(samples: np.ndarray, rate: int, n_channels: int = 1) -> bytes:
    """int16 samples [N] or [N, C] -> WAV bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def audio_energy_features(
    samples: np.ndarray, n_windows: int = 8
) -> np.ndarray:
    """Windowed RMS energy, float32 [n_windows] normalized to [0,1] —
    the deterministic audio-feature kernel (mono-mixed first)."""
    mono = samples.astype(np.float64).mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(n_windows, dtype=np.float32)
    edges = (np.arange(n_windows + 1) * n) // n_windows
    out = np.empty(n_windows, dtype=np.float32)
    for i in range(n_windows):
        seg = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt((seg**2).mean()) / 32768.0
    return out
