"""Real stdlib decoders for UNCOMPRESSED media formats.

The sandbox has no PIL/ffmpeg/librosa, but the raw interchange formats
need none of them: WAV is RIFF-framed PCM (stdlib ``wave`` + numpy
reinterpret), BMP is a fixed header + padded BGR rows, and netpbm
P5/P6 is an ASCII header + raw bytes. These decoders make the
multimodal stages' ``fake=False`` path REAL for those formats — the
compressed ones (jpeg/png/mp3/mp4) still raise NotImplementedError at
the same boundary, naming the library to plug in.

Everything is numpy-vectorized after the header parse; per-payload
Python work is O(header), not O(pixels).

Builders (``make_wav`` / ``make_bmp`` / ``make_ppm``) are the write
side of the same subset, used by tests and media fixture generators.
"""

from __future__ import annotations

import struct
from io import BytesIO
from typing import Tuple

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """→ (samples float32 in [-1, 1] of shape (n, channels), rate).
    8/16/32-bit integer PCM; anything else raises ValueError."""
    import wave
    with wave.open(BytesIO(payload)) as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:                       # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return x.reshape(-1, nch), rate


def make_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float array in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    import wave
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_window_features(payload: bytes, window_ms: int,
                        dim: int = 16) -> Tuple[np.ndarray, int]:
    """Real per-window audio features from PCM: per window of
    ``window_ms``, a ``dim``-vector = [rms, zero-crossing rate,
    spectral centroid (normalized), (dim-3) log-magnitude bands] —
    the classic cheap audio fingerprint. → (features (n_win, dim),
    duration_ms)."""
    x, rate = decode_wav(payload)
    mono = x.mean(axis=1)
    n = len(mono)
    duration_ms = int(round(n * 1000.0 / rate)) if rate else 0
    win = max(1, int(rate * window_ms / 1000.0))
    n_win = max(1, (n + win - 1) // win)
    pad = np.zeros(n_win * win, dtype=np.float32)
    pad[:n] = mono
    frames = pad.reshape(n_win, win)
    rms = np.sqrt((frames ** 2).mean(axis=1))
    zcr = (np.abs(np.diff(np.signbit(frames), axis=1)).sum(axis=1)
           / max(1, win - 1)).astype(np.float32)
    spec = np.abs(np.fft.rfft(frames, axis=1))       # (n_win, win//2+1)
    freqs = np.fft.rfftfreq(win, d=1.0 / rate) if rate else \
        np.arange(spec.shape[1], dtype=np.float64)
    tot = spec.sum(axis=1)
    tot[tot == 0] = 1.0
    centroid = (spec * freqs[None, :]).sum(axis=1) / tot
    centroid = centroid / max(freqs[-1], 1.0)        # → [0, 1]
    n_bands = dim - 3
    # log-spaced band edges over the magnitude spectrum
    edges = np.unique(np.geomspace(1, spec.shape[1],
                                   n_bands + 1).astype(int))
    bands = np.zeros((n_win, n_bands), dtype=np.float32)
    for b in range(min(n_bands, len(edges) - 1)):
        bands[:, b] = np.log1p(
            spec[:, edges[b]:edges[b + 1]].sum(axis=1))
    feats = np.concatenate(
        [rms[:, None], zcr[:, None], centroid[:, None].astype(np.float32),
         bands], axis=1).astype(np.float32)
    return feats, duration_ms


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """→ (h, w, 3) uint8 RGB. 24-bit uncompressed only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression}) — plug PIL in for the rest")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = arr.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]                       # BGR → RGB
    return rgb[::-1] if flipped else rgb


def make_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)   # RGB→BGR, flip
    pixel = rows.tobytes()
    data_off = 14 + 40
    size = data_off + len(pixel)
    head = (b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(pixel), 2835, 2835, 0, 0))
    return head + pixel


# ---------------------------------------------------------------------------
# netpbm (P5 grayscale / P6 RGB, binary, maxval <= 255)
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8; P5 → (h, w) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6) payload")
    # header: magic, whitespace/comments, width, height, maxval, one ws
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1                                      # single ws after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                        offset=pos)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def make_ppm(img: np.ndarray) -> bytes:
    """(h, w[, 3]) uint8 → P5/P6 bytes."""
    a = np.asarray(img, dtype=np.uint8)
    magic = b"P6" if a.ndim == 3 else b"P5"
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


# ---------------------------------------------------------------------------
# decode dispatch + resize kernel
# ---------------------------------------------------------------------------


def sniff_decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffed decode → (h, w, 3) uint8 RGB (grayscale promoted).
    Compressed formats raise NotImplementedError naming the library."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        img = decode_ppm(payload)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("PNG decode requires PIL — plug in here")
    if payload[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode requires PIL — plug in here")
    raise ValueError("unrecognized image payload (want BMP or netpbm)")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy fancy-indexing."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * (h / height)).astype(int), h - 1)
    xs = np.minimum((np.arange(width) * (w / width)).astype(int), w - 1)
    return img[ys][:, xs]


def image_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Real cheap image descriptor: [mean R, G, B, luma std,
    (dim-4)-bin luma histogram] — enough for near-dup / brightness
    filters without a model."""
    img = sniff_decode_image(payload).astype(np.float32)
    luma = img.mean(axis=2)
    hist, _ = np.histogram(luma, bins=dim - 4, range=(0, 255))
    total = max(1, luma.size)
    return np.concatenate([
        img.reshape(-1, 3).mean(axis=0) / 255.0,
        [float(luma.std()) / 255.0],
        hist.astype(np.float32) / total]).astype(np.float32)
