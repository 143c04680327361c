"""Real stdlib decoders for UNCOMPRESSED media formats.

The sandbox has no PIL/ffmpeg/librosa, but these formats need none of
them: WAV is RIFF-framed PCM (stdlib ``wave`` + numpy reinterpret),
BMP is a fixed header + padded BGR rows, netpbm P5/P6 is an ASCII
header + raw bytes, PNG is zlib-compressed scanlines behind five
well-specified row filters (RFC 2083) — and zlib IS stdlib — TIFF
(uncompressed) is an IFD + strips, and GIF's LZW patents expired in
2004 so its variable-width decoder is plain code. These decoders make
the multimodal stages' ``fake=False`` path REAL for those formats;
the remaining codecs (jpeg/webp/mp3/mp4) still raise
NotImplementedError at the same boundary, naming the library to plug
in.

Everything is numpy-vectorized after the header parse; per-payload
Python work is O(header), not O(pixels).

Builders (``make_wav`` / ``make_bmp`` / ``make_ppm``) are the write
side of the same subset, used by tests and media fixture generators.
"""

from __future__ import annotations

import struct
import zlib
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
# PNG (zlib IS stdlib: IDAT inflate + per-row scanline unfilter)
# RFC 2083; 8-bit gray / gray+alpha / RGB / RGBA / palette, no interlace
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4:pos + 8]
        yield typ, payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln                      # len + type + data + crc
        if typ == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(payload: bytes) -> np.ndarray:
    """→ (h, w, 3) uint8 RGB (alpha dropped, palette resolved, gray
    promoted). 8-bit depth, non-interlaced. The filter pass is
    row-sequential (the format's data dependency); rows with filter
    None/Up are vectorized, Sub is a cumsum, Average/Paeth fall back to
    the per-pixel recurrence."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (missing signature)")
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} interlace={interlace} needs PIL")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise ValueError(f"bad PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += stride + 1
        if f == 0:
            pass
        elif f == 1:                        # Sub: cumsum per channel
            row = np.cumsum(row.reshape(w, nch), axis=0,
                            dtype=np.uint32).astype(np.uint8) \
                .reshape(stride)
        elif f == 2:                        # Up
            row = (row + prev).astype(np.uint8)
        elif f in (3, 4):                   # Average / Paeth: recurrence
            r = row.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = int(r[x - nch]) if x >= nch else 0
                b = int(pv[x])
                if f == 3:
                    r[x] = (r[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(pv[x - nch]) if x >= nch else 0
                    r[x] = (r[x] + _paeth(a, b, c)) & 0xFF
            row = r.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = row
        prev = row
    px = out.reshape(h, w, nch)
    if color_type == 3:                     # palette
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[px[:, :, 0]]
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:                            # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]                     # RGB / RGBA → RGB


def make_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (single IDAT, one filter type for
    every row — 0/1/2 supported here; the decoder handles all five)."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    lines = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = a[y].reshape(-1)
        if filter_type == 0:
            enc = row
        elif filter_type == 1:              # Sub
            enc = (row.astype(np.int16)
                   - np.concatenate([[0, 0, 0], row[:-3]])) % 256
        elif filter_type == 2:              # Up
            enc = (row.astype(np.int16) - prev) % 256
        else:
            raise ValueError("encoder supports filter 0/1/2")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


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
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode requires PIL — plug in here")
    raise ValueError(
        "unrecognized image payload (want BMP, netpbm, PNG, TIFF or GIF)")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy fancy-indexing."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * (h / height)).astype(int), h - 1)
    xs = np.minimum((np.arange(width) * (w / width)).astype(int), w - 1)
    return img[ys][:, xs]


def resize_bilinear(img: np.ndarray, width: int,
                    height: int) -> np.ndarray:
    """Bilinear resize (align-corners=False, pixel-center sampling —
    the PIL/torch convention), fully vectorized."""
    a = np.asarray(img, dtype=np.float32)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w = a.shape[:2]
    y = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    x = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(y).astype(int)
    x0 = np.floor(x).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (y - y0)[:, None, None]
    fx = (x - x0)[None, :, None]
    out = (a[y0][:, x0] * (1 - fy) * (1 - fx)
           + a[y0][:, x1] * (1 - fy) * fx
           + a[y1][:, x0] * fy * (1 - fx)
           + a[y1][:, x1] * fy * fx)
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


# ---------------------------------------------------------------------------
# GIF (87a/89a, LZW — patent-expired, pure-python decoder)
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytes:
    """GIF variable-width LZW → index bytes."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dict_size = eoi + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                dict_size = eoi + 1
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if prev is None:
                entry = table[code]
            elif code < dict_size:
                entry = table[code]
                table.append(prev + entry[:1])
                dict_size += 1
            else:                          # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                dict_size += 1
            out.extend(entry)
            prev = entry
            if dict_size >= (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (h, w, 3) uint8 RGB (interlace
    handled; transparency flattened onto the palette colour)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                     # image descriptor
            _l, _t, iw, ih, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                   offset=pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without colour table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos]:
                ln = payload[pos]
                lzw.extend(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code, iw * ih),
                dtype=np.uint8)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            grid = idx.reshape(ih, iw)
            if iflags & 0x40:               # interlaced: 4-pass order
                de = np.empty_like(grid)
                rows = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                        + list(range(2, ih, 4)) + list(range(1, ih, 2)))
                de[rows] = grid
                grid = de
            return ct[np.minimum(grid, len(ct) - 1)]
        elif b == 0x3B:                     # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def make_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colours → GIF89a bytes.
    Uses the classic uncompressed-LZW trick (a Clear code before every
    pixel code keeps the code width fixed) — valid LZW, zero
    compression, trivial to emit."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("make_gif supports ≤256 distinct colours")
    depth = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    n_colors = 1 << depth
    pal = np.zeros((n_colors, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    min_code = depth
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in inverse:
        emit(int(v))
        emit(clear)                          # keep the table empty
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (uncompressed, 8-bit gray/RGB, both byte orders)
# ---------------------------------------------------------------------------

_TIFF_TAGS = {256: "width", 257: "height", 258: "bits", 259: "compression",
              273: "strip_offsets", 277: "spp", 278: "rows_per_strip",
              279: "strip_counts"}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def decode_tiff(payload: bytes) -> np.ndarray:
    """→ (h, w, 3) uint8 RGB (gray promoted). Uncompressed 8-bit only;
    LZW/JPEG-in-TIFF raise NotImplementedError naming PIL."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order magic)")
    ifd_off = struct.unpack_from(e + "I", payload, 4)[0]
    n = struct.unpack_from(e + "H", payload, ifd_off)[0]
    tags: dict = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, off)
        if tag not in _TIFF_TAGS:
            continue
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if size * cnt <= 4:
            vals = struct.unpack_from(e + fmt * cnt, payload, off + 8)
        else:
            voff = struct.unpack_from(e + "I", payload, off + 8)[0]
            vals = struct.unpack_from(e + fmt * cnt, payload, voff)
        tags[_TIFF_TAGS[tag]] = list(vals)
    w = tags["width"][0]
    h = tags["height"][0]
    comp = tags.get("compression", [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} requires PIL — plug in here")
    spp = tags.get("spp", [1])[0]
    bits = tags.get("bits", [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError("non-8-bit TIFF requires PIL")
    data = b"".join(
        payload[o:o + c] for o, c in zip(tags["strip_offsets"],
                                         tags["strip_counts"]))
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * spp)
    img = arr.reshape(h, w, spp)
    if spp == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def make_tiff(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → little-endian uncompressed TIFF, one
    strip."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    pix = a.tobytes()
    # layout: header(8) + pixel data + bits array(6) + IFD
    pix_off = 8
    bits_off = pix_off + len(pix)
    ifd_off = bits_off + 6
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, bits_off),
        (259, 3, 1, 1), (262, 3, 1, 2),           # photometric RGB
        (273, 4, 1, pix_off), (277, 3, 1, 3),
        (278, 3, 1, h), (279, 4, 1, len(pix)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)                   # no next IFD
    return (b"II*\x00" + struct.pack("<I", ifd_off) + pix
            + struct.pack("<HHH", 8, 8, 8) + ifd)


def media_metadata(payload: bytes) -> dict:
    """Header-only media metadata (no pixel/sample decode): format,
    dimensions for images, rate/channels/duration for WAV — the
    ImageProcessor.extract_metadata analogue for row payloads
    (image_processor.py:465-530 reports format/size/mode)."""
    p = payload or b""
    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack_from("<ii", p, 18)
        return {"format": "bmp", "width": int(w), "height": abs(int(h))}
    if p[:8] == _PNG_MAGIC and len(p) >= 24:
        w, h = struct.unpack_from(">II", p, 16)
        return {"format": "png", "width": int(w), "height": int(h)}
    if p[:2] in (b"P5", b"P6"):
        img_meta = {"format": "ppm" if p[:2] == b"P6" else "pgm"}
        try:
            img = decode_ppm(p)
            img_meta["height"], img_meta["width"] = img.shape[:2]
        except (ValueError, IndexError):
            img_meta["error"] = "malformed netpbm header"
        return img_meta
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        import wave
        with wave.open(BytesIO(p)) as w:
            rate = w.getframerate()
            n = w.getnframes()
            return {"format": "wav", "sample_rate": rate,
                    "channels": w.getnchannels(),
                    "sample_width": w.getsampwidth(),
                    "duration_ms": int(round(n * 1000.0 / rate))
                    if rate else 0}
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            img = decode_tiff(p)
            return {"format": "tiff", "width": img.shape[1],
                    "height": img.shape[0]}
        except NotImplementedError:
            return {"format": "tiff", "note": "compressed; needs PIL"}
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack_from("<HH", p, 6)
        return {"format": "gif", "width": int(w), "height": int(h)}
    if p[:2] == b"\xff\xd8":
        return {"format": "jpeg", "note": "dimensions need PIL"}
    raise ValueError("unrecognized media payload")


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
