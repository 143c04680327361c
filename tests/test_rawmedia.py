"""Real stdlib media decoders (ops/rawmedia.py) and the multimodal
stages' fake=False paths they enable: WAV PCM, 24-bit BMP, netpbm."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from agraph_ray.ops.rawmedia import (decode_bmp, decode_ppm, decode_wav,
                                     image_features, make_bmp, make_ppm,
                                     make_wav, resize_nearest,
                                     sniff_decode_image,
                                     wav_window_features)


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)          # 1 s of A440
    data = make_wav(sig, rate)
    x, r = decode_wav(data)
    assert r == rate and x.shape == (rate, 1)
    assert np.abs(x[:, 0] - sig).max() < 1e-3        # 16-bit quantization


def test_wav_window_features_distinguish_tone_from_silence():
    rate = 8000
    t = np.arange(2 * rate) / rate
    sig = np.concatenate([0.8 * np.sin(2 * np.pi * 440 * t[:rate]),
                          np.zeros(rate)])
    feats, dur = wav_window_features(make_wav(sig, rate), 1000, dim=16)
    assert feats.shape == (2, 16) and dur == 2000
    # window 0 (tone): high rms; window 1 (silence): ~0 rms
    assert feats[0, 0] > 0.5 and feats[1, 0] < 1e-3
    # a higher tone moves the spectral centroid up
    hi = wav_window_features(make_wav(
        0.8 * np.sin(2 * np.pi * 2000 * t[:rate]), rate), 1000, 16)[0]
    assert hi[0, 2] > feats[0, 2]


def test_bmp_roundtrip_and_padding():
    rng = np.random.default_rng(0)
    for w, h in [(5, 3), (4, 4), (7, 2)]:            # odd widths → padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(make_bmp(img)) == img).all()


def test_ppm_pgm_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert (decode_ppm(make_ppm(rgb)) == rgb).all()
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert (decode_ppm(make_ppm(gray)) == gray).all()
    # comment + whitespace variants in the header
    hdr_variant = b"P5\n# a comment\n 6 4 \n255\n" + gray.tobytes()
    assert (decode_ppm(hdr_variant) == gray).all()


def test_resize_nearest_semantics():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)[:, :, None] \
        .repeat(3, axis=2)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == img).all()               # exact 2x upsample
    down = resize_nearest(img, 2, 2)
    assert (down[:, :, 0] == [[0, 2], [8, 10]]).all()


def test_sniff_decode_raises_named_libs():
    # PNG now decodes for real; a torn PNG fails loudly, not silently
    with pytest.raises(ValueError):
        sniff_decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="PIL"):
        sniff_decode_image(b"\xff\xd8\xff\xe0....")   # JPEG needs PIL
    with pytest.raises(ValueError):
        sniff_decode_image(b"garbage")


def test_image_features_reflect_color():
    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 250
    f = image_features(make_bmp(red), 16)
    assert f.shape == (16,)
    assert f[0] > 0.9 and f[1] < 0.05 and f[2] < 0.05
    # flat image → zero luma std; histogram sums to 1
    assert f[3] < 1e-6
    assert abs(f[4:].sum() - 1.0) < 1e-5


def test_multimodal_stages_real_decode(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import (MEDIA_SCHEMA, chunk_audio,
                                           extract_media_features,
                                           resize_images)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    rate = 8000
    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(rate) / rate)
    rows = pa.Table.from_pylist([
        {"media_id": "i0", "kind": "image", "payload": make_bmp(img),
         "mime": "image/bmp", "width": 5, "height": 6,
         "duration_ms": -1},
        {"media_id": "a0", "kind": "audio", "payload": make_wav(sig, rate),
         "mime": "audio/wav", "width": -1, "height": -1,
         "duration_ms": 1000},
    ], schema=MEDIA_SCHEMA)
    ds = rd.from_arrow(rows)

    feats = {r["media_id"]: r["feature"] for r in
             extract_media_features(ds, fake=False).take_all()}
    assert len(feats["i0"]) == 16 and len(feats["a0"]) == 16
    assert feats["a0"][0] > 0.1                      # real rms of the tone

    resized = resize_images(ds, 3, 2, fake=False).take_all()
    out_img = [r for r in resized if r["media_id"] == "i0"][0]
    dec = decode_bmp(out_img["payload"])
    assert dec.shape == (2, 3, 3)
    assert out_img["width"] == 3 and out_img["height"] == 2

    wins = chunk_audio(ds, window_ms=500, fake=False).take_all()
    assert [w["window_idx"] for w in wins] == [0, 1]
    assert wins[0]["end_ms"] == 500 and wins[1]["end_ms"] == 1000
    assert wins[0]["feature"][0] > 0.1               # real window rms


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + scanline filters)
# ---------------------------------------------------------------------------

def test_png_roundtrip_filters():
    from agraph_ray.ops.rawmedia import decode_png, make_png
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for f in (0, 1, 2):
        assert (decode_png(make_png(img, filter_type=f)) == img).all(), f


def _ref_unfilter(raws, w, nch):
    """Independent straightforward per-pixel reference unfilter
    (RFC 2083 pseudocode transliterated) for cross-checking."""
    stride = w * nch
    prev = [0] * stride
    out = []
    for f, row in raws:
        cur = list(row)
        for x in range(stride):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 1:
                cur[x] = (cur[x] + a) & 0xFF
            elif f == 2:
                cur[x] = (cur[x] + b) & 0xFF
            elif f == 3:
                cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        out.append(cur)
        prev = cur
    return np.array(out, dtype=np.uint8).reshape(len(raws), w, nch)


def test_png_average_paeth_vs_reference_unfilter():
    import struct
    import zlib as _z

    from agraph_ray.ops.rawmedia import decode_png
    rng = np.random.default_rng(4)
    w, h, nch = 4, 3, 3
    raws = [(3, rng.integers(0, 256, size=w * nch, dtype=np.uint8)
             .tolist()),
            (4, rng.integers(0, 256, size=w * nch, dtype=np.uint8)
             .tolist()),
            (4, rng.integers(0, 256, size=w * nch, dtype=np.uint8)
             .tolist())]
    scan = b"".join(bytes([f]) + bytes(row) for f, row in raws)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", _z.compress(scan)) + chunk(b"IEND", b""))
    assert (decode_png(png) == _ref_unfilter(raws, w, nch)).all()


def test_png_palette_and_gray():
    import struct
    import zlib as _z

    from agraph_ray.ops.rawmedia import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))

    # 2x2 paletted: indices [[0,1],[1,0]] with a 2-color palette
    plte = bytes([255, 0, 0, 0, 0, 255])
    scan = bytes([0, 0, 1]) + bytes([0, 1, 0])
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", _z.compress(scan)) + chunk(b"IEND", b""))
    out = decode_png(png)
    assert (out[0, 0] == [255, 0, 0]).all()
    assert (out[0, 1] == [0, 0, 255]).all()
    # grayscale promotes to 3 channels
    scan = bytes([0, 7, 9]) + bytes([0, 200, 3])
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", _z.compress(scan)) + chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.shape == (2, 2, 3) and (out[1, 0] == [200] * 3).all()


def test_png_through_resize_stage(ray_session):
    import ray.data as rd

    from agraph_ray.ops.multimodal import MEDIA_SCHEMA, resize_images
    from agraph_ray.ops.rawmedia import decode_png, make_png
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    rows = pa.Table.from_pylist([
        {"media_id": "p0", "kind": "image", "payload": make_png(img),
         "mime": "image/png", "width": 4, "height": 6,
         "duration_ms": -1}], schema=MEDIA_SCHEMA)
    out = resize_images(rd.from_arrow(rows), 2, 3,
                        fake=False).take_all()[0]
    dec = decode_png(out["payload"])                 # stays PNG
    assert dec.shape == (3, 2, 3)


# ---------------------------------------------------------------------------
# vision captioning (ImageProcessor surface, mock vision transport)
# ---------------------------------------------------------------------------

def test_caption_images_mock_vision(ray_session):
    import ray.data as rd

    from agraph_ray.mock_llm import mock_chat_client
    from agraph_ray.ops.multimodal import MEDIA_SCHEMA, caption_images
    from agraph_ray.ops.rawmedia import make_bmp

    red = np.zeros((4, 6, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    rows = pa.Table.from_pylist([
        {"media_id": "i0", "kind": "image", "payload": make_bmp(red),
         "mime": "image/bmp", "width": 6, "height": 4,
         "duration_ms": -1},
        {"media_id": "j0", "kind": "image", "payload": b"\xff\xd8junk",
         "mime": "image/jpeg", "width": -1, "height": -1,
         "duration_ms": -1},
        {"media_id": "a0", "kind": "audio", "payload": b"riff...",
         "mime": "audio/wav", "width": -1, "height": -1,
         "duration_ms": 100},
    ], schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r["caption"] for r in caption_images(
        rd.from_arrow(rows),
        lambda: mock_chat_client(latency_sec=0.0),
        concurrency=1).take_all()}
    # the mock vision model really decoded the BMP: dims + colour
    assert "6x4" in out["i0"] and "rgb(200,0,0)" in out["i0"]
    # undecodable image still captions deterministically
    assert "undecodable" in out["j0"]
    # non-image rows pass through with null caption
    assert out["a0"] is None


def test_media_metadata_headers():
    from agraph_ray.ops.rawmedia import media_metadata, make_png
    img = np.zeros((4, 7, 3), dtype=np.uint8)
    assert media_metadata(make_bmp(img)) == \
        {"format": "bmp", "width": 7, "height": 4}
    assert media_metadata(make_png(img)) == \
        {"format": "png", "width": 7, "height": 4}
    assert media_metadata(make_ppm(img)) == \
        {"format": "ppm", "width": 7, "height": 4}
    wav = make_wav(np.zeros(4000), 8000)
    m = media_metadata(wav)
    assert m["format"] == "wav" and m["sample_rate"] == 8000
    assert m["duration_ms"] == 500 and m["channels"] == 1
    assert media_metadata(b"\xff\xd8x")["format"] == "jpeg"
    with pytest.raises(ValueError):
        media_metadata(b"nope")


def test_extract_media_metadata_stage(ray_session):
    import json

    import ray.data as rd
    from agraph_ray.ops.multimodal import (MEDIA_SCHEMA,
                                           extract_media_metadata)
    img = np.zeros((3, 5, 3), dtype=np.uint8)
    rows = pa.Table.from_pylist([
        {"media_id": "i", "kind": "image", "payload": make_bmp(img),
         "mime": "image/bmp", "width": 5, "height": 3,
         "duration_ms": -1},
        {"media_id": "bad", "kind": "image", "payload": b"xx",
         "mime": "", "width": -1, "height": -1, "duration_ms": -1},
    ], schema=MEDIA_SCHEMA)
    out = extract_media_metadata(rd.from_arrow(rows)).to_pandas()
    m0 = json.loads(out["metadata"][0])
    assert m0["width"] == 5 and m0["height"] == 3
    assert "error" in json.loads(out["metadata"][1])
    assert out["content_bytes"][0] > 0


def test_tiff_roundtrip_and_sniff():
    from agraph_ray.ops.rawmedia import decode_tiff, make_tiff
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = make_tiff(img)
    assert (decode_tiff(data) == img).all()
    assert (sniff_decode_image(data) == img).all()
    # big-endian gray variant, hand-built: 2x2 single strip
    import struct as _s
    gray = bytes([10, 20, 30, 40])
    ifd_off = 8 + len(gray)
    entries = [(256, 3, 1, 2 << 16), (257, 3, 1, 2 << 16),
               (259, 3, 1, 1 << 16), (273, 4, 1, 8),
               (277, 3, 1, 1 << 16), (279, 4, 1, len(gray))]
    # note: SHORT values in big-endian live in the HIGH half of the
    # 4-byte value slot — encode via << 16
    ifd = _s.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += _s.pack(">HHII", tag, typ, cnt, val)
    ifd += _s.pack(">I", 0)
    be = b"MM\x00*" + _s.pack(">I", ifd_off) + gray + ifd
    out = decode_tiff(be)
    assert out.shape == (2, 2, 3) and out[1, 1, 0] == 40
    # compressed TIFF names the missing library
    lzw = make_tiff(img).replace(
        _s.pack("<HHII", 259, 3, 1, 1), _s.pack("<HHII", 259, 3, 1, 5))
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_tiff(lzw)


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------

def test_gif_roundtrip_and_sniff():
    from agraph_ray.ops.rawmedia import decode_gif, make_gif
    rng = np.random.default_rng(8)
    # ≤256 distinct colours: quantize channels to 4 levels
    img = (rng.integers(0, 4, size=(6, 5, 3), dtype=np.uint8) * 80)
    data = make_gif(img)
    assert (decode_gif(data) == img).all()
    assert (sniff_decode_image(data) == img).all()
    from agraph_ray.ops.rawmedia import media_metadata
    assert media_metadata(data) == {"format": "gif", "width": 5,
                                    "height": 6}


def _ref_gif_lzw_encode(indices, min_code):
    """Independent REAL GIF-LZW encoder (growing dictionary, the
    standard algorithm) to cross-check the decoder's dictionary growth
    and KwKwK handling — make_gif deliberately never grows the table."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_codes = [clear]
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    widths = []
    cur = b""
    for v in indices:
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append(table[cur])
        widths.append(width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 >= (1 << width) and width < 12:
            width += 1
        cur = bytes([v])
    out_codes.append(table[cur])
    widths.append(width)
    out_codes.append(eoi)
    widths.append(width)
    # pack: first code (clear) uses min_code+1 bits
    widths = [min_code + 1] + widths
    acc = nbits = 0
    data = bytearray()
    for code, wd in zip(out_codes, widths):
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def test_gif_lzw_decoder_vs_real_encoder():
    from agraph_ray.ops.rawmedia import _gif_lzw_decode
    rng = np.random.default_rng(9)
    # repetitive sequence → dictionary growth + KwKwK cases
    seq = list(rng.integers(0, 4, size=50)) * 8 + [0, 0, 0, 0, 1, 0, 0]
    enc = _ref_gif_lzw_encode(seq, min_code=2)
    dec = _gif_lzw_decode(enc, 2, len(seq))
    assert list(dec) == [int(v) for v in seq]


def test_gif_rejects_garbage():
    from agraph_ray.ops.rawmedia import decode_gif
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_resize_bilinear_semantics():
    from agraph_ray.ops.rawmedia import resize_bilinear
    # constant image stays constant at any size
    const = np.full((5, 3, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(const, 9, 4) == 77).all()
    # a horizontal two-tone image halves to the midpoint at the seam
    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[:, 2:] = 200
    out = resize_bilinear(img, 2, 2)
    # pixel centers at x=0.5,2.5 of source → pure 0 and pure 200
    assert (out[:, 0] == 0).all() and (out[:, 1] == 200).all()
    out3 = resize_bilinear(img, 4, 1)        # same grid → identity cols
    assert list(out3[0, :, 0]) == [0, 0, 200, 200]
    # hand case: 1-D gradient [0, 100] upsampled to 4 → interpolated
    g = np.array([[0, 100]], dtype=np.uint8)[:, :, None].repeat(3, 2)
    up = resize_bilinear(g, 4, 1)[0, :, 0]
    assert list(up) == [0, 25, 75, 100]
    # grayscale (2-D) input round-trips shape
    assert resize_bilinear(np.zeros((4, 4), np.uint8), 2, 2).shape == (2, 2)


def test_resize_stage_bilinear(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import MEDIA_SCHEMA, resize_images
    from agraph_ray.ops.rawmedia import decode_bmp
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, 2:] = 200
    rows = pa.Table.from_pylist([
        {"media_id": "b", "kind": "image", "payload": make_bmp(img),
         "mime": "image/bmp", "width": 4, "height": 4,
         "duration_ms": -1}], schema=MEDIA_SCHEMA)
    out = resize_images(rd.from_arrow(rows), 2, 2, fake=False,
                        method="bilinear").take_all()[0]
    dec = decode_bmp(out["payload"])
    assert (dec[:, 0] == 0).all() and (dec[:, 1] == 200).all()
