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
    with pytest.raises(NotImplementedError, match="PIL"):
        sniff_decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="PIL"):
        sniff_decode_image(b"\xff\xd8\xff\xe0....")
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
