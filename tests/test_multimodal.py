"""Multimodal plumbing: binary media columns through actor-pool stages
(decode kernels stubbed — the schemas, batching, expansion and
determinism are the real contract under test)."""

import pytest


def test_media_features_deterministic(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import extract_media_features, synth_media
    ds = rd.from_arrow(synth_media(n=12, seed=5))
    a = {r["media_id"]: r["feature"]
         for r in extract_media_features(ds, fake=True).take_all()}
    b = {r["media_id"]: r["feature"]
         for r in extract_media_features(ds, fake=True).take_all()}
    assert a == b and len(a) == 12
    assert all(len(v) == 16 for v in a.values())


def test_resize_images_updates_dims_and_payload(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import resize_images, synth_media
    src = synth_media(n=9, seed=5)
    out = {r["media_id"]: r for r in
           resize_images(rd.from_arrow(src), 32, 32, fake=True).take_all()}
    assert len(out) == 9
    for orig in src.to_pylist():
        r = out[orig["media_id"]]
        if orig["kind"] == "image":
            assert (r["width"], r["height"]) == (32, 32)
            assert len(r["payload"]) == 32 * 32 // 64
            assert r["payload"] != orig["payload"]
        else:   # non-images pass through untouched
            assert r["payload"] == orig["payload"]
            assert r["width"] == orig["width"]


def test_video_frame_sampling(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import sample_video_frames, synth_media
    src = synth_media(n=9, seed=5)     # 3 videos, duration 1000ms each
    frames = sample_video_frames(rd.from_arrow(src), every_ms=250,
                                 fake=True).take_all()
    vids = {r["media_id"] for r in src.to_pylist() if r["kind"] == "video"}
    assert {f["media_id"] for f in frames} == vids
    per = {}
    for f in frames:
        per.setdefault(f["media_id"], []).append((f["frame_idx"], f["ts_ms"]))
    for mid, fr in per.items():
        assert sorted(fr) == [(0, 0), (1, 250), (2, 500), (3, 750)]
    payloads = {f["payload"] for f in frames}
    assert len(payloads) == len(frames)   # distinct frame payloads


def test_real_decode_boundaries(ray_session):
    """fake=False is REAL for uncompressed formats (test_rawmedia.py);
    compressed codecs raise NotImplementedError naming the library,
    garbage raises ValueError — never a silent wrong answer."""
    from agraph_ray.ops.multimodal import (MediaFeatureExtractor,
                                           MediaResizer, VideoFrameSampler)
    jpeg = b"\xff\xd8\xff\xe0...."
    with pytest.raises(NotImplementedError, match="PIL"):
        MediaFeatureExtractor(fake=False)._decode_and_embed(jpeg, "image")
    with pytest.raises(ValueError):
        MediaFeatureExtractor(fake=False)._decode_and_embed(b"x", "image")
    with pytest.raises(NotImplementedError, match="PIL"):
        MediaResizer(8, 8, fake=False)._resize(jpeg)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        VideoFrameSampler(fake=False)._frame(b"x", 0)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MediaFeatureExtractor(fake=False)._decode_and_embed(b"x", "video")


def test_audio_chunker_windows(ray_session):
    import ray.data as rd
    from agraph_ray.ops.multimodal import AudioChunker, chunk_audio, synth_media
    ds = rd.from_arrow(synth_media(n=30, seed=5))
    out = chunk_audio(ds, window_ms=300, concurrency=2).to_pandas()
    # only audio rows expand; 1000ms / 300ms → 4 windows each
    n_audio = sum(1 for i in range(30) if i % 3 == 1)
    assert len(out) == 4 * n_audio
    assert set(out["window_idx"]) == {0, 1, 2, 3}
    last = out[out["window_idx"] == 3]
    assert (last["end_ms"] == 1000).all()      # clamped to duration
    assert (out["feature"].str.len() == 16).all()
    # deterministic across runs
    out2 = chunk_audio(ds, window_ms=300, concurrency=2).to_pandas()
    a = out.sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    b = out2.sort_values(["media_id", "window_idx"]).reset_index(drop=True)
    assert (a["feature"].map(tuple) == b["feature"].map(tuple)).all()
    # fake=False really decodes WAV (test_rawmedia.py); a non-WAV
    # payload fails loudly at the wave parser, never silently
    import pytest
    with pytest.raises(Exception):
        AudioChunker(fake=False)._payload_windows(b"x", 0)
