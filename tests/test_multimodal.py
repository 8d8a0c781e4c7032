"""Multimodal stages: fake codecs, actor-pool plumbing, in-band decode
errors, frame sampling (SURVEY.md S1/M2/M3 generalized)."""

import numpy as np
import pytest

from xs_vlm_ocr_ray.stages.multimodal import (
    AudioFeatureExtractor,
    ImageFeatureExtractor,
    MEDIA_BATCH_SIZE,
    VideoFrameSampler,
    decode_fake_audio,
    decode_fake_image,
    decode_fake_video_frame,
    decode_real_image,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    media_table,
    resize_nearest,
    video_frame_count,
)


def test_fake_image_roundtrip():
    p = encode_fake_image(20, 10, 3, seed=7)
    img = decode_fake_image(p)
    assert img.shape == (10, 20, 3)
    # deterministic across calls
    assert np.array_equal(img, decode_fake_image(encode_fake_image(20, 10, 3, seed=7)))
    with pytest.raises(ValueError):
        decode_fake_image(b"JUNK" + bytes(30))
    with pytest.raises(ValueError):
        decode_fake_image(p[:-5])  # truncated


def test_fake_audio_video_roundtrip():
    sr, samples = decode_fake_audio(encode_fake_audio(16000, 320, seed=1))
    assert sr == 16000 and len(samples) == 320
    v = encode_fake_video(8, 6, 5, seed=2)
    assert video_frame_count(v) == 5
    f0 = decode_fake_video_frame(v, 0)
    f4 = decode_fake_video_frame(v, 4)
    assert f0.shape == (6, 8) and not np.array_equal(f0, f4)
    with pytest.raises(ValueError):
        decode_fake_video_frame(v, 5)


import importlib.util

_HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="PIL installed — the real-codec path test runs instead")
def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real_image(b"\x89PNG\r\n\x1a\n....")


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_real_codec_image_features(ray_session):
    """PIL-present branch: the production codec path end-to-end through
    the actor-pool stage — real PNG decode (RGB + grayscale), resize,
    features, corrupt payload in-band. Green wherever PIL exists,
    skipped cleanly without it."""
    import io

    import pyarrow as pa
    from PIL import Image

    import ray.data as rd

    def png_bytes(mode: str, size=(6, 4)) -> bytes:
        img = Image.new(mode, size)
        px = img.load()
        for y in range(size[1]):
            for x in range(size[0]):
                v = (x * 40 + y * 10) % 256
                px[x, y] = (v, 255 - v, v // 2) if mode == "RGB" else v
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rgb, gray = png_bytes("RGB"), png_bytes("L")
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([rgb, gray, b"not a png"], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            ImageFeatureExtractor,
            fn_constructor_kwargs={"use_real_codec": True},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert list(out["success"]) == [True, True, False]
    assert out["error"][2].startswith("decode_error")
    assert (out["width"][:2] == 6).all() and (out["height"][:2] == 4).all()
    # features match a direct decode
    direct = np.asarray(Image.open(io.BytesIO(rgb))).reshape(-1, 3).astype(np.float64)
    assert out["chan_mean"][0] == pytest.approx(direct.mean(axis=0), abs=1e-6)
    assert len(out["chan_mean"][1]) == 1  # grayscale → one channel


def test_resize_nearest():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    out = resize_nearest(img, 3, 2)
    assert out.shape == (2, 3, 1)
    assert out[0, 0, 0] == img[0, 0, 0]


def test_image_features_in_band_errors(ray_session):
    import ray.data as rd

    t = media_table(50)
    imgs = t.filter(__import__("pyarrow").compute.equal(t["kind"], "image"))
    ds = rd.from_arrow(imgs)
    out = ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"resize_to": (16, 12)},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
    ).to_pandas()
    assert len(out) == len(imgs)
    bad = out[~out["success"]]
    assert len(bad) >= 1  # the planted bad-magic rows
    assert bad["error"].str.startswith("decode_error").all()
    ok = out[out["success"]]
    assert (ok["width"] == 16).all() and (ok["height"] == 12).all()
    assert ok["chan_mean"].map(len).eq(3).all()


def test_audio_features(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    t = media_table(50)
    auds = t.filter(pc.equal(t["kind"], "audio"))
    ds = rd.from_arrow(auds)
    out = ds.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    assert out["success"].all()
    assert (out["sample_rate"] == 16000).all()
    assert (out["rms"] > 0).all()
    assert out["seconds"].between(0.09, 0.2).all()


def test_video_frame_sampling(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    t = media_table(50)
    vids = t.filter(pc.equal(t["kind"], "video"))
    ds = rd.from_arrow(vids)
    out = ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_k": 10},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=2,
    ).to_pandas()
    # every video contributes ceil(n_frames/10) rows
    want = 0
    for mid, p in zip(vids["media_id"].to_pylist(), vids["payload"].to_pylist()):
        want += -(-video_frame_count(p) // 10)
    assert len(out) == want
    assert (out["frame_idx"] % 10 == 0).all()
    assert out["mean_lum"].between(0, 255).all()


def test_media_table_deterministic():
    a = media_table(30)
    b = media_table(30)
    assert a.equals(b)


def test_corrupt_media_stays_in_band(ray_session):
    """sr=0 audio, zero-area images, truncated videos: decode oddities
    record in-band errors (or skip the payload) — never an uncaught
    ZeroDivisionError/ValueError killing the batch, never NaN features
    marked success=True."""
    import struct

    import numpy as np
    import pyarrow as pa

    from xs_vlm_ocr_ray.stages.multimodal import (
        AudioFeatureExtractor,
        ImageFeatureExtractor,
        VideoFrameSampler,
        encode_fake_video,
    )

    bad_audio = b"XAUD" + struct.pack("<IIq", 0, 4, 1) + bytes(8)
    out = AudioFeatureExtractor()(
        pa.table({"media_id": [1], "payload": pa.array([bad_audio], pa.binary())})
    )
    assert out["success"].to_pylist() == [False]
    assert "zero sample rate" in out["error"][0].as_py()

    zero_img = b"XIMG" + struct.pack("<IIIq", 0, 5, 3, 1)
    out = ImageFeatureExtractor()(
        pa.table({"media_id": [1], "payload": pa.array([zero_img], pa.binary())})
    )
    assert out["success"].to_pylist() == [False]
    assert not any(np.isnan(x) for x in (out["chan_mean"][0].as_py() or [0.0]))

    good = encode_fake_video(16, 12, 25, seed=3)
    truncated = good[: len(good) // 2]
    tables = list(
        VideoFrameSampler(every_k=10)(
            pa.table(
                {"media_id": pa.array([7, 8], pa.int64()),
                 "payload": pa.array([truncated, b"JUNK"], pa.binary())}
            )
        )
    )
    assert tables[0].schema.field("media_id").type == pa.int64()  # typed, even all-bad
