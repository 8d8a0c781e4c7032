"""Multimodal columns: image / audio / video as opaque ``binary``
payloads with typed metadata, processed by actor-pool ``map_batches``
stages.

This is the engine's analog of the reference's image path (decode →
preprocess → re-encode, SURVEY.md S1/M2/M3,
src/ui/MainWindow.cpp:1363-1375, src/adapters/TesseractAdapter.cpp:95-111,
src/adapters/QwenAdapter.cpp:99-125) generalized to a training-data
pipeline: decode / resize / frame-sample / feature-extract.

Codec reality: this container has no image/audio libraries, so REAL
format decode (PNG/JPEG/WAV) is stubbed — ``decode_real_image`` raises
``NotImplementedError`` unless PIL is importable (import-try gate).
Everything else is real and tested: a deterministic fake codec ("XIMG" /
"XAUD" framed payloads) exercises the full Ray-side plumbing — binary
schema, batch sizing for multi-MB rows, actor signatures, in-band decode
errors, vectorized numpy kernels — exactly as a production codec would.

Scale notes: payload columns stay ``binary`` end-to-end (no pandas
conversion — it would copy every payload); batch sizes are small
(``MEDIA_BATCH_SIZE``) because a batch × concurrency of multi-MB rows
must fit each worker's heap; decode state (codec tables) pins in actor
``__init__``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# A media batch holds multi-MB payloads: keep batches small so
# batch × concurrency fits worker heaps (prompt: "large binary payloads
# need small batches").
MEDIA_BATCH_SIZE = 32

_XIMG_MAGIC = b"XIMG"
_XAUD_MAGIC = b"XAUD"
_XVID_MAGIC = b"XVID"


# --- deterministic fake codec -------------------------------------------


def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    """Framed deterministic image payload: header + u8 pixels derived
    from a seeded counter (a stand-in for PNG/JPEG bytes)."""
    header = _XIMG_MAGIC + struct.pack("<IIIq", width, height, channels, seed)
    n = width * height * channels
    rng = np.random.default_rng(seed)
    return header + rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()


def decode_fake_image(payload: bytes) -> np.ndarray:
    """(H, W, C) uint8 array; raises ValueError on a malformed frame
    (converted to an in-band error by the stage)."""
    if len(payload) < 24 or payload[:4] != _XIMG_MAGIC:
        raise ValueError("bad_magic")
    w, h, c, _seed = struct.unpack("<IIIq", payload[4:24])
    n = w * h * c
    body = payload[24:]
    if len(body) != n:
        raise ValueError("truncated")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    header = _XAUD_MAGIC + struct.pack("<IIq", sample_rate, n_samples, seed)
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 8192).astype(np.int16)
    return header + samples.tobytes()


def decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if len(payload) < 20 or payload[:4] != _XAUD_MAGIC:
        raise ValueError("bad_magic")
    sr, n, _seed = struct.unpack("<IIq", payload[4:20])
    body = payload[20:]
    if len(body) != n * 2:
        raise ValueError("truncated")
    return sr, np.frombuffer(body, dtype=np.int16)


def encode_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Concatenated grayscale frames behind one header."""
    header = _XVID_MAGIC + struct.pack("<IIIq", width, height, n_frames, seed)
    rng = np.random.default_rng(seed)
    return header + rng.integers(
        0, 256, size=width * height * n_frames, dtype=np.uint8
    ).tobytes()


def decode_fake_video_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Random access into one frame without materializing the rest."""
    if len(payload) < 24 or payload[:4] != _XVID_MAGIC:
        raise ValueError("bad_magic")
    w, h, nf, _seed = struct.unpack("<IIIq", payload[4:24])
    if not 0 <= frame_idx < nf:
        raise ValueError("frame_out_of_range")
    fsize = w * h
    off = 24 + frame_idx * fsize
    return np.frombuffer(payload[off : off + fsize], dtype=np.uint8).reshape(h, w)


def video_frame_count(payload: bytes) -> int:
    if len(payload) < 24 or payload[:4] != _XVID_MAGIC:
        raise ValueError("bad_magic")
    return struct.unpack("<IIIq", payload[4:24])[2]


def decode_real_image(payload: bytes) -> np.ndarray:
    """REAL-format decode (PNG/JPEG/...). STUB: the container ships no
    imaging library; gated behind an import-try as instructed."""
    try:
        import io

        from PIL import Image  # not installed in this environment
    except ImportError as exc:  # pragma: no cover - no PIL here
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not in this container); "
            "use the deterministic fake codec for tests"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


# --- kernels -------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the analog of the reference's
    integer upscale preprocess, TesseractAdapter.cpp:95-111)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]


# --- actor-pool stages ---------------------------------------------------


class ImageFeatureExtractor:
    """decode → (optional resize) → per-channel mean/std features.

    In-band errors (decode failures flow through ``success/error``
    columns, never exceptions — reference M1/D3 semantics)."""

    def __init__(self, resize_to: tuple[int, int] | None = None, use_real_codec: bool = False):
        # per-actor setup: codec selection frozen once
        self.resize_to = resize_to
        self.decode = decode_real_image if use_real_codec else decode_fake_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        success = [False] * n
        error = [""] * n
        widths = [0] * n
        heights = [0] * n
        means: list[list[float]] = [[]] * n
        stds: list[list[float]] = [[]] * n
        for i, p in enumerate(payloads):
            if p is None or len(p) == 0:
                error[i] = "empty_payload"
                continue
            try:
                img = self.decode(p)
            except (ValueError, OSError) as exc:
                # OSError covers the real codec's corrupt-payload errors
                # (PIL.UnidentifiedImageError subclasses OSError); the
                # environmental NotImplementedError (no PIL installed)
                # stays LOUD — a misconfigured codec must not be
                # silently recorded as per-row decode failures
                error[i] = f"decode_error: {exc}"
                continue
            if img.ndim == 2:  # grayscale real decode → one channel
                img = img[:, :, None]
            if img.shape[0] == 0 or img.shape[1] == 0:
                # a zero-area image decodes "successfully" but has no
                # pixels — mean/std would be NaN silently marked valid
                error[i] = "decode_error: zero-area image"
                continue
            if self.resize_to is not None:
                img = resize_nearest(img, *self.resize_to)
            success[i] = True
            heights[i], widths[i] = img.shape[0], img.shape[1]
            flat = img.reshape(-1, img.shape[2]).astype(np.float64)
            means[i] = [round(float(x), 6) for x in flat.mean(axis=0)]
            stds[i] = [round(float(x), 6) for x in flat.std(axis=0)]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "success": pa.array(success, pa.bool_()),
                "error": pa.array(error, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "chan_mean": pa.array(means, pa.list_(pa.float64())),
                "chan_std": pa.array(stds, pa.list_(pa.float64())),
            }
        )


class AudioFeatureExtractor:
    """decode → RMS + zero-crossing-rate features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        success = [False] * n
        error = [""] * n
        srs = [0] * n
        secs = [0.0] * n
        rms = [0.0] * n
        zcr = [0.0] * n
        for i, p in enumerate(payloads):
            if p is None or len(p) == 0:
                error[i] = "empty_payload"
                continue
            try:
                sr, samples = decode_fake_audio(p)
            except ValueError as exc:
                error[i] = f"decode_error: {exc}"
                continue
            if sr <= 0 or len(samples) == 0:
                # corrupt header: sr=0 divides by zero below; an empty
                # frame yields NaN features silently marked valid
                error[i] = "decode_error: zero sample rate or no samples"
                continue
            success[i] = True
            srs[i] = sr
            secs[i] = round(len(samples) / sr, 6)
            x = samples.astype(np.float64)
            rms[i] = round(float(np.sqrt(np.mean(x * x))), 6)
            zcr[i] = round(float(np.mean(np.abs(np.diff(np.sign(x))) > 0)), 6)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "success": pa.array(success, pa.bool_()),
                "error": pa.array(error, pa.string()),
                "sample_rate": pa.array(srs, pa.int32()),
                "seconds": pa.array(secs, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
            }
        )


class VideoFrameSampler:
    """Sample every k-th frame → one output row per sampled frame
    (flat_map-shaped: a row fans out; giant videos never materialize all
    frames at once thanks to random-access decode)."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table):
        ids_out: list = []
        frame_idx: list[int] = []
        mean_lum: list[float] = []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            if p is None or len(p) == 0:
                continue
            try:
                nf = video_frame_count(p)
                for f in range(0, nf, self.every_k):
                    # a truncated body passes the header-only frame
                    # count but fails the per-frame decode — skip the
                    # payload in band, never the whole batch
                    frame = decode_fake_video_frame(p, f)
                    ids_out.append(mid)
                    frame_idx.append(f)
                    mean_lum.append(round(float(frame.mean()), 6))
            except ValueError:
                continue
        yield pa.table(
            {
                # typed by the INPUT column: an all-bad batch would
                # otherwise emit a null-typed media_id block that fails
                # schema unification against other batches downstream
                "media_id": pa.array(ids_out, batch["media_id"].type),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "mean_lum": pa.array(mean_lum, pa.float64()),
            }
        )


# --- fixture: deterministic media table ---------------------------------


def media_table(n: int, seed: int = 42) -> pa.Table:
    """n rows cycling image/audio/video payloads + planted bad rows."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        ids.append(i)
        m = i % 10
        if m < 5:
            kinds.append("image")
            if m == 4:
                payloads.append(b"JUNK" + bytes(16))  # bad magic row
            else:
                payloads.append(encode_fake_image(32 + i % 64, 24 + i % 48, 3, seed * 100003 + i))
        elif m < 8:
            kinds.append("audio")
            payloads.append(encode_fake_audio(16000, 1600 + (i % 10) * 160, seed * 100003 + i))
        else:
            kinds.append("video")
            payloads.append(encode_fake_video(16, 12, 25 + i % 50, seed * 100003 + i))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
