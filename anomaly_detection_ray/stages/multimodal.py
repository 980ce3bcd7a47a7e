"""Multimodal binary-column stages.

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as actor-pool
map_batches stages with SMALL batch sizes (payloads dominate block size).

Audio decode is REAL (stdlib WAV, stages/checks.FidelityCheck). Image
decode is REAL for PNG (``image.py``) and baseline JPEG (``jpeg.py``).
WebP and video codecs are not available in this container, so those
decoders are STUBS behind ``NotImplementedError`` with a deterministic
fake mode for testing the Ray-side plumbing (schema, batch size, actor
signature, output layout) — clearly marked per the build instructions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import audio
from .sizing import pool_size

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    pass


class AudioFeatures:
    """Actor-pool stage: WAV binary -> (rms, peak, duration_s, n_samples).
    Real decode via the stdlib codec; per-clip numpy work."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.bytes_col].to_pylist()
        n = len(payloads)
        rms = np.full(n, np.nan)
        peak = np.full(n, np.nan)
        dur_s = np.full(n, np.nan)
        n_samp = np.zeros(n, dtype=np.int64)
        for i, b in enumerate(payloads):
            if not b:
                continue
            sig, sr = audio.decode_wav_lenient(b)
            if sig is None or sr in (None, 0):
                continue
            rms[i] = float(np.sqrt(np.mean(sig**2))) if len(sig) else 0.0
            peak[i] = float(np.max(np.abs(sig))) if len(sig) else 0.0
            dur_s[i] = len(sig) / sr
            n_samp[i] = len(sig)
        return (t.append_column("rms", pa.array(rms))
                 .append_column("peak", pa.array(peak))
                 .append_column("audio_dur_s", pa.array(dur_s))
                 .append_column("n_samples", pa.array(n_samp)))


class ImageDecode:
    """Actor-pool stage: image binary -> (height, width, channels,
    mean_luma) + optional nearest-neighbor resize stats.

    REAL for PNG (stdlib codec in ``image.py``: 8-bit gray / RGB / RGBA /
    palette, all five scanline filters), for baseline JPEG (``jpeg.py``:
    SOF0 grayscale/YCbCr at 4:4:4 / 4:2:2 / 4:2:0, stream DQT/DHT tables,
    restart markers) and for lossless WebP (``webp.py``: full VP8L —
    transforms, color cache, meta prefix groups, LZ77). Lossy (VP8) WebP
    and unknown magic raise NotImplementedError (or, with
    ``fake="deterministic"``, fall back to crc-derived dimensions to keep
    exercising the plumbing).
    """

    def __init__(self, bytes_col: str = "image", fake: str | None = None,
                 resize_to: tuple[int, int] | None = None):
        self.bytes_col = bytes_col
        self.fake = fake
        self.resize_to = resize_to

    def __call__(self, t: pa.Table) -> pa.Table:
        from .. import image as img
        payloads = t[self.bytes_col].to_pylist()
        n = len(payloads)
        h = np.zeros(n, dtype=np.int32)
        w = np.zeros(n, dtype=np.int32)
        c = np.zeros(n, dtype=np.int32)
        luma = np.full(n, np.nan)
        import zlib
        for i, b in enumerate(payloads):
            if not b:
                continue
            arr = None
            if bytes(b[:8]) == img.PNG_MAGIC:
                arr, meta = img.decode_png(bytes(b))
            elif bytes(b[:2]) == b"\xff\xd8":
                from .. import jpeg
                arr, meta = jpeg.decode_jpeg(bytes(b))
            elif bytes(b[:4]) == b"RIFF" and bytes(b[8:12]) == b"WEBP":
                from .. import webp
                arr, meta = webp.decode_webp(bytes(b))
            if arr is not None:
                if self.resize_to is not None:
                    arr = img.resize_nearest(arr, self.resize_to)
                h[i], w[i] = arr.shape[:2]
                c[i] = arr.shape[2]
                luma[i] = float(img.luminance(arr).mean())
            elif self.fake == "deterministic":
                # crc32, not hash(): Python's hash is salted per process,
                # which would break determinism across Ray workers
                hv = zlib.crc32(bytes(b[:64])) & 0xFFFF
                h[i], w[i], c[i] = 64 + hv % 512, 64 + (hv >> 4) % 512, 3
            else:
                raise NotImplementedError(
                    "unknown image payload: PNG, baseline JPEG and "
                    "lossless (VP8L) WebP decode are built in; lossy VP8 "
                    "needs a video-intra codec — use fake='deterministic' "
                    "to exercise the plumbing")
        return (t.append_column("height", pa.array(h))
                 .append_column("width", pa.array(w))
                 .append_column("channels", pa.array(c))
                 .append_column("mean_luma", pa.array(luma)))


class VideoFrameSample:
    """Actor-pool stage: video binary -> sampled decoded-frame rows.

    REAL for MJPEG/AVI (``video.py`` parses the RIFF container; every
    frame is a baseline JPEG decoded by the from-scratch ``jpeg.py``):
    each clip expands into up to ``n_frames`` uniformly-sampled rows of
    (frame_idx, ts_ms, height, width, mean_luma). Inter-frame codecs
    (H.264/VP9/...) raise with the codec named — motion-compensated
    decoding is a different engine, honestly out of scope. The
    ``fake="deterministic"`` path keeps exercising the flat-map plumbing
    for payloads that are not AVI at all."""

    def __init__(self, bytes_col: str = "video", n_frames: int = 4,
                 id_col: str = "clip_id", fake: str | None = None):
        self.bytes_col, self.n_frames, self.id_col = bytes_col, n_frames, id_col
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        from .. import image as img
        from .. import jpeg, video
        ids, frame_idx, ts_ms = [], [], []
        heights, widths, luma = [], [], []
        for rid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            b = bytes(b or b"")
            if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                for fi, ts, payload in video.sample_frames(b, self.n_frames):
                    arr, _ = jpeg.decode_jpeg(payload)
                    ids.append(rid)
                    frame_idx.append(fi)
                    ts_ms.append(ts)
                    heights.append(arr.shape[0])
                    widths.append(arr.shape[1])
                    luma.append(float(img.luminance(arr).mean()))
            elif self.fake == "deterministic":
                import zlib
                hv = zlib.crc32(b[:64]) & 0xFFFF
                for f in range(self.n_frames):
                    ids.append(rid)
                    frame_idx.append(f)
                    ts_ms.append(f * 100.0)
                    heights.append(64 + hv % 512)
                    widths.append(64 + (hv >> 4) % 512)
                    luma.append(float("nan"))
            else:
                raise NotImplementedError(
                    "unknown video payload: MJPEG/AVI decodes here "
                    "(video.py + jpeg.py); inter-frame codecs need a real "
                    "video decoder — use fake='deterministic' to exercise "
                    "the plumbing")
        return pa.table({self.id_col: ids,
                         "frame_idx": pa.array(frame_idx, type=pa.int32()),
                         "ts_ms": pa.array(ts_ms, type=pa.float64()),
                         "height": pa.array(heights, type=pa.int32()),
                         "width": pa.array(widths, type=pa.int32()),
                         "mean_luma": pa.array(luma, type=pa.float64())})


def audio_features(ds, bytes_col: str = "bytes", batch_size: int = 64,
                   concurrency: int = 0):
    """Wire the AudioFeatures actor pool with payload-aware batch sizing."""
    return ds.map_batches(AudioFeatures,
                          fn_constructor_kwargs={"bytes_col": bytes_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)
