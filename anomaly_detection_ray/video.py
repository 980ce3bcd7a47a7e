"""Pure stdlib+numpy MJPEG/AVI video handling — no ffmpeg in this
container.

De-stubs the video branch of the multimodal stage the same way image.py /
jpeg.py / webp.py did for images: Motion-JPEG is the one mainstream video
coding this repo can implement honestly, because every frame is a
baseline JPEG — the from-scratch T.81 codec in ``jpeg.py`` decodes it.
``decode_avi`` parses the RIFF/AVI container (hdrl stream headers, movi
frame chunks, idx1 tolerated but not required) and yields the stream-0
video frames; ``encode_avi_mjpeg`` writes a minimal valid AVI so tests
and synth can produce real video payloads without external data.

Compressed inter-frame codecs (H.264/VP9/AV1 — motion compensation +
entropy engines far beyond an intra-only format) are rejected with a
clear error, as is non-MJPEG fourcc content.

Container spec: the public AVI RIFF format (Microsoft "AVI RIFF File
Reference"); frame payloads per ITU-T T.81 via jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

AVIH_FMT = "<14I"   # 56-byte main header
STRH_FMT = "<4s4sI2H8I4h"  # 56-byte AVISTREAMHEADER


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10,
                     width: int | None = None,
                     height: int | None = None) -> bytes:
    """JPEG frame payloads -> minimal valid MJPEG AVI."""
    if not frames:
        raise ValueError("no frames")
    if width is None or height is None:
        from . import jpeg
        arr, meta = jpeg.decode_jpeg(frames[0])
        height, width = arr.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack(
        AVIH_FMT, 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(f) for f in frames), width, height, 0, 0, 0, 0)
    strh = struct.pack(
        STRH_FMT, b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max(len(f) for f in frames), 10_000, 0, 0, 0, width, height)
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: offsets relative to the start of the movi LIST data ('movi')
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _iter_chunks(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        tag = data[i:i + 4]
        (ln,) = struct.unpack_from("<I", data, i + 4)
        yield tag, i + 8, ln
        i += 8 + ln + (ln & 1)


def decode_avi(data: bytes) -> tuple[list[bytes], dict]:
    """AVI bytes -> (stream-0 video frame payloads, meta). MJPEG only —
    other video fourccs raise with the codec named."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file (bad RIFF header)")
    meta: dict = {"format": "avi"}
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        for tag, body, ln in _iter_chunks(data, start, end):
            if tag == b"LIST":
                kind = data[body:body + 4]
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(body + 4, body + ln)
            elif tag == b"avih":
                v = struct.unpack_from(AVIH_FMT, data, body)
                meta.update({"usec_per_frame": v[0], "n_frames": v[4],
                             "width": v[8], "height": v[9]})
            elif tag == b"strh":
                fcc_type, handler = data[body:body + 4], data[body + 4:body + 8]
                if fcc_type == b"vids":
                    codec = handler.decode("ascii", "replace").strip("\x00 ")
                    meta["codec"] = codec
                    if codec.upper() not in ("MJPG", "MJPEG"):
                        raise NotImplementedError(
                            f"video codec {codec!r}: only MJPEG decodes "
                            "here (each frame is a baseline JPEG for "
                            "jpeg.py); inter-frame codecs need a real "
                            "video decoder")
            elif tag[2:4] in (b"dc", b"db") and tag[:2] == b"00":
                frames.append(data[body:body + ln])

    walk(12, 12 + struct.unpack_from("<I", data, 4)[0] - 4)
    if not frames:
        raise ValueError("no stream-0 video frames in AVI")
    meta.setdefault("n_frames", len(frames))
    return frames, meta


def sample_frames(data: bytes, n: int) -> list[tuple[int, float, bytes]]:
    """Uniformly sample up to ``n`` frames: (frame_idx, ts_ms, jpeg
    bytes). The per-clip unit of the VideoFrameSample stage."""
    frames, meta = decode_avi(data)
    total = len(frames)
    idx = (np.round(np.linspace(0, total - 1, min(n, total)))
           .astype(int).tolist())
    usec = meta.get("usec_per_frame") or 100_000
    return [(i, i * usec / 1000.0, frames[i]) for i in dict.fromkeys(idx)]
