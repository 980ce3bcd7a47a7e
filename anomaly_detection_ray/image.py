"""Pure stdlib+numpy PNG codec (no PIL/libpng in this container).

Gives the image modality a REAL decode path (the reference has no image
handling at all; this is part of the training-data-pipeline surface):
``encode_png`` writes 8-bit grayscale / RGB / RGBA, ``decode_png`` reads
8-bit color types 0/2/3/4/6 with all five PNG scanline filters
(RFC 2083 §6), non-interlaced. JPEG/WebP stay stubbed in
stages/multimodal.py — those codecs genuinely aren't available here.

Decode is the hot path in a pipeline: unfiltering is vectorized per
scanline (filters 0/2 whole-row numpy; 1/3/4 need the left-neighbor
recurrence, run per pixel across the row's channel lanes). Encode uses
filter 0 + zlib, which keeps the synth/test write path cheap.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (H,W) | (H,W,1) | (H,W,3) | (H,W,4) -> PNG bytes."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: (h, 1+stride) filter-byte-prefixed scanlines -> (h, stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: left recurrence, vectorized across bpp lanes
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + int(_paeth(
                    np.uint8(left), prev[x], np.uint8(ul)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line
        prev = out[y]
    return out


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """PNG bytes -> (uint8 array (H,W,C), meta dict). 8-bit depth,
    color types 0/2/3/4/6, no interlace."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos, idat, ihdr, plte = len(PNG_MAGIC), [], None, None
    view = memoryview(data)
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = bytes(view[pos + 4:pos + 8])
        if pos + 8 + ln > len(data):
            raise ValueError("truncated PNG chunk")
        body = view[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(bytes(body))
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("Adam7 interlace unsupported")
    c = _CHANNELS.get(color_type)
    if c is None:
        raise ValueError(f"bad color type {color_type}")
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    pix = _unfilter(raw.reshape(h, stride + 1), h, stride, c)
    arr = pix.reshape(h, w, c)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        arr = plte[arr[:, :, 0]]
        c = 3
    return arr, {"width": w, "height": h, "channels": c,
                 "color_type": color_type}


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — index gather, no deps."""
    h, w = arr.shape[:2]
    th, tw = size
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return arr[yi][:, xi]


def luminance(arr: np.ndarray) -> np.ndarray:
    """Rec.601 luma of an (H,W,C) uint8 array -> float (H,W)."""
    a = arr.astype(np.float64)
    if a.shape[2] == 1:
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def synth_image(seed: int, min_side: int = 24, max_side: int = 96,
                channels: int = 3) -> np.ndarray:
    """Deterministic test image: seeded gradient + blocky noise (compresses
    like a real photo-ish payload, unlike white noise)."""
    r = np.random.default_rng(seed)
    h = int(r.integers(min_side, max_side + 1))
    w = int(r.integers(min_side, max_side + 1))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 // max(h - 1, 1) + xx * 128 // max(w - 1, 1)) % 256
    block = r.integers(0, 64, size=((h + 7) // 8, (w + 7) // 8))
    noise = np.kron(block, np.ones((8, 8)))[:h, :w]
    img = ((base + noise) % 256).astype(np.uint8)
    return np.repeat(img[:, :, None], channels, axis=2)
