"""Pure stdlib+numpy baseline JPEG codec (no libjpeg/PIL in this container).

De-stubs the last image format (PNG is real in ``image.py``; the reference
has no image handling at all — this is training-data-pipeline surface):
``decode_jpeg`` reads baseline sequential JFIF (SOF0): 8-bit grayscale and
3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 sampling, arbitrary DQT/DHT
tables from the stream, restart markers (DRI/RSTn). Progressive (SOF2),
arithmetic coding and 12-bit depth are rejected with clear errors.
``encode_jpeg`` writes baseline JFIF with the Annex K quantization +
Huffman tables and IJG quality scaling — it exists so tests and synth can
produce real JPEG payloads without external data.

Performance shape: the entropy (Huffman) layer is an inherently sequential
bit recurrence, so it runs as a per-symbol Python loop — everything around
it (dequantization, inverse zigzag, IDCT, plane assembly, upsampling,
color conversion) is one vectorized numpy pass over ALL blocks of the
image. At 100 TB you would put a native codec inside the same actor-pool
stage; this keeps the stage REAL end-to-end, not a fake.

Spec: ITU-T T.81 (quant/Huffman tables from Annex K; decoder control flow
follows the DECODE/RECEIVE/EXTEND procedures of §F.2.2).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index k -> raster index (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K.1/K.2 base quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: forward = C @ B @ C.T."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def dct2(blocks: np.ndarray) -> np.ndarray:
    """(n,8,8) spatial -> (n,8,8) DCT coefficients, vectorized."""
    return np.einsum("kn,bnm,lm->bkl", _C, blocks, _C, optimize=True)


def idct2(coefs: np.ndarray) -> np.ndarray:
    """(n,8,8) DCT coefficients -> (n,8,8) spatial, vectorized."""
    return np.einsum("kn,bkl,lm->bnm", _C, coefs, _C, optimize=True)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


class _HuffTable:
    """Canonical Huffman table (T.81 Annex C generation).

    Decoding is table-driven: JPEG codes are at most 16 bits, so a
    65536-entry LUT indexed by a 16-bit lookahead yields (value, code
    length) in ONE lookup instead of §F.2.2 DECODE's bit-at-a-time walk —
    the standard fast-path of every production baseline decoder. The LUT
    is built with numpy slice fills (each code of length L owns the
    2^(16-L) lookahead words sharing its prefix), packed as
    ``(value << 5) | length``; -1 marks invalid prefixes."""

    def __init__(self, bits: list[int], values: list[int]):
        if len(bits) != 16 or sum(bits) != len(values):
            raise ValueError("malformed Huffman table")
        self.values = list(values)
        self.encode_map: dict[int, tuple[int, int]] = {}
        self.lut = np.full(1 << 16, -1, dtype=np.int32)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.encode_map[values[k]] = (code, ln)
                lo = code << (16 - ln)
                self.lut[lo:lo + (1 << (16 - ln))] = (values[k] << 5) | ln
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        packed = int(self.lut[br.peek16()])
        if packed < 0:
            raise ValueError("invalid Huffman code in entropy stream")
        br.consume(packed & 31)
        return packed >> 5

    def lutl(self) -> list:
        """Plain-list view of the LUT, built lazily and cached: scalar
        list indexing is ~3x faster than numpy scalar indexing in the
        sequential MCU loop, and the encoder never needs it."""
        lst = getattr(self, "_lutl", None)
        if lst is None:
            lst = self._lutl = self.lut.tolist()
        return lst


class _BitReader:
    """MSB-first bit cursor over unstuffed entropy bytes: a plain int
    accumulator refilled a byte at a time. ``peek16`` zero-pads past the
    stream end (a final short code may need fewer real bits than the
    lookahead); ``consume``/``receive`` still raise on truncation because
    they only accept bits that actually exist."""

    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def peek16(self) -> int:
        while self.nbits < 16 and self.pos < self.n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        return (self.acc << (16 - self.nbits)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("entropy stream truncated")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n and self.pos < self.n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if n > self.nbits:
            raise ValueError("entropy stream truncated")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, t: int) -> int:
    """§F.2.2.1 EXTEND: map the t received bits to a signed value."""
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------- encoder
def _rgb_to_ycbcr(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) with H,W % 8 == 0 -> (n,8,8) blocks in raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc: _HuffTable, ac: _HuffTable) -> int:
    dc_val = int(zz[0])
    diff = dc_val - pred
    t = _category(diff)
    code, ln = dc.encode_map[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac.encode_map[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = _category(v)
        c, l = ac.encode_map[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c, l = ac.encode_map[0x00]  # EOB
        bw.write(c, l)
    return dc_val


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: str = "420",
                restart_interval: int = 0) -> bytes:
    """uint8 (H,W) | (H,W,1) | (H,W,3 RGB) -> baseline JFIF bytes.

    ``subsample``: '444', '422' or '420' (3-channel input only)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError(f"unsupported channel count {nc}")
    qt_l, qt_c = _quality_tables(quality)
    sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}.get(subsample)
    if sub is None:
        raise ValueError(f"unknown subsampling {subsample!r}")
    hs, vs = sub if nc == 3 else (1, 1)

    f = a.astype(np.float64)
    if nc == 3:
        y, cb, cr = _rgb_to_ycbcr(f)
        # box-average chroma downsample on an even-padded plane
        cbp = _pad_to(cb, vs, hs)
        crp = _pad_to(cr, vs, hs)
        ch, cw = cbp.shape
        cb = cbp.reshape(ch // vs, vs, cw // hs, hs).mean(axis=(1, 3))
        cr = crp.reshape(ch // vs, vs, cw // hs, hs).mean(axis=(1, 3))
        comps = [  # (id, h, v, qtab_id, plane)
            (1, hs, vs, 0, _pad_to(y, vs * 8, hs * 8)),
            (2, 1, 1, 1, _pad_to(cb, 8, 8)),
            (3, 1, 1, 1, _pad_to(cr, 8, 8)),
        ]
        # chroma planes must cover the Y MCU grid
        ymh, ymw = comps[0][4].shape
        comps[1] = (2, 1, 1, 1, _pad_to(comps[1][4], ymh // vs, ymw // hs))
        comps[2] = (3, 1, 1, 1, _pad_to(comps[2][4], ymh // vs, ymw // hs))
    else:
        hs = vs = 1
        comps = [(1, 1, 1, 0, _pad_to(f[:, :, 0], 8, 8))]

    # quantized zigzag blocks per component, raster block order
    qts = {0: qt_l, 1: qt_c}
    zz_blocks, bpl = [], []
    for _, _, _, tq, plane in comps:
        coefs = dct2(_plane_blocks(plane - 128.0))
        q = np.round(coefs.reshape(-1, 64) / qts[tq].reshape(64))
        zz_blocks.append(q[:, ZIGZAG].astype(np.int32))
        bpl.append(plane.shape[1] // 8)

    dc_l = _HuffTable(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _HuffTable(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _HuffTable(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _HuffTable(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(comps) - 1)

    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    bw = _BitWriter()
    preds = [0] * len(comps)
    chunks: list[bytes] = []
    mcu_in_seg = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_seg == restart_interval:
                bw.flush()
                chunks.append(bytes(bw.buf))
                bw = _BitWriter()
                preds = [0] * len(comps)
                mcu_in_seg = 0
            for ci, (_, chf, cvf, _, _) in enumerate(comps):
                for i in range(cvf):
                    for j in range(chf):
                        bidx = (my * cvf + i) * bpl[ci] + (mx * chf + j)
                        preds[ci] = _encode_block(
                            bw, zz_blocks[ci][bidx], preds[ci], *tabs[ci])
            mcu_in_seg += 1
    bw.flush()
    chunks.append(bytes(bw.buf))
    scan = bytearray()
    for i, cdata in enumerate(chunks):
        if i:
            scan += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        scan += cdata

    # ---- headers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0x00]) + bytes(qt_l[ZIGZAG].astype(np.uint8))
    if len(comps) == 3:
        dqt += bytes([0x01]) + bytes(qt_c[ZIGZAG].astype(np.uint8))
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, chf, cvf, tq, _ in comps:
        sof += bytes([cid, (chf << 4) | cvf, tq])
    out += seg(0xFFC0, sof)
    dht = (bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
           + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if len(comps) == 3:
        dht += (bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
                + bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    out += seg(0xFFC4, dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i, (cid, *_rest) in enumerate(comps):
        sos += bytes([cid, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder
def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy bytes from ``start`` to the next real marker, unstuffed and
    split at restart markers. Returns (segments, position of end marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """Baseline JFIF bytes -> (uint8 (H,W,C) array, meta dict)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (bad SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    scan_comps = None
    segs = None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at byte {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone markers
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    raw = np.frombuffer(body[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    raw = np.frombuffer(body[p:p + 128], dtype=">u2")
                    p += 128
                t = np.zeros(64, dtype=np.float64)
                t[ZIGZAG] = raw.astype(np.float64)
                qts[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(body[p + 17:p + 17 + cnt])
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            sof = {"h": hh, "w": ww, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported — "
                f"got SOF marker 0xFF{marker:02X} (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append({"id": cid, "dc": tt >> 4, "ac": tt & 15})
            segs, i = _split_entropy(data, i)
        # APPn/COM/anything else: skipped
        if segs is not None:
            break
    if sof is None or scan_comps is None or segs is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")

    h, w = sof["h"], sof["w"]
    comps = sof["comps"]
    if len(scan_comps) != len(comps):
        raise ValueError(
            f"non-interleaved scans unsupported: SOS covers "
            f"{len(scan_comps)} of {len(comps)} components")
    if len(comps) == 1:
        # a single-component scan is non-interleaved by definition —
        # sampling factors are ignored (T.81 A.2.2: data unit = one block)
        comps[0]["h"] = comps[0]["v"] = 1
    by_id = {c["id"]: c for c in comps}
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"invalid sampling factors "
                             f"{c['h']}x{c['v']} for component {c['id']}")
        if max_h % c["h"] or max_v % c["v"]:
            raise ValueError(
                f"unsupported sampling grid: component {c['id']} factors "
                f"{c['h']}x{c['v']} do not divide max {max_h}x{max_v}")
    for sc in scan_comps:
        c = by_id[sc["id"]]
        c["dct"] = huff[(0, sc["dc"])]
        c["act"] = huff[(1, sc["ac"])]
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c["bpl"] = mcus_x * c["h"]
        c["rows"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["rows"] * c["bpl"], 64), dtype=np.int32)

    # ---- entropy decode (sequential Python: the Huffman recurrence).
    # The LUT peek/consume and EXTEND are fused inline with the bit
    # cursor (acc/nbits/pos) in plain locals: the per-coefficient method
    # calls dominated this loop (same move as webp.py's pixel loop).
    # Semantics are identical to _BitReader.peek16/consume/receive —
    # peek zero-pads past stream end, consume/receive raise on bits that
    # don't exist.
    total_mcus = mcus_x * mcus_y
    ri = restart_interval or total_mcus
    comp_state = [(c["id"], c["v"], c["h"], c["bpl"],
                   c["dct"].lutl(), c["act"].lutl(), c["coef"])
                  for c in comps]
    mcu = 0
    for seg_bytes in segs:
        if mcu >= total_mcus:
            break
        preds = {cid: 0 for cid, *_ in comp_state}
        dat = seg_bytes
        nn = len(seg_bytes)
        acc = 0
        nbits = 0
        pos = 0
        for _ in range(min(ri, total_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for cid, cv, ch, bpl, dct_lut, act_lut, coef in comp_state:
                pred = preds[cid]
                for bi in range(cv):
                    for bj in range(ch):
                        # ---- DC coefficient
                        while nbits < 16 and pos < nn:
                            acc = (acc << 8) | dat[pos]
                            pos += 1
                            nbits += 8
                        look = ((acc >> (nbits - 16)) & 0xFFFF
                                if nbits >= 16
                                else (acc << (16 - nbits)) & 0xFFFF)
                        packed = dct_lut[look]
                        if packed < 0:
                            raise ValueError(
                                "invalid Huffman code in entropy stream")
                        ln = packed & 31
                        if ln > nbits:
                            raise ValueError("entropy stream truncated")
                        nbits -= ln
                        acc &= (1 << nbits) - 1
                        t = packed >> 5
                        if t:
                            while nbits < t and pos < nn:
                                acc = (acc << 8) | dat[pos]
                                pos += 1
                                nbits += 8
                            if t > nbits:
                                raise ValueError("entropy stream truncated")
                            v = (acc >> (nbits - t)) & ((1 << t) - 1)
                            nbits -= t
                            acc &= (1 << nbits) - 1
                            pred += (v - ((1 << t) - 1)
                                     if v < (1 << (t - 1)) else v)
                        row = coef[(my * cv + bi) * bpl + (mx * ch + bj)]
                        row[0] = pred
                        k = 1
                        while k < 64:
                            # ---- AC run/size symbol
                            while nbits < 16 and pos < nn:
                                acc = (acc << 8) | dat[pos]
                                pos += 1
                                nbits += 8
                            look = ((acc >> (nbits - 16)) & 0xFFFF
                                    if nbits >= 16
                                    else (acc << (16 - nbits)) & 0xFFFF)
                            packed = act_lut[look]
                            if packed < 0:
                                raise ValueError(
                                    "invalid Huffman code in entropy stream")
                            ln = packed & 31
                            if ln > nbits:
                                raise ValueError("entropy stream truncated")
                            nbits -= ln
                            acc &= (1 << nbits) - 1
                            rs = packed >> 5
                            s = rs & 15
                            if s == 0:
                                if rs >> 4 == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overrun")
                            while nbits < s and pos < nn:
                                acc = (acc << 8) | dat[pos]
                                pos += 1
                                nbits += 8
                            if s > nbits:
                                raise ValueError("entropy stream truncated")
                            v = (acc >> (nbits - s)) & ((1 << s) - 1)
                            nbits -= s
                            acc &= (1 << nbits) - 1
                            row[k] = (v - ((1 << s) - 1)
                                      if v < (1 << (s - 1)) else v)
                            k += 1
                preds[cid] = pred
            mcu += 1
    if mcu != total_mcus:
        raise ValueError(f"decoded {mcu}/{total_mcus} MCUs (truncated scan)")

    # ---- vectorized reconstruction: dequant + inverse zigzag + IDCT +
    # plane scatter + upsample + color convert, one numpy pass per comp
    planes = []
    for c in comps:
        deq = c["coef"].astype(np.float64) * qts[c["tq"]][ZIGZAG][None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        pix = idct2(raster.reshape(-1, 8, 8)) + 128.0
        plane = (pix.reshape(c["rows"], c["bpl"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["rows"] * 8, c["bpl"] * 8))
        cw = -(-w * c["h"] // max_h)   # ceil(w*h/max_h)
        chh = -(-h * c["v"] // max_v)
        plane = plane[:chh, :cw]
        if c["h"] != max_h or c["v"] != max_v:
            plane = np.repeat(np.repeat(plane, max_v // c["v"], axis=0),
                              max_h // c["h"], axis=1)
        planes.append(plane[:h, :w])

    meta = {"width": w, "height": h, "channels": len(comps),
            "subsampling": f"{max_h}x{max_v}",
            "restart_interval": restart_interval}
    if len(comps) == 1:
        arr = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return arr, meta
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    arr = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return arr, meta
