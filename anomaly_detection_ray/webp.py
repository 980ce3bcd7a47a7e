"""Pure stdlib+numpy lossless WebP (VP8L) codec — no libwebp in this
container.

De-stubs the WebP branch of the multimodal image stage the same way
``image.py`` (PNG) and ``jpeg.py`` (baseline JPEG) did: ``decode_webp``
reads the full VP8L feature set — canonical prefix codes (simple and
code-length-coded), the meta-prefix (entropy image) groups, color cache,
LZ77 backward references with the 120-entry plane-code distance map, and
all four transforms (predictor, color, subtract-green, color-indexing
with sub-byte pixel bundling) — inverted in reverse order per the spec.
Lossy VP8 and the extended VP8X container are rejected with clear errors
(a DCT video-intra codec is out of scope; VP8L covers the lossless/alpha
path end to end).

``encode_webp_lossless`` writes a valid minimal VP8L stream (no
transforms, no cache, literal-only, per-channel canonical prefix codes
over the values present) so tests and synth can produce real WebP
payloads without external data; its building blocks (`_BitWriter`,
`_write_huffman_code`, `_balanced_lengths`) are reused by tests to craft
transform/cache/LZ77 streams that exercise every decoder path against
spec-computed expectations.

Performance shape: mirrors jpeg.py — the entropy layer is an inherently
sequential bit recurrence (per-symbol Python), everything array-shaped
(palette expansion, subtract-green, final plane assembly) is vectorized
numpy. The stage stays REAL end to end; at 100 TB you would put a native
codec inside the same actor-pool stage.

Spec: RFC 9649 (WebP), §3 "Specification for WebP Lossless Bitstream";
prefix-code conventions shared with RFC 1951 (deflate).
"""

from __future__ import annotations

import struct

import numpy as np

# Order in which code-length-code lengths are transmitted (RFC 9649 §3.7.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120 plane-code (x, y) offsets for short LZ77 distances (RFC 9649 §3.6.2);
# distance = x + y * xsize (clamped to >= 1); codes above 120 are linear.
# The table is exactly the causal neighborhood {y=0, 1<=x<=8} ∪
# {1<=y<=7, -7<=x<=8} (the 8-bit nibble-packed domain, 120 pairs) ordered
# by squared euclidean norm with |x|-then-sign tie-breaks — generated
# rather than transcribed; the spec's published leading entries are
# pinned in test_webp.test_distance_map_properties.
_DIST_MAP = sorted(
    [(x, y) for y in range(8) for x in range(-7, 9)
     if y > 0 or x >= 1],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ------------------------------------------------------------- bit io

class _BitReader:
    """LSB-first bit reader (VP8L convention, unlike jpeg.py's MSB)."""

    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= self.n:
                raise ValueError("VP8L stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek_raw(self, n: int) -> int:
        """Next n stream bits in RAW (LSB-first) order, zero-padded past
        the stream end — the prefix-code LUT is indexed by this."""
        while self.nbits < n and self.pos < self.n:
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.acc & ((1 << n) - 1)

    def drop(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("VP8L stream truncated")
        self.acc >>= n
        self.nbits -= n


class _BitWriter:
    """LSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix codes are read MSB-of-code-first from the
        LSB-first stream (deflate convention) — write them reversed."""
        rev = 0
        for _ in range(length):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, length)

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ------------------------------------------------------------- prefix codes

class _PrefixCode:
    """Canonical prefix decoder from a code-length array (deflate/VP8L
    canonical assignment: codes increase with symbol order within each
    length, lengths ascending). ``simple`` trees carry 0-bit (single
    symbol) or 1-bit codes."""

    def __init__(self, lengths: np.ndarray):
        nz = np.flatnonzero(lengths)
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = int(nz[0])
            return
        self.single = None
        max_len = int(lengths[nz].max())
        counts = np.bincount(lengths[nz], minlength=max_len + 1)
        # Kraft completeness check (over-subscription also caught here)
        if int((counts[1:] * (1 << (max_len - np.arange(1, max_len + 1))))
               .sum()) != (1 << max_len):
            raise ValueError("prefix code is not complete")
        self.mincode = [0] * (max_len + 1)
        self.maxcode = [-1] * (max_len + 1)
        self.valptr = [0] * (max_len + 1)
        self.values: list[int] = []
        # LUT fast path (the jpeg.py move, LSB-first flavor): indexed by
        # the next lut_bits RAW stream bits; a code of length L <= lut_bits
        # owns every index whose LOW L bits equal its bit-reversed
        # codeword (codes are read MSB-first from the LSB-first stream).
        self.lut_bits = min(max_len, 11)
        lut = np.full(1 << self.lut_bits, -1, dtype=np.int32)
        code = 0
        for ln in range(1, max_len + 1):
            syms = nz[lengths[nz] == ln]
            if len(syms):
                self.valptr[ln] = len(self.values)
                self.mincode[ln] = code
                for s in syms:
                    if ln <= self.lut_bits:
                        rev = 0
                        c = code
                        for _ in range(ln):
                            rev = (rev << 1) | (c & 1)
                            c >>= 1
                        step = 1 << ln
                        lut[rev::step] = (int(s) << 5) | ln
                    code += 1
                self.values.extend(int(s) for s in syms)
                self.maxcode[ln] = code - 1
            code <<= 1
        self.max_len = max_len
        # plain list + precomputed mask: per-symbol list indexing is ~3x
        # faster than numpy scalar indexing in the sequential decode loop
        self.lut = lut.tolist()
        self.lut_mask = (1 << self.lut_bits) - 1

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # inlined peek_raw/drop: the entropy loop is the decoder's hot path
        # and the method-call overhead dominated it (profiled ~2x)
        acc = br.acc
        nbits = br.nbits
        if nbits < self.lut_bits:
            data = br.data
            pos = br.pos
            n = br.n
            while nbits < self.lut_bits and pos < n:
                acc |= data[pos] << nbits
                pos += 1
                nbits += 8
            br.pos = pos
        packed = self.lut[acc & self.lut_mask]
        if packed >= 0:
            ln = packed & 31
            if ln > nbits:
                raise ValueError("VP8L stream truncated")
            br.acc = acc >> ln
            br.nbits = nbits - ln
            return packed >> 5
        br.acc = acc
        br.nbits = nbits
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            if code <= self.maxcode[ln]:
                return self.values[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid prefix code in VP8L stream")


def _canonical_codes(lengths: np.ndarray) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under the canonical assignment (encoder)."""
    out: dict[int, tuple[int, int]] = {}
    nz = np.flatnonzero(lengths)
    if len(nz) == 0:
        return out
    max_len = int(lengths[nz].max())
    code = 0
    for ln in range(1, max_len + 1):
        for s in nz[lengths[nz] == ln]:
            out[int(s)] = (code, ln)
            code += 1
        code <<= 1
    return out


def _balanced_lengths(symbols: list[int], alphabet: int) -> np.ndarray:
    """Kraft-complete code lengths over ``symbols``: a balanced tree with
    the standard split (K symbols -> 2*(K - 2^(L-1)) codes of length L,
    the rest L-1, L = ceil(log2 K))."""
    lengths = np.zeros(alphabet, dtype=np.int64)
    k = len(symbols)
    if k == 1:
        lengths[symbols[0]] = 1  # handled as a simple code by the writer
        return lengths
    L = max(1, int(np.ceil(np.log2(k))))
    n_long = 2 * (k - (1 << (L - 1)))
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = L - 1 if i < k - n_long else L
    return lengths


def _read_code_lengths(br: _BitReader, alphabet: int) -> np.ndarray:
    """§3.7.2: code-length-coded prefix code."""
    num_cl = 4 + br.bits(4)
    cl_lengths = np.zeros(19, dtype=np.int64)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.bits(1):  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = np.zeros(alphabet, dtype=np.int64)
    prev_len = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            extra, offset = {16: (2, 3), 17: (3, 3), 18: (7, 11)}[cl]
            repeat = br.bits(extra) + offset
            fill = prev_len if cl == 16 else 0
            end = min(symbol + repeat, alphabet)
            lengths[symbol:end] = fill
            symbol = end
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            first = br.bits(8)
        else:
            first = br.bits(1)
        lengths = np.zeros(alphabet, dtype=np.int64)
        if num_symbols == 1:
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = first
            return pc
        second = br.bits(8)
        if first == second:
            raise ValueError("duplicate symbol in simple prefix code")
        lengths[first] = lengths[second] = 1
        return _PrefixCode(lengths)
    return _PrefixCode(_read_code_lengths(br, alphabet))


def _write_huffman_code(bw: _BitWriter, lengths: np.ndarray) -> None:
    """Encoder/test counterpart of _read_prefix_code: single-symbol codes
    use the simple form; otherwise every position's length is emitted as a
    code-length symbol (no repeats — fine at these alphabet sizes)."""
    nz = np.flatnonzero(lengths)
    if len(nz) == 1:
        s = int(nz[0])
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s >= 2:
            bw.write(1, 1)
            bw.write(s, 8)
        else:
            bw.write(0, 1)
            bw.write(s, 1)
        return
    bw.write(0, 1)  # code-length coded
    cl_syms = sorted({int(v) for v in lengths})
    cl_lengths = _balanced_lengths(cl_syms, 19)
    need = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s]) + 1
    num_cl = max(4, need)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(int(cl_lengths[_CL_ORDER[i]]), 3)
    bw.write(0, 1)  # no max_symbol cap: we emit every position
    if len(cl_syms) == 1:
        # single-symbol code-length tree: the reader's 1-symbol prefix
        # code consumes ZERO bits per length (every position decodes to
        # the one value) — write none
        return
    cl_codes = _canonical_codes(cl_lengths)
    for v in lengths:
        code, ln = cl_codes[int(v)]
        bw.write_code(code, ln)


# ------------------------------------------------------------- pixel math

def _add_px(a: int, b: int) -> int:
    """Per-byte modular add of two packed ARGB values."""
    return (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF) | \
           (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _select(t: int, l, tl: int) -> int:
    diff = 0
    for sh in (24, 16, 8, 0):
        pl = (l >> sh) & 0xFF
        pt = (t >> sh) & 0xFF
        ptl = (tl >> sh) & 0xFF
        diff += abs(pl - ptl) - abs(pt - ptl)
    return t if diff <= 0 else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc division
        out |= max(0, min(255, a + half)) << sh
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"invalid predictor mode {mode}")


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ctd(pred: int, color: int) -> int:
    """ColorTransformDelta: signed-8 product, arithmetic >> 5."""
    return (_i8(pred & 0xFF) * _i8(color & 0xFF)) >> 5


# ------------------------------------------------------------- decoder

def _prefix_extra_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (§3.6.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_image(br: _BitReader, xsize: int, ysize: int,
                          is_level0: bool):
    """One spatially-coded image (§3.5/§3.7). Returns (pixels uint32 1-D,
    xsize_after_transforms_were_parsed, transforms list) — transforms are
    parsed (and returned for inverse application) only at level 0."""
    transforms = []
    seen = set()
    if is_level0:
        while br.bits(1):
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError(f"duplicate VP8L transform {ttype}")
            seen.add(ttype)
            if ttype == 2:  # subtract green: no payload
                transforms.append({"type": 2})
            elif ttype in (0, 1):  # predictor / color: tiled sub-image
                size_bits = 2 + br.bits(3)
                txs = _ceil_div(xsize, 1 << size_bits)
                tys = _ceil_div(ysize, 1 << size_bits)
                tiles, _, _ = _decode_entropy_image(br, txs, tys, False)
                transforms.append({"type": ttype, "bits": size_bits,
                                   "tiles": tiles, "txs": txs,
                                   "xsize": xsize})
            elif ttype == 3:  # color indexing
                pal_size = br.bits(8) + 1
                pal, _, _ = _decode_entropy_image(br, pal_size, 1, False)
                pal = np.cumsum(pal.view(np.uint8).reshape(-1, 4)
                                .astype(np.uint32), axis=0, dtype=np.uint32)
                pal = (pal & 0xFF).astype(np.uint8).reshape(-1)\
                    .view(np.uint32)  # per-channel modular prefix sum
                width_bits = (3 if pal_size <= 2 else 2 if pal_size <= 4
                              else 1 if pal_size <= 16 else 0)
                transforms.append({"type": 3, "palette": pal,
                                   "width_bits": width_bits,
                                   "xsize": xsize})
                xsize = _ceil_div(xsize, 1 << width_bits)

    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache size {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    huffman_bits = 0
    num_groups = 1
    if is_level0 and br.bits(1):
        huffman_bits = 2 + br.bits(3)
        hxs = _ceil_div(xsize, 1 << huffman_bits)
        hys = _ceil_div(ysize, 1 << huffman_bits)
        himg, _, _ = _decode_entropy_image(br, hxs, hys, False)
        meta = (((himg >> 8) & 0xFFFF)).astype(np.int64)  # (r<<8)|g
        num_groups = int(meta.max()) + 1
        meta_xs = hxs

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append({
            "g": _read_prefix_code(br, green_alpha),
            "r": _read_prefix_code(br, 256),
            "b": _read_prefix_code(br, 256),
            "a": _read_prefix_code(br, 256),
            "d": _read_prefix_code(br, 40),
        })

    cache = [0] * cache_size if cache_size else None
    # pixels and the color cache accumulate in plain Python lists (scalar
    # np-array loads/stores are slow); LZ77 back-refs read the list directly
    pix = [0] * (xsize * ysize)
    n_px = xsize * ysize
    i = 0
    meta_list = meta.tolist() if meta is not None else None

    # The literal path decodes 4 prefix symbols per pixel; at 64k+ pixels
    # the _PrefixCode.decode call overhead alone dominated wall time
    # (profiled: 263k calls). Fuse the LUT fast path inline and mirror the
    # bit-reader state (acc/nbits/pos) in locals, syncing to ``br`` only
    # around the rare slow paths (LUT miss, LZ77 extra bits). Per channel:
    # (single_or_-1, lut, lut_bits, lut_mask, code_obj).
    def _flat(grp):
        out = []
        for ch in ("g", "r", "b", "a", "d"):
            c = grp[ch]
            if c.single is not None:
                out.append((c.single, (), 0, 0, c))
            else:
                out.append((-1, c.lut, c.lut_bits, c.lut_mask, c))
        return out

    flats = [_flat(g) for g in groups]
    ((g_single, g_lut, g_bits, g_mask, g_obj),
     (r_single, r_lut, r_bits, r_mask, r_obj),
     (b_single, b_lut, b_bits, b_mask, b_obj),
     (a_single, a_lut, a_bits, a_mask, a_obj),
     (_, _, _, _, d_obj)) = flats[0]
    cur_gi = 0
    data = br.data
    n = br.n
    acc = br.acc
    nbits = br.nbits
    pos = br.pos
    while i < n_px:
        if meta_list is not None:
            y, x = divmod(i, xsize)
            gi = meta_list[(y >> huffman_bits) * meta_xs
                           + (x >> huffman_bits)]
            if gi != cur_gi:
                cur_gi = gi
                ((g_single, g_lut, g_bits, g_mask, g_obj),
                 (r_single, r_lut, r_bits, r_mask, r_obj),
                 (b_single, b_lut, b_bits, b_mask, b_obj),
                 (a_single, a_lut, a_bits, a_mask, a_obj),
                 (_, _, _, _, d_obj)) = flats[gi]
        # --- inline decode: green/length/cache symbol
        if g_single >= 0:
            s = g_single
        else:
            if nbits < g_bits:
                while nbits < g_bits and pos < n:
                    acc |= data[pos] << nbits
                    pos += 1
                    nbits += 8
            packed = g_lut[acc & g_mask]
            if packed >= 0:
                ln = packed & 31
                if ln > nbits:
                    raise ValueError("VP8L stream truncated")
                acc >>= ln
                nbits -= ln
                s = packed >> 5
            else:
                br.acc, br.nbits, br.pos = acc, nbits, pos
                s = g_obj.decode(br)
                acc, nbits, pos = br.acc, br.nbits, br.pos
        if s < 256:
            # --- inline decode: red
            if r_single >= 0:
                r = r_single
            else:
                if nbits < r_bits:
                    while nbits < r_bits and pos < n:
                        acc |= data[pos] << nbits
                        pos += 1
                        nbits += 8
                packed = r_lut[acc & r_mask]
                if packed >= 0:
                    ln = packed & 31
                    if ln > nbits:
                        raise ValueError("VP8L stream truncated")
                    acc >>= ln
                    nbits -= ln
                    r = packed >> 5
                else:
                    br.acc, br.nbits, br.pos = acc, nbits, pos
                    r = r_obj.decode(br)
                    acc, nbits, pos = br.acc, br.nbits, br.pos
            # --- inline decode: blue
            if b_single >= 0:
                b = b_single
            else:
                if nbits < b_bits:
                    while nbits < b_bits and pos < n:
                        acc |= data[pos] << nbits
                        pos += 1
                        nbits += 8
                packed = b_lut[acc & b_mask]
                if packed >= 0:
                    ln = packed & 31
                    if ln > nbits:
                        raise ValueError("VP8L stream truncated")
                    acc >>= ln
                    nbits -= ln
                    b = packed >> 5
                else:
                    br.acc, br.nbits, br.pos = acc, nbits, pos
                    b = b_obj.decode(br)
                    acc, nbits, pos = br.acc, br.nbits, br.pos
            # --- inline decode: alpha
            if a_single >= 0:
                a = a_single
            else:
                if nbits < a_bits:
                    while nbits < a_bits and pos < n:
                        acc |= data[pos] << nbits
                        pos += 1
                        nbits += 8
                packed = a_lut[acc & a_mask]
                if packed >= 0:
                    ln = packed & 31
                    if ln > nbits:
                        raise ValueError("VP8L stream truncated")
                    acc >>= ln
                    nbits -= ln
                    a = packed >> 5
                else:
                    br.acc, br.nbits, br.pos = acc, nbits, pos
                    a = a_obj.decode(br)
                    acc, nbits, pos = br.acc, br.nbits, br.pos
            v = (a << 24) | (r << 16) | (s << 8) | b
            pix[i] = v
            if cache is not None:
                cache[(0x1E35A7BD * v) % (1 << 32) >> (32 - cache_bits)] = v
            i += 1
        elif s < 280:
            br.acc, br.nbits, br.pos = acc, nbits, pos
            length = _prefix_extra_value(s - 256, br)
            dist_code = _prefix_extra_value(d_obj.decode(br), br)
            acc, nbits, pos = br.acc, br.nbits, br.pos
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dx + dy * xsize)
            if dist > i or i + length > n_px:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                v = pix[i - dist]
                pix[i] = v
                if cache is not None:
                    cache[(0x1E35A7BD * v) % (1 << 32)
                          >> (32 - cache_bits)] = v
                i += 1
        else:
            idx = s - 280
            if cache is None or idx >= cache_size:
                raise ValueError("color-cache reference without a cache")
            pix[i] = cache[idx]
            i += 1
    br.acc, br.nbits, br.pos = acc, nbits, pos
    return np.array(pix, dtype=np.uint32), xsize, transforms


def _inverse_transforms(pix: np.ndarray, xsize: int, ysize: int,
                        transforms: list[dict]) -> tuple[np.ndarray, int]:
    for t in reversed(transforms):
        if t["type"] == 2:  # subtract green (vectorized)
            b = pix.view(np.uint8).reshape(-1, 4)  # little-endian: b,g,r,a
            g = b[:, 1]
            b[:, 0] += g
            b[:, 2] += g
        elif t["type"] == 3:  # color indexing
            pal = t["palette"]
            wb = t["width_bits"]
            full_xs = t["xsize"]
            greens = (pix >> 8).astype(np.uint32) & 0xFF
            if wb == 0:
                idx = greens.reshape(ysize, xsize)[:, :full_xs]
            else:
                per = 1 << wb        # packed pixels per green byte
                bpp = 8 >> wb
                packed = greens.reshape(ysize, xsize)
                x = np.arange(full_xs)
                src = packed[:, x >> wb]
                shift = ((x & (per - 1)) * bpp).astype(np.uint32)
                idx = (src >> shift[None, :]) & ((1 << bpp) - 1)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            pix = pal[idx.reshape(-1).astype(np.int64)].copy()
            xsize = full_xs
        elif t["type"] == 0:  # predictor
            bits = t["bits"]
            tiles = t["tiles"]
            txs = t["txs"]
            out = pix.astype(np.int64)  # python-int friendly
            for i in range(xsize * ysize):
                y, x = divmod(i, xsize)
                if i == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(out[i - 1])
                elif x == 0:
                    pred = int(out[i - xsize])
                else:
                    mode = (int(tiles[(y >> bits) * txs + (x >> bits)])
                            >> 8) & 0xFF
                    # TR is memory-linear (i - xsize + 1): in the rightmost
                    # column that lands on the CURRENT row's first pixel,
                    # already reconstructed — the spec-blessed libwebp rule
                    tr = int(out[i - xsize + 1])
                    pred = _predict(mode, int(out[i - 1]),
                                    int(out[i - xsize]),
                                    int(out[i - xsize - 1]), tr)
                out[i] = _add_px(int(out[i]), pred)
            pix = out.astype(np.uint32)
        elif t["type"] == 1:  # color transform
            bits = t["bits"]
            tiles = t["tiles"]
            txs = t["txs"]
            b = pix.view(np.uint8).reshape(-1, 4)
            for i in range(xsize * ysize):
                y, x = divmod(i, xsize)
                cte = int(tiles[(y >> bits) * txs + (x >> bits)])
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                g = int(b[i, 1])
                red = (int(b[i, 2]) + _ctd(g2r, g)) & 0xFF
                blue = (int(b[i, 0]) + _ctd(g2b, g) + _ctd(r2b, red)) & 0xFF
                b[i, 2] = red
                b[i, 0] = blue
    return pix, xsize


def decode_vp8l(payload: bytes) -> tuple[np.ndarray, dict]:
    """VP8L chunk payload -> (uint8 (H, W, C) array, meta)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream (bad signature)")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    alpha_hint = br.bits(1)
    version = br.bits(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    pix, xs, transforms = _decode_entropy_image(br, w, h, True)
    pix, xs = _inverse_transforms(pix, xs, h, transforms)
    if xs != w:
        raise ValueError("width mismatch after inverse transforms")
    b = pix.view(np.uint8).reshape(h, w, 4)  # little-endian b,g,r,a
    rgba = b[:, :, [2, 1, 0, 3]]
    meta = {"width": w, "height": h, "format": "vp8l",
            "alpha_hint": bool(alpha_hint),
            "transforms": [t["type"] for t in transforms]}
    if (rgba[:, :, 3] == 255).all():
        return rgba[:, :, :3].copy(), {**meta, "channels": 3}
    return rgba.copy(), {**meta, "channels": 4}


def decode_webp(data: bytes) -> tuple[np.ndarray, dict]:
    """RIFF/WEBP container (or bare VP8L payload) -> decoded array."""
    if data[:1] == b"\x2f":
        return decode_vp8l(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file (bad RIFF header)")
    i = 12
    while i + 8 <= len(data):
        tag = data[i:i + 4]
        (ln,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8:i + 8 + ln]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP needs a DCT video-intra codec — only "
                "lossless (VP8L) is implemented from scratch here")
        if tag == b"VP8X":
            i += 8 + ln + (ln & 1)  # extended header: keep scanning
            continue
        i += 8 + ln + (ln & 1)
    raise ValueError("no VP8L chunk in WebP container")


# ------------------------------------------------------------- encoder

def _write_entropy_image(bw: _BitWriter, rgba: np.ndarray,
                         level0: bool) -> None:
    """Write one literal-only spatially-coded image (no cache, one prefix
    group): rgba is an (N, 4) uint8 array in r,g,b,a order. Also the
    building block tests use to craft transform sub-images."""
    bw.write(0, 1)       # no color cache
    if level0:
        bw.write(0, 1)   # no meta prefix codes
    r, g, b, a = (rgba[:, k] for k in range(4))
    codes = []
    for vals, alphabet in ((g, 280), (r, 256), (b, 256), (a, 256)):
        lengths = _balanced_lengths(sorted({int(v) for v in vals}), alphabet)
        _write_huffman_code(bw, lengths)
        codes.append(_canonical_codes(lengths))
    dist_lengths = np.zeros(40, dtype=np.int64)
    dist_lengths[0] = 1
    _write_huffman_code(bw, dist_lengths)  # simple 1-symbol code
    cg, cr, cb, ca = codes
    single = [len(c) <= 1 for c in codes]
    for i in range(len(rgba)):
        if not single[0]:
            bw.write_code(*cg[int(g[i])])
        if not single[1]:
            bw.write_code(*cr[int(r[i])])
        if not single[2]:
            bw.write_code(*cb[int(b[i])])
        if not single[3]:
            bw.write_code(*ca[int(a[i])])


def _wrap_riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_lossless(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 1|3|4) -> lossless WebP. Minimal valid VP8L: no
    transforms, no cache, literal-only, per-channel canonical prefix codes
    over the values present (the distance code is a 1-symbol simple
    code)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 1:
        arr = np.repeat(arr, 3, axis=2)
        c = 3
    if c == 3:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        arr = np.concatenate([arr, alpha], axis=2)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((arr[:, :, 3] != 255).any()), 1)
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no more transforms
    _write_entropy_image(bw, arr.reshape(-1, 4), level0=True)
    return _wrap_riff(bw.getvalue())
