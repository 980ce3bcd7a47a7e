"""Baseline JPEG codec (jpeg.py) — transform/entropy unit checks plus
encode→decode round-trips. The decoder is the product surface (ImageDecode
actor stage); the encoder exists to produce real payloads without PIL."""

import numpy as np
import pytest

from anomaly_detection_ray import image as img
from anomaly_detection_ray import jpeg


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


def colorful(h, w, seed=0):
    """RGB test image with REAL chroma (synth_image is gray-replicated)."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    red = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    grn = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    blu = np.kron(r.integers(0, 256, ((h + 7) // 8, (w + 7) // 8)),
                  np.ones((8, 8)))[:h, :w].astype(np.uint8)
    return np.stack([red, grn, blu], axis=2)


# ------------------------------------------------------------- transforms
def test_dct_matrix_orthonormal():
    C = jpeg._dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)


def test_dct_idct_roundtrip():
    rng = np.random.default_rng(7)
    b = rng.uniform(-128, 127, (20, 8, 8))
    assert np.allclose(jpeg.idct2(jpeg.dct2(b)), b, atol=1e-9)


def test_dct_dc_is_block_mean():
    b = np.full((1, 8, 8), 100.0)
    coef = jpeg.dct2(b)
    assert np.isclose(coef[0, 0, 0], 800.0)  # 8 * mean
    assert np.allclose(coef[0].flatten()[1:], 0, atol=1e-9)


# ------------------------------------------------------------- huffman
def test_huffman_canonical_codes_prefix_free():
    t = jpeg._HuffTable(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    codes = sorted((ln, code) for code, ln in t.encode_map.values())
    assert len(codes) == len(jpeg.AC_LUMA_VALS)
    seen = set()
    for ln, code in codes:
        bits = format(code, f"0{ln}b")
        for p in range(1, len(bits)):
            assert bits[:p] not in seen, f"prefix violation at {bits}"
        seen.add(bits)


def test_huffman_encode_decode_identity():
    t = jpeg._HuffTable(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 12, 200).tolist()
    bw = jpeg._BitWriter()
    for s in syms:
        code, ln = t.encode_map[s]
        bw.write(code, ln)
    bw.flush()
    br = jpeg._BitReader(bytes(bw.buf).replace(b"\xff\x00", b"\xff"))
    assert [t.decode(br) for _ in syms] == syms


def test_extend_symmetry():
    # EXTEND inverts the encoder's negative-value mapping
    for v in [-1, -3, -7, 1, 5, 255, -255]:
        t = int(abs(v)).bit_length()
        enc = v if v >= 0 else v + (1 << t) - 1
        assert jpeg._extend(enc, t) == v


# ------------------------------------------------------------- roundtrips
@pytest.mark.parametrize("shape,sub", [
    ((64, 64), "444"), ((33, 41), "444"),        # grayscale, odd dims
])
def test_roundtrip_gray(shape, sub):
    a = img.synth_image(seed=shape[0], channels=1)[:shape[0], :shape[1]]
    dec, meta = jpeg.decode_jpeg(jpeg.encode_jpeg(a[:, :, 0], quality=90))
    assert dec.shape == (*a.shape[:2], 1)
    assert meta["channels"] == 1
    assert psnr(a, dec) > 30


@pytest.mark.parametrize("sub,factors", [("444", "1x1"), ("422", "2x1"),
                                         ("420", "2x2")])
def test_roundtrip_color_subsampling(sub, factors):
    a = colorful(37, 51, seed=11)   # odd dims, real chroma
    enc = jpeg.encode_jpeg(a, quality=90, subsample=sub)
    dec, meta = jpeg.decode_jpeg(enc)
    assert dec.shape == a.shape and meta["subsampling"] == factors
    assert psnr(a, dec) > 28


def test_quality_knob_monotone():
    a = colorful(48, 48, seed=5)
    sizes, errs = [], []
    for q in (95, 75, 40):
        enc = jpeg.encode_jpeg(a, quality=q, subsample="444")
        dec, _ = jpeg.decode_jpeg(enc)
        sizes.append(len(enc))
        errs.append(psnr(a, dec))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] > errs[1] > errs[2]


def test_restart_markers():
    a = colorful(40, 48, seed=9)
    enc = jpeg.encode_jpeg(a, quality=85, subsample="420", restart_interval=2)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    dec, meta = jpeg.decode_jpeg(enc)
    assert meta["restart_interval"] == 2
    # bit-identical to the unsegmented encode after decode
    dec2, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=85,
                                                subsample="420"))
    assert np.array_equal(dec, dec2)


def test_single_pixel_and_exact_block():
    for shape in [(1, 1, 3), (8, 8, 3), (16, 8, 3)]:
        a = colorful(*shape[:2], seed=1)
        dec, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=90,
                                                   subsample="444"))
        assert dec.shape == shape


# ------------------------------------------------------------- errors
def test_rejects_progressive():
    a = colorful(16, 16)
    enc = bytearray(jpeg.encode_jpeg(a, quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # relabel SOF0 as progressive
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg(bytes(enc))


def test_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    enc = jpeg.encode_jpeg(colorful(24, 24), quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(enc[:len(enc) // 2])


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        jpeg.encode_jpeg(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="channel"):
        jpeg.encode_jpeg(np.zeros((8, 8, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8),
                         subsample="411")


def test_rejects_non_interleaved_scan():
    """SOS covering fewer components than SOF declares is rejected with a
    clear error (baseline non-interleaved scans are out of scope)."""
    import struct
    a = colorful(16, 16)
    enc = bytearray(jpeg.encode_jpeg(a, quality=90, subsample="444"))
    i = enc.find(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", enc, i + 2)
    # rewrite the SOS to cover only component 1 (Y)
    new_sos = bytes([1, 1, 0x00, 0, 63, 0])
    enc[i + 2:i + 2 + ln] = struct.pack(">H", len(new_sos) + 2) + new_sos
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg.decode_jpeg(bytes(enc))


def test_rejects_bad_sampling_factors():
    """Zero or non-dividing sampling factors raise a clear ValueError
    instead of an opaque numpy crash."""
    import struct
    a = colorful(16, 16)
    # SOF0: marker(2) len(2) prec(1) H(2) W(2) ncomp(1) then id,hv,tq per
    # component -> comp1 hv at i+11, comp2 hv at i+14
    for off, hv in ((11, 0x00),   # zero factors: out of range
                    (14, 0x31)):  # chroma 3x1 does not divide Y's 2x1
        enc = bytearray(jpeg.encode_jpeg(a, quality=90, subsample="422"))
        i = enc.find(b"\xff\xc0")
        enc[i + off] = hv
        with pytest.raises(ValueError, match="sampling"):
            jpeg.decode_jpeg(bytes(enc))
