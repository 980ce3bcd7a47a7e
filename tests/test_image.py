"""PNG codec tests: encode/decode roundtrip, all five scanline filters
(forward-filter implemented independently here, decoder must invert),
palette images, resize, luminance, and the real ImageDecode stage path."""

import struct
import zlib

import numpy as np
import pytest

from anomaly_detection_ray import image as img

rng = np.random.default_rng(3)


@pytest.mark.parametrize("shape", [(17, 23), (17, 23, 1), (16, 16, 3), (9, 31, 4)])
def test_roundtrip_exact(shape):
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec, meta = img.decode_png(img.encode_png(a))
    want = a if a.ndim == 3 else a[:, :, None]
    assert dec.shape == (shape[0], shape[1], want.shape[2])
    np.testing.assert_array_equal(dec, want)
    assert meta["height"], meta["width"] == shape[:2]


def _forward_filter(a: np.ndarray, ftype: int) -> bytes:
    """Independent forward PNG filter (RFC 2083 §6.3-6.6) — NOT the
    codec's code; the decoder must invert it exactly."""
    h, w, c = a.shape
    flat = a.reshape(h, w * c).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        line = flat[y]
        f = np.zeros_like(line)
        for x in range(w * c):
            left = line[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb and pa_ <= pc else (up if pb <= pc else ul)
            f[x] = (line[x] - pred) & 0xFF
        out += bytes([ftype]) + bytes(f.astype(np.uint8))
        prev = line
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_decode_inverts_every_filter(ftype, channels):
    a = rng.integers(0, 256, size=(12, 10, channels), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 10, 12, 8, {1: 0, 3: 2}[channels], 0, 0, 0)
    raw = _forward_filter(a, ftype)
    data = (img.PNG_MAGIC + img._chunk(b"IHDR", ihdr)
            + img._chunk(b"IDAT", zlib.compress(raw))
            + img._chunk(b"IEND", b""))
    dec, _ = img.decode_png(data)
    np.testing.assert_array_equal(dec, a)


def test_palette_decode():
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 9), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 9, 8, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(idx[y]) for y in range(8))
    data = (img.PNG_MAGIC + img._chunk(b"IHDR", ihdr)
            + img._chunk(b"PLTE", plte.tobytes())
            + img._chunk(b"IDAT", zlib.compress(raw))
            + img._chunk(b"IEND", b""))
    dec, meta = img.decode_png(data)
    assert meta["channels"] == 3
    np.testing.assert_array_equal(dec, plte[idx])


def test_bad_inputs_rejected():
    with pytest.raises(ValueError, match="magic"):
        img.decode_png(b"GIF87a" + b"\x00" * 40)
    a = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    good = img.encode_png(a)
    with pytest.raises(ValueError):
        img.decode_png(good[:20])  # truncated: no IDAT
    with pytest.raises(ValueError):
        img.encode_png(a.astype(np.int32))


def test_resize_and_luminance():
    a = img.synth_image(seed=5, channels=3)
    r = img.resize_nearest(a, (32, 48))
    assert r.shape == (32, 48, 3)
    # nearest-neighbor only ever copies source pixels
    assert set(np.unique(r)) <= set(np.unique(a))
    lum = img.luminance(a)
    assert lum.shape == a.shape[:2]
    # gray input (all channels equal) => luma == channel value
    np.testing.assert_allclose(lum, a[:, :, 0].astype(np.float64))


def test_image_decode_stage_real_png(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.stages.multimodal import ImageDecode

    arrs = [img.synth_image(seed=s) for s in range(6)]
    t = pa.table({"img_id": [f"i{s}" for s in range(6)],
                  "image": [img.encode_png(a) for a in arrs]})
    out = (rd.from_arrow(t).map_batches(
        ImageDecode, fn_constructor_kwargs={"bytes_col": "image"},
        batch_format="pyarrow", concurrency=2, batch_size=2)
        .to_pandas().set_index("img_id"))
    for s, a in enumerate(arrs):
        row = out.loc[f"i{s}"]
        assert (row["height"], row["width"], row["channels"]) == (*a.shape[:2], 3)
        np.testing.assert_allclose(row["mean_luma"], img.luminance(a).mean())
    # resize path: fixed output dims
    out2 = (rd.from_arrow(t).map_batches(
        ImageDecode, fn_constructor_kwargs={"bytes_col": "image",
                                            "resize_to": (16, 16)},
        batch_format="pyarrow", concurrency=1).to_pandas())
    assert (out2["height"] == 16).all() and (out2["width"] == 16).all()


def test_image_decode_stage_mixed_png_jpeg(ray_session):
    """One batch mixing PNG and baseline-JPEG payloads: both decode REAL
    through the same actor stage (magic-dispatched), no fake mode."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray import jpeg
    from anomaly_detection_ray.stages.multimodal import ImageDecode

    arrs = [img.synth_image(seed=s) for s in range(4)]
    payloads = [img.encode_png(arrs[0]),
                jpeg.encode_jpeg(arrs[1], quality=90, subsample="444"),
                jpeg.encode_jpeg(arrs[2], quality=85, subsample="420"),
                jpeg.encode_jpeg(arrs[3][:, :, 0], quality=90)]  # gray
    t = pa.table({"img_id": [f"m{s}" for s in range(4)], "image": payloads})
    out = (rd.from_arrow(t).map_batches(
        ImageDecode, fn_constructor_kwargs={"bytes_col": "image"},
        batch_format="pyarrow", concurrency=2, batch_size=2)
        .to_pandas().set_index("img_id"))
    for s, a in enumerate(arrs):
        row = out.loc[f"m{s}"]
        assert (row["height"], row["width"]) == a.shape[:2]
        assert row["channels"] == (1 if s == 3 else 3)
        # JPEG is lossy: luma within quantization error, not exact
        assert abs(row["mean_luma"] - img.luminance(a).mean()) < 2.0
