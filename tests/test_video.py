"""MJPEG/AVI video: container roundtrip, frame sampling, the real
VideoFrameSample decode stage, and honest rejection of inter-frame
codecs."""

import numpy as np
import pytest

from anomaly_detection_ray import image as img
from anomaly_detection_ray import jpeg, video


def _mk_frames(seed: int, n: int, size=(48, 64)):
    rng = np.random.default_rng(seed)
    frames, arrays = [], []
    for k in range(n):
        base = np.add.outer(np.linspace(0, 255, size[0]),
                            np.linspace(0, 255, size[1])) / 2
        a = np.clip(base[:, :, None] + rng.normal(0, 10, size + (3,))
                    + k * 5, 0, 255).astype(np.uint8)
        arrays.append(a)
        frames.append(jpeg.encode_jpeg(a, quality=85))
    return frames, arrays


def test_avi_roundtrip_and_meta():
    frames, arrays = _mk_frames(1, 6)
    data = video.encode_avi_mjpeg(frames, fps=5)
    got, meta = video.decode_avi(data)
    assert len(got) == 6 and meta["codec"] == "MJPG"
    assert meta["n_frames"] == 6 and meta["usec_per_frame"] == 200_000
    assert (meta["width"], meta["height"]) == (64, 48)
    for raw, arr in zip(got, arrays):
        dec, _ = jpeg.decode_jpeg(raw)
        assert dec.shape == arr.shape  # JPEG lossy: shape-exact


def test_sample_frames_uniform():
    frames, _ = _mk_frames(2, 10)
    data = video.encode_avi_mjpeg(frames, fps=10)
    samp = video.sample_frames(data, 4)
    assert [i for i, _, _ in samp] == [0, 3, 6, 9]
    assert [t for _, t, _ in samp] == [0.0, 300.0, 600.0, 900.0]
    # n > total: every frame once
    assert len(video.sample_frames(data, 99)) == 10


def test_rejects_interframe_codecs_and_garbage():
    frames, _ = _mk_frames(3, 2)
    data = bytearray(video.encode_avi_mjpeg(frames, fps=10))
    i = data.find(b"vids") + 4
    data[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        video.decode_avi(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        video.decode_avi(b"not a video at all")


def test_video_frame_sample_stage_real(ray_session):
    """The actor-pool stage decodes real MJPEG/AVI payloads into per-frame
    rows whose luma matches a direct decode."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.stages.multimodal import VideoFrameSample

    payloads, wants = [], {}
    for vid in range(3):
        frames, _ = _mk_frames(10 + vid, 5)
        payloads.append(video.encode_avi_mjpeg(frames, fps=5))
        for fi, ts, raw in video.sample_frames(payloads[-1], 3):
            arr, _ = jpeg.decode_jpeg(raw)
            wants[(f"v{vid}", fi)] = float(img.luminance(arr).mean())
    t = pa.table({"clip_id": [f"v{i}" for i in range(3)],
                  "video": payloads})
    out = (rd.from_arrow(t)
           .map_batches(VideoFrameSample,
                        fn_constructor_kwargs={"bytes_col": "video",
                                               "n_frames": 3},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas())
    assert len(out) == 9
    assert set(out["frame_idx"]) == {0, 2, 4}
    assert (out["height"] == 48).all() and (out["width"] == 64).all()
    for _, r in out.iterrows():
        assert r["mean_luma"] == pytest.approx(
            wants[(r["clip_id"], r["frame_idx"])])
