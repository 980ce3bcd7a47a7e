"""Deterministic synthetic clip-table generator (FIXTURES.md §B).

Every field is a pure function of ``(seed, clip index)`` via a splitmix64
hash — so generation parallelizes embarrassingly (any batch of indices can
be generated anywhere on the cluster with no shared state), and the
expected value of ANY row (signal, transcript, violation class) can be
re-derived row-locally by the validation pipeline. No external data.

Schema (BASELINE.json "input_hint"):
    clip_id:string  bytes:binary  sr_hz:int32  dur_ms:int32
    codec:string    transcript:string
plus ``partition_id:int32`` (= splitmix64(clip index) % P) used for
per-partition verdicts, drift injection and resumable output layout.

Injected violation classes (disjoint probability bands of one per-index
uniform; see ``violation_class``): duplicate clip_id, missing transcript,
sr_hz out of range, dur_ms outlier, truncated bytes, corrupted PCM,
null metadata. One partition (P-1) carries a distribution drift
(sr_hz all 22050, dur_ms ×1.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import audio

# violation probability bands over u_viol ~ U[0,1)
BAND_DUP = (0.000, 0.005)
BAND_MISSING_TRANSCRIPT = (0.005, 0.015)
BAND_SR_RANGE = (0.015, 0.018)
BAND_DUR_OUTLIER = (0.018, 0.021)
BAND_TRUNCATED = (0.021, 0.023)
BAND_CORRUPT_PCM = (0.023, 0.025)
BAND_NULL_META = (0.025, 0.026)

MAX_SAMPLES = 200_000  # cap generated audio length (also for lying metadata)

SR_CHOICES = np.array([8000, 16000, 22050, 44100], dtype=np.int32)
SR_CUM_W = np.cumsum([0.20, 0.40, 0.15, 0.25])
CODEC_CHOICES = np.array(["pcm_s16le", "flac", "opus", "mp3", "amr"], dtype=object)
CODEC_CUM_W = np.cumsum([0.70, 0.15, 0.10, 0.04, 0.01])

VOCAB = np.array([
    "the", "water", "level", "sensor", "flow", "alpha", "bravo", "charlie",
    "delta", "echo", "fox", "golf", "hotel", "india", "julia", "kilo",
    "lima", "mike", "nov", "oscar", "papa", "quebec", "romeo", "sierra",
    "tango", "uniform", "victor", "whiskey", "xray", "yankee", "zulu",
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "pump", "valve", "tank", "pipe", "leak", "clean", "raw",
    "sample", "record", "clip", "audio", "speech", "noise", "signal",
    "check", "status", "ok", "warn", "error", "drift", "mean", "sigma",
], dtype=object)

CLIP_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
    ("partition_id", pa.int32()),
])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash(seed: int, idx: np.ndarray, tag: int) -> np.ndarray:
    mask = 0xFFFFFFFFFFFFFFFF
    base = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.uint64((seed * 0xC2B2AE3D27D4EB4F) & mask)
            ^ np.uint64((tag * 0x165667B19E3779F9) & mask))
    return _splitmix64(base)


def _uniform(seed: int, idx: np.ndarray, tag: int) -> np.ndarray:
    return _hash(seed, idx, tag).astype(np.float64) / 2.0**64


def _choice(cum_weights: np.ndarray, choices: np.ndarray, u: np.ndarray) -> np.ndarray:
    return choices[np.searchsorted(cum_weights, u, side="right").clip(0, len(choices) - 1)]


def partition_of(idx: np.ndarray, P: int) -> np.ndarray:
    return (_splitmix64(np.asarray(idx, dtype=np.uint64)) % np.uint64(P)).astype(np.int32)


def _in_band(u: np.ndarray, band: tuple[float, float]) -> np.ndarray:
    return (u >= band[0]) & (u < band[1])


def base_metadata(seed: int, idx: np.ndarray, P: int) -> dict[str, np.ndarray]:
    """Clean (pre-violation) metadata for a batch of clip indices."""
    idx = np.asarray(idx, dtype=np.int64)
    sr = _choice(SR_CUM_W, SR_CHOICES, _uniform(seed, idx, 1)).astype(np.int32)
    # log-normal-ish duration around ~3000 ms, clamped [200, 15000]
    u1 = np.clip(_uniform(seed, idx, 2), 1e-12, 1 - 1e-12)
    u2 = _uniform(seed, idx, 3)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    dur = np.clip(np.exp(np.log(2500.0) + 0.55 * z), 200, 15000).astype(np.int32)
    codec = _choice(CODEC_CUM_W, CODEC_CHOICES, _uniform(seed, idx, 4))
    return {"sr_hz": sr, "dur_ms": dur, "codec": codec}


def violation_class(seed: int, idx: np.ndarray) -> np.ndarray:
    """Violation class per index: '' (clean) or one of dup/missing_transcript/
    sr_range/dur_outlier/truncated/corrupt_pcm/null_meta."""
    idx = np.asarray(idx, dtype=np.int64)
    u = _uniform(seed, idx, 10)
    out = np.full(len(idx), "", dtype=object)
    out[_in_band(u, BAND_DUP) & (idx > 0)] = "dup"
    out[_in_band(u, BAND_MISSING_TRANSCRIPT)] = "missing_transcript"
    out[_in_band(u, BAND_SR_RANGE)] = "sr_range"
    out[_in_band(u, BAND_DUR_OUTLIER)] = "dur_outlier"
    out[_in_band(u, BAND_TRUNCATED)] = "truncated"
    out[_in_band(u, BAND_CORRUPT_PCM)] = "corrupt_pcm"
    out[_in_band(u, BAND_NULL_META)] = "null_meta"
    return out


def dup_source(seed: int, idx: np.ndarray) -> np.ndarray:
    """For 'dup' rows: the earlier clip index whose clip_id is repeated."""
    idx = np.asarray(idx, dtype=np.int64)
    return (_hash(seed, idx, 11) % np.maximum(idx, 1).astype(np.uint64)).astype(np.int64)


def transcript_for(seed: int, clip_index: int, dur_ms: int) -> str:
    n_tokens = max(1, int(dur_ms) // 400)
    j = np.arange(n_tokens, dtype=np.int64)
    h = _hash(seed, j + np.int64(clip_index) * np.int64(1_000_003), 20)
    return " ".join(VOCAB[(h % np.uint64(len(VOCAB))).astype(np.int64)])


def transcripts_for_batch(seed: int, clip_index: np.ndarray,
                          dur_ms: np.ndarray) -> np.ndarray:
    """Vectorized ``transcript_for`` over a batch: ONE hash call over the
    concatenated token-index space instead of one per clip (the per-row
    form spends its time in numpy call overhead, not hashing)."""
    idx = np.asarray(clip_index, dtype=np.int64)
    dur = np.asarray(dur_ms, dtype=np.int64)
    if len(idx) == 0:
        return np.array([], dtype=object)
    n_tokens = np.maximum(1, dur // 400)
    offsets = np.concatenate([[0], np.cumsum(n_tokens)])
    total = int(offsets[-1])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tokens)
    base = np.repeat(idx * np.int64(1_000_003), n_tokens)
    h = _hash(seed, j + base, 20)
    words = VOCAB[(h % np.uint64(len(VOCAB))).astype(np.int64)]
    return np.array([" ".join(words[offsets[k]:offsets[k + 1]])
                     for k in range(len(idx))], dtype=object)


def generate_batch(seed: int, idx: np.ndarray, P: int = 16,
                   with_audio: bool = True) -> pa.Table:
    """Generate clip rows for a batch of indices — pure, parallel-safe."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    meta = base_metadata(seed, idx, P)
    vclass = violation_class(seed, idx)
    sr = meta["sr_hz"].copy()
    dur = meta["dur_ms"].copy()

    # clip ids (duplicates point at an earlier index's id; partition follows it)
    src = idx.copy()
    dmask = vclass == "dup"
    src[dmask] = dup_source(seed, idx)[dmask]
    clip_ids = np.array([f"clip-{i:09d}" for i in src], dtype=object)
    part = partition_of(src, P)

    # drift partition P-1: sr all 22050, dur mean ×1.6 (FIXTURES.md §B);
    # applied on the FINAL partition (duplicates follow their source's)
    drift = part == (P - 1)
    sr[drift] = 22050
    dur[drift] = np.clip((dur[drift] * 1.6).astype(np.int32), 200, 15000)

    # metadata violations
    m = vclass == "sr_range"
    sr[m] = np.where(_uniform(seed, idx[m], 12) < 0.5, 900, 192000).astype(np.int32)
    m = vclass == "dur_outlier"
    dur[m] = np.where(_uniform(seed, idx[m], 13) < 0.5, 1, 600000).astype(np.int32)

    sr_valid = pa.array(np.where(vclass == "null_meta", None, sr.astype(object)),
                        type=pa.int32())
    dur_valid = pa.array(np.where(vclass == "null_meta", None, dur.astype(object)),
                         type=pa.int32())

    transcripts: list[str | None] = []
    payloads: list[bytes | None] = []
    for k in range(n):
        i = int(idx[k])
        vc = vclass[k]
        d = int(dur[k])
        s = int(sr[k])
        if vc == "missing_transcript":
            transcripts.append("" if i % 2 == 0 else None)
        else:
            transcripts.append(transcript_for(seed, int(src[k]), d))
        if not with_audio:
            payloads.append(b"")
            continue
        n_samp = min(int(round(s * d / 1000.0)), MAX_SAMPLES)
        gen_sr = min(s, 48000)
        if vc == "corrupt_pcm":
            rng = np.random.default_rng(seed * 1_000_003 + i)
            sig = rng.uniform(-0.5, 0.5, size=n_samp)
        else:
            sig = audio.clip_signal(seed, int(src[k]), gen_sr, d,
                                    max_samples=n_samp)
        wav = audio.encode_wav(sig, s)
        if vc == "truncated":
            wav = wav[: len(wav) // 2]
        payloads.append(wav)

    return pa.table({
        "clip_id": pa.array(clip_ids, type=pa.string()),
        "bytes": pa.array(payloads, type=pa.binary()),
        "sr_hz": sr_valid,
        "dur_ms": dur_valid,
        "codec": pa.array(meta["codec"], type=pa.string()),
        "transcript": pa.array(transcripts, type=pa.string()),
        "partition_id": pa.array(part, type=pa.int32()),
    })


def ground_truth(seed: int, n: int, P: int = 16) -> dict[str, np.ndarray]:
    """Row indices per injected violation class (known-answer sets)."""
    idx = np.arange(n, dtype=np.int64)
    vclass = violation_class(seed, idx)
    out = {c: idx[vclass == c] for c in
           ["dup", "missing_transcript", "sr_range", "dur_outlier",
            "truncated", "corrupt_pcm", "null_meta"]}
    out["drift_partition"] = np.array([P - 1])
    return out


def generate_table(seed: int, n: int, P: int = 16, with_audio: bool = True,
                   batch_size: int = 2048) -> pa.Table:
    """Driver-side generation for tests/small scales."""
    tables = [generate_batch(seed, np.arange(s, min(s + batch_size, n)), P, with_audio)
              for s in range(0, n, batch_size)]
    return pa.concat_tables(tables)


def _write_shard(path: str, fidx: int, seed: int, start: int, stop: int,
                 P: int) -> None:
    import pyarrow.parquet as pq
    fp = f"{path}/clips-{fidx:05d}.parquet"
    tmp = fp + ".tmp"
    # audio payloads are high-entropy: compression buys ~nothing but costs
    # ~6s/file of decode CPU at read time; plain encoding reads ~memcpy-fast
    pq.write_table(generate_batch(seed, np.arange(start, stop), P), tmp,
                   compression="none", use_dictionary=False)
    import os
    os.replace(tmp, fp)  # atomic: readers never see a partial file


def write_clip_table(path: str, seed: int = 42, n: int = 2000, P: int = 16,
                     rows_per_file: int = 4096) -> None:
    """Write the clip table as partition-ranged parquet files under ``path``
    (idempotent, deterministic layout). Every shard is a pure function of
    (seed, index range), so shards fan out as Ray tasks when a Ray session
    is up; serial fallback otherwise (tests without Ray)."""
    import os

    os.makedirs(path, exist_ok=True)
    todo = []
    for fidx, s in enumerate(range(0, n, rows_per_file)):
        fp = os.path.join(path, f"clips-{fidx:05d}.parquet")
        if not os.path.exists(fp):
            todo.append((fidx, s, min(s + rows_per_file, n)))
    if not todo:
        return
    try:
        import ray
        use_ray = ray.is_initialized()
    except ImportError:
        use_ray = False
    if use_ray:
        import ray
        shard = ray.remote(num_cpus=1)(_write_shard)
        ray.get([shard.remote(path, fidx, seed, a, b, P)
                 for fidx, a, b in todo])
    else:
        for fidx, a, b in todo:
            _write_shard(path, fidx, seed, a, b, P)
