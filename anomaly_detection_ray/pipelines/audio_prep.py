"""Audio training-data preparation pipeline: quality-gate -> rate-normalize
-> segment -> partitioned parquet, resumable per partition.

This is the composition a 100 TB audio corpus needs before model training:
keep only clips that pass the signal-quality gate (clipping / silence /
optional flatness ceiling), resample every survivor to one target rate,
chunk into fixed-length training windows, and write one parquet directory
per input partition with a lineage manifest so a failed run resumes.

Execution shape: ONE fused actor-pool stage (``AudioPrep``) does decode ->
grade -> resample -> segment per clip — the payload is decoded exactly
once and re-encoded exactly once per emitted segment (chaining the
standalone SpectralFeatures/ResampleAudio/SegmentClips stages would decode
three times and ship intermediate WAV bytes twice through the object
store). Per-partition metrics flow through a small side-channel actor (the
validate.py pattern); the segment stream goes straight to
``write_parquet(partition_cols=["partition_id"])`` — nothing materializes.

Resume mirrors validate.py: config-hashed manifest, completed partitions
skipped via predicate pushdown at the read, partition dirs cleared before
rewrite so re-runs are idempotent.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .. import audio
from ..sources.clips import read_clips
from ..stages import audio_ops as ao
from ..stages.sizing import decode_pool_size
from . import checkpoint as ckpt


@dataclass(frozen=True)
class AudioPrepConfig:
    P: int = 16
    target_sr: int = 16000
    seg_ms: int = 1000
    min_ms: int = 200
    declip: bool = False            # cubic declip repair before grading
    err_clip: float = 0.01          # clipping_ratio above => drop
    max_flatness: float = 1.0       # spectral flatness above => drop (1.0 = off)
    min_speech: float = 0.0         # speech_ratio below => drop (0.0 = off)
    min_snr_db: float | None = None  # blind SNR below => drop (None = off)
    max_dc: float | None = None  # |DC offset| above => drop (None = off);
                                 # clips under ~50 ms stay ungated (a few
                                 # sine samples have a legit nonzero mean)
    remove_dc: bool = False      # subtract the mean before gating/resample
                                 # (repair-then-grade, the declip idiom)
    denoise_below_snr: float | None = None  # Wiener-denoise clips under
                                    # this blind SNR; clean clips untouched
    max_wow_cents: float | None = None  # wow/flutter modulation depth
                                    # above => drop (None = off); unpitched
                                    # clips stay ungated (no pitch, no
                                    # pitch-stability verdict)
    batch_size: int = 32
    concurrency: int = 0            # 0 = auto (decode_pool_size)
    resampler: str = "linear"       # "linear" (cheap) | "sinc" (anti-aliased)
    target_dbfs: float | None = None  # loudness normalization (None=off)
    level_mode: str = "rms"         # "rms" | "peak" | "lufs" (BS.1770 gated)
    seg_mode: str = "fixed"         # "fixed" windows | "vad" (cut at silence)


# Side-channel accumulation: pipelines/sidechannel.ShardedSink — sharded
# zero-CPU actors, blocking ack, content-key idempotent under task retry.
from .sidechannel import ShardedSink  # noqa: E402


class AudioPrep:
    """Fused per-clip prep: decode -> quality grade -> resample -> segment.

    Emits one row per kept segment: (clip_id, partition_id, seg_idx,
    seg_start_ms, seg_dur_ms, sr_hz, bytes). Metric partials go to the
    side-channel actor per batch (fire-and-forget)."""

    def __init__(self, cfg_dict: dict, metrics_actor=None):
        self.cfg = AudioPrepConfig(**cfg_dict)
        self.metrics = metrics_actor

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids, pids, seg_idx, start_ms, dur_ms, payloads = [], [], [], [], [], []
        stats: dict[int, dict] = {}
        part_col = t["partition_id"].to_numpy(zero_copy_only=False)
        for cid, pid, b in zip(t["clip_id"].to_pylist(), part_col,
                               t["bytes"].to_pylist()):
            pid = int(pid)
            st = stats.setdefault(pid, {"clips": 0, "kept": 0, "segments": 0,
                                        "drop_quality": 0, "drop_decode": 0})
            st["clips"] += 1
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                st["drop_decode"] += 1
                continue
            if cfg.declip:
                sig, _ = ao.declip(sig)   # repair, THEN grade: salvages
                                          # clips the gate would drop
            if cfg.remove_dc and len(sig) >= 256:
                sig = sig - float(np.mean(sig))
            if (cfg.max_dc is not None
                    and len(sig) >= max(256, int(sr) // 20)
                    and abs(float(np.mean(sig))) > cfg.max_dc):
                st["drop_quality"] += 1
                continue
            clip_r = ao.clipping_stats(sig)["clipping_ratio"]
            if clip_r > cfg.err_clip:
                st["drop_quality"] += 1
                continue
            if cfg.min_speech > 0.0 or cfg.max_flatness < 1.0:
                speech = ao.vad_stats(sig, sr)["speech_ratio"]
                if speech < cfg.min_speech or speech == 0.0:
                    st["drop_quality"] += 1
                    continue
                if cfg.max_flatness < 1.0:
                    flat = ao.spectral_features(sig, sr)["flatness"]
                    if not np.isnan(flat) and flat > cfg.max_flatness:
                        st["drop_quality"] += 1
                        continue
            if cfg.max_wow_cents is not None:
                wf = ao.wow_flutter(sig, sr)
                depth = np.nanmax([wf["wow_cents"], wf["flutter_cents"]])
                if (wf["f0_med_hz"] == wf["f0_med_hz"]
                        and depth == depth and depth > cfg.max_wow_cents):
                    st["drop_quality"] += 1
                    continue
            if cfg.min_snr_db is not None or cfg.denoise_below_snr is not None:
                snr = ao.snr_estimate(sig, sr)["snr_db"]
                if (cfg.min_snr_db is not None and not np.isnan(snr)
                        and snr < cfg.min_snr_db):
                    st["drop_quality"] += 1
                    continue
                # salvage the band above the drop gate but below the
                # denoise threshold; clean clips stay bit-untouched (the
                # Wiener floor HURTS already-clean audio — see kernel doc)
                if (cfg.denoise_below_snr is not None and not np.isnan(snr)
                        and snr < cfg.denoise_below_snr):
                    sig = ao.denoise_wiener(sig, sr)
            rs = (ao.resample_sinc(sig, sr, cfg.target_sr)
                  if cfg.resampler == "sinc"
                  else ao.resample_linear(sig, sr, cfg.target_sr))
            if cfg.target_dbfs is not None:
                rs = ao.gain_to_dbfs(rs, cfg.target_dbfs,
                                     mode=cfg.level_mode, sr=cfg.target_sr)
            seg_n = max(1, int(cfg.target_sr * cfg.seg_ms / 1000.0))
            min_n = int(cfg.target_sr * cfg.min_ms / 1000.0)
            if cfg.seg_mode == "vad":
                # silence-aware rows: speech spans (small pauses closed,
                # context-padded), each span then cut to <= seg_ms
                spans = ao.vad_segments(rs, cfg.target_sr)
                ranges = [(s0 + s, min(s0 + s + seg_n, e0))
                          for s0, e0 in spans
                          for s in range(0, e0 - s0, seg_n)]
            else:
                ranges = [(s, min(s + seg_n, len(rs)))
                          for s in range(0, len(rs), seg_n)]
            kept_any = False
            k = 0
            for s, e in ranges:
                if e - s < min_n:
                    continue
                ids.append(cid)
                pids.append(pid)
                seg_idx.append(k)
                k += 1
                start_ms.append(s / cfg.target_sr * 1000.0)
                dur_ms.append((e - s) / cfg.target_sr * 1000.0)
                payloads.append(audio.encode_wav(rs[s:e], cfg.target_sr))
                kept_any = True
            if kept_any:
                st["kept"] += 1
        # segment counts per partition (recount once, vectorized)
        if pids:
            u, c = np.unique(np.asarray(pids), return_counts=True)
            for p, n in zip(u, c):
                stats[int(p)]["segments"] += int(n)
        if self.metrics is not None:
            # blocking sharded ack + content key (see sidechannel.py): the
            # driver's total() cannot outrun in-flight adds, and a retried
            # batch re-adds idempotently
            import hashlib
            key = hashlib.md5(b"".join(
                s.encode() for s in t["clip_id"].to_pylist()
                if s is not None)).digest()
            self.metrics.add_sync(key, [{"partition_id": p, **e}
                                        for p, e in stats.items()])
        return pa.table({
            "clip_id": pa.array(ids, type=pa.string()),
            "partition_id": pa.array(pids, type=pa.int32()),
            "seg_idx": pa.array(seg_idx, type=pa.int32()),
            "seg_start_ms": pa.array(start_ms, type=pa.float64()),
            "seg_dur_ms": pa.array(dur_ms, type=pa.float64()),
            "sr_hz": pa.array(np.full(len(ids), self.cfg.target_sr,
                                      dtype=np.int32)),
            "bytes": pa.array(payloads, type=pa.binary()),
        })


def run_audio_prep(path: str, out_dir: str,
                   cfg: AudioPrepConfig | None = None,
                   resume: bool = True) -> dict:
    """End-to-end prep run. Returns {metrics, segments_path, skipped...}."""
    cfg = cfg or AudioPrepConfig()
    cfg_hash = ckpt.config_hash(asdict(cfg))
    manifest, done, todo = ckpt.begin_partitioned_run(
        out_dir, cfg_hash, cfg.P, resume, data_subdir="segments")
    t0 = time.time()

    seg_path = os.path.join(out_dir, "segments")
    result = {"config_hash": cfg_hash, "skipped_partitions": sorted(done),
              "segments_path": seg_path, "out_dir": out_dir}
    METRIC_KEYS = ["clips", "kept", "segments", "drop_quality", "drop_decode"]
    if not todo:
        result.update({"metrics": pd.DataFrame(
            [{"partition_id": int(p), **e["metrics"]}
             for p, e in manifest["partitions"].items()])
            [["partition_id", *METRIC_KEYS]], "wall_sec": 0.0})
        return result

    ds = read_clips(path, columns=["clip_id", "bytes", "partition_id"],
                    partitions=todo if done else None)
    acc = ShardedSink()
    pool = cfg.concurrency or decode_pool_size()
    segs = ds.map_batches(
        AudioPrep,
        fn_constructor_kwargs={"cfg_dict": asdict(cfg), "metrics_actor": acc},
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=pool, num_cpus=1)

    segs.write_parquet(seg_path, partition_cols=["partition_id"])
    metrics = acc.total()
    acc.kill()

    ckpt.finish_partitioned_run(out_dir, manifest, cfg_hash, metrics, todo,
                                METRIC_KEYS, path)
    result.update({"metrics": metrics, "wall_sec": time.time() - t0})
    return result
