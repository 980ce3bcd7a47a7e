"""Audio-native operators over the clip table's binary WAV column.

These are the training-data-pipeline stages an audio corpus needs beyond
plain validation: spectral feature extraction, voice-activity / silence
statistics, a clipping+silence quality grade (the reference's 4-valued
verdict idiom from /root/reference/src/algorithms/anomaly_detection.py:41-50
applied to signal-quality constraints), content-based acoustic
fingerprinting with exact and Hamming-banded near-duplicate detection
(Haitsma & Kalker 2002 band-energy-sign fingerprints — public method),
linear resampling, and fixed-window segmentation (chunking long clips into
training-sized rows).

Execution shape: every stage is an actor-pool ``map_batches`` over
``batch_format="pyarrow"`` with SMALL batches (binary payloads dominate
block size). Decode is inherently per-clip, but all per-clip math is
numpy-vectorized over the clip's samples/frames; nothing materializes the
dataset, and the dedup paths shuffle only (fingerprint, id) pairs — never
audio bytes.

Scale notes (100 TB):
- fingerprint dedup shuffles 16-byte rows after a per-batch partial count;
  bucket sizes are bounded by content collisions, not corpus size.
- near-dup banding explodes each fingerprint into 4 (band, key) rows —
  the same pigeonhole design as the SimHash text path (dedup.py); hot
  buckets are capped with a documented truncation log.
- segmentation multiplies row count but divides payload size; output rows
  are written per input partition so resume skips finished shards.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import audio
from ..functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE, WARNING_CODE
from .sizing import pool_size

# ---------------------------------------------------------------- kernels

FRAME = 512
HOP = 256
FP_BANDS = 33          # 33 band edges -> 32 energy bands -> 32 sign bits
FP_FMIN = 100.0
FP_FMAX = 2800.0


def frame_signal(sig: np.ndarray, frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """(n,) -> (n_frames, frame) view via stride tricks (no copy)."""
    sig = np.ascontiguousarray(sig, dtype=np.float64)
    if len(sig) < frame:
        pad = np.zeros(frame, dtype=np.float64)
        pad[: len(sig)] = sig
        return pad[None, :]
    n_frames = 1 + (len(sig) - frame) // hop
    return np.lib.stride_tricks.as_strided(
        sig, shape=(n_frames, frame),
        strides=(sig.strides[0] * hop, sig.strides[0]), writeable=False)


@functools.lru_cache(maxsize=16)
def _hann(frame: int) -> np.ndarray:
    w = np.hanning(frame)
    w.setflags(write=False)
    return w


def stft_mag(sig: np.ndarray, frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """Hann-windowed magnitude spectrogram, shape (n_frames, frame//2+1)."""
    frames = frame_signal(sig, frame, hop)
    return np.abs(np.fft.rfft(frames * _hann(frame), axis=1))


def spectral_features(sig: np.ndarray, sr: int,
                      frame: int = FRAME, hop: int = HOP,
                      S: np.ndarray | None = None) -> dict[str, float]:
    """Clip-level spectral descriptors from the time-averaged magnitude
    spectrum: zero-crossing rate (crossings/sec), spectral centroid /
    bandwidth / 85% rolloff (Hz), and spectral flatness (geometric/arith
    mean of power). Pass ``S`` (magnitude spectrogram at frame/hop) to
    reuse an already-computed STFT."""
    if len(sig) < 2:
        return {k: float("nan") for k in
                ("zcr", "centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness")}
    zcr = float(np.count_nonzero(np.signbit(sig[1:]) != np.signbit(sig[:-1]))
                / (len(sig) / sr))
    mag = (stft_mag(sig, frame, hop) if S is None else S).mean(axis=0)
    freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
    power = mag**2
    total = float(power.sum())
    if total <= 0.0:
        return {"zcr": zcr, "centroid_hz": float("nan"),
                "bandwidth_hz": float("nan"), "rolloff_hz": float("nan"),
                "flatness": float("nan")}
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    rolloff = float(freqs[np.searchsorted(np.cumsum(power), 0.85 * total)])
    flatness = float(np.exp(np.mean(np.log(power + 1e-20))) / (power.mean() + 1e-20))
    return {"zcr": zcr, "centroid_hz": centroid, "bandwidth_hz": bandwidth,
            "rolloff_hz": rolloff, "flatness": flatness}


def vad_stats(sig: np.ndarray, sr: int, threshold_db: float = -40.0,
              frame_ms: float = 25.0, hop_ms: float = 10.0) -> dict[str, float]:
    """Energy-threshold voice-activity statistics: fraction of active
    frames, leading/trailing silence (ms), and number of active segments.
    Threshold is ``threshold_db`` relative to the clip's peak frame RMS."""
    frame = max(2, int(sr * frame_ms / 1000.0))
    hop = max(1, int(sr * hop_ms / 1000.0))
    frames = frame_signal(sig, frame, hop)
    rms = np.sqrt(np.mean(frames**2, axis=1))
    peak = float(rms.max(initial=0.0))
    if peak <= 0.0:
        return {"speech_ratio": 0.0, "lead_silence_ms": len(sig) / sr * 1000.0,
                "trail_silence_ms": len(sig) / sr * 1000.0, "n_segments": 0}
    active = rms > peak * 10.0 ** (threshold_db / 20.0)
    idx = np.nonzero(active)[0]
    n_seg = int(np.count_nonzero(np.diff(idx) > 1) + 1) if len(idx) else 0
    lead = float(idx[0] * hop / sr * 1000.0) if len(idx) else len(sig) / sr * 1000.0
    tail_frames = len(active) - 1 - idx[-1] if len(idx) else len(active)
    trail = float(tail_frames * hop / sr * 1000.0)
    return {"speech_ratio": float(active.mean()), "lead_silence_ms": lead,
            "trail_silence_ms": trail, "n_segments": n_seg}


def denoise_wiener(sig: np.ndarray, sr: int, frame: int = 512,
                   hop: int = 256, alpha: float = 0.98,
                   gain_floor: float = 0.05) -> np.ndarray:
    """Decision-directed Wiener denoising (Ephraim & Malah 1984's
    a-priori SNR recursion with the Wiener gain): noise PSD from the
    same exponential-corrected median floor as snr_estimate, per-frame
    a-priori SNR xi smoothed by ``alpha`` (this smoothing — not the
    subtraction — is what kills musical noise: plain spectral
    subtraction coherently keeps the loudest noise atoms and measures
    ~0 dB net), COLA Hann overlap-add resynthesis (identity >60 dB
    pinned).

    Measured behavior (pinned in tests): +5 dB SNR at 5 dB input,
    ~+1 dB at 11 dB, -23 dB on pure noise, but a ~-20 dB processing
    floor that HURTS already-clean audio — callers should gate on
    snr_estimate and leave clean clips untouched (audio_prep's
    ``denoise_below_snr`` does exactly that)."""
    x = np.asarray(sig, dtype=np.float64)
    n = len(x)
    if n < frame or sr <= 0:
        return x.copy()
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    n_f = (n - frame) // hop + 1
    idx = np.arange(frame)[None, :] + hop * np.arange(n_f)[:, None]
    F = np.fft.rfft(x[idx] * w, axis=1)
    P = F.real ** 2 + F.imag ** 2
    noise = max(float(np.median(np.median(P, axis=0))) / np.log(2.0), 1e-300)
    G = np.empty_like(P)
    prev = np.zeros(P.shape[1])
    for i in range(n_f):
        gamma = P[i] / noise
        xi = alpha * prev + (1.0 - alpha) * np.maximum(gamma - 1.0, 0.0)
        g = np.maximum(xi / (1.0 + xi), gain_floor)
        G[i] = g
        prev = g * g * gamma
    y_f = np.fft.irfft(F * G, frame, axis=1)
    y = np.zeros(n)
    wsum = np.zeros(n)
    for i in range(n_f):
        s = i * hop
        y[s:s + frame] += y_f[i] * w
        wsum[s:s + frame] += w * w
    return np.where(wsum > 1e-6, y / np.maximum(wsum, 1e-6), x)


def declip(sig: np.ndarray, full_scale: float = 0.999
           ) -> tuple[np.ndarray, int]:
    """Repair clipped runs by cubic reconstruction: each maximal run of
    samples at/above ``full_scale`` is replaced with the Lagrange cubic
    through the two unclipped samples on each side (degree degrades
    gracefully at clip edges / adjacent runs) — the audio counterpart of
    the reference's value-repair normalization (LastNAverage replaces a
    flagged record from its neighborhood; this replaces flagged SAMPLES
    from theirs). Returns (repaired signal, n_samples_repaired).
    Physics pin (tests): a sine hard-clipped at 0.7 FS recovers >20 dB
    of SNR. Runs wider than the support can anchor stay clipped honestly
    rather than inventing a waveform."""
    x = np.asarray(sig, dtype=np.float64).copy()
    clipped = np.abs(x) >= full_scale
    if not clipped.any():
        return x, 0
    idx = np.nonzero(clipped)[0]
    runs = np.split(idx, np.nonzero(np.diff(idx) > 1)[0] + 1)
    n = len(x)
    fixed = 0
    for r in runs:
        a, b = int(r[0]), int(r[-1])
        pts = [i for i in (a - 2, a - 1, b + 1, b + 2)
               if 0 <= i < n and not clipped[i]]
        if len(pts) < 2:
            continue
        p = np.asarray(pts, dtype=np.float64) - a   # local coords: conditioning
        coef = np.polyfit(p, x[pts], min(3, len(pts) - 1))
        x[r] = np.polyval(coef, r - a)
        fixed += len(r)
    return x, fixed


def vad_segments(sig: np.ndarray, sr: int, threshold_db: float = -40.0,
                 frame_ms: float = 25.0, hop_ms: float = 10.0,
                 min_gap_ms: float = 200.0,
                 pad_ms: float = 50.0) -> list[tuple[int, int]]:
    """Speech spans as (start_sample, end_sample) pairs: energy-VAD
    frames (same detector as vad_stats), gaps shorter than
    ``min_gap_ms`` closed (intra-utterance pauses stay inside one
    span), then each span padded by ``pad_ms`` context on both sides.

    The boundary primitive for silence-aware corpus segmentation: a
    fixed window chops words in half and keeps padding; cutting at VAD
    boundaries yields utterance-shaped training rows."""
    n = len(sig)
    if n == 0 or sr <= 0:
        return []
    frame = max(2, int(sr * frame_ms / 1000.0))
    hop = max(1, int(sr * hop_ms / 1000.0))
    frames = frame_signal(sig, frame, hop)
    if len(frames) == 0:
        return [(0, n)]
    rms = np.sqrt(np.mean(frames ** 2, axis=1))
    peak = float(rms.max(initial=0.0))
    if peak <= 0.0:
        return []
    active = rms > peak * 10.0 ** (threshold_db / 20.0)
    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return []
    # runs of active frames; close gaps below min_gap
    max_gap = max(1, int(min_gap_ms / hop_ms))
    breaks = np.nonzero(np.diff(idx) > max_gap)[0]
    starts = np.concatenate([[idx[0]], idx[breaks + 1]])
    ends = np.concatenate([idx[breaks], [idx[-1]]])
    pad = int(sr * pad_ms / 1000.0)
    out = []
    for s_f, e_f in zip(starts, ends):
        s = max(0, int(s_f) * hop - pad)
        e = min(n, int(e_f) * hop + frame + pad)
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], e)          # padding merged spans
        else:
            out.append((s, e))
    return out


def clipping_stats(sig: np.ndarray, full_scale: float = 0.999) -> dict[str, float]:
    """Fraction of samples at/above digital full scale + DC offset (the
    two classic recording-quality defects)."""
    if len(sig) == 0:
        return {"clipping_ratio": float("nan"), "dc_offset": float("nan")}
    return {"clipping_ratio": float(np.mean(np.abs(sig) >= full_scale)),
            "dc_offset": float(np.mean(sig))}


def snr_estimate(sig: np.ndarray, sr: int, frame: int = 512,
                 hop: int = 256, P: np.ndarray | None = None) -> dict[str, float]:
    """Blind per-clip SNR: spectral noise-floor estimation (the
    minimum/percentile-statistics family, Martin 2001's principle).

    Per-frequency-bin noise PSD = temporal MEDIAN of the power
    spectrogram corrected for the exponential periodogram distribution
    (median = ln2 x mean for complex-Gaussian noise bins); the median
    ACROSS bins then rejects the few tonal bins whose own floor is
    contaminated by steady signal. SNR = (mean total - noise) / noise.
    Physics-tested within 0.2 dB from +37 to +1 dB true SNR on
    tone+white and AM-modulated synth clips (test_audio_ops). Assumes
    the signal is sparse in time or frequency (speech/music/tones);
    a pause-free broadband signal reads as noise (documented limit of
    every noise-floor method). Returns snr_db plus the noise/signal
    levels in dBFS. Pass ``P`` (power spectrogram, frames x bins) to
    reuse an already-computed STFT."""
    x = np.asarray(sig, dtype=np.float64)
    if len(x) == 0 or sr <= 0:
        return {"snr_db": float("nan"), "noise_db": float("nan"),
                "signal_db": float("nan")}
    if P is None:
        if len(x) < frame:
            frame = max(16, 1 << int(np.log2(max(len(x), 16))))
            hop = max(8, frame // 2)
        P = stft_mag(x, frame, hop) ** 2
    if P.size == 0:
        return {"snr_db": float("nan"), "noise_db": float("nan"),
                "signal_db": float("nan")}
    floor = np.median(P, axis=0) / np.log(2.0)
    noise_pow = float(np.median(floor)) * P.shape[1]
    tot = float(P.sum(axis=1).mean())
    if noise_pow <= 0.0:
        return {"snr_db": float("inf"), "noise_db": float("-inf"),
                "signal_db": 10.0 * np.log10(max(tot, 1e-300))}
    sig_pow = max(tot - noise_pow, noise_pow * 1e-12)
    # dBFS scaling: power spectrogram sums are per-frame window energies;
    # report levels relative to the mean-square of the frames so
    # noise_db/signal_db decompose the clip's own power
    scale = tot / max(float(np.mean(x * x)), 1e-300)
    return {"snr_db": float(10.0 * np.log10(sig_pow / noise_pow)),
            "noise_db": float(10.0 * np.log10(noise_pow / scale)),
            "signal_db": float(10.0 * np.log10(sig_pow / scale))}


def band_edges(sr: int, n_edges: int = FP_BANDS, fmin: float = FP_FMIN,
               fmax: float = FP_FMAX) -> np.ndarray:
    """Log-spaced band edges clamped to Nyquist."""
    top = min(fmax, sr / 2.0 - 1.0)
    return np.geomspace(fmin, max(top, fmin * 1.5), n_edges)


def fingerprint(sig: np.ndarray, sr: int) -> int:
    """Content-based 32-bit acoustic fingerprint: sign of adjacent
    log-band-energy differences of the time-averaged spectrum over
    log-spaced bands (Haitsma-Kalker style, collapsed to clip level).
    Phase- and amplitude-invariant: the same tone mixture at any phase or
    gain maps to the same fingerprint; different dominant frequencies flip
    the bits around their band positions."""
    if len(sig) < 2:
        return 0
    mag = stft_mag(sig).mean(axis=0)
    freqs = np.fft.rfftfreq(FRAME, d=1.0 / sr)
    edges = band_edges(sr)
    power = mag**2
    # sum power per band via searchsorted bucketing (vectorized)
    pos = np.searchsorted(edges, freqs)
    valid = (pos > 0) & (pos < len(edges))
    e = np.zeros(len(edges) - 1)
    np.add.at(e, pos[valid] - 1, power[valid])
    loge = np.log(e + 1e-20)
    bits = (np.diff(loge) > 0).astype(np.uint64)
    return int(bits @ (np.uint64(1) << np.arange(len(bits), dtype=np.uint64)))


def resample_linear(sig: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample (cheap rate normalization; see
    resample_sinc for the anti-aliased quality path)."""
    if sr_from == sr_to or len(sig) == 0:
        return np.asarray(sig, dtype=np.float64)
    n_out = max(1, int(round(len(sig) * sr_to / sr_from)))
    x_out = np.arange(n_out, dtype=np.float64) * (sr_from / sr_to)
    return np.interp(x_out, np.arange(len(sig), dtype=np.float64), sig)


_SINC_LUT_PHASES = 8192
_sinc_lut_cache: dict[tuple, np.ndarray] = {}


def _sinc_kernel_lut(ratio: float, taps: int, beta: float) -> np.ndarray:
    """(PHASES+1, taps) Kaiser-sinc kernel rows sampled on a uniform phase
    grid φ∈[0,1]; row p is the kernel for an output sample falling at
    fractional position p/PHASES between input samples. Built ONCE per
    distinct (ratio, taps, beta) — the i0 Chebyshev evaluation that
    dominated per-sample kernel construction (~70% of resample time) now
    amortizes across every clip an actor processes; per-sample cost drops
    to two row gathers + a lerp. Max lerp error on the smooth kernel at
    8192 phases is ~1e-8 — far below 16-bit PCM quantization."""
    key = (round(ratio, 12), taps, beta)
    lut = _sinc_lut_cache.get(key)
    if lut is None:
        phi = (np.arange(_SINC_LUT_PHASES + 1, dtype=np.float64)
               / _SINC_LUT_PHASES)
        offs = np.arange(-taps // 2 + 1, taps // 2 + 1, dtype=np.float64)
        frac = phi[:, None] - offs[None, :]
        cutoff = min(1.0, ratio)
        x = frac / (taps / 2.0)
        win = (np.i0(beta * np.sqrt(np.clip(1.0 - x * x, 0.0, None)))
               / np.i0(beta))
        lut = cutoff * np.sinc(cutoff * frac) * win
        if len(_sinc_lut_cache) > 64:
            _sinc_lut_cache.clear()
        _sinc_lut_cache[key] = lut
    return lut


def resample_sinc(sig: np.ndarray, sr_from: int, sr_to: int,
                  taps: int = 32, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed-sinc resample — the quality path: anti-aliased on
    downsample (cutoff follows the output Nyquist), flat passband on
    upsample. Kernel rows come from a per-ratio phase LUT
    (_sinc_kernel_lut) interpolated at each output sample's phase; one
    vectorized (n_out × taps) gather per clip; per-sample kernel
    renormalization keeps unity gain at the clip edges."""
    sig = np.asarray(sig, dtype=np.float64)
    if sr_from == sr_to or len(sig) == 0:
        return sig
    ratio = sr_to / sr_from
    n_out = max(1, int(round(len(sig) * ratio)))
    t = np.arange(n_out, dtype=np.float64) / ratio
    base = np.floor(t).astype(np.int64)
    phi = t - base
    lut = _sinc_kernel_lut(ratio, taps, beta)
    pf = phi * _SINC_LUT_PHASES
    p0 = pf.astype(np.int64)
    w1 = (pf - p0)[:, None]
    h = lut[p0] * (1.0 - w1) + lut[p0 + 1] * w1
    offs = np.arange(-taps // 2 + 1, taps // 2 + 1)
    idx = base[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < len(sig))
    h = np.where(valid, h, 0.0)
    vals = sig[np.clip(idx, 0, len(sig) - 1)]
    norm = h.sum(axis=1)
    norm = np.where(np.abs(norm) < 1e-12, 1.0, norm)
    return (vals * h).sum(axis=1) / norm


def gain_to_dbfs(sig: np.ndarray, target_dbfs: float = -20.0,
                 mode: str = "rms", limit: float = 0.999,
                 sr: int | None = None) -> np.ndarray:
    """Loudness normalization: scale so the clip's RMS, peak, or gated
    integrated loudness (``mode="lufs"``, needs ``sr``; silence-immune —
    padding can't inflate the gain the way RMS leveling does) sits at
    ``target_dbfs``, then hard-limit to ±limit — the corpus-leveling
    step before training-window extraction."""
    sig = np.asarray(sig, dtype=np.float64)
    if len(sig) == 0:
        return sig
    if mode == "lufs":
        if not sr:
            raise ValueError("mode='lufs' requires sr")
        level_db = gated_loudness(sig, sr)["loudness_db"]
        if not np.isfinite(level_db):
            return sig
    else:
        level = (float(np.sqrt(np.mean(sig * sig))) if mode == "rms"
                 else float(np.max(np.abs(sig))))
        if level <= 0.0:
            return sig
        level_db = 20.0 * np.log10(level)
    gain = 10.0 ** ((target_dbfs - level_db) / 20.0)
    return np.clip(sig * gain, -limit, limit)


# ---------------------------------------------------------------- stages


@functools.lru_cache(maxsize=64)
def mel_filterbank(sr: int, n_fft: int = FRAME, n_mels: int = 26,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters on the HTK mel scale
    (2595·log10(1+f/700)) — the standard speech front-end filterbank.
    Cached per (sr, n_fft, n_mels, fmin, fmax): clips share a handful of
    sample rates, and rebuilding the bank per clip measured ~20% of the
    MFCC path. The returned array is read-only (shared across calls)."""
    fmax = fmax if fmax is not None else sr / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    pts = to_hz(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (bins - lo) / max(c - lo, 1e-12)
        down = (hi - bins) / max(hi - c, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    fb.setflags(write=False)
    return fb


@functools.lru_cache(maxsize=16)
def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis, (n_mfcc, n_mels), cached and read-only."""
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    n = np.arange(n_mels, dtype=np.float64)[None, :]
    dct = np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * n_mels))
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] *= np.sqrt(0.5)
    dct.setflags(write=False)
    return dct


def mfcc(sig: np.ndarray, sr: int, n_mels: int = 26, n_mfcc: int = 13,
         frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """(n_frames, n_mfcc) MFCCs: Hann STFT power -> mel filterbank ->
    log -> orthonormal DCT-II. One vectorized numpy pass per clip."""
    power = stft_mag(sig, frame, hop) ** 2
    fb = mel_filterbank(sr, frame, n_mels)
    logmel = np.log(power @ fb.T + 1e-10)
    return logmel @ _dct_matrix(n_mfcc, n_mels).T


def delta(M: np.ndarray, N: int = 2) -> np.ndarray:
    """Regression delta features (HTK book eq. 5.16): for each frame t,
    d_t = sum_{n=1..N} n (c_{t+n} - c_{t-n}) / (2 sum n^2), with edge
    frames replicated. Vectorized over the whole (n_frames, n_coef)
    matrix; apply twice for delta-delta."""
    if len(M) == 0:
        return M.copy()
    pad = np.concatenate([np.repeat(M[:1], N, axis=0), M,
                          np.repeat(M[-1:], N, axis=0)])
    denom = 2.0 * sum(n * n for n in range(1, N + 1))
    out = np.zeros_like(M, dtype=np.float64)
    for n in range(1, N + 1):
        out += n * (pad[N + n:len(pad) - N + n] - pad[N - n:len(pad) - N - n])
    return out / denom


def cmvn(M: np.ndarray) -> np.ndarray:
    """Per-clip cepstral mean-variance normalization: (M - mean) / std per
    coefficient — removes channel/loudness bias so downstream models see
    a comparable feature scale across recording conditions."""
    if len(M) == 0:
        return M.copy()
    mu = M.mean(axis=0, keepdims=True)
    sd = M.std(axis=0, keepdims=True)
    return (M - mu) / np.maximum(sd, 1e-10)


class MfccDeltaFeatures:
    """Actor-pool stage: WAV bytes -> per-clip delta/delta-delta MFCC
    summaries + CMVN'd dynamics in LONG form (clip_id, coef, delta_mean,
    delta_std, d2_std, cmvn_delta_std, n_frames). The per-frame matrices
    (static -> delta -> delta-delta, CMVN) stay inside the actor; only
    the fixed-width summary rows leave, so block size is independent of
    clip length."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 n_mels: int = 26, n_mfcc: int = 13, N: int = 2):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.n_mels, self.n_mfcc, self.N = n_mels, n_mfcc, N

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in
                                 ("id", "coef", "delta_mean", "delta_std",
                                  "d2_std", "cmvn_delta_std", "n_frames")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            m = mfcc(sig, sr, self.n_mels, self.n_mfcc)
            d1 = delta(m, self.N)
            d2 = delta(d1, self.N)
            dc = delta(cmvn(m), self.N)
            rows["id"].extend([cid] * self.n_mfcc)
            rows["coef"].extend(range(self.n_mfcc))
            rows["delta_mean"].extend(d1.mean(axis=0).tolist())
            rows["delta_std"].extend(d1.std(axis=0).tolist())
            rows["d2_std"].extend(d2.std(axis=0).tolist())
            rows["cmvn_delta_std"].extend(dc.std(axis=0).tolist())
            rows["n_frames"].extend([m.shape[0]] * self.n_mfcc)
        return pa.table({
            self.id_col: pa.array(rows["id"], type=pa.string()),
            "coef": pa.array(rows["coef"], type=pa.int32()),
            "delta_mean": pa.array(rows["delta_mean"], type=pa.float64()),
            "delta_std": pa.array(rows["delta_std"], type=pa.float64()),
            "d2_std": pa.array(rows["d2_std"], type=pa.float64()),
            "cmvn_delta_std": pa.array(rows["cmvn_delta_std"],
                                       type=pa.float64()),
            "n_frames": pa.array(rows["n_frames"], type=pa.int32())})


class MelFeatures:
    """Actor-pool stage: WAV bytes -> per-clip MFCC summary rows in LONG
    form (clip_id, coef, mfcc_mean, mfcc_std, n_frames) — the speech
    front-end features a training-data pipeline aggregates per corpus.
    Long form keeps the schema fixed-width and SQL/fixture friendly;
    per-frame matrices stay inside the actor (they are intermediate
    state, not pipeline payload)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 n_mels: int = 26, n_mfcc: int = 13):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.n_mels, self.n_mfcc = n_mels, n_mfcc

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, coefs, means, stds, n_frames = [], [], [], [], []
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            m = mfcc(sig, sr, self.n_mels, self.n_mfcc)
            ids.extend([cid] * self.n_mfcc)
            coefs.extend(range(self.n_mfcc))
            means.extend(m.mean(axis=0).tolist())
            stds.extend(m.std(axis=0).tolist())
            n_frames.extend([m.shape[0]] * self.n_mfcc)
        return pa.table({
            self.id_col: pa.array(ids, type=pa.string()),
            "coef": pa.array(coefs, type=pa.int32()),
            "mfcc_mean": pa.array(means, type=pa.float64()),
            "mfcc_std": pa.array(stds, type=pa.float64()),
            "n_frames": pa.array(n_frames, type=pa.int32())})


class SpectralFeatures:
    """Actor-pool stage: WAV bytes -> spectral + VAD + clipping columns and
    a 4-valued audio-quality verdict (aq_code/aq_status).

    Grade (documented constraint, reference verdict idiom): Undefined if
    the payload fails to decode; Error if clipping_ratio > err_clip or the
    clip is entirely silent; Warning if clipping_ratio > warn_clip or
    speech_ratio < min_speech; else OK.
    """

    FLOAT_COLS = ("zcr", "centroid_hz", "bandwidth_hz", "rolloff_hz",
                  "flatness", "speech_ratio", "lead_silence_ms",
                  "trail_silence_ms", "clipping_ratio", "dc_offset",
                  "snr_db", "noise_db")

    def __init__(self, bytes_col: str = "bytes", err_clip: float = 0.01,
                 warn_clip: float = 0.001, min_speech: float = 0.1,
                 keep_bytes: bool = False):
        self.bytes_col = bytes_col
        self.err_clip = err_clip
        self.warn_clip = warn_clip
        self.min_speech = min_speech
        self.keep_bytes = keep_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.bytes_col].to_pylist()
        n = len(payloads)
        cols = {c: np.full(n, np.nan) for c in self.FLOAT_COLS}
        n_seg = np.zeros(n, dtype=np.int32)
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.full(n, "Undefined: audio payload not decodable",
                         dtype=object)
        for i, b in enumerate(payloads):
            if not b:
                continue
            sig, sr = audio.decode_wav_lenient(b)
            if sig is None or not sr:
                continue
            # ONE stft per clip, shared by the descriptor and blind-SNR
            # kernels (an extra fft pass measured ~15% of this stage)
            S = (stft_mag(np.asarray(sig, dtype=np.float64), FRAME, HOP)
                 if len(sig) >= FRAME else None)
            feats = spectral_features(sig, sr, S=S)
            feats.update(vad_stats(sig, sr))
            feats.update(clipping_stats(sig))
            snr = snr_estimate(sig, sr, FRAME, HOP,
                               P=None if S is None else S ** 2)
            feats["snr_db"] = snr["snr_db"]
            feats["noise_db"] = snr["noise_db"]
            n_seg[i] = int(feats.pop("n_segments"))
            for k, v in feats.items():
                cols[k][i] = v
            clip_r = cols["clipping_ratio"][i]
            speech = cols["speech_ratio"][i]
            if clip_r > self.err_clip or speech == 0.0:
                code[i] = ERROR_CODE
                status[i] = ("Error: clipped audio"
                             if clip_r > self.err_clip else "Error: silent audio")
            elif clip_r > self.warn_clip or speech < self.min_speech:
                code[i] = WARNING_CODE
                status[i] = ("Warning1: audio near full scale"
                             if clip_r > self.warn_clip
                             else "Warning1: mostly silent audio")
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        if not self.keep_bytes:
            t = t.drop_columns([self.bytes_col])
        for k in self.FLOAT_COLS:
            t = t.append_column(k, pa.array(cols[k], type=pa.float64()))
        return (t.append_column("n_segments", pa.array(n_seg))
                 .append_column("aq_code", pa.array(code, type=pa.int8()))
                 .append_column("aq_status", pa.array(status, type=pa.string())))


class DeclipStats:
    """Actor-pool stage: WAV bytes -> declip repair stats per clip
    (clipping ratio before/after, samples repaired, residual-clip flag).
    The repair itself is a pure kernel (``declip``) so audio_prep can
    apply it inline in its fused decode pass without re-decoding."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 full_scale: float = 0.999):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.full_scale = full_scale

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        n = len(ids)
        before = np.full(n, np.nan)
        after = np.full(n, np.nan)
        fixed = np.zeros(n, dtype=np.int32)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            n_clip = int(np.count_nonzero(np.abs(sig) >= self.full_scale))
            before[i] = n_clip / len(sig)
            _, nf = declip(sig, self.full_scale)
            # "after" counts samples still stuck in UNREPAIRED runs —
            # reconstructed peaks legitimately exceed the old rail, so an
            # amplitude re-count would be meaningless
            after[i] = (n_clip - nf) / len(sig)
            fixed[i] = nf
        return pa.table({
            self.id_col: t[self.id_col],
            "clip_ratio_before": pa.array(np.round(before, 6),
                                          type=pa.float64()),
            "clip_ratio_after": pa.array(np.round(after, 6),
                                         type=pa.float64()),
            "n_repaired": pa.array(fixed, type=pa.int32())})


def declip_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                 concurrency: int = 0, full_scale: float = 0.999):
    return ds.map_batches(DeclipStats,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "full_scale": full_scale},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


class DenoiseStats:
    """Actor-pool stage: WAV bytes -> SNR-gated Wiener denoise audit per
    clip (blind SNR before/after, processed flag, residual-energy delta).
    The repair itself is a pure kernel (``denoise_wiener``) so audio_prep
    applies it inline in its fused decode pass (``denoise_below_snr``);
    this stage is the standalone audit/repair view of the same gate:
    clips whose blind SNR (``snr_estimate``) sits below ``below_snr_db``
    are processed, everything else is reported untouched — the kernel's
    ~-20 dB processing floor HURTS already-clean audio (pinned in
    tests/test_audio_ops), so an ungated pass would be wrong, not just
    wasteful."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 below_snr_db: float = 10.0):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.below_snr_db = below_snr_db

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        n = len(ids)
        snr_before = np.full(n, np.nan)
        snr_after = np.full(n, np.nan)
        energy_delta = np.full(n, np.nan)
        proc = np.zeros(n, dtype=bool)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            s0 = snr_estimate(sig, sr)["snr_db"]
            snr_before[i] = s0
            if np.isnan(s0) or s0 >= self.below_snr_db:
                snr_after[i] = s0
                energy_delta[i] = 0.0
                continue
            den = denoise_wiener(sig, sr)
            proc[i] = True
            snr_after[i] = snr_estimate(den, sr)["snr_db"]
            e0 = float(np.mean(sig ** 2))
            e1 = float(np.mean(den ** 2))
            energy_delta[i] = (10.0 * np.log10(max(e1, 1e-300)
                                               / max(e0, 1e-300))
                               if e0 > 0 else 0.0)
        return pa.table({
            self.id_col: t[self.id_col],
            "snr_before_db": pa.array(np.round(snr_before, 4),
                                      type=pa.float64()),
            "snr_after_db": pa.array(np.round(snr_after, 4),
                                     type=pa.float64()),
            "denoised": pa.array(proc, type=pa.bool_()),
            "energy_delta_db": pa.array(np.round(energy_delta, 4),
                                        type=pa.float64())})


def denoise_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                  concurrency: int = 0, below_snr_db: float = 10.0):
    return ds.map_batches(DenoiseStats,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "below_snr_db": below_snr_db},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


class AudioFingerprint:
    """Actor-pool stage: WAV bytes -> fp:uint64 (0 for undecodable).

    Drops the payload column from its output by default: everything
    downstream (partial counts, band explode, groupby) only needs
    (id, fp), and carrying multi-KB binary rows through later stages
    dominates wall time (measured ~1.6x on the 20k-clip bench)."""

    def __init__(self, bytes_col: str = "bytes", keep_bytes: bool = False):
        self.bytes_col = bytes_col
        self.keep_bytes = keep_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = np.zeros(t.num_rows, dtype=np.uint64)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            if not b:
                continue
            sig, sr = audio.decode_wav_lenient(b)
            if sig is None or not sr:
                continue
            fps[i] = fingerprint(sig, sr)
        if not self.keep_bytes:
            t = t.drop_columns([self.bytes_col])
        return t.append_column("fp", pa.array(fps, type=pa.uint64()))


class ResampleAudio:
    """Actor-pool stage: re-encode every clip at ``target_sr`` (rate
    normalization for training). Adds bytes_rs / n_samples_rs; undecodable
    payloads pass through as empty."""

    def __init__(self, target_sr: int = 16000, bytes_col: str = "bytes",
                 emit_bytes: bool = True):
        self.target_sr = target_sr
        self.bytes_col = bytes_col
        self.emit_bytes = emit_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        out: list[bytes] = []
        n_out = np.zeros(t.num_rows, dtype=np.int64)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = audio.decode_wav_lenient(b) if b else (None, None)
            if sig is None or not sr:
                out.append(b"")
                continue
            rs = resample_linear(sig, sr, self.target_sr)
            if self.emit_bytes:
                out.append(audio.encode_wav(rs, self.target_sr))
            n_out[i] = len(rs)
        if self.emit_bytes:
            t = t.append_column("bytes_rs", pa.array(out, type=pa.binary()))
        return t.append_column("n_samples_rs", pa.array(n_out))


class SegmentClips:
    """Actor-pool stage: chunk each clip into fixed-length segments — one
    OUTPUT ROW per segment (clip_id, seg_idx, seg_start_ms, seg_dur_ms,
    seg_bytes). Short remainders below ``min_ms`` are dropped; undecodable
    clips yield no rows. Row multiplication with payload division: block
    sizes stay bounded."""

    def __init__(self, seg_ms: int = 1000, min_ms: int = 200,
                 bytes_col: str = "bytes", id_col: str = "clip_id",
                 emit_bytes: bool = True, overlap_ms: int = 0):
        # overlap_ms > 0 gives sliding windows (hop = seg_ms - overlap_ms)
        # — the ASR-training chunking shape where boundary words must
        # appear whole in at least one window
        if not 0 <= overlap_ms < seg_ms:
            raise ValueError("overlap_ms must be in [0, seg_ms)")
        self.seg_ms = seg_ms
        self.min_ms = min_ms
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.emit_bytes = emit_bytes
        self.overlap_ms = overlap_ms

    def __call__(self, t: pa.Table) -> pa.Table:
        ids: list[str] = []
        seg_idx: list[int] = []
        start_ms: list[float] = []
        dur_ms: list[float] = []
        seg_bytes: list[bytes] = []
        payloads = t[self.bytes_col].to_pylist()
        clip_ids = t[self.id_col].to_pylist()
        for cid, b in zip(clip_ids, payloads):
            if not b:
                continue
            sig, sr = audio.decode_wav_lenient(b)
            if sig is None or not sr:
                continue
            seg_n = max(1, int(sr * self.seg_ms / 1000.0))
            min_n = int(sr * self.min_ms / 1000.0)
            hop_n = max(1, seg_n - int(sr * self.overlap_ms / 1000.0))
            for k, s in enumerate(range(0, len(sig), hop_n)):
                chunk = sig[s: s + seg_n]
                if len(chunk) < min_n:
                    break
                ids.append(cid)
                seg_idx.append(k)
                start_ms.append(s / sr * 1000.0)
                dur_ms.append(len(chunk) / sr * 1000.0)
                if self.emit_bytes:
                    seg_bytes.append(audio.encode_wav(chunk, sr))
        cols = {
            "clip_id": pa.array(ids, type=pa.string()),
            "seg_idx": pa.array(seg_idx, type=pa.int32()),
            "seg_start_ms": pa.array(start_ms, type=pa.float64()),
            "seg_dur_ms": pa.array(dur_ms, type=pa.float64()),
        }
        if self.emit_bytes:
            cols["seg_bytes"] = pa.array(seg_bytes, type=pa.binary())
        return pa.table(cols)


# ------------------------------------------------------------- pipelines


def spectral_feature_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                           concurrency: int = 0):
    """ds -> ds + spectral/VAD/quality columns (actor pool, small batches)."""
    return ds.map_batches(SpectralFeatures,
                          fn_constructor_kwargs={"bytes_col": bytes_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


def fingerprint_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                      concurrency: int = 0):
    return ds.map_batches(AudioFingerprint,
                          fn_constructor_kwargs={"bytes_col": bytes_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


def fingerprint_dedup(ds, bytes_col: str = "bytes", id_col: str = "clip_id",
                      concurrency: int = 0) -> pd.DataFrame:
    """Exact content-duplicate groups by acoustic fingerprint.

    Decode pass emits (fp) only; per-batch partial counts shrink the
    shuffle to one row per distinct fp per batch; the groupby merges
    partials. Only (fp, cnt>1) groups reach the driver — bounded by the
    number of content-collision groups, not corpus size."""
    from ..functions.fold import fold_partials
    fps = fingerprint_table(ds, bytes_col, concurrency=concurrency)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fp", as_index=False).agg(
            cnt=(id_col, "size"), keep_id=(id_col, "min"))

    # per-batch partials -> cardinality-aware merge (distinct fingerprints
    # are bounded by content diversity, usually far below the row count; a
    # Ray sort over hundreds of tiny partial blocks costs ~5s fixed —
    # measured — while the driver fold is O(#fps))
    out = fold_partials(fps.map_batches(partial, batch_format="pandas"),
                        "fp", {"cnt": "sum", "keep_id": "min"})
    out = out[out["cnt"] > 1].copy()
    out["cnt"] = out["cnt"].astype("int64")
    out["fp"] = out["fp"].astype("uint64")
    return out.sort_values("fp").reset_index(drop=True)


def fingerprint_neardup_pairs(ds, bytes_col: str = "bytes",
                              id_col: str = "clip_id", max_hamming: int = 3,
                              bucket_cap: int = 2000, quad_cap: int = 2048,
                              concurrency: int = 0,
                              with_report: bool = False) -> pd.DataFrame:
    """Near-duplicate clip pairs: 32-bit fingerprints banded into 4 bytes
    (pigeonhole: Hamming distance <= 3 across 4 bands guarantees one exact
    band match), candidate pairs verified by full Hamming distance. Mirrors
    the SimHash text path (dedup.py) on audio content: over-full buckets
    split recursively on sub-bands of the remaining bits (exact); only
    quadratic pair output inside near-identical mega-groups truncates,
    with the dropped count reported (sentinel id "" rows;
    ``with_report=True`` returns (pairs, {"truncated_pairs": n}))."""
    fps = fingerprint_table(ds, bytes_col, concurrency=concurrency)

    def explode(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = np.asarray(t[id_col].to_pylist(), dtype=object)
        bands, keys, bids, bfps = [], [], [], []
        for band in range(4):
            key = (fp >> np.uint64(band * 8)) & np.uint64(0xFF)
            bands.append(np.full(len(fp), band, dtype=np.int8))
            keys.append(key)
            bids.append(ids)
            bfps.append(fp)
        return pa.table({
            "band": pa.array(np.concatenate(bands)),
            "key": pa.array(np.concatenate(keys), type=pa.uint64()),
            id_col: pa.array(np.concatenate(bids), type=pa.string()),
            "fp": pa.array(np.concatenate(bfps), type=pa.uint64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pigeonhole_pairs
        empty = pd.DataFrame({"id_a": pd.Series(dtype=object),
                              "id_b": pd.Series(dtype=object),
                              "hamming": pd.Series(dtype=np.int64),
                              "trunc": pd.Series(dtype=np.int64)})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        if len(g) < 2:
            return empty
        band = int(g["band"].iloc[0])
        bits = np.setdiff1d(np.arange(32), np.arange(8 * band, 8 * band + 8))
        ia, ib, d, trunc = _pigeonhole_pairs(
            g[id_col].to_numpy(), g["fp"].to_numpy().astype(np.uint64),
            bits, max_hamming, bucket_cap, quad_cap)
        out = pd.DataFrame({"id_a": ia, "id_b": ib,
                            "hamming": d.astype(np.int64),
                            "trunc": np.zeros(len(ia), dtype=np.int64)})
        out = out.drop_duplicates(["id_a", "id_b"])
        if trunc:
            out = pd.concat([out, pd.DataFrame(
                {"id_a": [""], "id_b": [""], "hamming": [-1],
                 "trunc": [trunc]})], ignore_index=True)
        return out

    pairs = (fps.map_batches(explode, batch_format="pyarrow")
             .groupby(["band", "key"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # cardinality-aware pair dedup (same pattern as dedup.py minhash):
    # driver fold while pairs are few, automatic Ray groupby past threshold
    from ..functions.fold import fold_partials
    folded = fold_partials(pairs, ["id_a", "id_b"],
                           {"hamming": "min", "trunc": "sum"})
    report = {"truncated_pairs": 0}
    out = folded
    if len(folded):
        sentinel = folded["id_a"] == ""
        report["truncated_pairs"] = int(folded.loc[sentinel, "trunc"].sum())
        out = (folded[~sentinel].drop(columns=["trunc"])
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    else:
        out = folded.drop(columns=["trunc"], errors="ignore")
    out["hamming"] = out.get("hamming", pd.Series(dtype="int64")).astype("int64")
    if report["truncated_pairs"]:
        import logging
        logging.getLogger(__name__).warning(
            "fingerprint_neardup_pairs: %d candidate pairs beyond "
            "quad_cap=%d counted, not emitted", report["truncated_pairs"],
            quad_cap)
    return (out, report) if with_report else out


def segment_clips(ds, seg_ms: int = 1000, min_ms: int = 200,
                  bytes_col: str = "bytes", batch_size: int = 32,
                  concurrency: int = 0, emit_bytes: bool = True,
                  overlap_ms: int = 0):
    return ds.map_batches(SegmentClips,
                          fn_constructor_kwargs={"seg_ms": seg_ms,
                                                 "min_ms": min_ms,
                                                 "bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes,
                                                 "overlap_ms": overlap_ms},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


def resample_clips(ds, target_sr: int = 16000, bytes_col: str = "bytes",
                   batch_size: int = 32, concurrency: int = 0,
                   emit_bytes: bool = True):
    return ds.map_batches(ResampleAudio,
                          fn_constructor_kwargs={"target_sr": target_sr,
                                                 "bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


class AugmentClips:
    """Actor-pool stage: deterministic speech-training augmentation — per
    clip, each configured variant applies speed perturbation (Kaiser-sinc
    resample by the speed factor at fixed output rate, the sox
    speed-perturb idiom), a gain offset, and additive white noise at a
    fixed SNR, seeded from a stable hash of (clip_id, variant) so every
    run/partitioning yields byte-identical audio. One decode per clip
    feeds all variants; emits (clip_id, variant, speed, gain_db, snr_db,
    aug_ms, n_samples, rms, bytes?) — stats always, re-encoded WAV only
    when ``emit_bytes`` (feature pipelines skip the payload copy)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 speeds: tuple = (0.9, 1.0, 1.1), gain_db: float = 2.0,
                 snr_db: float = 20.0, emit_bytes: bool = False):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.speeds, self.gain_db, self.snr_db = speeds, gain_db, snr_db
        self.emit_bytes = emit_bytes

    def _one(self, sig: np.ndarray, sr: int, seed: int, speed: float):
        rng = np.random.default_rng(seed)
        out = resample_sinc(sig, sr, max(1, int(round(sr / speed))))
        gain = rng.uniform(-self.gain_db, self.gain_db)
        out = out * (10.0 ** (gain / 20.0))
        p_sig = float(np.mean(out * out))
        if p_sig > 0:
            p_noise = p_sig / (10.0 ** (self.snr_db / 10.0))
            out = out + rng.normal(0.0, np.sqrt(p_noise), len(out))
        return np.clip(out, -0.999, 0.999), gain

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in
                                 ("id", "variant", "speed", "gain_db",
                                  "snr_db", "aug_ms", "n_samples", "rms",
                                  "payload")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            base_seed = int(
                np.frombuffer(hashlib.md5(str(cid).encode()).digest()[:8],
                              dtype=np.uint64)[0] & np.uint64(0x7FFFFFFF))
            for v, speed in enumerate(self.speeds):
                aug, gain = self._one(sig, sr, base_seed + v, speed)
                rows["id"].append(cid)
                rows["variant"].append(v)
                rows["speed"].append(speed)
                rows["gain_db"].append(round(gain, 6))
                rows["snr_db"].append(self.snr_db)
                rows["aug_ms"].append(int(round(len(aug) * 1000.0 / sr)))
                rows["n_samples"].append(len(aug))
                rows["rms"].append(
                    round(float(np.sqrt(np.mean(aug * aug))), 6))
                rows["payload"].append(
                    audio.encode_wav(aug, sr) if self.emit_bytes else b"")
        out = {
            self.id_col: pa.array(rows["id"], type=pa.string()),
            "variant": pa.array(rows["variant"], type=pa.int32()),
            "speed": pa.array(rows["speed"], type=pa.float64()),
            "gain_db": pa.array(rows["gain_db"], type=pa.float64()),
            "snr_db": pa.array(rows["snr_db"], type=pa.float64()),
            "aug_ms": pa.array(rows["aug_ms"], type=pa.int32()),
            "n_samples": pa.array(rows["n_samples"], type=pa.int64()),
            "rms": pa.array(rows["rms"], type=pa.float64()),
        }
        if self.emit_bytes:
            out["aug_bytes"] = pa.array(rows["payload"], type=pa.binary())
        return pa.table(out)


def augment_clips(ds, bytes_col: str = "bytes", batch_size: int = 32,
                  concurrency: int = 0, emit_bytes: bool = False, **kw):
    return ds.map_batches(AugmentClips,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


def logmel(sig: np.ndarray, sr: int, n_mels: int = 26,
           frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """(n_frames, n_mels) log-mel spectrogram — the SpecAugment substrate
    (same Hann STFT power -> HTK mel filterbank front half as mfcc())."""
    power = stft_mag(sig, frame, hop) ** 2
    fb = mel_filterbank(sr, frame, n_mels)
    return np.log(power @ fb.T + 1e-10)


class SpecAugmentClips:
    """Actor-pool stage: feature-space augmentation policy stats — decode
    -> log-mel -> SpecAugment (Park et al. 2019, "SpecAugment: A Simple
    Data Augmentation Method for ASR"): ``n_time`` time masks of width
    U[0, t_max] and ``n_freq`` frequency masks of width U[0, f_max],
    masked cells set to the per-clip log-mel mean. Mask draws are seeded
    from md5(clip_id) so any run/partitioning emits identical masks.
    Emits fixed-width per-clip stats (the masked spectrogram itself is
    intermediate actor state, exactly like MelFeatures): n_frames,
    time_masked frames, freq_masked bins, masked_frac (union cell
    fraction), and pre/post log-mel means — post moves toward pre-mean by
    construction, a property the tests pin."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 n_mels: int = 26, n_time: int = 2, n_freq: int = 2,
                 t_max: int = 40, f_max: int = 8):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.n_mels = n_mels
        self.n_time, self.n_freq = n_time, n_freq
        self.t_max, self.f_max = t_max, f_max

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("id", "n_frames", "time_masked",
                                  "freq_masked", "masked_frac",
                                  "logmel_mean", "logmel_mean_post")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            M = logmel(sig, sr, self.n_mels)
            nf = M.shape[0]
            if nf == 0:
                continue
            rng = np.random.default_rng(int(np.frombuffer(
                hashlib.md5(f"specaug:{cid}".encode()).digest()[:8],
                dtype=np.uint64)[0] & np.uint64(0x7FFFFFFF)))
            tmask = np.zeros(nf, dtype=bool)
            fmask = np.zeros(self.n_mels, dtype=bool)
            for _ in range(self.n_time):
                w = int(rng.integers(0, min(self.t_max, nf) + 1))
                t0 = int(rng.integers(0, nf - w + 1))
                tmask[t0:t0 + w] = True
            for _ in range(self.n_freq):
                w = int(rng.integers(0, self.f_max + 1))
                f0 = int(rng.integers(0, self.n_mels - w + 1))
                fmask[f0:f0 + w] = True
            pre = float(M.mean())
            out = M.copy()
            out[tmask, :] = pre
            out[:, fmask] = pre
            cells = tmask.sum() * self.n_mels + (~tmask).sum() * fmask.sum()
            cols["id"].append(cid)
            cols["n_frames"].append(nf)
            cols["time_masked"].append(int(tmask.sum()))
            cols["freq_masked"].append(int(fmask.sum()))
            cols["masked_frac"].append(
                round(float(cells) / (nf * self.n_mels), 6))
            cols["logmel_mean"].append(round(pre, 6))
            cols["logmel_mean_post"].append(round(float(out.mean()), 6))
        return pa.table({
            self.id_col: pa.array(cols["id"], type=pa.string()),
            "n_frames": pa.array(cols["n_frames"], type=pa.int32()),
            "time_masked": pa.array(cols["time_masked"], type=pa.int32()),
            "freq_masked": pa.array(cols["freq_masked"], type=pa.int32()),
            "masked_frac": pa.array(cols["masked_frac"], type=pa.float64()),
            "logmel_mean": pa.array(cols["logmel_mean"], type=pa.float64()),
            "logmel_mean_post": pa.array(cols["logmel_mean_post"],
                                         type=pa.float64())})


def specaugment_clips(ds, bytes_col: str = "bytes", batch_size: int = 64,
                      concurrency: int = 0, **kw):
    return ds.map_batches(SpecAugmentClips,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


class MfccEmbedding:
    """Actor-pool stage: WAV bytes -> ONE fixed-width clip embedding
    (mean ++ std of the 13 MFCCs, 26-dim) + a stable int64 id hash for
    hash-slice sampling — the clip-level representation the clustering /
    ANN ops consume (pseudo-speaker clustering, audio SemDeDup)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 n_mels: int = 26, n_mfcc: int = 13):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.n_mels, self.n_mfcc = n_mels, n_mfcc

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, hashes, embs = [], [], []
        for cid, b in zip(df[self.id_col], df[self.bytes_col]):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            m = mfcc(sig, sr, self.n_mels, self.n_mfcc)
            ids.append(cid)
            hashes.append(int(np.frombuffer(
                hashlib.md5(str(cid).encode()).digest()[:8],
                dtype=np.uint64)[0] >> np.uint64(1)))
            embs.append(np.concatenate([m.mean(axis=0), m.std(axis=0)]))
        return pd.DataFrame({self.id_col: ids,
                             "cid": np.asarray(hashes, dtype=np.int64),
                             "embedding": embs})


def mfcc_embedding_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                         concurrency: int = 0, **kw):
    return ds.map_batches(MfccEmbedding,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


class TrimSilence:
    """Actor-pool stage: VAD-based lead/trail silence trim — the prep step
    between the silence quality gate (which only grades) and window
    extraction: find the first/last active frame at ``threshold_db``
    below the clip's peak frame RMS (same energy VAD as vad_stats), keep
    ``pad_ms`` of context on each side, and emit per-clip trim stats
    (+ re-encoded trimmed WAV when ``emit_bytes``). All-silent clips emit
    n_samples_out = 0 and empty bytes rather than dropping, so the row
    count is stable for downstream joins."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 threshold_db: float = -40.0, pad_ms: float = 50.0,
                 frame_ms: float = 25.0, hop_ms: float = 10.0,
                 emit_bytes: bool = False):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.threshold_db, self.pad_ms = threshold_db, pad_ms
        self.frame_ms, self.hop_ms = frame_ms, hop_ms
        self.emit_bytes = emit_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("id", "n_in", "n_out", "lead_ms",
                                  "trail_ms", "payload")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            frame = max(2, int(sr * self.frame_ms / 1000.0))
            hop = max(1, int(sr * self.hop_ms / 1000.0))
            frames = frame_signal(sig, frame, hop)
            rms = np.sqrt(np.mean(frames * frames, axis=1))
            peak = float(rms.max(initial=0.0))
            pad = int(sr * self.pad_ms / 1000.0)
            if peak <= 0.0:
                lo = hi = 0
            else:
                active = np.flatnonzero(
                    rms > peak * 10.0 ** (self.threshold_db / 20.0))
                if len(active) == 0:
                    lo = hi = 0
                else:
                    lo = max(0, active[0] * hop - pad)
                    hi = min(len(sig), active[-1] * hop + frame + pad)
            out = sig[lo:hi]
            cols["id"].append(cid)
            cols["n_in"].append(len(sig))
            cols["n_out"].append(len(out))
            cols["lead_ms"].append(int(round(lo * 1000.0 / sr)))
            cols["trail_ms"].append(
                int(round((len(sig) - hi) * 1000.0 / sr)))
            cols["payload"].append(
                audio.encode_wav(out, sr) if (self.emit_bytes and len(out))
                else b"")
        res = {
            self.id_col: pa.array(cols["id"], type=pa.string()),
            "n_samples_in": pa.array(cols["n_in"], type=pa.int64()),
            "n_samples_out": pa.array(cols["n_out"], type=pa.int64()),
            "trim_lead_ms": pa.array(cols["lead_ms"], type=pa.int32()),
            "trim_trail_ms": pa.array(cols["trail_ms"], type=pa.int32()),
        }
        if self.emit_bytes:
            res["trimmed_bytes"] = pa.array(cols["payload"],
                                            type=pa.binary())
        return pa.table(res)


def trim_silence(ds, bytes_col: str = "bytes", batch_size: int = 64,
                 concurrency: int = 0, **kw):
    return ds.map_batches(TrimSilence,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------------------------ pitch

def pitch_f0(sig: np.ndarray, sr: int, fmin: float = 60.0,
             fmax: float = 1000.0, max_s: float = 0.5) -> dict[str, float]:
    """Fundamental-frequency estimate by normalized autocorrelation with
    parabolic peak interpolation (the classic ACF pitch tracker; same
    family as Boersma 1993 / librosa's yin precursor). One FFT-based
    autocorrelation over (up to) the middle ``max_s`` seconds; the peak
    lag inside [sr/fmax, sr/fmin] gives f0 = sr / lag, and
    voiced_conf = r(lag)/r(0) separates periodic content from noise
    (a pure-ish tone scores near 1, white noise near 0)."""
    n = len(sig)
    use = int(min(n, max_s * sr))
    if use < 64 or sr <= 0:
        return {"f0_hz": float("nan"), "voiced_conf": float("nan")}
    start = (n - use) // 2
    x = np.asarray(sig[start:start + use], dtype=np.float64)
    x = x - x.mean()
    r0_guard = float((x * x).sum())
    if r0_guard <= 0.0:
        return {"f0_hz": float("nan"), "voiced_conf": float("nan")}
    # FFT autocorrelation (biased estimator — consistent across lags)
    nfft = 1 << int(np.ceil(np.log2(2 * use)))
    X = np.fft.rfft(x, nfft)
    r = np.fft.irfft(X * np.conj(X), nfft)[:use]
    lag_min = max(2, int(np.floor(sr / fmax)))
    lag_max = min(use - 2, int(np.ceil(sr / fmin)))
    if lag_max <= lag_min:
        return {"f0_hz": float("nan"), "voiced_conf": float("nan")}
    seg = r[lag_min:lag_max + 1]
    # subharmonic (octave-down) guard: a periodic signal peaks equally at
    # T, 2T, 3T…, and integer-lag sampling can make a multiple LOOK
    # higher when T is non-integer — take the SMALLEST lag within 5% of
    # the max (the standard octave-error mitigation), then refine
    top = float(seg.max())
    is_peak = np.zeros(len(seg), dtype=bool)
    is_peak[1:-1] = (seg[1:-1] >= seg[:-2]) & (seg[1:-1] >= seg[2:])
    cand = np.flatnonzero(is_peak & (seg >= 0.95 * top))
    k = lag_min + (int(cand[0]) if len(cand) else int(np.argmax(seg)))
    # parabolic refinement around the integer-lag peak
    y0, y1, y2 = r[k - 1], r[k], r[k + 1]
    denom = y0 - 2.0 * y1 + y2
    delta = 0.5 * (y0 - y2) / denom if denom != 0.0 else 0.0
    lag = k + float(np.clip(delta, -0.5, 0.5))
    return {"f0_hz": float(sr / lag),
            "voiced_conf": float(max(0.0, min(1.0, y1 / r[0])))}


class PitchFeatures:
    """Actor-pool stage: WAV bytes -> (f0_hz, voiced_conf) per clip.
    On the synthetic corpus the fundamental is known exactly
    (200 + (idx % 37)·13 Hz), so tests pin the estimator against
    physics, not a frozen copy of itself."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id"):
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .. import audio as _audio
        ids = t[self.id_col].to_pylist()
        f0 = np.full(len(ids), np.nan)
        conf = np.full(len(ids), np.nan)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (_audio.decode_wav_lenient(b) if b
                       else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            p = pitch_f0(sig, sr)
            f0[i], conf[i] = p["f0_hz"], p["voiced_conf"]
        return pa.table({
            self.id_col: t[self.id_col],
            "f0_hz": pa.array(np.round(f0, 4), type=pa.float64()),
            "voiced_conf": pa.array(np.round(conf, 6), type=pa.float64())})


def pitch_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                concurrency: int = 0):
    return ds.map_batches(PitchFeatures,
                          fn_constructor_kwargs={"bytes_col": bytes_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# --------------------------------------------------------------- loudness

def k_weighting_coeffs(sr: int) -> tuple[tuple, tuple, tuple, tuple]:
    """ITU-R BS.1770-4 K-weighting as two biquads (shelf_b, shelf_a,
    hp_b, hp_a) at sample rate ``sr``.

    Derived parametrically from the spec's analog parameters — stage-1
    spherical-head high shelf (fc 1681.97 Hz, +3.99984 dB, Q 0.70718)
    and stage-2 RLB high-pass (fc 38.1355 Hz, Q 0.50033) — via the
    published bilinear design (De Man 2013, "Evaluation of
    implementations of the ITU-R BS.1770 loudness algorithm"; the same
    parameterization pyloudnorm documents). At sr=48000 this reproduces
    the coefficient tables printed in BS.1770-4 itself to <1e-15
    (pinned in tests/test_audio_ops.py), which cross-validates both the
    parameters and the design math; unlike the fixed tables it is exact
    at EVERY clip sample rate, not just 48 kHz."""
    G, fc, Q = 3.999843853973347, 1681.974450955533, 0.7071752369554196
    K = np.tan(np.pi * fc / sr)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    shelf_b = ((Vh + Vb * K / Q + K * K) / a0, 2.0 * (K * K - Vh) / a0,
               (Vh - Vb * K / Q + K * K) / a0)
    shelf_a = (1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0)
    fc2, Q2 = 38.13547087602444, 0.5003270373238773
    K = np.tan(np.pi * fc2 / sr)
    a0 = 1.0 + K / Q2 + K * K
    hp_b = (1.0, -2.0, 1.0)
    hp_a = (1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q2 + K * K) / a0)
    return shelf_b, shelf_a, hp_b, hp_a


@functools.lru_cache(maxsize=32)
def _k_weight_fir(sr: int) -> np.ndarray:
    """Truncated impulse response of the K-weighting cascade at ``sr``,
    cached per sample rate and returned read-only.

    The 4th-order IIR is applied as FFT convolution with this kernel:
    the slowest pole (the 38 Hz high-pass, |p| ≈ sqrt(hp_a2)) sets the
    truncation length for a 1e-13 envelope, so the FIR result matches
    the exact recurrence to float64 noise (pinned against dsp.lfilter)
    while the per-clip cost is one rfft round-trip instead of a Python
    per-sample loop.

    ``sr`` is clamped into [4000, 192000] for the DESIGN: beyond that
    range the header is lying (the synth corpus ships such clips) and
    the unclamped high-pass pole walks to 1, making the kernel
    unboundedly long — a clamped-rate K-weighting is still the right
    measure for whatever signal actually decoded."""
    from ..functions import dsp
    sr = min(max(sr, 4000), 192000)
    shelf_b, shelf_a, hp_b, hp_a = k_weighting_coeffs(sr)
    radius = max(np.sqrt(abs(shelf_a[2])), np.sqrt(abs(hp_a[2])))
    n = int(np.log(1e-13) / np.log(min(radius, 1.0 - 1e-9))) + 8
    imp = np.zeros(n)
    imp[0] = 1.0
    h = dsp.lfilter(np.array(hp_b), np.array(hp_a),
                    dsp.lfilter(np.array(shelf_b), np.array(shelf_a), imp))
    h.setflags(write=False)
    return h


def k_weight(sig: np.ndarray, sr: int) -> np.ndarray:
    """Apply the BS.1770 K-weighting pre-filter (zero initial state,
    same-length output) via FFT convolution with the cached kernel."""
    x = np.asarray(sig, dtype=np.float64)
    n = len(x)
    if n == 0 or sr <= 0:
        return x
    h = _k_weight_fir(min(max(int(sr), 4000), 192000))
    m = 1 << int(np.ceil(np.log2(n + len(h) - 1)))
    y = np.fft.irfft(np.fft.rfft(x, m) * np.fft.rfft(h, m), m)[:n]
    return y


def gated_loudness(sig: np.ndarray, sr: int, block_ms: float = 400.0,
                   hop_ms: float = 100.0, abs_gate_db: float = -70.0,
                   rel_gate_db: float = -10.0,
                   k_weighting: bool = True) -> dict[str, float]:
    """Integrated LUFS per ITU-R BS.1770-4 (mono, channel weight 1):
    K-weighting pre-filter (parametric biquads, see k_weighting_coeffs),
    400 ms blocks at 75% overlap, -0.691 dB offset, -70 LUFS absolute
    gate, then a -10 LU relative gate off the surviving blocks' mean
    power. ``k_weighting=False`` degrades to the round-3 gated RMS dBFS
    measure (no pre-filter, no offset). Gating is the part that matters
    for corpus work: long silences must not drag the loudness estimate
    down, so normalization gains computed from it don't blast speech
    that happens to sit in a quiet clip.

    Returns integrated loudness_db, short-term range_db (p10..p95 of
    block loudness after the absolute gate), and block counts."""
    n = len(sig)
    if n == 0 or sr <= 0:
        return {"loudness_db": float("-inf"), "range_db": 0.0,
                "n_blocks": 0, "n_gated": 0}
    blk = int(sr * block_ms / 1000.0)
    hop = max(1, int(sr * hop_ms / 1000.0))
    if n < blk:
        blk = n
    if k_weighting:
        x = k_weight(sig, sr)
        off = -0.691
    else:
        x = np.asarray(sig, dtype=np.float64)
        off = 0.0
    n_blocks = max(1, (len(x) - blk) // hop + 1)
    idx = np.arange(blk)[None, :] + hop * np.arange(n_blocks)[:, None]
    ms = (x[idx] ** 2).mean(axis=1)
    with np.errstate(divide="ignore"):
        ldb = off + 10.0 * np.log10(ms)
    keep = ldb > abs_gate_db
    if not keep.any():
        return {"loudness_db": float("-inf"), "range_db": 0.0,
                "n_blocks": int(n_blocks), "n_gated": int(n_blocks)}
    rel_thresh = off + 10.0 * np.log10(ms[keep].mean()) + rel_gate_db
    final = keep & (ldb > rel_thresh)
    if not final.any():
        final = keep
    loud = off + 10.0 * np.log10(ms[final].mean())
    surv = ldb[keep]
    return {"loudness_db": float(loud),
            "range_db": float(np.quantile(surv, 0.95)
                              - np.quantile(surv, 0.10)),
            "n_blocks": int(n_blocks),
            "n_gated": int(n_blocks - final.sum())}


class LoudnessStats:
    """Actor-pool stage: WAV bytes -> integrated-LUFS columns + the gain
    (dB) to reach ``target_db`` (default -23 LUFS, the EBU R128 target)
    — the corpus loudness-normalization planning pass (apply is a scalar
    multiply inside any decode stage)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 target_db: float = -23.0):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.target_db = target_db

    def __call__(self, t: pa.Table) -> pa.Table:
        from .. import audio as _audio
        ids = t[self.id_col].to_pylist()
        cols = {k: np.full(len(ids), np.nan) for k in
                ("loudness_db", "range_db", "gain_db")}
        nb = np.zeros(len(ids), dtype=np.int32)
        ng = np.zeros(len(ids), dtype=np.int32)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (_audio.decode_wav_lenient(b) if b
                       else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            r = gated_loudness(sig, sr)
            cols["loudness_db"][i] = r["loudness_db"]
            cols["range_db"][i] = r["range_db"]
            cols["gain_db"][i] = (self.target_db - r["loudness_db"]
                                  if np.isfinite(r["loudness_db"])
                                  else np.nan)
            nb[i], ng[i] = r["n_blocks"], r["n_gated"]
        return pa.table({
            self.id_col: t[self.id_col],
            "loudness_db": pa.array(np.round(cols["loudness_db"], 6),
                                    type=pa.float64()),
            "range_db": pa.array(np.round(cols["range_db"], 6),
                                 type=pa.float64()),
            "gain_db": pa.array(np.round(cols["gain_db"], 6),
                                type=pa.float64()),
            "n_blocks": pa.array(nb, type=pa.int32()),
            "n_gated": pa.array(ng, type=pa.int32())})


def loudness_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                   concurrency: int = 0, target_db: float = -23.0):
    return ds.map_batches(LoudnessStats,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "target_db": target_db},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------- rhythm / tempo kernels


def _flux_envelope(S: np.ndarray) -> np.ndarray:
    """Positive spectral flux over a -60 dB-floored log spectrogram.
    The relative floor is load-bearing: without it, the 16-bit
    quantization-noise churn in sub-noise bins (a WAV round-trip puts
    periodic quantization harmonics ~-90 dB down) sums across 513 bins
    into a strong fake-rhythmic envelope — measured clarity 0.77+ on
    steady encoded tones. Floored, a steady tone's flux is exactly 0."""
    ref = float(S.max())
    if ref <= 0.0:
        return np.zeros(max(S.shape[0] - 1, 0))
    L = np.log(np.maximum(S, ref * 1e-3))
    return np.maximum(np.diff(L, axis=0), 0.0).sum(axis=1)


def onset_envelope(sig: np.ndarray, sr: int, frame: int = 1024,
                   hop: int = 256) -> tuple[np.ndarray, float]:
    """Spectral-flux onset strength envelope (Bello 2005): magnitude
    STFT floored at -60 dB below the clip peak, log, positive first
    difference summed over frequency. Returns (envelope,
    frames_per_second)."""
    x = np.asarray(sig, dtype=np.float64)
    if len(x) < 2 * frame or sr <= 0:
        return np.zeros(0), 0.0
    return _flux_envelope(stft_mag(x, frame, hop)), sr / hop


def tempo_estimate(sig: np.ndarray, sr: int, bpm_min: float = 50.0,
                   bpm_max: float = 240.0, frame: int = 1024,
                   hop: int = 256) -> dict[str, float]:
    """Global tempo by autocorrelation of the onset envelope (the
    envelope-autocorrelation stage of Ellis 2007's beat tracker, without
    the dynamic-programming beat grid): biased autocorrelation peaks at
    the shortest inter-onset period (longer multiples overlap fewer
    terms), parabolic refinement around the winning lag. Also reports
    onset count/rate (envelope peaks above mean + std) and a pulse
    clarity score (winning autocorrelation / zero-lag). Returns NaN bpm
    for silence / too-short / non-rhythmic input — the -60 dB spectral
    floor (see ``_flux_envelope``) zeroes a steady tone's flux outright,
    and autocorrelation clarity < 0.25 rejects white-noise flux (maxes
    at ~0.22 over 20 seeds; clean-to-moderate click tracks measure
    0.47-0.95). Near the gate the rhythm is GENUINELY ambiguous (clicks
    at 0 dB SNR measure ~0.2), so ``pulse_clarity`` is always emitted
    for callers that want a stricter cut."""
    nanr = {"bpm": float("nan"), "n_onsets": 0,
            "onset_rate_hz": float("nan"), "pulse_clarity": float("nan")}
    env, fps = onset_envelope(sig, sr, frame, hop)
    if len(env) < 8 or not np.any(env > 0):
        return nanr
    # absolute flux gate: a real onset lifts tens of bins through the
    # 60 dB floored range (peak flux: clicks ~650, speech-like ~19),
    # while a steady ENCODED tone's residual leakage/quantization churn
    # stays under ~3 (measured on the synth corpus at 4 sample rates) —
    # and the scale-free clarity ratio can't tell those apart
    if float(env.max()) < 0.01 * (frame // 2 + 1):
        return nanr
    # onset picking: local maxima above mean + std
    thr = env.mean() + env.std()
    peaks = np.nonzero((env[1:-1] > env[:-2]) & (env[1:-1] >= env[2:])
                       & (env[1:-1] > thr))[0]
    n_onsets = int(len(peaks))
    dur_s = len(sig) / sr
    e = env - env.mean()
    n = len(e)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    F = np.fft.rfft(e, nfft)
    ac = np.fft.irfft(F * np.conj(F), nfft)[:n] / n     # biased
    lag_min = max(1, int(np.floor(60.0 * fps / bpm_max)))
    lag_max = min(n - 1, int(np.ceil(60.0 * fps / bpm_min)))
    if lag_max <= lag_min or ac[0] <= 0:
        return {**nanr, "n_onsets": n_onsets,
                "onset_rate_hz": n_onsets / dur_s}
    seg = ac[lag_min:lag_max + 1]
    k = int(np.argmax(seg)) + lag_min
    clarity = float(ac[k] / ac[0])
    if clarity < 0.25:
        return {**nanr, "n_onsets": n_onsets,
                "onset_rate_hz": n_onsets / dur_s,
                "pulse_clarity": clarity}
    # parabolic lag refinement
    if 1 <= k < n - 1:
        y0, y1, y2 = ac[k - 1], ac[k], ac[k + 1]
        d = y0 - 2 * y1 + y2
        k = k + (0.5 * (y0 - y2) / d if d != 0 else 0.0)
    return {"bpm": float(60.0 * fps / k), "n_onsets": n_onsets,
            "onset_rate_hz": n_onsets / dur_s, "pulse_clarity": clarity}


class TempoFeatures:
    """Actor-pool stage: WAV bytes -> tempo/rhythm columns per clip
    (bpm, onset count/rate, pulse clarity). Non-rhythmic audio honestly
    reports NaN bpm rather than a hallucinated value."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id"):
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        n = len(ids)
        bpm = np.full(n, np.nan)
        rate = np.full(n, np.nan)
        clar = np.full(n, np.nan)
        n_on = np.zeros(n, dtype=np.int32)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            r = tempo_estimate(sig, sr)
            bpm[i], n_on[i] = r["bpm"], r["n_onsets"]
            rate[i], clar[i] = r["onset_rate_hz"], r["pulse_clarity"]
        return pa.table({
            self.id_col: t[self.id_col],
            "bpm": pa.array(np.round(bpm, 4), type=pa.float64()),
            "n_onsets": pa.array(n_on, type=pa.int32()),
            "onset_rate_hz": pa.array(np.round(rate, 4), type=pa.float64()),
            "pulse_clarity": pa.array(np.round(clar, 4),
                                      type=pa.float64())})


def tempo_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                concurrency: int = 0):
    return ds.map_batches(TempoFeatures,
                          fn_constructor_kwargs={"bytes_col": bytes_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------ time-stretch (WSOLA)


def time_stretch(sig: np.ndarray, sr: int, rate: float,
                 frame_ms: float = 50.0, search_ms: float = 10.0
                 ) -> np.ndarray:
    """Pitch-preserving time stretch by WSOLA (Verhelst & Roelands 1993):
    output is a Hann overlap-add of input frames taken near the ideal
    time-scaled positions, each shifted within ±search to maximize
    cross-correlation with the natural continuation of the previously
    chosen frame — preserving local waveform periodicity (hence pitch),
    unlike plain resampling which scales pitch by the rate.

    ``rate`` > 1 shortens (speeds up), < 1 lengthens. Output length is
    ~len(sig)/rate (± one frame). rate == 1 returns a copy."""
    x = np.asarray(sig, dtype=np.float64)
    if rate <= 0:
        raise ValueError("rate must be positive")
    frame = max(64, int(sr * frame_ms / 1000.0)) & ~1
    hop_out = frame // 2
    search = max(1, int(sr * search_ms / 1000.0))
    if rate == 1.0 or len(x) < frame + 2 * search:
        return x.copy()
    w = _hann(frame)
    n_out_frames = max(1, int((len(x) / rate - frame) / hop_out) + 1)
    out = np.zeros((n_out_frames - 1) * hop_out + frame)
    wsum = np.zeros_like(out)
    prev_start = 0
    for k in range(n_out_frames):
        ideal = int(round(k * hop_out * rate))
        if k == 0:
            start = 0
        else:
            # natural continuation of the previous frame
            nat = prev_start + hop_out
            lo = max(0, ideal - search)
            hi = min(len(x) - frame, ideal + search)
            if hi <= lo or nat + frame > len(x):
                start = min(max(ideal, 0), max(len(x) - frame, 0))
            else:
                ref = x[nat:nat + frame]
                # cross-correlate ref against candidate windows
                seg = x[lo:hi + frame]
                cc = np.correlate(seg, ref, mode="valid")
                start = lo + int(np.argmax(cc))
        pos = k * hop_out
        out[pos:pos + frame] += x[start:start + frame] * w
        wsum[pos:pos + frame] += w
        prev_start = start
    good = wsum > 1e-8
    out[good] /= wsum[good]
    return out


class StretchStats:
    """Actor-pool stage: WSOLA time-stretch audit per clip — for each
    configured rate, the achieved duration ratio and the f0 before/after
    (pitch preservation is the whole point; plain resampling would show
    f0_after == f0_before * rate). Stats-only by default; ``emit_bytes``
    adds the stretched WAV for training-data emission."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 rates: tuple = (0.9, 1.1), emit_bytes: bool = False):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.rates, self.emit_bytes = rates, emit_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in
                                 ("id", "rate", "dur_ratio", "f0_before",
                                  "f0_after", "n_samples", "payload")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            f0b = pitch_f0(sig, sr)["f0_hz"]
            for r in self.rates:
                y = time_stretch(sig, sr, r)
                rows["id"].append(cid)
                rows["rate"].append(r)
                rows["dur_ratio"].append(
                    round(len(y) / len(sig), 4) if len(sig) else np.nan)
                rows["f0_before"].append(round(f0b, 4))
                rows["f0_after"].append(
                    round(pitch_f0(y, sr)["f0_hz"], 4))
                rows["n_samples"].append(len(y))
                rows["payload"].append(
                    audio.encode_wav(np.clip(y, -0.999, 0.999), sr)
                    if self.emit_bytes else b"")
        out = {
            self.id_col: pa.array(rows["id"], type=pa.string()),
            "rate": pa.array(rows["rate"], type=pa.float64()),
            "dur_ratio": pa.array(rows["dur_ratio"], type=pa.float64()),
            "f0_before": pa.array(rows["f0_before"], type=pa.float64()),
            "f0_after": pa.array(rows["f0_after"], type=pa.float64()),
            "n_samples": pa.array(rows["n_samples"], type=pa.int64()),
        }
        if self.emit_bytes:
            out["stretch_bytes"] = pa.array(rows["payload"],
                                            type=pa.binary())
        return pa.table(out)


def stretch_table(ds, bytes_col: str = "bytes", batch_size: int = 32,
                  concurrency: int = 0, emit_bytes: bool = False, **kw):
    return ds.map_batches(StretchStats,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# --------------------------------------------- codec simulation (G.711)


def mu_law_roundtrip(sig: np.ndarray, mu: int = 255,
                     bits: int = 8) -> np.ndarray:
    """G.711 mu-law compand -> uniform quantize at ``bits`` -> expand
    (the standard continuous-mu-law approximation of the segmented
    codec). Deterministic; input clipped to [-1, 1]."""
    x = np.clip(np.asarray(sig, dtype=np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    levels = (1 << bits) - 1
    yq = np.round((y + 1.0) * 0.5 * levels) / levels * 2.0 - 1.0
    return np.sign(yq) * ((1.0 + mu) ** np.abs(yq) - 1.0) / mu


@functools.lru_cache(maxsize=16)
def _fir_bandpass(sr: int, f_lo: float, f_hi: float,
                  taps: int = 255) -> np.ndarray:
    """Linear-phase windowed-sinc band-pass (Hamming window), cached per
    (sr, band). Standard textbook design (Oppenheim & Schafer)."""
    n = np.arange(taps) - (taps - 1) / 2.0
    def lp(fc):
        h = np.sinc(2.0 * fc / sr * n) * 2.0 * fc / sr
        return h
    h = lp(f_hi) - lp(f_lo)
    h *= np.hamming(taps)
    h.setflags(write=False)
    return h


def codec_telephone(sig: np.ndarray, sr: int, mu: int = 255,
                    bits: int = 8) -> np.ndarray:
    """Telephone-channel simulation for robustness augmentation:
    band-limit to 300-3400 Hz (ITU voice band), resample to 8 kHz,
    G.711 mu-law round-trip, resample back to ``sr``. Deterministic —
    the degradation every narrowband-robust speech corpus trains
    against."""
    x = np.asarray(sig, dtype=np.float64)
    if len(x) == 0 or sr <= 0:
        return x.copy()
    h = _fir_bandpass(sr, 300.0, 3400.0)
    x = np.convolve(x, h, mode="same")
    nb = resample_linear(x, sr, 8000) if sr != 8000 else x
    nb = mu_law_roundtrip(nb, mu=mu, bits=bits)
    y = (resample_linear(nb, 8000, sr) if sr != 8000 else nb)[:len(sig)]
    if len(y) < len(sig):              # resample round-trip is ±1 sample
        y = np.pad(y, (0, len(sig) - len(y)))
    return y


class CodecStats:
    """Actor-pool stage: telephone-codec simulation audit per clip —
    post-codec SNR vs the original (codec distortion), band energy
    ratio (voice band survives, out-of-band dies), and distinct quantizer
    levels actually used. ``emit_bytes`` adds the degraded WAV for
    robustness-training emission."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 emit_bytes: bool = False):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.emit_bytes = emit_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        n = len(ids)
        snr = np.full(n, np.nan)
        ratio = np.full(n, np.nan)
        payload: list[bytes] = []
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                payload.append(b"")
                continue
            y = codec_telephone(sig, sr)
            e_in = float(np.mean(sig ** 2))
            e_err = float(np.mean((y - sig) ** 2))
            snr[i] = (10.0 * np.log10(e_in / max(e_err, 1e-300))
                      if e_in > 0 else np.nan)
            ratio[i] = (float(np.mean(y ** 2)) / e_in if e_in > 0
                        else np.nan)
            payload.append(audio.encode_wav(np.clip(y, -0.999, 0.999), sr)
                           if self.emit_bytes else b"")
        out = {
            self.id_col: t[self.id_col],
            "codec_snr_db": pa.array(np.round(snr, 4), type=pa.float64()),
            "energy_ratio": pa.array(np.round(ratio, 4),
                                     type=pa.float64()),
        }
        if self.emit_bytes:
            out["codec_bytes"] = pa.array(payload, type=pa.binary())
        return pa.table(out)


def codec_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                concurrency: int = 0, emit_bytes: bool = False):
    return ds.map_batches(CodecStats,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------------- audit kernels

@functools.lru_cache(maxsize=64)
def _hum_phasors(n: int, sr: int, base: float,
                 harmonics: int) -> tuple[np.ndarray, ...]:
    """Read-only conjugate phasor rows for the hum probe, cached per
    (window length, sr, base): the exp() evaluation was ~80% of
    hum_stats wall when rebuilt per clip (lengths collapse to one value
    once the probe is windowed)."""
    t = np.arange(n)
    rows = []
    w = np.exp(-2j * np.pi * base * t / sr)
    e = np.ones(n, dtype=np.complex128)
    for h in range(1, harmonics + 1):
        if base * h >= sr / 2.0:
            break
        e = e * w
        e.setflags(write=False)
        rows.append(e)
        e = e.copy()
    return tuple(rows)


def hum_stats(sig: np.ndarray, sr: int, harmonics: int = 3,
              max_window_s: float = 1.0) -> dict[str, float]:
    """Mains-hum detection: single-bin DFT (Goertzel identity, one
    complex dot per frequency) at 50/60 Hz and their first ``harmonics``
    multiples, over the clip's FIRST ``max_window_s`` seconds (hum is
    stationary; 1 s gives 1 Hz resolution and lets the phasor tables
    cache across clips). Each bin's power is normalized so a full-scale
    pure tone at the probe frequency reads 0 dB: ratio_f =
    (2/N²)·|X(f)|² / mean(win²); hum_db_* = 10·log10(Σ_harmonics
    ratio). Clean broadband material sits near 10·log10(4/N) (two-sided
    bin share of white noise), far below any flag threshold."""
    sig = np.asarray(sig, dtype=np.float64)
    win = sig[:max(8, int(sr * max_window_s))]
    n = len(win)
    p_tot = float(np.mean(win * win))
    if n < 8 or p_tot <= 0.0:
        return {"hum_db_50": -120.0, "hum_db_60": -120.0}
    out = {}
    for base, key in ((50.0, "hum_db_50"), (60.0, "hum_db_60")):
        ratio = 0.0
        for e in _hum_phasors(n, int(sr), base, harmonics):
            X = np.dot(win, e)
            ratio += 2.0 * (abs(X) ** 2) / (n * n) / p_tot
        out[key] = float(10.0 * np.log10(ratio + 1e-12))
    return out


def click_stats(sig: np.ndarray, sr: int, z: float = 10.0,
                min_gap: int = 32) -> dict[str, float]:
    """Impulsive click/pop detection on the second difference (a click
    is a two-sided discontinuity; speech/music second differences are
    locally smooth): robust MAD threshold at ``z`` sigma with an
    absolute floor (silence would otherwise flag quantization noise),
    greedy ``min_gap``-sample de-bounce so one physical click counts
    once. Returns count, rate, and the worst normalized magnitude."""
    sig = np.asarray(sig, dtype=np.float64)
    if len(sig) < 8:
        return {"n_clicks": 0.0, "clicks_per_sec": 0.0, "max_click_z": 0.0}
    d = np.diff(sig, 2)
    ad = np.abs(d)
    mad = float(np.median(ad))
    scale = max(1.4826 * mad, 1e-4)
    zs = ad / scale
    cand = np.flatnonzero(zs > z)
    n_clicks = 0
    last = -min_gap
    for i in cand:
        if i - last >= min_gap:
            n_clicks += 1
            last = i
    return {"n_clicks": float(n_clicks),
            "clicks_per_sec": float(n_clicks / (len(sig) / sr)),
            "max_click_z": float(zs.max(initial=0.0))}


class AudioAudit:
    """Actor-pool stage: fused audio-integrity audit — ONE decode per
    clip feeds mains-hum probing (hum_stats), click detection
    (click_stats), VAD speech fraction, and the cross-modal
    transcript↔speech consistency verdict the north-star validation
    engine needs (speech with an empty transcript, or a transcript over
    silence, is a row-level violation no single-column check can see).

    Verdict (reference 4-valued idiom): Undefined = payload undecodable;
    Error = speech_ratio > min_speech with empty/NULL transcript, or
    transcript ≥ min_chars chars over a clip with speech_ratio <
    silent_speech; Warning = mains hum above hum_warn_db or click rate
    above clicks_warn_per_sec; else OK."""

    def __init__(self, bytes_col: str = "bytes",
                 transcript_col: str = "transcript",
                 min_speech: float = 0.2, silent_speech: float = 0.02,
                 min_chars: int = 8, hum_warn_db: float = -15.0,
                 clicks_warn_per_sec: float = 2.0,
                 silent_dbfs: float = -55.0):
        self.bytes_col = bytes_col
        self.transcript_col = transcript_col
        self.min_speech = min_speech
        self.silent_speech = silent_speech
        self.min_chars = min_chars
        self.hum_warn_db = hum_warn_db
        self.clicks_warn_per_sec = clicks_warn_per_sec
        self.silent_dbfs = silent_dbfs

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.bytes_col].to_pylist()
        texts = t[self.transcript_col].to_pylist()
        n = len(payloads)
        speech = np.full(n, np.nan)
        rms_db = np.full(n, np.nan)
        hum50 = np.full(n, np.nan)
        hum60 = np.full(n, np.nan)
        clicks = np.zeros(n, dtype=np.int32)
        cps = np.full(n, np.nan)
        n_chars = np.array([len(x.strip()) if isinstance(x, str) else 0
                            for x in texts], dtype=np.int32)
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.full(n, "Undefined: audio payload not decodable",
                         dtype=object)
        for i, b in enumerate(payloads):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            sig = np.asarray(sig, dtype=np.float64)
            speech[i] = vad_stats(sig, sr)["speech_ratio"]
            rms_db[i] = float(20.0 * np.log10(
                np.sqrt(np.mean(sig * sig)) + 1e-12))
            h = hum_stats(sig, sr)
            hum50[i], hum60[i] = h["hum_db_50"], h["hum_db_60"]
            c = click_stats(sig, sr)
            clicks[i] = int(c["n_clicks"])
            cps[i] = c["clicks_per_sec"]
            # VAD is relative to the clip's own peak, so gate the
            # cross-modal verdicts on absolute level: a clip below
            # silent_dbfs has no speech no matter what VAD says
            sp_eff = speech[i] if rms_db[i] >= self.silent_dbfs else 0.0
            if sp_eff > self.min_speech and n_chars[i] == 0:
                code[i] = ERROR_CODE
                status[i] = "Error: speech without transcript"
            elif (n_chars[i] >= self.min_chars
                  and sp_eff < self.silent_speech):
                code[i] = ERROR_CODE
                status[i] = "Error: transcript without speech"
            elif max(hum50[i], hum60[i]) > self.hum_warn_db:
                code[i] = WARNING_CODE
                status[i] = "Warning1: mains hum detected"
            elif cps[i] > self.clicks_warn_per_sec:
                code[i] = WARNING_CODE
                status[i] = "Warning1: impulsive clicks detected"
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        t = t.drop_columns([self.bytes_col])
        return (t.append_column("speech_ratio",
                                pa.array(np.round(speech, 6),
                                         type=pa.float64()))
                 .append_column("rms_db", pa.array(np.round(rms_db, 4),
                                                   type=pa.float64()))
                 .append_column("n_chars", pa.array(n_chars,
                                                    type=pa.int32()))
                 .append_column("hum_db_50",
                                pa.array(np.round(hum50, 4),
                                         type=pa.float64()))
                 .append_column("hum_db_60",
                                pa.array(np.round(hum60, 4),
                                         type=pa.float64()))
                 .append_column("n_clicks", pa.array(clicks,
                                                     type=pa.int32()))
                 .append_column("clicks_per_sec",
                                pa.array(np.round(cps, 4),
                                         type=pa.float64()))
                 .append_column("audit_code", pa.array(code, type=pa.int8()))
                 .append_column("audit_status",
                                pa.array(status, type=pa.string())))


def audio_audit_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                      concurrency: int = 0, **kwargs):
    return ds.map_batches(AudioAudit,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kwargs},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


def bandwidth_stats(sig: np.ndarray, sr: int,
                    energy_frac: float = 0.99) -> dict[str, float]:
    """Effective-bandwidth measurement for fake-sample-rate detection: a
    clip upsampled from a lower rate (or decoded from a band-limited
    codec) claims sr but carries no energy near its Nyquist. Returns the
    frequency below which ``energy_frac`` of the mean-spectrum energy
    lives (eff_bw_hz), its fraction of Nyquist (bw_ratio), and the
    energy fraction in the top half of the band (hf_energy_ratio)."""
    sig = np.asarray(sig, dtype=np.float64)
    if len(sig) < FRAME:
        return {"eff_bw_hz": float("nan"), "bw_ratio": float("nan"),
                "hf_energy_ratio": float("nan")}
    P = (stft_mag(sig, FRAME, HOP) ** 2).mean(axis=0)
    total = float(P.sum())
    if total <= 0.0:
        return {"eff_bw_hz": 0.0, "bw_ratio": 0.0, "hf_energy_ratio": 0.0}
    freqs = np.fft.rfftfreq(FRAME, d=1.0 / sr)
    cum = np.cumsum(P)
    eff = float(freqs[np.searchsorted(cum, energy_frac * total)])
    half = np.searchsorted(freqs, sr / 4.0)
    return {"eff_bw_hz": eff,
            "bw_ratio": float(eff / (sr / 2.0)),
            "hf_energy_ratio": float(P[half:].sum() / total)}


class BandwidthCheck:
    """Actor-pool stage: effective-bandwidth audit against the claimed
    sample rate — flags clips whose spectrum stops far below Nyquist
    (upsampled-from-lower-rate or band-limited-codec material masquer-
    ading as full-band; the sr_hz-column drift checks can't see this,
    only the audio can). Warning when bw_ratio < warn_ratio on a
    non-silent clip; Undefined when the payload doesn't decode."""

    def __init__(self, bytes_col: str = "bytes",
                 warn_ratio: float = 0.5):
        self.bytes_col = bytes_col
        self.warn_ratio = warn_ratio

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.bytes_col].to_pylist()
        n = len(payloads)
        eff = np.full(n, np.nan)
        ratio = np.full(n, np.nan)
        hf = np.full(n, np.nan)
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.full(n, "Undefined: audio payload not decodable",
                         dtype=object)
        for i, b in enumerate(payloads):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            s = bandwidth_stats(np.asarray(sig, dtype=np.float64), sr)
            eff[i], ratio[i], hf[i] = (s["eff_bw_hz"], s["bw_ratio"],
                                       s["hf_energy_ratio"])
            if np.isnan(ratio[i]):
                status[i] = "Undefined: clip shorter than one frame"
            elif ratio[i] == 0.0:
                code[i] = WARNING_CODE
                status[i] = "Warning1: silent clip, bandwidth unmeasurable"
            elif ratio[i] < self.warn_ratio:
                code[i] = WARNING_CODE
                status[i] = "Warning1: effective bandwidth far below Nyquist"
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        t = t.drop_columns([self.bytes_col])
        return (t.append_column("eff_bw_hz",
                                pa.array(np.round(eff, 2),
                                         type=pa.float64()))
                 .append_column("bw_ratio",
                                pa.array(np.round(ratio, 6),
                                         type=pa.float64()))
                 .append_column("hf_energy_ratio",
                                pa.array(np.round(hf, 6),
                                         type=pa.float64()))
                 .append_column("bw_code", pa.array(code, type=pa.int8()))
                 .append_column("bw_status",
                                pa.array(status, type=pa.string())))


def bandwidth_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                    concurrency: int = 0, warn_ratio: float = 0.5):
    return ds.map_batches(BandwidthCheck,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "warn_ratio": warn_ratio},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ----------------------------------------------------------------- reverb

def synth_rir(rt60_s: float, sr: int, seed: int,
              direct_ratio: float = 0.5) -> np.ndarray:
    """Deterministic synthetic room impulse response: a unit direct path
    followed by exponentially decaying white noise (the standard
    image-method surrogate used for ASR reverb augmentation; decay rate
    set so the Schroeder curve falls 60 dB in ``rt60_s``). Amplitude
    envelope e^{-t/tau} with tau = rt60 / (3 ln 10) makes the ENERGY
    decay 60 dB at t = rt60 exactly. Seeded with numpy PCG64 so every
    run / partitioning produces byte-identical audio."""
    tau = rt60_s / (3.0 * np.log(10.0))
    n = max(8, int(round(1.2 * rt60_s * sr)))
    rng = np.random.default_rng(seed)
    h = rng.standard_normal(n) * np.exp(-np.arange(n) / (tau * sr))
    # normalize the tail so the direct path dominates by direct_ratio
    tail_rms = float(np.sqrt(np.mean(h * h)))
    if tail_rms > 0:
        h = h * (direct_ratio / (tail_rms * np.sqrt(n)))
    h[0] = 1.0
    return h


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth length >= n (numpy's FFT runs mixed radix
    2/3/5 efficiently; pow2-only padding costs up to 2x the work on
    typical clip lengths — measured 1.5x on the reverb stage)."""
    if n <= 6:
        return max(1, n)
    best = 1 << (n - 1).bit_length()
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            # smallest power of two lifting p35 to >= n
            m = p35 * (1 << max(0, (n + p35 - 1) // p35 - 1).bit_length())
            while m < n:
                m *= 2
            if m < best:
                best = m
            p35 *= 3
        p5 *= 5
    return best


def apply_rir(sig: np.ndarray, h: np.ndarray) -> np.ndarray:
    """FFT convolution of a clip with an impulse response (full tail kept
    — the decay after the dry signal ends is the reverb audit's free-
    decay region). Peak-normalized to the dry peak so re-encode never
    clips."""
    n_out = len(sig) + len(h) - 1
    nfft = _next_fast_len(max(2, n_out))
    out = np.fft.irfft(np.fft.rfft(sig, nfft) * np.fft.rfft(h, nfft),
                       nfft)[:n_out]
    peak_in = float(np.max(np.abs(sig))) if len(sig) else 0.0
    peak_out = float(np.max(np.abs(out)))
    if peak_out > 0 and peak_in > 0:
        out *= peak_in / peak_out
    return out


def rt60_estimate(sig: np.ndarray, sr: int, frame_ms: float = 10.0,
                  fit_lo_db: float = -5.0, fit_hi_db: float = -35.0,
                  min_fit_frames: int = 4) -> dict[str, float]:
    """Blind RT60 from a reverberant signal: frame-energy envelope in dB,
    locate the LAST frame within 3 dB of the global peak (end of
    sustain), least-squares fit the decay from ``fit_lo_db`` to
    ``fit_hi_db`` below peak (the classic T30 window extrapolated x2,
    ISO 3382 style), RT60 = -60 / slope. Returns NaN when no free-decay
    region exists (sustained content to the end) — honest for dry clips;
    emits the observed decay span and fit r² as confidence."""
    nan = {"rt60_s": float("nan"), "decay_db": float("nan"),
           "fit_r2": float("nan")}
    frame = max(16, int(round(sr * frame_ms / 1000.0)))
    n_fr = len(sig) // frame
    if n_fr < min_fit_frames + 2:
        return nan
    x = np.asarray(sig[:n_fr * frame], dtype=np.float64)
    e = (x.reshape(n_fr, frame) ** 2).mean(axis=1)
    peak = float(e.max())
    if peak <= 0.0:
        return nan
    # smooth the frame envelope (~5 frames) before locating the end of
    # sustain: the envelope of narrowband content through a noise IR is
    # Rayleigh-fluctuating, and an unsmoothed 3 dB test can mistake a
    # mid-sustain dip for the decay start (seen at low sample rates)
    k = min(5, n_fr)
    e_s = np.convolve(e, np.ones(k) / k, mode="same")
    peak_s = float(e_s.max())
    env_db = 10.0 * np.log10(np.maximum(e_s, peak_s * 1e-12) / peak_s)
    # end of sustain: the LAST smoothed frame within 5 dB of the peak;
    # everything after it is the free-decay region
    last_hi = int(np.flatnonzero(env_db >= -5.0)[-1])
    tail = x[(last_hi + 1) * frame:]
    if len(tail) < min_fit_frames * frame:
        return nan
    # Schroeder backward-integrated energy decay curve (ISO 3382): the
    # EDC is monotone, so narrowband envelope beating integrates out —
    # fit the -5..-35 dB window on it, excluding the last 10% of samples
    # (finite-interval truncation steepens the curve artificially)
    edc = np.cumsum((tail * tail)[::-1])[::-1]
    if edc[0] <= 0.0:
        return nan
    db = 10.0 * np.log10(np.maximum(edc, edc[0] * 1e-15) / edc[0])
    below_lo = np.flatnonzero(db <= fit_lo_db)
    if not len(below_lo):
        return nan
    start = int(below_lo[0])
    below_hi = np.flatnonzero(db <= fit_hi_db)
    trunc = int(0.9 * len(db))
    end = min(int(below_hi[0]) if len(below_hi) else len(db) - 1,
              max(trunc, start + 1))
    if end - start + 1 < min_fit_frames * frame:
        return nan
    y = db[start:end + 1]
    t = np.arange(start, end + 1, dtype=np.float64) / sr
    tm, ym = t.mean(), y.mean()
    stt = float(((t - tm) ** 2).sum())
    if stt <= 0.0:
        return nan
    slope = float(((t - tm) * (y - ym)).sum()) / stt
    if slope >= 0.0:
        return nan
    resid = y - (ym + slope * (t - tm))
    syy = float(((y - ym) ** 2).sum())
    r2 = 1.0 - float((resid ** 2).sum()) / syy if syy > 0 else float("nan")
    return {"rt60_s": -60.0 / slope, "decay_db": float(y[0] - y[-1]),
            "fit_r2": r2}


class ReverbClips:
    """Actor-pool stage: reverb augmentation + blind RT60 audit in ONE
    decode. Each clip is convolved with a deterministic synthetic room
    impulse response (planted RT60 cycles 0.2-0.8 s by clip hash; RIR
    noise seeded from clip_id so output is run/partition invariant),
    then the blind estimator reads the RT60 back from the wet signal —
    the audit is thereby physics-pinned END TO END on the distributed
    path, not just in unit tests. Emits (clip_id, rt60_true_s, rt60_s,
    decay_db, fit_r2, wet_ms, bytes?); payload only when emit_bytes."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 emit_bytes: bool = False):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.emit_bytes = emit_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in
                                 ("id", "true", "est", "decay", "r2",
                                  "wet_ms", "payload")}
        for cid, b in zip(t[self.id_col].to_pylist(),
                          t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) < 16:
                continue
            seed = int(
                np.frombuffer(hashlib.md5(str(cid).encode()).digest()[:8],
                              dtype=np.uint64)[0] & np.uint64(0x7FFFFFFF))
            rt60_true = 0.2 + (seed % 7) * 0.1
            wet = apply_rir(sig, synth_rir(rt60_true, sr, seed))
            est = rt60_estimate(wet, sr)
            rows["id"].append(cid)
            rows["true"].append(rt60_true)
            rows["est"].append(round(est["rt60_s"], 4))
            rows["decay"].append(round(est["decay_db"], 4))
            rows["r2"].append(round(est["fit_r2"], 6))
            rows["wet_ms"].append(int(round(len(wet) * 1000.0 / sr)))
            rows["payload"].append(
                audio.encode_wav(np.clip(wet, -0.999, 0.999), sr)
                if self.emit_bytes else b"")
        out = {
            self.id_col: pa.array(rows["id"], type=pa.string()),
            "rt60_true_s": pa.array(rows["true"], type=pa.float64()),
            "rt60_s": pa.array(rows["est"], type=pa.float64()),
            "decay_db": pa.array(rows["decay"], type=pa.float64()),
            "fit_r2": pa.array(rows["r2"], type=pa.float64()),
            "wet_ms": pa.array(rows["wet_ms"], type=pa.int32()),
        }
        if self.emit_bytes:
            out["wet_bytes"] = pa.array(rows["payload"], type=pa.binary())
        return pa.table(out)


def reverb_table(ds, bytes_col: str = "bytes", batch_size: int = 32,
                 concurrency: int = 0, emit_bytes: bool = False):
    return ds.map_batches(ReverbClips,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 "emit_bytes": emit_bytes},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ---------------------------------------------------------------- hygiene

def hygiene_stats(sig: np.ndarray, sr: int) -> dict[str, float]:
    """Signal-hygiene measurements a capture-chain audit needs and the
    spectral/loudness stages don't cover: DC offset (electrical bias in
    the ADC path), subsonic rumble share (energy below 20 Hz — handling
    noise, wind, HVAC), crest factor (peak/RMS in dB — low values flag
    over-compression or limiting), and flat-top ratio (fraction of
    samples within 1 dB of the peak — limiting/clipping pressure even
    when no sample touches full scale)."""
    if len(sig) < 8:
        return {"dc_offset": float("nan"), "sub20_ratio": float("nan"),
                "crest_db": float("nan"), "flat_top_ratio": float("nan")}
    x = np.asarray(sig, dtype=np.float64)
    dc = float(x.mean())
    rms = float(np.sqrt((x * x).mean()))
    peak = float(np.abs(x).max())
    # subsonic share from one rFFT power spectrum (DC bin excluded —
    # reported separately as the offset)
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    tot = float(spec[1:].sum())
    sub = float(spec[1:][freqs[1:] < 20.0].sum()) if tot > 0 else 0.0
    crest = (20.0 * np.log10(peak / rms)
             if rms > 0 and peak > 0 else float("nan"))
    flat = float((np.abs(x) >= peak * 10.0 ** (-1.0 / 20.0)).mean()
                 ) if peak > 0 else float("nan")
    return {"dc_offset": dc,
            "sub20_ratio": sub / tot if tot > 0 else float("nan"),
            "crest_db": crest, "flat_top_ratio": flat}


def _tp_phase_peaks(x: np.ndarray, taps: int = 32,
                    beta: float = 8.0) -> float:
    """Max |value| over the three interpolated phases of a 4x upsample,
    value-identical to resample_sinc(x, sr, 4*sr) (same LUT rows — the
    j/4 phases land exactly on the 8192-phase grid; same edge
    renormalization) but polyphase: three length-``taps`` np.convolve
    passes instead of one (4n × taps) float64 gather/temporary — the
    generic path allocated ~700 MB for a 15 s / 48 kHz clip and was
    ~95% of hygiene_table wall."""
    n = len(x)
    lut = _sinc_kernel_lut(4.0, taps, beta)
    step = _SINC_LUT_PHASES // 4
    offs = np.arange(-taps // 2 + 1, taps // 2 + 1)
    lo, hi = taps // 2 - 1, taps // 2          # interior margin
    edge = np.concatenate([np.arange(0, min(lo, n)),
                           np.arange(max(0, n - hi), n)])
    peak = 0.0
    for j in (1, 2, 3):
        h = lut[j * step]
        if n > lo + hi:
            c = np.convolve(x, h[::-1])
            interior = c[2 * lo + 1:2 * lo + 1 + (n - lo - hi)] / h.sum()
            peak = max(peak, float(np.max(np.abs(interior))))
        if len(edge):
            idx = edge[:, None] + offs[None, :]
            valid = (idx >= 0) & (idx < n)
            hh = np.where(valid, h[None, :], 0.0)
            vals = x[np.clip(idx, 0, n - 1)]
            norm = hh.sum(axis=1)
            norm = np.where(np.abs(norm) < 1e-12, 1.0, norm)
            ev = (vals * hh).sum(axis=1) / norm
            peak = max(peak, float(np.max(np.abs(ev))))
    return peak


def true_peak_dbtp(sig: np.ndarray, sr: int) -> float:
    """Inter-sample true peak (BS.1770-4 Annex 2 idea): 4x oversample
    with the Kaiser-sinc kernel and take the absolute peak in dBTP —
    a sample-peak of -0.1 dBFS can clip a DAC's reconstruction filter;
    dBTP sees it. Phase 0 of the upsample is the input itself (the
    phase-0 kernel row is a unit impulse), so the peak is the max over
    the samples and the three polyphase interpolations
    (_tp_phase_peaks, value-matched to the resample_sinc path)."""
    if len(sig) < 8 or sr <= 0:
        return float("nan")
    x = np.asarray(sig, dtype=np.float64)
    p = max(float(np.max(np.abs(x))), _tp_phase_peaks(x))
    return 20.0 * np.log10(p) if p > 0 else float("-inf")


class HygieneCheck:
    """Actor-pool stage: WAV bytes -> signal-hygiene stats + a 4-valued
    verdict in the reference's grading idiom (anomaly_detection.py:41-50
    status-code scheme): Error2 undecodable, Warning1 on DC bias or
    rumble above thresholds, OK otherwise (dynamics are reported, not
    graded — tonal corpora legitimately run low-crest)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 max_dc: float = 0.02, max_sub20: float = 0.05):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.max_dc, self.max_sub20 = max_dc, max_sub20

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        dc = np.full(n, np.nan)
        sub = np.full(n, np.nan)
        crest = np.full(n, np.nan)
        flat = np.full(n, np.nan)
        tp = np.full(n, np.nan)
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.empty(n, dtype=object)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) < 8:
                code[i] = ERROR_CODE
                status[i] = "Error2: undecodable or empty clip"
                continue
            h = hygiene_stats(sig, sr)
            dc[i], sub[i] = h["dc_offset"], h["sub20_ratio"]
            crest[i], flat[i] = h["crest_db"], h["flat_top_ratio"]
            tp[i] = true_peak_dbtp(sig, sr)
            if abs(h["dc_offset"]) > self.max_dc:
                code[i] = WARNING_CODE
                status[i] = "Warning1: DC offset above threshold"
            elif h["sub20_ratio"] == h["sub20_ratio"] \
                    and h["sub20_ratio"] > self.max_sub20:
                code[i] = WARNING_CODE
                status[i] = "Warning1: subsonic rumble above threshold"
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        t = t.drop_columns([self.bytes_col])
        return (t.append_column("dc_offset",
                                pa.array(np.round(dc, 6),
                                         type=pa.float64()))
                 .append_column("sub20_ratio",
                                pa.array(np.round(sub, 6),
                                         type=pa.float64()))
                 .append_column("crest_db",
                                pa.array(np.round(crest, 4),
                                         type=pa.float64()))
                 .append_column("flat_top_ratio",
                                pa.array(np.round(flat, 6),
                                         type=pa.float64()))
                 .append_column("true_peak_dbtp",
                                pa.array(np.round(tp, 4),
                                         type=pa.float64()))
                 .append_column("hy_code", pa.array(code, type=pa.int8()))
                 .append_column("hy_status",
                                pa.array(status, type=pa.string())))


def hygiene_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                  concurrency: int = 0, **kw):
    return ds.map_batches(HygieneCheck,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------------- wow & flutter

def f0_track(sig: np.ndarray, sr: int, frame_s: float = 0.04,
             hop_s: float = 0.01, fmin: float = 60.0,
             fmax: float = 1000.0) -> tuple[np.ndarray, np.ndarray, float]:
    """Framewise pitch track: the per-frame twin of pitch_f0, fully
    vectorized ACROSS frames (one strided frame matrix, one batched FFT
    autocorrelation, one vectorized peak pick with the same
    smallest-lag-within-5% octave guard and parabolic refinement).
    Returns (f0_hz per frame, voiced confidence per frame, frame rate)."""
    frame = int(round(frame_s * sr))
    hop = max(1, int(round(hop_s * sr)))
    x = np.asarray(sig, dtype=np.float64)
    n_frames = 1 + (len(x) - frame) // hop if len(x) >= frame else 0
    if n_frames < 4 or sr <= 0:
        return np.empty(0), np.empty(0), 0.0
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    F = x[idx]
    F = F - F.mean(axis=1, keepdims=True)
    lag_min = max(2, int(np.floor(sr / fmax)))
    lag_max = min(frame - 2, int(np.ceil(sr / fmin)))
    if lag_max <= lag_min:
        return np.empty(0), np.empty(0), 0.0
    # circular ACF wraparound at lag k pulls in linear lag (nfft - k),
    # which is zero whenever nfft >= frame + lag_max — so the FFT only
    # needs to cover frame + lag_max, not the full 2*frame (half the
    # transform work at 16 kHz); power spectrum as re^2+im^2 skips the
    # complex-conjugate multiply and its allocation
    nfft = 1 << int(np.ceil(np.log2(frame + lag_max + 1)))
    X = np.fft.rfft(F, nfft, axis=1)
    r = np.fft.irfft(X.real * X.real + X.imag * X.imag, nfft,
                     axis=1)[:, :lag_max + 2]
    seg = r[:, lag_min:lag_max + 1]
    top = seg.max(axis=1, keepdims=True)
    is_peak = np.zeros(seg.shape, dtype=bool)
    is_peak[:, 1:-1] = ((seg[:, 1:-1] >= seg[:, :-2])
                        & (seg[:, 1:-1] >= seg[:, 2:]))
    cand = is_peak & (seg >= 0.95 * top)
    has = cand.any(axis=1)
    first = np.where(has, cand.argmax(axis=1), seg.argmax(axis=1))
    k = lag_min + first
    rows = np.arange(len(k))
    y0, y1, y2 = r[rows, k - 1], r[rows, k], r[rows, k + 1]
    denom = y0 - 2.0 * y1 + y2
    safe = np.where(denom == 0.0, 1.0, denom)
    delta = np.where(denom != 0.0, 0.5 * (y0 - y2) / safe, 0.0)
    lag = k + np.clip(delta, -0.5, 0.5)
    f0 = sr / lag
    r0 = r[:, 0]
    conf = np.clip(np.where(r0 > 0.0, y1 / np.where(r0 <= 0.0, np.inf, r0),
                            0.0), 0.0, 1.0)
    return f0, conf, sr / hop


_WF_FRAME_S = 0.04


def wow_flutter(sig: np.ndarray, sr: int, conf_min: float = 0.5,
                min_voiced: float = 0.5) -> dict[str, float]:
    """Wow & flutter audit: slow periodic pitch modulation — the
    tape-transport / warped-media / bad-resampler defect the static
    pitch and bandwidth checks can't see. Pipeline: framewise f0 track
    (40 ms / 10 ms), deviation from the median f0 in CENTS, then the
    modulation spectrum of that deviation at the 100 Hz frame rate; the
    strongest component in 0.5-6 Hz is wow, in 6-30 Hz flutter.
    Reported depth divides out the analysis window's sinc rolloff
    (a 40 ms ACF window attenuates 12 Hz FM to sinc(0.48) = 0.66 of its
    true depth — the correction recovers planted depths to a few %;
    physics pinned in test_audio_ops). Unvoiced/unpitched content
    (voiced fraction < min_voiced) reports NaN, not an invented number
    (the rt60_estimate convention)."""
    nanrow = {"f0_med_hz": float("nan"), "voiced_frac": float("nan"),
              "dev_rms_cents": float("nan"), "wow_hz": float("nan"),
              "wow_cents": float("nan"), "flutter_hz": float("nan"),
              "flutter_cents": float("nan")}
    # the tracker only needs content up to fmax (1 kHz) — decimate by
    # the integer factor floor(sr/8000) first via box-filter + stride
    # (one reshape-mean, ~1 ms; the box's first null sits at the new
    # sample rate and its response at 1 kHz is ~0.97, so the f0 band is
    # untouched while the per-frame ACF FFT drops 4096 -> 512 points at
    # a 48 kHz source: 74 -> ~4 ms/clip measured; a full Kaiser-sinc
    # decimation spent 17 ms/clip to do the same job for this purpose)
    k = int(sr) // 8000
    if k > 1:
        x = np.asarray(sig, dtype=np.float64)
        n_k = (len(x) // k) * k
        sig = x[:n_k].reshape(-1, k).mean(axis=1)
        sr = sr / k          # exact rational rate (44100/5 = 8820.0)
    f0, conf, fps = f0_track(sig, sr, frame_s=_WF_FRAME_S)
    if len(f0) < 32:
        return nanrow
    v = (conf >= conf_min) & np.isfinite(f0)
    vf = float(v.mean())
    if vf < min_voiced:
        out = dict(nanrow)
        out["voiced_frac"] = vf
        return out
    med = float(np.median(f0[v]))
    t = np.arange(len(f0))
    f = f0.copy()
    f[~v] = np.interp(t[~v], t[v], f0[v])
    cents = 1200.0 * np.log2(f / med)
    cents = cents - cents.mean()
    n = len(cents)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
    X = np.fft.rfft(cents * w)
    freqs = np.fft.rfftfreq(n, 1.0 / fps)
    # Hann coherent gain is 0.5: single-tone amplitude = 2|X|/(n*0.5);
    # then divide out the ACF window's sinc attenuation of the FM
    # itself. The correction is capped at 4x (sinc >= 0.25, rates up to
    # ~18.6 Hz at the 40 ms window): near the window null at 25 Hz the
    # true gain -> 0 and an uncapped inverse would amplify tracker
    # noise by orders of magnitude — rates past the cap read
    # under-corrected rather than invented.
    amp = 4.0 * np.abs(X) / n
    amp = amp / np.maximum(np.sinc(freqs * _WF_FRAME_S), 0.25)

    def band(lo: float, hi: float) -> tuple[float, float]:
        m = (freqs >= lo) & (freqs < hi)
        if not m.any():
            return float("nan"), float("nan")
        i = np.flatnonzero(m)[int(np.argmax(amp[m]))]
        return float(freqs[i]), float(amp[i])

    wow_hz, wow_c = band(0.5, 6.0)
    fl_hz, fl_c = band(6.0, 30.0)
    return {"f0_med_hz": med, "voiced_frac": vf,
            "dev_rms_cents": float(cents.std()),
            "wow_hz": wow_hz, "wow_cents": wow_c,
            "flutter_hz": fl_hz, "flutter_cents": fl_c}


class WowFlutterCheck:
    """Actor-pool stage: WAV bytes -> wow/flutter stats + verdict in the
    reference's grading idiom: Error2 undecodable, Warning1 when the
    corrected wow or flutter depth exceeds ``max_cents`` on pitched
    content, OK otherwise (unpitched clips grade Undefined — no pitch,
    no pitch-stability verdict)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 max_cents: float = 20.0):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.max_cents = max_cents

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {k: np.full(n, np.nan) for k in
                ("f0_med_hz", "voiced_frac", "dev_rms_cents", "wow_hz",
                 "wow_cents", "flutter_hz", "flutter_cents")}
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.empty(n, dtype=object)
        for i, b in enumerate(t[self.bytes_col].to_pylist()):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) < 8:
                code[i] = ERROR_CODE
                status[i] = "Error2: undecodable or empty clip"
                continue
            r = wow_flutter(sig, sr)
            for k in cols:
                cols[k][i] = r[k]
            if r["f0_med_hz"] != r["f0_med_hz"]:
                status[i] = "Undefined: unpitched content"
                continue
            depth = np.nanmax([r["wow_cents"], r["flutter_cents"]])
            if depth == depth and depth > self.max_cents:
                code[i] = WARNING_CODE
                status[i] = "Warning1: pitch modulation above threshold"
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        t = t.drop_columns([self.bytes_col])
        for k, dp in (("f0_med_hz", 4), ("voiced_frac", 6),
                      ("dev_rms_cents", 4), ("wow_hz", 4),
                      ("wow_cents", 4), ("flutter_hz", 4),
                      ("flutter_cents", 4)):
            t = t.append_column(k, pa.array(np.round(cols[k], dp),
                                            type=pa.float64()))
        return (t.append_column("wf_code", pa.array(code, type=pa.int8()))
                 .append_column("wf_status",
                                pa.array(status, type=pa.string())))


def wow_flutter_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                      concurrency: int = 0, **kw):
    return ds.map_batches(WowFlutterCheck,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ---------------------------------------------------- fused QC audit

class FullAudit:
    """Actor-pool stage: the complete audio QC battery off ONE decode —
    cross-modal transcript consistency + hum + clicks (AudioAudit's
    checks), DC/rumble hygiene, effective-bandwidth-vs-claimed-sr,
    wow/flutter pitch stability, and blind-RT60 reverberation
    (ISO-3382-style Schroeder decay fit; overly reverberant speech is a
    training-data defect like the rest). At warehouse scale the decode + framing
    dominates each individual audit pass, so running the audits as
    separate pipelines re-pays that cost per audit; the fused stage pays
    it once (interleaved A/B x2, 2k clips / 12 actors: fused 11.1/23.4 s
    vs separate 34.6/46.6 s — 2-3x at equal pool size). Emits one
    per-audit flag
    column each (the audit tables' own thresholds) plus a fused overall
    verdict: Error on cross-modal inconsistency, Warning on any signal
    defect, Undefined when the payload doesn't decode.

    Per-audit flag semantics: 1 = flagged, 0 = clean, -1 = not gradable
    (e.g. wow/flutter on unpitched content, bandwidth on silence)."""

    def __init__(self, bytes_col: str = "bytes",
                 transcript_col: str = "transcript",
                 min_speech: float = 0.2, silent_speech: float = 0.02,
                 min_chars: int = 8, hum_warn_db: float = -15.0,
                 clicks_warn_per_sec: float = 2.0,
                 silent_dbfs: float = -55.0, max_dc: float = 0.02,
                 max_sub20: float = 0.05, bw_warn_ratio: float = 0.5,
                 wf_max_cents: float = 20.0, rt60_warn_s: float = 0.8):
        self.bytes_col = bytes_col
        self.transcript_col = transcript_col
        self.min_speech = min_speech
        self.silent_speech = silent_speech
        self.min_chars = min_chars
        self.hum_warn_db = hum_warn_db
        self.clicks_warn_per_sec = clicks_warn_per_sec
        self.silent_dbfs = silent_dbfs
        self.max_dc = max_dc
        self.max_sub20 = max_sub20
        self.bw_warn_ratio = bw_warn_ratio
        self.wf_max_cents = wf_max_cents
        self.rt60_warn_s = rt60_warn_s

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.bytes_col].to_pylist()
        texts = t[self.transcript_col].to_pylist()
        n = len(payloads)
        n_chars = np.array([len(x.strip()) if isinstance(x, str) else 0
                            for x in texts], dtype=np.int32)
        flags = {k: np.full(n, -1, dtype=np.int8)
                 for k in ("xm_flag", "hum_flag", "click_flag", "hy_flag",
                           "bw_flag", "wf_flag", "rv_flag")}
        bw_ratio = np.full(n, np.nan)
        dc = np.full(n, np.nan)
        wow_c = np.full(n, np.nan)
        rt60 = np.full(n, np.nan)
        code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
        status = np.full(n, "Undefined: audio payload not decodable",
                         dtype=object)
        for i, b in enumerate(payloads):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            sig = np.asarray(sig, dtype=np.float64)
            rms_db = float(20.0 * np.log10(
                np.sqrt(np.mean(sig * sig)) + 1e-12))
            speech = vad_stats(sig, sr)["speech_ratio"]
            sp_eff = speech if rms_db >= self.silent_dbfs else 0.0
            flags["xm_flag"][i] = int(
                (sp_eff > self.min_speech and n_chars[i] == 0)
                or (n_chars[i] >= self.min_chars
                    and sp_eff < self.silent_speech))
            h = hum_stats(sig, sr)
            flags["hum_flag"][i] = int(
                max(h["hum_db_50"], h["hum_db_60"]) > self.hum_warn_db)
            c = click_stats(sig, sr)
            flags["click_flag"][i] = int(
                c["clicks_per_sec"] > self.clicks_warn_per_sec)
            if len(sig) >= max(256, sr // 20):
                hy = hygiene_stats(sig, sr)
                dc[i] = hy["dc_offset"]
                flags["hy_flag"][i] = int(
                    abs(hy["dc_offset"]) > self.max_dc
                    or (hy["sub20_ratio"] == hy["sub20_ratio"]
                        and hy["sub20_ratio"] > self.max_sub20))
            bw = bandwidth_stats(sig, sr)
            bw_ratio[i] = bw["bw_ratio"]
            if bw_ratio[i] == bw_ratio[i] and rms_db >= self.silent_dbfs:
                flags["bw_flag"][i] = int(bw_ratio[i] < self.bw_warn_ratio)
            wf = wow_flutter(sig, sr)
            if wf["f0_med_hz"] == wf["f0_med_hz"]:
                wow_c[i] = wf["wow_cents"]
                depth = np.nanmax([wf["wow_cents"], wf["flutter_cents"]])
                flags["wf_flag"][i] = int(depth == depth
                                          and depth > self.wf_max_cents)
            rv = rt60_estimate(sig, sr)
            if rv["rt60_s"] == rv["rt60_s"] and rms_db >= self.silent_dbfs:
                rt60[i] = rv["rt60_s"]
                flags["rv_flag"][i] = int(rt60[i] > self.rt60_warn_s)
            if flags["xm_flag"][i] == 1:
                code[i] = ERROR_CODE
                status[i] = "Error: transcript-speech mismatch"
            elif any(flags[k][i] == 1 for k in
                     ("hum_flag", "click_flag", "hy_flag", "bw_flag",
                      "wf_flag", "rv_flag")):
                code[i] = WARNING_CODE
                status[i] = "Warning1: signal defect"
            else:
                code[i] = OK_CODE
                status[i] = "OK"
        t = t.drop_columns([self.bytes_col, self.transcript_col])
        for k in ("xm_flag", "hum_flag", "click_flag", "hy_flag",
                  "bw_flag", "wf_flag", "rv_flag"):
            t = t.append_column(k, pa.array(flags[k], type=pa.int8()))
        return (t.append_column("bw_ratio",
                                pa.array(np.round(bw_ratio, 6),
                                         type=pa.float64()))
                 .append_column("dc_offset",
                                pa.array(np.round(dc, 6),
                                         type=pa.float64()))
                 .append_column("wow_cents",
                                pa.array(np.round(wow_c, 4),
                                         type=pa.float64()))
                 .append_column("rt60_s",
                                pa.array(np.round(rt60, 4),
                                         type=pa.float64()))
                 .append_column("qa_code", pa.array(code, type=pa.int8()))
                 .append_column("qa_status",
                                pa.array(status, type=pa.string())))


def full_audit_table(ds, bytes_col: str = "bytes", batch_size: int = 64,
                     concurrency: int = 0, **kw):
    return ds.map_batches(FullAudit,
                          fn_constructor_kwargs={"bytes_col": bytes_col,
                                                 **kw},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)
