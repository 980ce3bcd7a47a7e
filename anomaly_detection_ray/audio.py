"""PCM16 WAV encode/decode + SNR — stdlib ``wave``/``struct`` + numpy only.

The clip table's ``bytes`` column holds an encoded mono PCM16 WAV whose
signal is a pure function of (seed, clip index) — see synth.py — so the
validation pipeline can re-generate the expected signal for any row and
verify decoded-PCM fidelity (SNR >= 30 dB, BASELINE.json "input_hint")
without shipping reference audio around the cluster.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

WAV_HEADER_BYTES = 44  # canonical PCM WAV header size


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float [-1, 1] -> mono PCM16 WAV bytes."""
    ints = np.clip(np.asarray(pcm) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr_hz)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 signal in [-1, 1], sample rate).

    Raises on malformed/truncated payloads — callers treat that as a
    corrupted-PCM violation.
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    return pcm, sr


def decode_wav_lenient(data: bytes) -> tuple[np.ndarray | None, int | None]:
    """decode_wav that returns (None, None) instead of raising."""
    try:
        return decode_wav(data)
    except Exception:
        return None, None


def snr_db(signal: np.ndarray, reference: np.ndarray) -> float:
    """SNR of ``signal`` against ``reference`` in dB (aligned, same length).

    Mismatched lengths compare the overlapping prefix and count the
    missing tail as pure noise.
    """
    n = min(len(signal), len(reference))
    if n == 0:
        return -np.inf
    ref = np.asarray(reference, dtype=np.float64)
    sig = np.asarray(signal, dtype=np.float64)
    noise = sig[:n] - ref[:n]
    noise_power = float(np.mean(noise**2))
    extra = max(len(ref), len(sig)) - n
    if extra:
        tail = ref[n:] if len(ref) > n else sig[n:]
        noise_power = (noise_power * n + float(np.sum(tail**2))) / (n + extra)
    ref_power = float(np.mean(ref[: max(len(ref), 1)] ** 2))
    if noise_power == 0:
        return np.inf
    if ref_power == 0:
        return -np.inf
    return 10.0 * np.log10(ref_power / noise_power)


def clip_signal(seed: int, index: int, sr_hz: int, dur_ms: int,
                max_samples: int | None = None) -> np.ndarray:
    """Deterministic per-clip reference signal (FIXTURES.md §B): a seeded
    sine mixture, frequency 200 + (i % 37)*13 Hz, amplitude 0.5, phase from
    (seed, index). ``max_samples`` caps generation up front — a lying
    dur_ms (dur_outlier violations claim 600 s) must not cost 13M samples
    of sin() when only the capped prefix is ever compared."""
    n = int(round(sr_hz * dur_ms / 1000.0))
    if max_samples is not None:
        n = min(n, max_samples)
    freq = 200.0 + (index % 37) * 13.0
    phase = ((seed * 2654435761 + index * 40503) % 65536) / 65536.0 * 2 * np.pi
    t = np.arange(n, dtype=np.float64) / sr_hz
    sig = 0.5 * np.sin(2 * np.pi * freq * t + phase)
    # second harmonic keyed off index so clips are not all pure tones
    sig += 0.1 * np.sin(2 * np.pi * 2 * freq * t + phase * 0.5)
    return sig


def expected_wav_bytes(sr_hz: int, dur_ms: int) -> int:
    """Expected encoded size: 44-byte header + 2 bytes/sample
    (consistency check, FIXTURES.md §B)."""
    return WAV_HEADER_BYTES + 2 * int(round(sr_hz * dur_ms / 1000.0))
