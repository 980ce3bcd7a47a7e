"""Stateless per-row check stages (clip table) — each a vectorized
``map_batches(batch_format="pyarrow")`` kernel appending verdict columns.

Provenance: border check = border_check.py:122-146; byte-length consistency
and transcript presence/equality are the north-rule referential checks
(BASELINE.json); the global-stats z-check is the broadcast form of the
reference's infinite Welford limits (welford.py:176-191) — stats computed
once over the dataset (stages/stats.py), shipped to every task via
``ray.put``, graded row-locally with the shared warning-stage idiom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import audio, synth
from ..functions.grading import (ERROR_CODE, OK_CODE, UNDEFINED_CODE,
                                 WARNING_CODE, grade_normalized, normalize)


def _float_np(arr) -> np.ndarray:
    # cast first — nulls survive the cast and become NaN in the numpy view
    return pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)


def _null_mask(arr) -> np.ndarray:
    return pc.is_null(arr).to_numpy(zero_copy_only=False).astype(bool)


def _append(t: pa.Table, prefix: str, code: np.ndarray,
            status: np.ndarray | None = None) -> pa.Table:
    t = t.append_column(f"{prefix}_code", pa.array(code.astype(np.int8), type=pa.int8()))
    if status is not None:
        t = t.append_column(f"{prefix}_status", pa.array(status, type=pa.string()))
    return t


def border_stage(t: pa.Table, column: str, UL: float, LL: float,
                 warning_stages: list[float], prefix: str = "bc") -> pa.Table:
    """Static range check on one column; nulls grade Undefined."""
    vals = _float_np(t[column])
    vn = normalize(vals, UL, LL)
    code, status = grade_normalized(vn, warning_stages)
    return _append(t, prefix, code, status)


def zscore_stage(t: pa.Table, column: str, mean: float, std: float, X: float,
                 warning_stages: list[float], prefix: str = "wf") -> pa.Table:
    """Broadcast-stats Welford check: limits mean ± X·std from the dataset-level
    merged Welford partials (the scale form of welford.py's dynamic limits)."""
    vals = _float_np(t[column])
    half = X * max(std, np.nextafter(0, 1))
    vn = (vals - mean) / half
    code, status = grade_normalized(vn, warning_stages)
    return _append(t, prefix, code, status)


def consistency_stage(t: pa.Table, prefix: str = "cc",
                      max_samples: int = synth.MAX_SAMPLES) -> pa.Table:
    """bytes↔metadata consistency: encoded length must equal
    44 + 2·min(round(sr_hz·dur_ms/1000), cap) (FIXTURES.md §B)."""
    blen = _float_np(pc.binary_length(pc.fill_null(t["bytes"], b"")))
    sr = _float_np(t["sr_hz"])
    dur = _float_np(t["dur_ms"])
    expected = audio.WAV_HEADER_BYTES + 2 * np.minimum(
        np.round(sr * dur / 1000.0), max_samples)
    meta_null = np.isnan(sr) | np.isnan(dur)
    code = np.where(blen == expected, OK_CODE, ERROR_CODE).astype(np.int8)
    code[meta_null] = UNDEFINED_CODE
    status = np.where(code == ERROR_CODE, "Error: byte length inconsistent with metadata",
                      np.where(code == UNDEFINED_CODE, "Undefined", "OK")).astype(object)
    return _append(t, prefix, code, status)


def transcript_stage(t: pa.Table, seed: int | None = None,
                     prefix: str = "tc") -> pa.Table:
    """Referential transcript check: presence (null/empty => Error) and, when
    the generator seed is known, equality against the regenerated token
    sequence (per-row fidelity invariant, BASELINE.json)."""
    tr = t["transcript"]
    missing = _null_mask(tr) | pc.equal(pc.fill_null(tr, ""), "").to_numpy(
        zero_copy_only=False).astype(bool)
    code = np.where(missing, ERROR_CODE, OK_CODE).astype(np.int8)
    status = np.where(missing, "Error: transcript missing", "OK").astype(object)
    if seed is not None:
        idx = clip_index(t)
        dur = _float_np(t["dur_ms"])
        texts = np.asarray(tr.to_pylist(), dtype=object)
        ok_rows = np.nonzero(~missing & ~np.isnan(dur))[0]
        if len(ok_rows):
            expected = synth.transcripts_for_batch(
                seed, idx[ok_rows], dur[ok_rows].astype(np.int64))
            bad = ok_rows[texts[ok_rows] != expected]
            code[bad] = ERROR_CODE
            status[bad] = "Error: transcript mismatch"
    return _append(t, prefix, code, status)


def speaking_rate_stage(t: pa.Table, prefix: str = "sr",
                        err_cps: float = 30.0, warn_cps: float = 20.0,
                        min_cps: float = 1.0,
                        min_dur_ms: float = 2000.0) -> pa.Table:
    """Transcript↔audio speaking-rate plausibility: chars/sec of the
    transcript against dur_ms (metadata only — the payload column is
    never read, so the stage runs column-pruned at the scan). Error when
    the rate is impossible for speech (> err_cps, or ~silent-length
    transcript on a long clip: < min_cps past min_dur_ms); Warning in
    the fast band (> warn_cps); Undefined when duration or transcript is
    null. Emits chars_per_sec/words_per_min alongside the graded code."""
    tr = t["transcript"]
    tr_null = _null_mask(tr)
    s = pc.fill_null(tr, "")
    n_chars = _float_np(pc.utf8_length(s))
    n_words = _float_np(pc.count_substring_regex(s, r"\S+"))
    dur = _float_np(t["dur_ms"])
    sec = dur / 1000.0
    safe = np.maximum(sec, 1e-9)
    cps = n_chars / safe
    wpm = n_words / safe * 60.0
    code = np.full(len(n_chars), OK_CODE, dtype=np.int8)
    code[cps > warn_cps] = WARNING_CODE
    too_slow = (cps < min_cps) & (dur > min_dur_ms)
    code[(cps > err_cps) | too_slow | (dur <= 0)] = ERROR_CODE
    undef = tr_null | np.isnan(dur)
    code[undef] = UNDEFINED_CODE
    status = np.where(code == ERROR_CODE,
                      "Error: implausible speaking rate",
                      np.where(code == WARNING_CODE,
                               "Warning: fast speaking rate",
                               np.where(code == UNDEFINED_CODE,
                                        "Undefined", "OK"))).astype(object)
    out = _append(t, prefix, code, status)
    out = out.append_column("chars_per_sec",
                            pa.array(np.round(np.where(undef, np.nan, cps), 6),
                                     type=pa.float64()))
    return out.append_column("words_per_min",
                             pa.array(np.round(np.where(undef, np.nan, wpm), 6),
                                      type=pa.float64()))


def clip_index(t: pa.Table) -> np.ndarray:
    """Parse the numeric clip index from clip_id ('clip-%09d')."""
    sliced = pc.utf8_slice_codeunits(pc.fill_null(t["clip_id"], "clip-000000000"), 5, 99)
    return pc.cast(sliced, pa.int64()).to_numpy(zero_copy_only=False)


class FidelityCheck:
    """Actor-pool stage: decode PCM16 WAV payloads and verify SNR >= threshold
    against the regenerated deterministic signal (audio.clip_signal).

    Callable-class => one actor per pool slot; per-clip decode is genuinely
    per-item work (like image decode) but each decode/SNR is numpy-vectorized
    over the clip's samples. Appends fid_code / fid_status / snr_db.
    """

    def __init__(self, seed: int, snr_threshold: float = 30.0,
                 max_samples: int = synth.MAX_SAMPLES,
                 loudness_bounds: tuple | None = None,
                 hygiene_limits: tuple | None = None):
        self.seed = seed
        self.snr_threshold = snr_threshold
        self.max_samples = max_samples
        # optional gated-loudness grade from the SAME decode (no extra
        # pass): clips outside [lo_db, hi_db] dBFS are flagged — too
        # quiet/hot for training. None (default) appends nothing.
        self.loudness_bounds = loudness_bounds
        # optional signal-hygiene gate from the SAME decode: (max_dc,
        # max_sub20) — DC bias / subsonic rumble beyond either limit is
        # an Error. None (default) appends nothing.
        self.hygiene_limits = hygiene_limits

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = clip_index(t)
        sr = _float_np(t["sr_hz"])
        dur = _float_np(t["dur_ms"])
        payloads = t["bytes"].to_pylist()
        code = np.full(n, OK_CODE, dtype=np.int8)
        status = np.full(n, "OK", dtype=object)
        snr = np.full(n, np.nan)
        lb = self.loudness_bounds
        if lb:
            ld_code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
            ld_status = np.full(n, "Undefined", dtype=object)
            loud = np.full(n, np.nan)
        hl = self.hygiene_limits
        if hl:
            hy_code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
            hy_status = np.full(n, "Undefined", dtype=object)
            dc = np.full(n, np.nan)
            sub = np.full(n, np.nan)
        for r in range(n):
            if payloads[r] is None or np.isnan(sr[r]) or np.isnan(dur[r]):
                code[r] = UNDEFINED_CODE
                status[r] = "Undefined"
                continue
            dec, dec_sr = audio.decode_wav_lenient(payloads[r])
            if dec is None:
                code[r] = ERROR_CODE
                status[r] = "Error: undecodable audio payload"
                continue
            if lb and dec_sr and len(dec):
                from .audio_ops import gated_loudness
                ldb = gated_loudness(dec, dec_sr)["loudness_db"]
                loud[r] = ldb
                if not np.isfinite(ldb) or ldb < lb[0]:
                    ld_code[r] = ERROR_CODE
                    ld_status[r] = "Error: gated loudness below floor"
                elif ldb > lb[1]:
                    ld_code[r] = ERROR_CODE
                    ld_status[r] = "Error: gated loudness above ceiling"
                else:
                    ld_code[r] = OK_CODE
                    ld_status[r] = "OK"
            # grade hygiene only with >= 50 ms of audio: the mean of a
            # handful of sine samples is legitimately nonzero (a planted
            # 1 ms clip reads 0.11 "DC"), so shorter clips stay Undefined
            if hl and dec_sr and len(dec) >= max(256, dec_sr // 20):
                from .audio_ops import hygiene_stats
                h = hygiene_stats(dec, dec_sr)
                dc[r], sub[r] = h["dc_offset"], h["sub20_ratio"]
                if abs(h["dc_offset"]) > hl[0]:
                    hy_code[r] = ERROR_CODE
                    hy_status[r] = "Error: DC offset above limit"
                elif h["sub20_ratio"] == h["sub20_ratio"] \
                        and h["sub20_ratio"] > hl[1]:
                    hy_code[r] = ERROR_CODE
                    hy_status[r] = "Error: subsonic rumble above limit"
                else:
                    hy_code[r] = OK_CODE
                    hy_status[r] = "OK"
            n_samp = min(int(round(sr[r] * dur[r] / 1000.0)), self.max_samples)
            ref = audio.clip_signal(self.seed, int(idx[r]),
                                    min(int(sr[r]), 48000), int(dur[r]),
                                    max_samples=n_samp)
            s = audio.snr_db(dec, ref)
            snr[r] = s
            if not (s >= self.snr_threshold):
                code[r] = ERROR_CODE
                status[r] = "Error: decoded-PCM SNR below threshold"
        t = _append(t, "fid", code, status)
        t = t.append_column("snr_db", pa.array(snr, type=pa.float64()))
        if lb:
            t = _append(t, "ld", ld_code, ld_status)
            t = t.append_column("loudness_db",
                                pa.array(loud, type=pa.float64()))
        if hl:
            t = _append(t, "hy", hy_code, hy_status)
            t = t.append_column("dc_offset",
                                pa.array(dc, type=pa.float64()))
            t = t.append_column("sub20_ratio",
                                pa.array(sub, type=pa.float64()))
        return t


def flag_duplicates_stage(t: pa.Table, dup_ids: set[str] | frozenset[str],
                          prefix: str = "uq") -> pa.Table:
    """Uniqueness flag: clip_id in the (broadcast) confirmed-duplicate set."""
    isin = pc.is_in(t["clip_id"], value_set=pa.array(sorted(dup_ids), type=pa.string()))
    dup = pc.fill_null(isin, False).to_numpy(zero_copy_only=False).astype(bool)
    code = np.where(dup, ERROR_CODE, OK_CODE).astype(np.int8)
    status = np.where(dup, "Error: duplicate clip_id", "OK").astype(object)
    return _append(t, prefix, code, status)


def flag_duplicates_join_stage(t: pa.Table, prefix: str = "uq") -> pa.Table:
    """Uniqueness flag from the join regime: a left-outer join against the
    confirmed-dup Dataset left a ``uq_dup`` marker (null = not a dup) and
    the transient ``clip_id_hash`` join key — consume both and emit the
    same code/status columns the broadcast path does."""
    dup = pc.fill_null(t["uq_dup"], False).to_numpy(
        zero_copy_only=False).astype(bool)
    t = t.drop_columns(["clip_id_hash", "uq_dup"])
    code = np.where(dup, ERROR_CODE, OK_CODE).astype(np.int8)
    status = np.where(dup, "Error: duplicate clip_id", "OK").astype(object)
    return _append(t, prefix, code, status)


# per-worker-process cache for the partitioned dup-flag stage:
# (dup_dir, partition_id) -> (dir fingerprint, sorted uint64 hash array).
# Ray reuses worker processes across runs in a session, so entries are
# validated against a cheap scandir fingerprint (names+mtime+size) — a
# rerun that rewrites a partition's flags invalidates its entry without
# any cross-worker coordination.
_PART_DUP_CACHE: dict = {}


def _partition_dup_hashes(dup_dir: str, pid: int) -> np.ndarray:
    import os

    import pyarrow.parquet as pq
    d = os.path.join(dup_dir, f"partition_id={int(pid)}")
    try:
        with os.scandir(d) as it:
            fp = tuple(sorted((e.name, e.stat().st_mtime_ns, e.stat().st_size)
                              for e in it if e.is_file()))
    except FileNotFoundError:
        fp = None
    key = (dup_dir, int(pid))
    hit = _PART_DUP_CACHE.get(key)
    if hit is not None and hit[0] == fp:
        return hit[1]
    if fp is None or not fp:
        arr = np.empty(0, dtype=np.uint64)
    else:
        tabs = [pq.read_table(os.path.join(d, name),
                              columns=["clip_id_hash"]) for name, _, _ in fp]
        h = np.concatenate([t["clip_id_hash"].to_numpy(zero_copy_only=False)
                            for t in tabs]).astype(np.uint64)
        arr = np.unique(h)  # sorted
    if len(_PART_DUP_CACHE) > 64:
        _PART_DUP_CACHE.clear()
    _PART_DUP_CACHE[key] = (fp, arr)
    return arr


def flag_duplicates_partitioned_stage(t: pa.Table, dup_dir: str,
                                      prefix: str = "uq") -> pa.Table:
    """Uniqueness flag from per-partition dup-flag files — the map-side
    regime for dup-heavy tables (validate pass A wrote, for every
    partition, the confirmed-duplicate hashes PRESENT IN that partition).
    Each batch loads only its own partitions' hash arrays (worker-cached),
    so the verdict stream never shuffles and per-task memory is O(dups in
    the partitions this batch touches), not O(all dups)."""
    import pandas as pd
    h = pd.util.hash_pandas_object(t["clip_id"].to_pandas(),
                                   index=False).to_numpy(np.uint64)
    parts = t["partition_id"].to_numpy(zero_copy_only=False)
    dup = np.zeros(len(h), dtype=bool)
    for p in np.unique(parts):
        dups = _partition_dup_hashes(dup_dir, int(p))
        if not len(dups):
            continue
        m = parts == p
        idx = np.clip(np.searchsorted(dups, h[m]), 0, len(dups) - 1)
        dup[m] = dups[idx] == h[m]
    code = np.where(dup, ERROR_CODE, OK_CODE).astype(np.int8)
    status = np.where(dup, "Error: duplicate clip_id", "OK").astype(object)
    return _append(t, prefix, code, status)


def flag_duplicate_hashes_stage(t: pa.Table, dup_hashes: np.ndarray,
                                prefix: str = "uq") -> pa.Table:
    """Uniqueness flag by broadcast SORTED 64-bit id-hash array — the hash is
    re-derived row-locally with the same pandas hash the pass-A partial used,
    so no id strings ever move (validate.run_pass_a)."""
    import pandas as pd
    h = pd.util.hash_pandas_object(t["clip_id"].to_pandas(),
                                   index=False).to_numpy(np.uint64)
    idx = np.searchsorted(dup_hashes, h)
    idx = np.clip(idx, 0, max(len(dup_hashes) - 1, 0))
    dup = (len(dup_hashes) > 0) & (dup_hashes[idx] == h) if len(dup_hashes) \
        else np.zeros(len(h), dtype=bool)
    code = np.where(dup, ERROR_CODE, OK_CODE).astype(np.int8)
    status = np.where(dup, "Error: duplicate clip_id", "OK").astype(object)
    return _append(t, prefix, code, status)
