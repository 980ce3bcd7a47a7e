"""Continuous (micro-batch) clip-table validation — the flagship pipeline's
streaming run mode, completing the reference's primary deployment shape
(/root/reference/src/consumer.py:164-191 infinite Kafka poll) for the AUDIO
table the same way sources/streaming.StreamRunner does for message streams.

Concepts (same mapping as StreamRunner):
- **topic** → a watched directory into which clip parquet shards land.
- **offset** → the processed-file ledger in ``_stream_manifest.json``,
  committed only AFTER the poll's outputs are durably written
  (at-least-once); a re-processed poll overwrites its own poll directory
  (named by the hash of its file set) → idempotent.
- **poll** → read ONLY the new shards, run the full check chain on them.
- **carried state** → what the batch flagship computes in pass A becomes
  cumulative cross-poll state:
    * duplicate detection: a BUCKETED compacted ledger — cumulative
      (clip_id_hash, cnt) parquet per ``hash % ledger_buckets`` bucket.
      Each poll merges its new counts into ONLY the touched buckets
      (O(new rows + touched-bucket bytes), never O(stream history)), so
      an arriving clip whose twin came in an EARLIER poll is still
      flagged (the historical copy was already emitted and is not
      retracted). Bucket compactions are written under the NEW poll's
      generation name and become live only when the manifest commits.
    * dur_ms z-score baseline: a mergeable Welford partial folded over all
      polls (grading accuracy grows with history; the first poll grades
      against itself exactly like a fresh batch run).
    * drift: the arriving poll's fixed-edge histograms are PSI-graded
      against the CUMULATIVE history histogram (warm-up below
      ``drift_min_rows`` rows skips grading) — "is the arriving data
      distributed like everything seen so far".
    * HLL keeps the running distinct-clip estimate.

Scale: per-poll work is O(new rows) streaming + per-bucket ledger merges
in Ray tasks (O(distinct ids) rows on disk, never on the driver);
cumulative state is a few KB of sketch registers. Violations append under
``violations/poll=<id>/partition_id=*`` so a consumer can tail them.

Crash safety: a poll's outputs (violations, bucket compactions, the
per-poll state pickle) are all written under the poll's own generation
name FIRST; the manifest — file ledger + live-state pointer + per-bucket
live-generation map — is then replaced atomically, so state and offsets
advance together (a crash between output writes and the commit replays
the poll, overwriting its own files: at-least-once, idempotent).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.sketches import HyperLogLog, WelfordPartial, psi
from ..stages import drift as drift_mod
from ..stages import stats as stats_mod
from . import validate as vp
from .validate import ValidateConfig


def _state_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_stream_state")


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_stream_manifest.json")


@ray.remote
def _merge_bucket(bucket_dir: str, prior_file: str | None, poll_id: str,
                  hashes: np.ndarray, cnts: np.ndarray):
    """Merge one ledger bucket: prior compacted (hash, cnt) + this poll's
    new counts → ``cum-<poll_id>.parquet`` (atomic tmp+rename; a replayed
    poll overwrites its own generation). Returns (hashes among THIS
    poll's arrivals whose cumulative count > 1, prior files read)."""
    import pyarrow.parquet as pq
    os.makedirs(bucket_dir, exist_ok=True)
    new = pd.DataFrame({"clip_id_hash": hashes.astype(np.int64),
                        "cnt": cnts.astype(np.int64)})
    files_read = 0
    if prior_file and os.path.exists(prior_file):
        prior = pq.read_table(prior_file).to_pandas()
        files_read = 1
        merged = (pd.concat([prior, new], ignore_index=True)
                  .groupby("clip_id_hash", as_index=False)
                  .agg(cnt=("cnt", "sum")))
    else:
        merged = new
    out = os.path.join(bucket_dir, f"cum-{poll_id}.parquet")
    tmp = out + f".tmp-{poll_id}"
    pq.write_table(pa.table({
        "clip_id_hash": merged["clip_id_hash"].to_numpy(np.int64),
        "cnt": merged["cnt"].to_numpy(np.int64)}), tmp)
    os.replace(tmp, out)
    dup = merged.merge(new[["clip_id_hash"]], on="clip_id_hash")
    return dup.loc[dup["cnt"] > 1, "clip_id_hash"].to_numpy(np.int64), \
        files_read


class ClipStreamValidator:
    """Continuous validation over a watched clip-shard directory."""

    def __init__(self, watch_dir: str, out_dir: str,
                 cfg: ValidateConfig | None = None,
                 drift_min_rows: int = 512, drift_psi_error: float = 0.25,
                 ledger_buckets: int = 64, qc_audit: bool = False):
        self.watch_dir = watch_dir
        self.out_dir = out_dir
        self.cfg = cfg or ValidateConfig()
        self.drift_min_rows = drift_min_rows
        self.drift_psi_error = drift_psi_error
        self.ledger_buckets = ledger_buckets
        # optional per-poll audio QC: the fused one-decode audit battery
        # (audio_ops.FullAudit — cross-modal, hum, clicks, hygiene,
        # bandwidth, wow/flutter, blind-RT60 reverb) over the arriving
        # shards, folded to
        # poll-level counts in the manifest entry — the QC-trend twin of
        # the per-poll metadata drift grading
        self.qc_audit = qc_audit
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = self._load_manifest()
        self.state = self._load_state()

    # ------------------------------------------------------------ state io

    def _load_manifest(self) -> dict:
        if os.path.exists(_manifest_path(self.out_dir)):
            with open(_manifest_path(self.out_dir)) as f:
                return json.load(f)
        return {"files": [], "polls": {}, "state": None, "ledger": {}}

    def _save_manifest(self) -> None:
        tmp = _manifest_path(self.out_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, _manifest_path(self.out_dir))

    def _load_state(self) -> dict:
        """Load the state generation the manifest points at — state only
        becomes live with the ledger commit, so a crash between output
        writes and the commit replays against the PRE-poll state."""
        live = self.manifest.get("state")
        if live:
            with open(os.path.join(_state_dir(self.out_dir),
                                   f"state-{live}.pkl"), "rb") as f:
                return pickle.load(f)
        return {"hll": HyperLogLog(14), "dur": WelfordPartial(),
                "hist": None, "rows": 0}

    def _write_state_generation(self, poll_id: str) -> None:
        d = _state_dir(self.out_dir)
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, f"state-{poll_id}.pkl")
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.state, f)
        os.replace(tmp, out)

    def _prune_generations(self, touched_buckets: list[int],
                           prev_state: str | None) -> None:
        """Post-commit cleanup: drop state pickles other than the live +
        previous generation, and stale bucket compactions the manifest no
        longer references."""
        d = _state_dir(self.out_dir)
        keep = {self.manifest.get("state"), prev_state}
        for f in os.listdir(d):
            gen = f.removeprefix("state-").removesuffix(".pkl")
            if f.startswith("state-") and f.endswith(".pkl") and gen not in keep:
                os.unlink(os.path.join(d, f))
        for b in touched_buckets:
            bdir = os.path.join(self.out_dir, "id_hashes",
                                f"bucket={int(b):05d}")
            live = f"cum-{self.manifest['ledger'][str(int(b))]}.parquet"
            for f in os.listdir(bdir):
                if f != live:
                    os.unlink(os.path.join(bdir, f))

    # --------------------------------------------------------------- poll

    def _new_files(self) -> list[str]:
        seen = set(self.manifest["files"])
        return sorted(os.path.join(self.watch_dir, f)
                      for f in os.listdir(self.watch_dir)
                      if f.endswith(".parquet")
                      and os.path.join(self.watch_dir, f) not in seen)

    def poll_once(self) -> dict | None:
        """Validate newly-arrived shards. Returns the poll summary, or
        None when nothing new arrived.

        Poison-shard quarantine (same contract as StreamRunner.poll_once):
        each new parquet is probed locally (footer/metadata read — parquet
        checksums its footer, so truncated or garbage shards fail here)
        before entering the Ray read; failures are committed to the file
        ledger as quarantined with the error recorded, never retried, and
        the healthy shards of the same poll still validate."""
        files = self._new_files()
        if not files:
            return None
        ok, bad = [], []
        for f in files:
            try:
                import pyarrow.parquet as _pq
                _pq.read_metadata(f)
                ok.append(f)
            except Exception as err:  # noqa: BLE001 — any footer failure
                bad.append((f, f"{type(err).__name__}: {err}"))
        if bad:
            q = self.manifest.setdefault("quarantined", {})
            for f, err in bad:
                q[os.path.basename(f)] = err
                self.manifest["files"].append(f)
            self._save_manifest()
        files = ok
        quarantined = [os.path.basename(f) for f, _ in bad]
        if not files:
            return {"poll": None, "rows": 0, "quarantined": quarantined}
        poll_id = hashlib.sha256("\n".join(
            os.path.basename(f) for f in files).encode()).hexdigest()[:12]
        t0 = time.time()
        cfg = self.cfg

        ds = rd.read_parquet(files)

        # ---- pass A over the micro-batch: partials for sketches + hashes
        drift_cols = cfg.drift.get("columns") or drift_mod.DEFAULT_EDGES

        def composite_partial(t: pa.Table) -> pa.Table:
            hll = HyperLogLog(14)
            hll.add_hashes(vp._id_hashes(t["clip_id"].to_pandas()))
            payload = {
                "hll": hll.registers.tobytes(),
                "dur": stats_mod.welford_partial_batch(t, "dur_ms").to_pydict(),
                "hist": drift_mod._hist_partial_batch(
                    t, drift_cols, "partition_id").to_pydict(),
                "hashes": vp._hash_count_partial(t),
                "rows": t.num_rows,
            }
            return pa.table({"payload": pa.array([pickle.dumps(payload)],
                                                 type=pa.binary())})

        hll_new = HyperLogLog(14)
        dur_new = WelfordPartial()
        hist_rows: list[pd.DataFrame] = []
        hash_frames: list[pd.DataFrame] = []
        rows_new = 0
        parts = ds.map_batches(composite_partial, batch_format="pyarrow")
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
            for buf in b["payload"].to_pylist():
                p = pickle.loads(buf)
                other = HyperLogLog(14)
                other.registers = np.frombuffer(p["hll"], dtype=np.uint8).copy()
                hll_new = hll_new.merge(other)
                d = p["dur"]
                for i in range(len(d["n"])):
                    dur_new = dur_new.merge(WelfordPartial(
                        int(d["n"][i]), d["mean"][i], d["M2"][i],
                        d["min"][i], d["max"][i]))
                hist_rows.append(pd.DataFrame(p["hist"]))
                hash_frames.append(p["hashes"])
                rows_new += p["rows"]

        # ---- bucketed ledger merge: only the buckets the new hashes touch
        # are read + recompacted (O(new + touched), never O(history)); a
        # clip arriving now whose twin landed in an earlier poll shows a
        # cumulative count > 1 in its bucket and is flagged.
        ledger_dir = os.path.join(self.out_dir, "id_hashes")
        live = (pd.concat(hash_frames, ignore_index=True)
                .groupby("clip_id_hash", as_index=False).agg(cnt=("cnt", "sum")))
        bucket_of = (live["clip_id_hash"].to_numpy(np.int64).astype(np.uint64)
                     % np.uint64(self.ledger_buckets))
        ledger_map: dict[str, str] = dict(self.manifest.get("ledger", {}))
        bucket_refs = []
        for b in np.unique(bucket_of):
            m = bucket_of == b
            bdir = os.path.join(ledger_dir, f"bucket={int(b):05d}")
            prior = ledger_map.get(str(int(b)))
            prior_file = (os.path.join(bdir, f"cum-{prior}.parquet")
                          if prior else None)
            bucket_refs.append((int(b), _merge_bucket.remote(
                bdir, prior_file, poll_id,
                live["clip_id_hash"].to_numpy(np.int64)[m],
                live["cnt"].to_numpy(np.int64)[m])))
        dup_parts, ledger_files_read = [], 0
        for b, ref in bucket_refs:
            d, r = ray.get(ref)
            dup_parts.append(d)
            ledger_files_read += r
            ledger_map[str(b)] = poll_id
        touched = [b for b, _ in bucket_refs]
        dup_hashes = (np.concatenate(dup_parts).astype(np.uint64)
                      if dup_parts else np.array([], dtype=np.uint64))
        import pyarrow.compute as pc

        # ---- drift of the arriving poll vs cumulative history
        hist_new = (pd.concat(hist_rows, ignore_index=True)
                    .groupby("column", as_index=False)
                    .agg(counts=("counts", lambda s: np.sum(
                        np.stack([np.asarray(c) for c in s]), axis=0))))
        drift_psi: dict[str, float] = {}
        drifted = False
        prior_hist = self.state["hist"]
        if prior_hist is not None and self.state["rows"] >= self.drift_min_rows:
            prior = {r["column"]: np.asarray(r["counts"])
                     for _, r in prior_hist.iterrows()}
            for _, r in hist_new.iterrows():
                col = r["column"]
                if col in prior:
                    v = float(psi(prior[col], np.asarray(r["counts"])))
                    drift_psi[col] = round(v, 4)
                    drifted |= v > self.drift_psi_error

        # ---- pass B on the new rows (cumulative dur baseline)
        dur_cum = self.state["dur"].merge(dur_new)
        pass_a = {"dup_hashes": dup_hashes, "dur_stats": dur_cum}
        acc = vp.ShardedSink()
        verdicts = vp.build_pass_b(ds, cfg, pass_a, metrics_actor=acc)
        violations = verdicts.map_batches(
            lambda t: t.filter(pc.equal(t["status_code"], vp.ERROR_CODE)),
            batch_format="pyarrow")
        viol_dir = os.path.join(self.out_dir, "violations", f"poll={poll_id}")
        if os.path.isdir(viol_dir):  # idempotent re-poll
            import shutil
            shutil.rmtree(viol_dir)
        os.makedirs(viol_dir, exist_ok=True)
        violations.write_parquet(viol_dir, partition_cols=["partition_id"])
        metrics = acc.total()
        acc.kill()
        n_viol = (int(metrics["status_code_errors"].sum())
                  if not metrics.empty else 0)

        # ---- fold state into this poll's generation, then commit offsets,
        # the live-state pointer, and the bucket generations in ONE atomic
        # manifest replace (at-least-once; replay re-derives everything
        # from the pre-poll generation, so nothing double-counts).
        self.state["hll"] = self.state["hll"].merge(hll_new)
        self.state["dur"] = dur_cum
        if prior_hist is None:
            self.state["hist"] = hist_new
        else:
            both = pd.concat([prior_hist, hist_new], ignore_index=True)
            self.state["hist"] = (both.groupby("column", as_index=False)
                                  .agg(counts=("counts", lambda s: np.sum(
                                      np.stack([np.asarray(c) for c in s]),
                                      axis=0))))
        self.state["rows"] += rows_new
        self._write_state_generation(poll_id)

        # ---- optional per-poll audio QC scorecard (advisory: warnings
        # trend in the manifest; the pass/fail verdict stays owned by the
        # violation and drift gates above)
        qc_counts = None
        if self.qc_audit:
            from ..stages import audio_ops as ao
            flag_cols = ["xm_flag", "hum_flag", "click_flag", "hy_flag",
                         "bw_flag", "wf_flag", "rv_flag"]

            def qc_partial(df: pd.DataFrame) -> pd.DataFrame:
                qcode = df["qa_code"].to_numpy()
                row = {"n": float(len(df)),
                       "n_error": float((qcode == -1).sum()),
                       "n_warning": float((qcode == 0).sum()),
                       "n_undecodable": float((qcode == 2).sum())}
                for col in flag_cols:
                    row["n_" + col[:-5]] = float(
                        (df[col].to_numpy() == 1).sum())
                return pd.DataFrame([row])

            qp = (ao.full_audit_table(rd.read_parquet(files))
                  .map_batches(qc_partial, batch_format="pandas")
                  .to_pandas())
            qc_counts = {k: int(qp[k].sum()) for k in qp.columns}

        entry = {
            "files": [os.path.basename(f) for f in files],
            "rows": int(rows_new),
            "violations": n_viol,
            "drift_psi": drift_psi,
            "drifted": bool(drifted),
            "pass": not (n_viol > 0 or drifted),
            "ledger_files_read": int(ledger_files_read),
            "ledger_buckets_touched": len(touched),
            "wall_sec": round(time.time() - t0, 3),
        }
        if qc_counts is not None:
            entry["qc"] = qc_counts
        prev_state = self.manifest.get("state")
        self.manifest["polls"][poll_id] = entry
        self.manifest["files"].extend(files)
        self.manifest["state"] = poll_id
        self.manifest["ledger"] = ledger_map
        self._save_manifest()
        self._prune_generations(touched, prev_state)
        out = {"poll_id": poll_id, **entry,
               "hll_estimate": self.state["hll"].estimate(),
               "rows_total": self.state["rows"]}
        if quarantined:
            out["quarantined"] = quarantined
        return out

    def run(self, max_polls: int | None = None, idle_sleep: float = 1.0,
            idle_limit: int | None = 1):
        """Poll loop: validate new shards as they land; stop after
        ``idle_limit`` consecutive empty polls (None = run forever)."""
        results, idle = [], 0
        while max_polls is None or len(results) < max_polls:
            r = self.poll_once()
            if r is None:
                idle += 1
                if idle_limit is not None and idle >= idle_limit:
                    break
                time.sleep(idle_sleep)
                continue
            idle = 0
            results.append(r)
        return results
