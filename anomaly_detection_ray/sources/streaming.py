"""Micro-batch streaming ingestion — the Ray Data equivalent of the
reference's primary run mode, the Kafka consumer loop
(/root/reference/src/consumer.py:107-221: subscribe, infinite poll,
per-message ``message_insert`` into each configured scorer).

Kafka itself is deliberately outside the dependency set, and a per-message
driver loop is the opposite of a Ray design. The equivalent here maps the
Kafka concepts onto files + Datasets:

- **topic** → a watched directory of message files (CSV/JSON in the
  reference's message layout). Each file is one producer batch; files are
  the offset unit.
- **committed offset** → the processed-file ledger in
  ``<out_dir>/_stream_manifest.json``, committed only AFTER a poll's
  output is durably written → **at-least-once**, and a re-processed poll
  overwrites the same poll directory (named by the hash of its file set)
  → idempotent, so effectively exactly-once on stable input.
- **consumer poll** → ``poll_once()``: read only the new files, grade them
  with the configured per-series kernels, append verdict parquet.
- **scorer state between polls** (the reference keeps it in each
  algorithm object) → a per-key state store: the trailing ``state_rows``
  rows of every series are carried into the next micro-batch (prepended,
  graded for state only, dropped from output — Structured-Streaming-style).

Exactness: kernels whose memory is bounded by their window (BorderCheck,
Welford(N), Hampel, Percentile, MACD, LinearFit, Filtering warm-up) give
verdicts EQUAL to a batch run over the full history when ``state_rows`` ≥
their window. Infinite-memory recurrences (Welford-inf, Cumulative, EMA's
geometric tail) converge exponentially but are not bit-equal — callers
needing exact infinite-memory semantics should run batch over the full
table. Late data: by default rows older than the carried tail are graded
against the warm state as-is (no retraction; watermark = oldest carried
row). With ``allowed_lateness_s`` set, an explicit event-time watermark is
kept in the manifest — PER SERIES KEY on a keyed stream (skewed arrival
across series must not classify a slow-but-ordered series as late), scalar
on an unkeyed one; rows behind their series' max seen ``ts`` minus the
lateness are diverted to ``<out_dir>/late/poll=*`` — never graded, never
entering state — so in-time verdicts keep batch parity even under
disorder.

Scale: state flows through parquet + the object store, never the driver;
one ``groupby(key).map_groups`` shuffle per poll; the graded micro-batch
is written ONCE and verdict/state views are column-pruned, predicate-
pushdown reads of that file.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd

import ray.data as rd

from ..stages import series as series_mod
from .messages import read_message_csv, read_message_json

_WARM, _TAIL = "__warm__", "__tail__"


def _read_messages(paths: list[str]):
    csvs = [p for p in paths if not p.endswith(".json")]
    parts = [read_message_csv(p) for p in sorted(csvs)]
    parts += [read_message_json(p) for p in sorted(paths) if p.endswith(".json")]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


class StreamRunner:
    """Continuous validation over a watched directory (see module doc)."""

    def __init__(self, conf: dict, watch_dir: str, out_dir: str,
                 key_col: str | None = None, value_col: str = "f0",
                 state_rows: int = 256,
                 allowed_lateness_s: float | None = None):
        from ..pipelines.config import parse_config, _flatten
        checks = _flatten(parse_config(conf))
        bad = [c["name"] for c in checks if c["kind"] != "kernel"]
        if bad:
            raise NotImplementedError(
                f"streaming supports per-series kernel checks; {bad} need "
                "a training pass — run them batch, or pre-train and "
                "register the fitted kernel")
        self.specs = [{"name": c["name"], "kernel": c["kernel"],
                       "params": c["params"]} for c in checks]
        self.watch_dir, self.out_dir = watch_dir, out_dir
        self.key_col, self.value_col = key_col, value_col
        self.state_rows = state_rows
        self.allowed_lateness_s = allowed_lateness_s
        self.manifest_path = os.path.join(out_dir, "_stream_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = {"processed": [], "polls": []}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    @property
    def state_path(self) -> str:
        """Current state store. State files are per-poll and the manifest
        points at the live one — state only becomes visible when the
        poll's ledger commit lands, so a crash between the state write and
        the commit replays against the PRE-batch state (no double-grading
        of the same rows into a warm tail)."""
        sf = self.manifest.get("state_file", "_state.parquet")
        return os.path.join(self.out_dir, sf)

    # ------------------------------------------------------------ internals
    def _pending_files(self) -> list[str]:
        done = set(self.manifest["processed"])
        try:
            names = sorted(os.listdir(self.watch_dir))
        except FileNotFoundError:
            return []
        return [os.path.join(self.watch_dir, n) for n in names
                if n not in done and (n.endswith(".csv") or n.endswith(".json"))]

    def _grade_kernel(self, order_cols: list[str]):
        base = series_mod.make_series_kernel(self.specs, self.value_col,
                                             order_cols, valid_col=None,
                                             keep_status=True)
        state_rows = self.state_rows

        def per_group(g: pd.DataFrame) -> pd.DataFrame:
            out = base(g)  # sorted by order_cols inside
            tail = np.zeros(len(out), dtype=bool)
            tail[max(0, len(out) - state_rows):] = True
            out[_TAIL] = tail
            return out

        return per_group

    # ------------------------------------------------------------ API
    def warm_start(self, files: list[str]) -> dict:
        """Two-phase consumption (reference ``ConsumerFileKafka``,
        consumer.py:366-412: grade a history FILE fully, then keep
        consuming the stream with the scorers' state carried over). The
        history files are graded through the exact same poll machinery —
        verdicts land in their own ``poll=`` dir, the state store ends
        holding each series' trailing rows — and subsequent ``poll_once``
        calls continue from that state. Files may live anywhere (they are
        not entered in the watch-dir ledger); call before the first poll."""
        done = set(self.manifest.get("warm_processed", []))
        todo = [f for f in files if os.path.basename(f) not in done]
        if not todo:
            return {"files": [], "rows": 0, "violations": 0}
        return self._process(todo, ledger=False)

    def poll_once(self) -> dict:
        """One consumer poll: new files -> graded verdict parquet + updated
        state store + committed ledger. Returns the poll record.

        Poison-file quarantine: each new file is probed locally (CSV
        header + first rows parse / full JSON parse) BEFORE entering the
        Ray read, and a file that fails the probe is committed to the
        ledger as quarantined — recorded with its error in
        ``manifest["quarantined"]``, never retried, never able to
        crash-loop the poll (at 100-TB stream scale corrupt shards are a
        when, not an if). The probe catches head/format corruption; a
        well-formed head with a corrupt tail still fails the poll and
        retries under the at-least-once ledger (deliberate: silent
        partial grading would be worse than a loud stall)."""
        files = self._pending_files()
        if not files:
            return {"files": [], "rows": 0, "violations": 0}
        ok, bad = [], []
        for f in files:
            err = self._probe(f)
            (ok if err is None else bad).append((f, err))
        ok = [f for f, _ in ok]
        if bad:
            q = self.manifest.setdefault("quarantined", {})
            for f, err in bad:
                name = os.path.basename(f)
                q[name] = err
                self.manifest["processed"].append(name)
            tmpm = self.manifest_path + ".tmp"
            with open(tmpm, "w") as fh:
                json.dump(self.manifest, fh, indent=1)
            os.replace(tmpm, self.manifest_path)
        if not ok:
            return {"files": [], "rows": 0, "violations": 0,
                    "quarantined": [os.path.basename(f) for f, _ in bad]}
        rec = self._process(ok, ledger=True)
        if bad:
            rec["quarantined"] = [os.path.basename(f) for f, _ in bad]
        return rec

    @staticmethod
    def _probe(path: str) -> str | None:
        """None if the file parses; else the error string. Local (no Ray
        tasks): micro-batch stream files are small by contract."""
        try:
            if path.endswith(".json"):
                with open(path) as fh:
                    json.load(fh)
            else:
                pd.read_csv(path, nrows=64)
            return None
        except Exception as err:  # noqa: BLE001 — any parse failure
            return f"{type(err).__name__}: {err}"

    def _process(self, files: list[str], ledger: bool) -> dict:
        import shutil

        poll_id = hashlib.sha256("\n".join(
            sorted(os.path.basename(f) for f in files)).encode()).hexdigest()[:16]
        poll_dir = os.path.join(self.out_dir, f"poll={poll_id}")

        ds = _read_messages(files)
        raw_cols = list(ds.schema().names)
        n_late = 0
        if self.allowed_lateness_s is not None:
            # event-time watermark (Structured-Streaming-style): rows older
            # than their series' watermark − lateness are routed to a
            # late-rows side output — never graded, never entering kernel
            # state, so bounded-window batch-parity is preserved for
            # in-time rows. The watermark is kept PER SERIES KEY when the
            # stream is keyed (skewed per-series arrival must not classify
            # a slow-but-ordered series as late just because a fast series
            # advanced a global clock); an unkeyed stream keeps the scalar
            # watermark. Manifest forms: float (unkeyed, and round-2
            # legacy, honored as a floor for every series) or
            # {str(key): ts}. The micro-batch is materialized ONCE (it is
            # small by definition) so the split/count/max passes below
            # reuse blocks instead of re-parsing the message files.
            ds = ds.materialize()
            lateness = self.allowed_lateness_s
            wm_key = self.key_col  # None => one global series
            raw_wm = self.manifest.get("watermark_ts")
            if isinstance(raw_wm, dict):
                wm_map = {k: float(v) for k, v in raw_wm.items()}
            elif raw_wm is not None:
                # scalar: the unkeyed stream's watermark, or a legacy
                # global one for a keyed stream (floor for every series)
                wm_map = {"__global__": float(raw_wm)}
            else:
                wm_map = {}
            if wm_map:
                glob_wm = wm_map.get("__global__")

                def _late_mask(df: pd.DataFrame) -> np.ndarray:
                    # numpy NaN semantics make this null-safe: a null ts
                    # (NaN) is never late (it flows to grading, where the
                    # kernels handle it), and an unseen series key (NaN
                    # cutoff) is never late either
                    ts = df["ts"].to_numpy(np.float64)
                    if wm_key is None:
                        w = np.full(len(df), glob_wm, dtype=np.float64)
                    else:
                        mapped = df[wm_key].astype(str).map(wm_map)
                        if glob_wm is not None:
                            mapped = mapped.fillna(glob_wm)
                        w = mapped.to_numpy(np.float64)
                    return ts < (w - lateness)

                late = ds.map_batches(lambda df: df[_late_mask(df)],
                                      batch_format="pandas")
                n_late = late.count()
                if n_late:
                    # side output stays in Ray (never the driver); the dir
                    # is cleared first so a replayed poll is idempotent
                    # (Ray's write_parquet APPENDS by default)
                    late_dir = os.path.join(self.out_dir, "late",
                                            f"poll={poll_id}")
                    shutil.rmtree(late_dir, ignore_errors=True)
                    late.write_parquet(late_dir)
                    ds = ds.map_batches(lambda df: df[~_late_mask(df)],
                                        batch_format="pandas")
                    if ds.count() == 0:
                        # every row was late: the files ARE processed (into
                        # the side output) — commit them, leave kernel state
                        # and the watermark untouched
                        return self._commit(poll_id, files, ledger,
                                            rows=0, violations=0,
                                            n_late=n_late)
            # advance watermarks from the IN-TIME rows only
            if wm_key is None:
                batch_max = ds.max("ts")
                if batch_max is not None:  # None when every in-time ts null
                    prev = wm_map.get("__global__")
                    self.manifest["watermark_ts"] = float(
                        max(prev, batch_max) if prev is not None
                        else batch_max)
            else:
                parts = ds.map_batches(
                    lambda df: (df.groupby(wm_key, as_index=False)
                                .agg(ts=("ts", "max"))),
                    batch_format="pandas").to_pandas()
                if len(parts):
                    mx = parts.groupby(wm_key)["ts"].max()
                    for k, v in mx.items():
                        if not pd.isna(v):
                            ks = str(k)
                            wm_map[ks] = max(wm_map.get(ks, -np.inf),
                                             float(v))
                self.manifest["watermark_ts"] = {
                    k: v for k, v in wm_map.items()}
        key = self.key_col
        if key is None:
            key = "__stream__"
            ds = ds.add_column(key, lambda df: pd.Series(np.zeros(len(df), dtype=np.int8)))
            raw_cols.append(key)
        ds = ds.add_column(_WARM, lambda df: pd.Series(np.zeros(len(df), dtype=bool)))
        if os.path.exists(self.state_path):
            warm = rd.read_parquet(self.state_path).select_columns(raw_cols)
            warm = warm.add_column(_WARM, lambda df: pd.Series(np.ones(len(df), dtype=bool)))
            ds = warm.union(ds)

        graded = ds.groupby(key).map_groups(self._grade_kernel(["ts"]),
                                            batch_format="pandas")
        # ONE write of the graded micro-batch; verdict/state are pruned
        # re-reads (no second shuffle, no materialize). Clear the dir first:
        # Ray's write_parquet APPENDS, and a crash-replayed poll must
        # overwrite, not double its rows.
        import shutil
        shutil.rmtree(poll_dir, ignore_errors=True)
        graded.write_parquet(poll_dir)

        verdicts = rd.read_parquet(poll_dir).filter(expr=f"{_WARM} == False")
        code_cols = [f"{s['name']}_code" for s in self.specs]
        stats = verdicts.map_batches(
            lambda df: pd.DataFrame({
                "rows": [len(df)],
                "violations": [int(np.any(
                    np.stack([df[c].to_numpy() == -1 for c in code_cols]),
                    axis=0).sum())]}),
            batch_format="pandas").to_pandas().sum()

        new_state = (rd.read_parquet(poll_dir)
                     .filter(expr=f"{_TAIL} == True")
                     .select_columns(raw_cols))
        # per-poll state file: becomes live only via the manifest pointer
        # in _commit — crash before the commit leaves the previous state
        # live, so the ledger replay grades against PRE-batch state
        state_file = f"_state-{poll_id}.parquet"
        tmp = os.path.join(self.out_dir, state_file + ".tmp")
        new_state.to_pandas().to_parquet(tmp, index=False)
        os.replace(tmp, os.path.join(self.out_dir, state_file))

        return self._commit(poll_id, files, ledger, rows=int(stats["rows"]),
                            violations=int(stats["violations"]),
                            n_late=n_late, state_file=state_file)

    def _commit(self, poll_id: str, files: list[str], ledger: bool,
                rows: int, violations: int, n_late: int,
                state_file: str | None = None) -> dict:
        """Durably record a finished poll (output is already written):
        append the poll record, advance the state pointer, and commit the
        file ledger atomically (one manifest replace)."""
        rec = {"poll": poll_id, "files": [os.path.basename(f) for f in files],
               "rows": rows, "violations": violations}
        if state_file is not None:
            prev = self.manifest.get("state_file")
            if prev and prev != state_file:
                self.manifest["prev_state_file"] = prev
            self.manifest["state_file"] = state_file
        if self.allowed_lateness_s is not None:
            rec["late"] = int(n_late)
        if not ledger:
            rec["warm_start"] = True
            self.manifest.setdefault("warm_processed", []).extend(rec["files"])
        else:
            self.manifest["processed"].extend(rec["files"])
        self.manifest["polls"].append(rec)
        tmpm = self.manifest_path + ".tmp"
        with open(tmpm, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmpm, self.manifest_path)
        # prune superseded state files, KEEPING the previous one: a
        # manifest restored to the prior commit (crash recovery, backup
        # rollback) must still find the state it points at. A crash here
        # just leaves an extra file for the next commit to prune.
        live = self.manifest.get("state_file")
        keep = {live, self.manifest.get("prev_state_file")}
        if live:
            for n in os.listdir(self.out_dir):
                if (n.startswith("_state") and n.endswith(".parquet")
                        and n not in keep):
                    try:
                        os.remove(os.path.join(self.out_dir, n))
                    except OSError:
                        pass
        return rec

    def run(self, max_polls: int | None = None, poll_interval_s: float = 1.0,
            stop_after_idle: int | None = 3) -> list[dict]:
        """The consumer loop (consumer.py:164-191). Bounded for tests via
        ``max_polls`` / ``stop_after_idle``; pass None for both to tail the
        directory forever."""
        records: list[dict] = []
        idle = 0
        while True:
            rec = self.poll_once()
            if not rec["files"]:
                # idle = NO files arrived. A poll whose files were all
                # late rows (rows == 0 but files committed) still did
                # work — it must reset the idle counter and keep its
                # record, or a disordered stream could stop the loop early
                idle += 1
                if stop_after_idle is not None and idle >= stop_after_idle:
                    return records
                time.sleep(poll_interval_s)
            else:
                idle = 0
                records.append(rec)
            if max_polls is not None and len(records) >= max_polls:
                return records
