"""Message-format sources — consumer parity with the reference's file inputs.

The reference's ConsumerFile (/root/reference/src/consumer.py:226-331) reads
either a CSV whose header is ``timestamp,<value cols...>[,label[,labelInfo]]``
(every non-timestamp/label column becomes one element of ``ftr_vector``,
consumer.py:303,316-321) or a JSON document ``{"data": [{"ftr_vector": [...],
"timestamp": t}, ...]}`` (consumer.py:285-291), replaying rows one at a time.

Here the same files become a Ray Data Dataset with one row per message:
``ts`` (float seconds) + feature columns ``f0..fk`` (+ label/labelInfo when
present). Kafka input is out of scope (no brokers in a batch validation
engine); its equivalent is simply a Dataset over the stored table.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_LABEL_COLS = {"label", "labelInfo"}


def _explode_vector_strings(arr: pa.ChunkedArray,
                            width: int | None = None) -> list[pa.Array]:
    """Stringified-vector column (the reference's train-file layout,
    ``ftr_vector = "[2.53, 1.1]"`` parsed with ``literal_eval`` at
    isolation_forest.py-style train paths) -> one float64 array per
    element, vectorized (strip brackets, split, cast).

    ``width`` pins the output column count so every batch emits the same
    schema regardless of short/malformed vectors in it (short vectors pad
    with NaN, long ones truncate); None derives it from this batch."""
    s = pd.Series(arr.to_pandas()).astype(str).str.strip().str.strip("[]")
    parts = s.str.split(",", expand=True)
    if width is None:
        width = parts.shape[1]
    out = []
    for i in range(width):
        if i < parts.shape[1]:
            out.append(pa.array(pd.to_numeric(parts[i].str.strip(),
                                              errors="coerce")
                                .to_numpy(dtype=np.float64)))
        else:
            out.append(pa.array(np.full(len(s), np.nan)))
    return out


def read_message_csv(path: str, keep_labels: bool = True):
    """CSV in the reference's message layout -> Dataset(ts, f0..fk, ...).

    Handles both plain value columns (``ads-1.csv``) and stringified-vector
    columns (``ads-1_train.csv``: ``ftr_vector`` = ``"[v0, v1, ...]"``) —
    the latter explode into consecutive ``fi`` columns."""
    ds = rd.read_csv(path)
    schema = ds.schema()
    names = schema.names
    feature_cols = [c for c in names if c != "timestamp" and c not in _LABEL_COLS]
    rename = {"timestamp": "ts"}
    rename.update({c: f"f{i}" for i, c in enumerate(feature_cols)})

    # Pin vector widths ONCE at dataset level so every batch emits the
    # same f0..fk schema even when a batch holds only short/malformed
    # vectors (per-batch derivation would drift the schema across blocks).
    widths: dict[str, int] = {}
    str_feats = [c for i, c in enumerate(feature_cols)
                 if pa.types.is_string(schema.types[names.index(c)])
                 or pa.types.is_large_string(schema.types[names.index(c)])]
    if str_feats:
        head = ds.limit(16).to_pandas()
        for c in str_feats:
            s = head[c].astype(str).str.strip().str.strip("[]")
            widths[c] = int((s.str.count(",") + 1).max()) if len(s) else 1

    def project(t: pa.Table) -> pa.Table:
        cols, out_names = [], []
        fi = 0
        for src in names:
            if src in _LABEL_COLS and not keep_labels:
                continue
            arr = t[src]
            if src == "timestamp":
                cols.append(pa.compute.cast(arr, pa.float64()))
                out_names.append("ts")
            elif src in rename and rename[src].startswith("f"):
                if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                    for sub in _explode_vector_strings(arr, widths.get(src)):
                        cols.append(sub)
                        out_names.append(f"f{fi}")
                        fi += 1
                else:
                    cols.append(pa.compute.cast(arr, pa.float64()))
                    out_names.append(f"f{fi}")
                    fi += 1
            else:
                cols.append(arr)
                out_names.append(src)
        return pa.table(dict(zip(out_names, cols)))

    return ds.map_batches(project, batch_format="pyarrow")


def read_message_json(path: str):
    """JSON ``{"data": [{ftr_vector, timestamp}, ...]}`` -> Dataset.

    The document is one file read once on the driver (these are small replay
    files in the reference; a sharded corpus would be JSONL via
    ``ray.data.read_json``)."""
    with open(path) as f:
        doc = json.load(f)
    data = doc["data"]
    n_feat = max(len(m["ftr_vector"]) for m in data) if data else 0
    cols = {"ts": [float(m["timestamp"]) for m in data]}
    for i in range(n_feat):
        cols[f"f{i}"] = [float(m["ftr_vector"][i])
                         if i < len(m["ftr_vector"]) else np.nan for m in data]
    return rd.from_pandas(pd.DataFrame(cols))


def write_verdicts(ds, out_dir: str, fmt: str = "parquet",
                   violations_only: bool = False,
                   code_col: str = "status_code"):
    """FileOutput/KafkaOutput-parity sink: write verdict rows (optionally only
    non-OK rows — the reference's ``send_ok=False`` gate, output.py:203-206).
    Partitioned files, not one giant file (resumable layout)."""
    if violations_only:
        names = ds.schema().names
        if code_col in names:
            ds = ds.filter(expr=f"{code_col} != 1")
        else:
            # no combined verdict column: keep rows where ANY check is
            # non-OK (the reference's gate applies per configured output)
            code_cols = [c for c in names if c.endswith("_code")]
            if not code_cols:
                raise ValueError(f"no '{code_col}' or '*_code' columns to "
                                 "gate violations on")

            def keep(t):
                import pyarrow as pa
                import pyarrow.compute as pc
                mask = None
                for c in code_cols:
                    m = pc.not_equal(pc.fill_null(t[c], 2), 1)
                    mask = m if mask is None else pc.or_(mask, m)
                return t.filter(mask)

            ds = ds.map_batches(keep, batch_format="pyarrow")
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "json":
        ds.write_json(out_dir)
    else:
        raise ValueError(f"unknown sink format: {fmt}")
    return out_dir
