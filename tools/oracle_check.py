"""Local replica of the driver's correctness gate: run each Ray query and
its DuckDB oracle side by side and compare rows/schema/values after sorting
columns by name and rows by all columns.

Usage: python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_class(dt) -> str:
    """Coarse dtype class for driver-hash parity: the driver hashes a
    pandas frame, so int64 123 vs float64 123.0 is a hash mismatch even
    when values are equal (the round-3 pack_documents red row)."""
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "other"


def compare(a: pd.DataFrame, b: pd.DataFrame) -> dict:
    a, b = canon(a), canon(b)
    out = {"rows": (len(a), len(b)), "rows_match": len(a) == len(b),
           "schema_match": list(a.columns) == list(b.columns)}
    if not (out["rows_match"] and out["schema_match"]):
        out["cols"] = (list(a.columns), list(b.columns))
        return out
    # dtype-class parity mirrors the driver's hash sensitivity: values can
    # be numerically equal yet hash differently when one side is int and
    # the other float (e.g. DuckDB HUGEINT -> pandas float64)
    dtype_bad = {c: (dtype_class(a[c].dtype), dtype_class(b[c].dtype))
                 for c in a.columns
                 if dtype_class(a[c].dtype) != dtype_class(b[c].dtype)}
    bad = {}
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(np.asarray(y).dtype, np.floating):
            # the driver rounds floats before hashing (verified: ~1e-14
            # rolling-mean low-bit diffs pass its gate) — mirror with a
            # tight relative tolerance
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            eq = np.isclose(x, y, rtol=1e-9, atol=1e-12, equal_nan=True)
        else:
            eq = x == y
        n_bad = int((~np.asarray(eq, dtype=bool)).sum())
        if n_bad:
            bad[c] = n_bad
    out["value_mismatch_cols"] = bad
    out["dtype_mismatch_cols"] = dtype_bad
    out["match"] = not bad and not dtype_bad
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    queries = e.queries()
    oracles = e.oracle_sql()
    if not names:
        names = [n for n in queries if n in oracles]

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name in names:
        if name not in oracles:
            print(f"{name:34s} NO-ORACLE")
            continue
        try:
            mine = to_df(queries[name](sf_dir))
            orc = con.sql(oracles[name]).df()
            r = compare(mine, orc)
            ok = r.get("match") and r["rows_match"] and r["schema_match"]
        except Exception as ex:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if ok:
            print(f"{name:34s} OK    rows={r['rows'][0]}")
            n_pass += 1
        else:
            print(f"{name:34s} FAIL  {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
