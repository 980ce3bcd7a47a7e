"""Declarative schema + constraint suites over any Dataset — the generic
face of the north-star "schema + constraint validation engine".

The clip flagship (pipelines/validate.py) hard-codes its checks; this
module takes a JSON-able SUITE (list of check specs) and compiles it once
into ONE vectorized ``map_batches`` pass over zero-copy Arrow batches,
emitting per-batch partial counts that merge associatively — the same
partials-then-fold shape as every other wide aggregate here (no driver
row loops, no per-check dataset scans). Reference lineage: the per-record
validity grading of /root/reference/src/anomaly_detection.py:204-263
generalized to declarative column constraints.

Check kinds
-----------
Row-local (compiled to a vectorized pyarrow.compute mask; value sets /
regexes are prepared ONCE at compile time and ride Ray's closure
serialization into each task — put to the object store once, not
re-shipped per batch):

- ``{"check": "not_null", "column": c}``
- ``{"check": "in_range", "column": c, "min": x, "max": y}`` (either
  bound optional; nulls are NOT violations — pair with not_null)
- ``{"check": "in_set", "column": c, "values": [...]}``
- ``{"check": "regex", "column": c, "pattern": p}`` (full match)
- ``{"check": "str_len_between", "column": c, "min": a, "max": b}``
- ``{"check": "col_compare", "column": a, "op": "<=", "other": b,
  "scale": s}`` — cross-column invariant: violates where NOT
  ``a <op> s*b`` (ops: < <= == != > >=; nulls are not violations)
- ``{"check": "referential", "column": c, "ref": <iterable of keys>}``
  (or the JSON-able form ``"ref_table": <parquet path>, "ref_column": c2``
  — the small side is read once at compile, pruned to the key column)
  — broadcast membership against the small side, never a shuffle join.

Table-level:

- ``{"check": "unique", "column": c}`` — violations = rows beyond the
  first per value (count − distinct), via per-batch value-count partials
  merged by the cardinality-aware ``fold_partials`` (driver fold for
  small key sets, automatic Ray groupby past the threshold — the same
  regime switch as exact dedup). With ``"approx": true`` the count comes
  from the mergeable HLL sketch instead (``"hll_p"`` registers, default
  2^14): the driver only ever merges registers, never keys — the
  10^12-key path; pair with a ``mostly`` tolerance looser than the HLL
  error (~1 % at the default precision).
- ``{"check": "non_decreasing", "column": c, "by": key,
  "order_by": [cols]}`` — ordered per-key monotonicity (counters must not
  go backwards, event time must not regress): one ``groupby(key)``
  series shuffle, each key's rows sorted by ``order_by`` (give a
  tie-breaking column list for determinism), violations = descents
  between consecutive non-null values. Per-key history must fit a worker
  (the engine-wide series assumption, stages/series.py).
- ``{"check": "dtype", "column": c, "type": "int64"}`` — schema-level,
  evaluated once against ``ds.schema()`` (zero data passes).

Graded (multi-level warning-stage) kinds — the flagship clip pipeline's
check vocabulary, compiled by ``compile_graded`` into Table -> Table
stages appending ``<prefix>_code``/``<prefix>_status`` (1 OK, 0 warning,
-1 error, -2 undefined). ``pipelines/validate.build_pass_b`` drives its
built-in chain through these same specs, and accepts them in
``ValidateConfig.extra_suite``:

- ``{"check": "border", "column": c, "UL": u, "LL": l,
  "warning_stages": [...]}``
- ``{"check": "zscore", "column": c, "mean": m, "std": s, "X": x,
  "warning_stages": [...]}`` (broadcast stats supplied by the caller;
  the flagship feeds its pass-A Welford fold in)
- ``{"check": "bytes_consistency"}`` / ``{"check": "transcript",
  "seed": s|None}`` (clip-table invariants)

Every check accepts ``"mostly": f`` (Great-Expectations-style tolerance):
it passes when the non-violating fraction ≥ f (default 1.0).

Row-local checks also accept ``"when"`` (the Great-Expectations
``row_condition`` idiom): ``{"when": {"column": c, "op": "=="|"!="|"<"|
"<="|">"|">="|"in"|"not_null", "value"/"values": ...}}`` restricts the
check to matching rows — they become the denominator AND the only
violation candidates; NULL condition values are out of scope. Supported
by run_expectations, run_expectations_by, and the incremental
expectation store (per-sig scope counts keep the merge exact).

Outputs: ``run_expectations`` returns a summary DataFrame
(check_name, column_name, n_rows, violations, passed) in deterministic
order — directly SQL-oracle-able; ``flag_violations`` appends one boolean
``<check>:<column>__bad`` column per row-local check so violating rows
can be filtered to a sink (the reference's ``send_ok=False`` gate shape,
output.py:203-206).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_ROW_LOCAL = {"not_null", "in_range", "in_set", "regex",
              "str_len_between", "referential", "col_compare"}
# Graded (multi-level warning-stage) checks: the flagship clip pipeline's
# check vocabulary expressed declaratively, so ONE suite grammar drives
# both ad-hoc expectation suites and pipelines/validate.build_pass_b
# (round-2 verdict unification item). Each compiles to a Table -> Table
# stage appending <prefix>_code (int8: 1 OK, 0 warning, -1 error, -2
# undefined) + <prefix>_status, reusing the stages/checks.py kernels.
_GRADED = {"border", "zscore", "bytes_consistency", "transcript"}
_KINDS = _ROW_LOCAL | _GRADED | {"unique", "dtype", "non_decreasing",
                                 "freshness"}

_GRADED_PREFIX = {"border": "bc", "zscore": "wf",
                  "bytes_consistency": "cc", "transcript": "tc"}


def compile_graded(spec: dict) -> Callable[[pa.Table], pa.Table]:
    """Graded check spec -> vectorized stage (see _GRADED note).

    Specs:
    - ``{"check": "border", "column": c, "UL": u, "LL": l,
      "warning_stages": [...]}`` — static range with warning grading.
    - ``{"check": "zscore", "column": c, "mean": m, "std": s, "X": x,
      "warning_stages": [...]}`` — broadcast-stats z-check (the flagship
      feeds pass-A Welford results in; ad-hoc suites supply their own).
    - ``{"check": "bytes_consistency"}`` — clip-table bytes↔metadata
      length invariant.
    - ``{"check": "transcript", "seed": s|None}`` — transcript presence
      (+ equality against the regenerated sequence when seeded).
    Optional ``"prefix"`` overrides the output column prefix."""
    from . import checks as ck
    kind = spec["check"]
    prefix = spec.get("prefix") or _GRADED_PREFIX[kind]
    if kind == "border":
        col, ul, ll = spec["column"], spec["UL"], spec["LL"]
        ws = list(spec.get("warning_stages", ()))
        return lambda t: ck.border_stage(t, col, ul, ll, ws, prefix=prefix)
    if kind == "zscore":
        col, x = spec["column"], spec["X"]
        mean, std = spec["mean"], spec["std"]
        ws = list(spec.get("warning_stages", ()))
        return lambda t: ck.zscore_stage(t, col, mean, std, x, ws,
                                         prefix=prefix)
    if kind == "bytes_consistency":
        kwargs = ({"max_samples": spec["max_samples"]}
                  if "max_samples" in spec else {})
        return lambda t: ck.consistency_stage(t, prefix=prefix, **kwargs)
    if kind == "transcript":
        seed = spec.get("seed")
        return lambda t: ck.transcript_stage(t, seed=seed, prefix=prefix)
    raise ValueError(f"unknown graded check {kind!r}")

_CMP_OPS = {"<": pc.less, "<=": pc.less_equal, "==": pc.equal,
            "!=": pc.not_equal, ">": pc.greater, ">=": pc.greater_equal}


def _col_label(spec: dict) -> str:
    """Summary column_name — for col_compare the whole comparison, so two
    checks on the same left column stay distinct (deterministic sort);
    conditional checks carry their ``when`` clause for the same reason."""
    if spec["check"] == "col_compare":
        scale = spec.get("scale", 1)
        rhs = (f"{scale}*{spec['other']}" if scale != 1 else spec["other"])
        base = f"{spec['column']} {spec['op']} {rhs}"
    else:
        base = spec["column"]
    w = spec.get("when")
    if w:
        val = w.get("values", w.get("value"))
        base += f" when {w['column']} {w.get('op', 'in')} {val!r}"
    return base


def _compile_when(spec: dict) -> Callable[[pa.Table], np.ndarray] | None:
    """Optional row condition (Great-Expectations ``row_condition``
    idiom): ``{"when": {"column": c, "op": <cmp>|"in"|"not_null",
    "value"/"values": ...}}`` restricts a row-local check to matching
    rows — those rows are the denominator AND the only candidates for
    violation (NULL condition = out of scope)."""
    w = spec.get("when")
    if not w:
        return None
    col, op = w["column"], w.get("op", "==")

    def _np(arr) -> np.ndarray:
        return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)

    if op == "in":
        vals = list(w["values"])
        return lambda t: _np(pc.is_in(t[col],
                                      value_set=pa.array(vals)))
    if op == "not_null":
        return lambda t: pc.is_valid(t[col]).to_numpy(
            zero_copy_only=False)
    cmp = _CMP_OPS.get(op)
    if cmp is None:
        raise ValueError(f"when.op must be one of "
                         f"{sorted(_CMP_OPS) + ['in', 'not_null']}, "
                         f"got {op!r}")
    val = w["value"]
    return lambda t: _np(cmp(t[col], val))


def _check_key(spec: dict) -> str:
    return f"{spec['check']}:{_col_label(spec)}"


def _compile_mask(spec: dict) -> Callable[[pa.Table], np.ndarray]:
    """Row-local spec -> fn(Table) -> bool mask (True = row violates).
    Nulls violate only not_null; everything heavy is prepared here, once."""
    col_name = spec["column"]
    kind = spec["check"]

    def _np(arr) -> np.ndarray:
        return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)

    if kind == "not_null":
        return lambda t: pc.is_null(t[col_name]).to_numpy(
            zero_copy_only=False)
    if kind == "in_range":
        lo, hi = spec.get("min"), spec.get("max")
        if lo is None and hi is None:
            raise ValueError("in_range needs min and/or max")

        def mask(t: pa.Table) -> np.ndarray:
            col = t[col_name]
            bad = None
            if lo is not None:
                bad = pc.less(col, lo)
            if hi is not None:
                b = pc.greater(col, hi)
                bad = b if bad is None else pc.or_(bad, b)
            return _np(bad)

        return mask
    if kind == "in_set":
        # pc.is_in maps null -> False (not null), so mask with validity:
        # nulls must not count as violations (not_null owns them)
        vals = pa.array(list(spec["values"]))
        return lambda t: _np(pc.and_(
            pc.invert(pc.is_in(t[col_name], value_set=vals)),
            pc.is_valid(t[col_name])))
    if kind == "regex":
        pat = f"^(?:{spec['pattern']})$"
        return lambda t: _np(pc.invert(
            pc.match_substring_regex(t[col_name], pat)))
    if kind == "str_len_between":
        lo, hi = spec.get("min", 0), spec.get("max")

        def mask(t: pa.Table) -> np.ndarray:
            ln = pc.utf8_length(t[col_name])
            bad = pc.less(ln, lo)
            if hi is not None:
                bad = pc.or_(bad, pc.greater(ln, hi))
            return _np(bad)

        return mask
    if kind == "col_compare":
        op = _CMP_OPS.get(spec.get("op"))
        if op is None:
            raise ValueError(f"col_compare op must be one of "
                             f"{sorted(_CMP_OPS)}, got {spec.get('op')!r}")
        other, scale = spec["other"], spec.get("scale", 1)

        def mask(t: pa.Table) -> np.ndarray:
            rhs = t[other]
            if scale != 1:
                rhs = pc.multiply(rhs, scale)
            return _np(pc.invert(op(t[col_name], rhs)))

        return mask
    if kind == "referential":
        if "ref" in spec:
            keys = spec["ref"]
        else:
            # JSON-able form: the small side is a parquet path + column,
            # read ONCE at compile time (pruned to the key column)
            import ray.data as rd
            keys = (rd.read_parquet(spec["ref_table"],
                                    columns=[spec["ref_column"]])
                    .to_pandas()[spec["ref_column"]].to_numpy())
        # drop null reference keys (nullable dimension keys are common);
        # null fact keys are not violations (not_null owns them)
        ref = pa.array([k for k in set(keys)
                        if k is not None and k == k])
        return lambda t: _np(pc.and_(
            pc.invert(pc.is_in(t[col_name], value_set=ref)),
            pc.is_valid(t[col_name])))
    raise ValueError(f"unknown row-local check {kind!r}")


def _schema_types(ds) -> dict[str, Any]:
    """name -> type. Arrow-backed datasets give pa.DataType; pandas-block
    datasets may give numpy dtypes / python types — normalized at use."""
    s = ds.schema()
    return dict(zip(s.names, s.types))


def _type_str(t: Any) -> str:
    if isinstance(t, pa.DataType):
        return str(t)
    try:
        return np.dtype(t).name
    except TypeError:
        return str(t)


def _validate_suite(suite: list[dict], names) -> None:
    names = set(names)
    for spec in suite:
        if spec.get("check") not in _KINDS:
            raise ValueError(f"unknown check kind {spec.get('check')!r}")
        cols = [spec["column"]]
        if spec["check"] == "col_compare":
            cols.append(spec["other"])
        if spec["check"] == "freshness":
            for k in ("as_of", "max_lag_s"):
                if k not in spec:
                    raise ValueError("freshness requires explicit "
                                     f"{k!r} — no wall-clock default "
                                     "(determinism/oracle contract)")
            if spec.get("by") is not None:
                cols.append(spec["by"])
        w = spec.get("when")
        if w is not None:
            if spec["check"] not in _ROW_LOCAL:
                raise ValueError(
                    f"'when' is only supported on row-local checks "
                    f"({sorted(_ROW_LOCAL)}), not {spec['check']!r}")
            cols.append(w["column"])
        for c in cols:
            if c not in names:
                raise ValueError(
                    f"check {spec['check']!r}: column {c!r} not in "
                    f"schema {sorted(names)}")


def flag_violations(ds, suite: list[dict]):
    """Input Dataset + one ``<check>:<column>__bad`` bool column per
    row-local check (table-level checks have no per-row meaning here)."""
    row_checks = [s for s in suite if s["check"] in _ROW_LOCAL]
    _validate_suite(row_checks, ds.schema().names)
    compiled = [(_check_key(s), _compile_mask(s)) for s in row_checks]

    def flag(t: pa.Table) -> pa.Table:
        for key, mask in compiled:
            t = t.append_column(f"{key}__bad", pa.array(mask(t)))
        return t

    return ds.map_batches(flag, batch_format="pyarrow")


def run_expectations(ds, suite: list[dict]) -> pd.DataFrame:
    """Evaluate a suite in one streaming pass (plus one value-count fold
    per ``unique`` check). Returns (check_name, column_name, n_rows,
    violations, passed) sorted by (check_name, column_name)."""
    from ..functions.fold import fold_partials

    types = _schema_types(ds)
    _validate_suite(suite, types.keys())
    row_checks = [s for s in suite if s["check"] in _ROW_LOCAL]
    uniq_checks = [s for s in suite if s["check"] == "unique"]
    dtype_checks = [s for s in suite if s["check"] == "dtype"]
    ordered_checks = [s for s in suite if s["check"] == "non_decreasing"]
    fresh_checks = [s for s in suite if s["check"] == "freshness"]

    records: list[dict[str, Any]] = []

    for spec in fresh_checks:
        # {"check": "freshness", "column": ts, "as_of": ISO-string|epoch-s,
        #  "max_lag_s": L, "by": optional group col} — per group (or whole
        # table) max(ts) must be within L of as_of. as_of is EXPLICIT, not
        # wall clock: deterministic suites are oracle-able and re-runnable;
        # a scheduler passes its tick time in. Violations = stale groups;
        # n_rows = group count (so `mostly` reads "fraction of fresh
        # groups"). Shape: slim (group, max-ts-epoch) partials, one fold.
        col, by = spec["column"], spec.get("by")
        as_of = pd.Timestamp(spec["as_of"], unit=(
            "s" if isinstance(spec["as_of"], (int, float)) else None))
        lag_us = int(float(spec["max_lag_s"]) * 1e6)
        cols = [col] if by is None else sorted({col, by})

        def fresh_partial(df: pd.DataFrame, col=col, by=by) -> pd.DataFrame:
            ts = df[col].astype("datetime64[us]").astype(np.int64)
            g = (pd.Series(["" ] * len(df)) if by is None
                 else df[by].astype(str))
            t = pd.DataFrame({"_g": g.to_numpy(), "mt": ts})
            t = t[df[col].notna().to_numpy()]
            return t.groupby("_g", as_index=False)["mt"].max()

        folded = fold_partials(
            ds.select_columns(cols).map_batches(
                fresh_partial, batch_format="pandas"),
            "_g", {"mt": "max"})
        cutoff = as_of.value // 1000 - lag_us  # pandas .value is ns
        n_groups = int(len(folded))
        v = int((folded["mt"] < cutoff).sum()) if n_groups else 0
        frac_ok = 1.0 if n_groups == 0 else 1.0 - v / n_groups
        records.append({"check_name": "freshness",
                        "column_name": (col if by is None
                                        else f"{col} by {by}"),
                        "n_rows": n_groups, "violations": v,
                        "passed": frac_ok >= spec.get("mostly", 1.0)})

    for spec in ordered_checks:
        col, key = spec["column"], spec["by"]
        order_by = spec["order_by"]
        if isinstance(order_by, str):
            order_by = [order_by]
        for c in [key, *order_by]:
            if c not in types:
                raise ValueError(f"non_decreasing: column {c!r} not in "
                                 "schema")

        def per_group(g: pd.DataFrame, col=col, order_by=order_by
                      ) -> pd.DataFrame:
            # stable sort pins tie semantics so the incremental store's
            # per-file slices (_nd_group_stats) fold to the same counts
            x = g.sort_values(order_by, kind="stable")[col].dropna().to_numpy()
            v = 0
            if len(x) > 1:
                d = np.diff(x)  # timedelta64 for datetime cols: compare
                v = int((d < np.zeros(1, dtype=d.dtype)[0]).sum())
            return pd.DataFrame({"n": [len(x)], "v": [v]})

        grouped = (ds.select_columns(sorted({col, key, *order_by}))
                   .groupby(key).map_groups(per_group,
                                            batch_format="pandas"))
        red = (grouped.map_batches(
            lambda df: pd.DataFrame({"n": [int(df["n"].sum())],
                                     "v": [int(df["v"].sum())]}),
            batch_format="pandas").to_pandas().sum())
        n_rows, v = int(red["n"]), int(red["v"])
        frac_ok = 1.0 if n_rows == 0 else 1.0 - v / n_rows
        records.append({"check_name": "non_decreasing",
                        "column_name": col, "n_rows": n_rows,
                        "violations": v,
                        "passed": frac_ok >= spec.get("mostly", 1.0)})

    for spec in dtype_checks:  # schema-level: zero data passes
        actual = _type_str(types[spec["column"]])
        ok = actual == spec["type"]
        records.append({"check_name": "dtype",
                        "column_name": spec["column"], "n_rows": 0,
                        "violations": 0 if ok else 1, "passed": ok})

    if row_checks:
        keys = [_check_key(s) for s in row_checks]
        compiled = [_compile_mask(s) for s in row_checks]
        whens = [_compile_when(s) for s in row_checks]
        needed = sorted({s["column"] for s in row_checks}
                        | {s["other"] for s in row_checks
                           if s["check"] == "col_compare"}
                        | {s["when"]["column"] for s in row_checks
                           if s.get("when")})
        # conditional checks count scope rows per spec; unconditional
        # ones share the table row count
        scope_cols = [f"{k}__n" for k, w in zip(keys, whens)
                      if w is not None]

        def partial(t: pa.Table) -> pd.DataFrame:
            out: dict[str, list] = {"_g": [0], "n_rows": [len(t)]}
            for k, mask, when in zip(keys, compiled, whens):
                bad = mask(t)
                if when is not None:
                    scope = when(t)
                    out[f"{k}__n"] = [int(scope.sum())]
                    bad = bad & scope
                out[k] = [int(bad.sum())]
            return pd.DataFrame(out)

        folded = fold_partials(
            ds.select_columns(needed).map_batches(
                partial, batch_format="pyarrow"),
            "_g", {c: "sum" for c in ["n_rows", *keys, *scope_cols]})
        table_rows = int(folded["n_rows"].iloc[0]) if len(folded) else 0
        for spec, k, when in zip(row_checks, keys, whens):
            v = int(folded[k].iloc[0]) if len(folded) else 0
            n_rows = (int(folded[f"{k}__n"].iloc[0])
                      if when is not None and len(folded) else table_rows)
            frac_ok = 1.0 if n_rows == 0 else 1.0 - v / n_rows
            records.append({"check_name": spec["check"],
                            "column_name": _col_label(spec),
                            "n_rows": n_rows,
                            "violations": v,
                            "passed": frac_ok >= spec.get("mostly", 1.0)})

    for spec in uniq_checks:
        col = spec["column"]
        if spec.get("approx"):
            # 10^12-key path: HLL registers per batch, driver merges 2^p
            # bytes per batch — the driver NEVER holds distinct keys.
            # violations ≈ n − estimate (HLL σ ≈ 1.04/√2^p, ~0.8 % at
            # p=14): pair with a `mostly` tolerance looser than that.
            from .uniqueness import estimate_unique
            valid = ds.select_columns([col]).map_batches(
                lambda t, col=col: t.filter(pc.is_valid(t[col])),
                batch_format="pyarrow")
            n_rows = int(valid.count())
            est = estimate_unique(valid, col, p=spec.get("hll_p", 14))
            v = max(0, int(round(n_rows - est)))
        else:
            def vc(t: pa.Table, col=col) -> pd.DataFrame:
                s = t[col].to_pandas()
                g = s.groupby(s, dropna=True).size()
                return pd.DataFrame({"v": g.index.to_numpy(),
                                     "n": g.to_numpy()})

            counts = fold_partials(
                ds.select_columns([col]).map_batches(
                    vc, batch_format="pyarrow"),
                "v", {"n": "sum"})
            n_rows = int(counts["n"].sum()) if len(counts) else 0
            v = (int((counts["n"] - 1).clip(lower=0).sum())
                 if len(counts) else 0)
        frac_ok = 1.0 if n_rows == 0 else 1.0 - v / n_rows
        records.append({"check_name": "unique", "column_name": col,
                        "n_rows": n_rows, "violations": v,
                        "passed": frac_ok >= spec.get("mostly", 1.0)})

    out = pd.DataFrame.from_records(
        records, columns=["check_name", "column_name", "n_rows",
                          "violations", "passed"])
    return (out.sort_values(["check_name", "column_name"])
            .reset_index(drop=True))


def run_expectations_by(ds, suite: list[dict], by: str) -> pd.DataFrame:
    """Per-GROUP suite evaluation — the declarative form of the flagship's
    per-partition pass/fail verdicts (north star: 'per-partition verdicts
    and violation rows'). One streaming pass emits per-batch per-group
    partial counts for every row-local check; ``unique`` folds (group,
    value) counts. Returns one row per (group, check):
    (``by``, check_name, column_name, n_rows, violations, passed), sorted.
    dtype checks are schema-level (group-independent) and not included.
    Rows whose GROUP KEY is null are not reported (the partials fold drops
    null keys) — fill or filter the group column first; null-key *values*
    inside a group follow the normal per-check null semantics."""
    from ..functions.fold import fold_partials

    types = _schema_types(ds)
    _validate_suite(suite, types.keys())
    if by not in types:
        raise ValueError(f"group column {by!r} not in schema")
    if any(s["check"] == "dtype" for s in suite):
        raise ValueError("dtype checks are schema-level — use "
                         "run_expectations for them")
    if any(s["check"] == "non_decreasing" for s in suite):
        raise ValueError("non_decreasing is not supported per group — "
                         "use run_expectations (its 'by' key already "
                         "defines the series)")
    row_checks = [s for s in suite if s["check"] in _ROW_LOCAL]
    uniq_checks = [s for s in suite if s["check"] == "unique"]

    frames: list[pd.DataFrame] = []

    if row_checks:
        keys = [_check_key(s) for s in row_checks]
        compiled = [_compile_mask(s) for s in row_checks]
        whens = [_compile_when(s) for s in row_checks]
        needed = sorted({s["column"] for s in row_checks}
                        | {s["other"] for s in row_checks
                           if s["check"] == "col_compare"}
                        | {s["when"]["column"] for s in row_checks
                           if s.get("when")} | {by})
        scope_cols = [f"{k}__n" for k, w in zip(keys, whens)
                      if w is not None]

        def partial(t: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame({by: t[by].to_pandas()})
            for k, mask, when in zip(keys, compiled, whens):
                bad = mask(t)
                if when is not None:
                    scope = when(t)
                    df[f"{k}__n"] = scope
                    bad = bad & scope
                df[k] = bad
            # dropna=True HERE so null group keys are excluded in BOTH
            # fold regimes (the Ray groupby fallback keeps null keys; the
            # pandas fold drops them — decide once, deterministically)
            g = df.groupby(by, as_index=False, dropna=True)
            out = g.agg(n_rows=(by, "size"),
                        **{k: (k, "sum") for k in [*keys, *scope_cols]})
            return out

        folded = fold_partials(
            ds.select_columns(needed).map_batches(
                partial, batch_format="pyarrow"),
            by, {c: "sum" for c in ["n_rows", *keys, *scope_cols]})
        for spec, k, when in zip(row_checks, keys, whens):
            n = (folded[f"{k}__n"] if when is not None
                 else folded["n_rows"]).astype("int64")
            v = folded[k].astype("int64")
            frac_ok = np.where(n == 0, 1.0, 1.0 - v / n.clip(lower=1))
            frames.append(pd.DataFrame({
                by: folded[by], "check_name": spec["check"],
                "column_name": _col_label(spec), "n_rows": n,
                "violations": v,
                "passed": frac_ok >= spec.get("mostly", 1.0)}))

    for spec in uniq_checks:
        col = spec["column"]

        def vc(t: pa.Table, col=col) -> pd.DataFrame:
            df = pd.DataFrame({by: t[by].to_pandas(),
                               "v": t[col].to_pandas()})
            df = df[df["v"].notna()]
            return (df.groupby([by, "v"], as_index=False)
                    .agg(n=("v", "size")))

        counts = fold_partials(
            ds.select_columns([by, col]).map_batches(
                vc, batch_format="pyarrow"),
            [by, "v"], {"n": "sum"})
        if len(counts):
            g = counts.groupby(by, as_index=False).agg(
                n_rows=("n", "sum"),
                violations=("n", lambda s: int((s - 1).clip(lower=0).sum())))
        else:
            g = pd.DataFrame({by: [], "n_rows": [], "violations": []})
        n = g["n_rows"].astype("int64")
        v = g["violations"].astype("int64")
        frac_ok = np.where(n == 0, 1.0, 1.0 - v / n.clip(lower=1))
        frames.append(pd.DataFrame({
            by: g[by], "check_name": "unique", "column_name": col,
            "n_rows": n, "violations": v,
            "passed": frac_ok >= spec.get("mostly", 1.0)}))

    if not frames:
        return pd.DataFrame(columns=[by, "check_name", "column_name",
                                     "n_rows", "violations", "passed"])
    out = pd.concat(frames, ignore_index=True)
    return (out.sort_values([by, "check_name", "column_name"])
            .reset_index(drop=True)
            [[by, "check_name", "column_name", "n_rows", "violations",
              "passed"]])
