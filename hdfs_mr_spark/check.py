"""Local parity harness mirroring the driver's t2 correctness gate.

For each registered query: run the PySpark version and the DuckDB oracle
on the same parquet directory, then compare row count, column names
(sorted), and values (columns sorted by name, rows sorted, exact
equality — floats must match bit-for-bit, which the decimal-sum strategy
in :mod:`hdfs_mr_spark.exprs` guarantees for checked aggregates).

Driver-compat rules this harness enforces (VERDICT r1):
- every query MUST have an oracle — the driver rejects ``oracle=None``
  as ``err: no_oracle`` rather than downgrading to a rows-only check;
- cells must be scalars — the driver's value hasher dies on Python
  lists/dicts (``unhashable type``), so a query emitting an array/map
  column FAILS here too (stringify via array_join/to_json instead);
- queries tagged ``"ordered"`` are additionally compared in emitted
  order (the canonical row sort would otherwise mask a broken ORDER BY).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from hdfs_mr_spark.io import TABLES
from hdfs_mr_spark.registry import QuerySpec


@dataclass
class CheckResult:
    name: str
    ok: bool
    mode: str  # "oracle" or "error"
    detail: str = ""


class _DriverIncompatible(Exception):
    """A cell the driver's raw-value hasher cannot take (list/map/etc.)."""


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame, sort_rows: bool = True) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # str(Timestamp) always renders 'YYYY-MM-DD HH:MM:SS[.ffffff]'
            # (Series.astype(str) drops midnight times -> would mismatch
            # the date-object normalization in _canon_cell)
            df[c] = s.astype("datetime64[us]").map(
                lambda x: "NULL" if pd.isna(x) else str(x)
            )
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
    if sort_rows:
        order_keys = [df[c].astype(str) for c in df.columns]
        if order_keys:
            idx = pd.DataFrame(dict(enumerate(order_keys))).sort_values(
                by=list(range(len(order_keys)))
            ).index
            df = df.loc[idx].reset_index(drop=True)
    return df


def _canon_cell(v):
    import datetime

    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # The driver hashes raw cells: a list/map cell crashes its hasher
        # (VERDICT r1: agg_collect `unhashable type: 'list'`). Refuse it
        # locally so local green predicts driver green.
        raise _DriverIncompatible(
            f"driver-incompatible cell type {type(v).__name__}: "
            "project arrays/maps through array_join/to_json"
        )
    if isinstance(v, np.generic):  # numpy scalar (e.g. float32) -> python
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return str(v)  # space separator, matches datetime64 astype(str)
    if isinstance(v, datetime.date):
        return f"{v.isoformat()} 00:00:00"  # DATE == midnight timestamp
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    return str(a) == str(b)


def _compare_canon(name: str, a: pd.DataFrame, b: pd.DataFrame,
                   label: str) -> CheckResult | None:
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return CheckResult(
                    name, False, "oracle",
                    f"{label}col {c} row {i}: ours={x!r} oracle={y!r}",
                )
    return None


def compare_frames(
    name: str, ours: pd.DataFrame, oracle: pd.DataFrame, ordered: bool = False
) -> CheckResult:
    if len(ours) != len(oracle):
        return CheckResult(name, False, "oracle", f"row count {len(ours)} vs {len(oracle)}")
    a_cols, b_cols = sorted(ours.columns), sorted(oracle.columns)
    if a_cols != b_cols:
        return CheckResult(name, False, "oracle", f"columns {a_cols} vs {b_cols}")
    try:
        bad = _compare_canon(name, _canon(ours), _canon(oracle), "")
        if bad is None and ordered:
            # re-compare in emitted order: catches a broken ORDER BY that
            # the canonical row sort would mask (ADVICE r1)
            bad = _compare_canon(
                name, _canon(ours, sort_rows=False),
                _canon(oracle, sort_rows=False), "emitted-order ",
            )
    except _DriverIncompatible as e:
        return CheckResult(name, False, "error", str(e))
    return bad if bad is not None else CheckResult(name, True, "oracle")


def check_query(spec: QuerySpec, spark, con, sf_dir: str) -> CheckResult:
    if spec.oracle is None:
        # the driver records oracle-less queries as `err: no_oracle` —
        # treat the registration itself as a failure (VERDICT r1 item 1b)
        return CheckResult(spec.name, False, "error", "no oracle registered")
    try:
        ours = spec.fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return CheckResult(spec.name, False, "error", f"spark raised: {e!r:.500}")
    try:
        oracle = con.execute(spec.oracle).fetchdf()
    except Exception as e:  # noqa: BLE001
        return CheckResult(spec.name, False, "error", f"oracle raised: {e!r:.500}")
    return compare_frames(spec.name, ours, oracle, ordered="ordered" in spec.tags)
