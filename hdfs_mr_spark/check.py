"""Local parity harness mirroring the driver's t2 correctness gate.

For each registered query: run the PySpark version and the DuckDB oracle
on the same parquet directory, then compare row count, column names
(sorted), and values (columns sorted by name, rows sorted, exact
equality — floats must match bit-for-bit, which the decimal-sum strategy
in :mod:`hdfs_mr_spark.exprs` guarantees for checked aggregates).
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
    mode: str  # "oracle" or "rows-only"
    detail: str = ""


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
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

    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
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
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    return str(a) == str(b)


def compare_frames(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> CheckResult:
    if len(ours) != len(oracle):
        return CheckResult(name, False, "oracle", f"row count {len(ours)} vs {len(oracle)}")
    a_cols, b_cols = sorted(ours.columns), sorted(oracle.columns)
    if a_cols != b_cols:
        return CheckResult(name, False, "oracle", f"columns {a_cols} vs {b_cols}")
    a, b = _canon(ours), _canon(oracle)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return CheckResult(
                    name, False, "oracle",
                    f"col {c} row {i}: ours={x!r} oracle={y!r}",
                )
    return CheckResult(name, True, "oracle")


def check_query(spec: QuerySpec, spark, con, sf_dir: str) -> CheckResult:
    try:
        ours = spec.fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return CheckResult(spec.name, False, "error", f"spark raised: {e!r:.500}")
    if spec.oracle is None:
        ok = len(ours) >= 0
        return CheckResult(spec.name, ok, "rows-only", f"{len(ours)} rows")
    try:
        oracle = con.execute(spec.oracle).fetchdf()
    except Exception as e:  # noqa: BLE001
        return CheckResult(spec.name, False, "error", f"oracle raised: {e!r:.500}")
    return compare_frames(spec.name, ours, oracle)
