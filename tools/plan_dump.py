#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/plan_dump.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt. The judge reads these to verify
plan-shape claims in OPTIMIZATION_r15.md (driver-side loops mean some
ops' returned frame is only the final stitch; the file still carries
the full physical plan of what the query RETURNS)."""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hdfs_mr_spark.registry import all_specs
    from hdfs_mr_spark.session import get_spark

    specs = all_specs()
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        Path(outdir, f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
