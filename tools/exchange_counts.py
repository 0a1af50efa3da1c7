#!/usr/bin/env python
"""Regenerate tests/exchange_counts.json — the per-headline-query
exchange/join-strategy fingerprint that
tests/test_plans.py::test_headline_exchange_counts_pinned gates on
(VERDICT r10 item 6: silent plan regressions must become test failures,
not bench forensics).

Run this ONLY to bless a DELIBERATE plan change, with the diff reviewed
query-by-query; a CI-red on the gate plus a regenerate here is the
audit trail.

Usage: python tools/exchange_counts.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PINNED_KEYS = (
    "exchanges",
    "broadcast_hash_joins",
    "sort_merge_joins",
    "nested_loop_joins",
    "cartesian_products",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--out", default=str(REPO / "tests" / "exchange_counts.json")
    )
    args = ap.parse_args()

    from bench import HEADLINE
    from hdfs_mr_spark.plans.audit import plan_summary
    from hdfs_mr_spark.registry import all_specs
    from hdfs_mr_spark.session import get_spark

    spark = get_spark("exchange-counts")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out = {}
    for name in HEADLINE:
        s = plan_summary(specs[name].fn(spark, args.sf))
        out[name] = {k: s[k] for k in PINNED_KEYS}
        print(name, out[name])
    Path(args.out).write_text(json.dumps(
        {"sf": args.sf, "keys": list(PINNED_KEYS), "queries": out},
        indent=1, sort_keys=True,
    ))
    print(f"wrote {args.out} ({len(out)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
