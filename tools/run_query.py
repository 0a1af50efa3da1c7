#!/usr/bin/env python
"""Run any registered query from the command line — the `hadoop jar
wordcount in out` replacement a reference (HDFS+MapReduce) user reaches
for first.

Usage:
  python tools/run_query.py NAME [--sf DIR] [--out PATH] [--format parquet|csv|json] [--show N]
  python tools/run_query.py --list [--family SUBSTR]

Examples:
  python tools/run_query.py mr_wordcount --show 20
  python tools/run_query.py agg_groupby --out /tmp/q1 --format csv
  python tools/run_query.py --list --family streaming
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="scale-factor dir")
    ap.add_argument("--out", default=None, help="write result here instead of showing")
    ap.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    ap.add_argument("--show", type=int, default=20, metavar="N",
                    help="rows to print when --out is absent")
    ap.add_argument("--list", action="store_true", help="list available queries")
    ap.add_argument("--family", default=None, help="family filter for --list")
    args = ap.parse_args()

    from hdfs_mr_spark.registry import all_specs

    specs = all_specs()
    if args.list or not args.name:
        for name, spec in sorted(specs.items(), key=lambda kv: (kv[1].family, kv[0])):
            if args.family and args.family not in spec.family:
                continue
            doc = (spec.fn.__doc__ or "").strip().splitlines()[0]
            print(f"{spec.family:28s} {name:32s} {doc}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    from hdfs_mr_spark.session import get_spark

    spark = get_spark(f"run-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.name].fn(spark, args.sf)
    if args.out:
        writer = df.write.mode("overwrite")
        if args.format == "csv":
            writer = writer.option("header", True)
        getattr(writer, args.format)(args.out)
        print(f"wrote {args.out} ({args.format})")
    else:
        df.show(args.show, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
