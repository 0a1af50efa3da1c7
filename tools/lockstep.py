#!/usr/bin/env python3
"""CLI lockstep gate (VERDICT r5 item 3). Exit 0 iff SURVEY.md §2,
the registry, and the latest BENCH_r{N}_full.json agree. Runs in
seconds, no SparkSession — suitable as a pre-commit hook:

    python tools/lockstep.py || exit 1
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hdfs_mr_spark import lockstep  # noqa: E402


def main() -> int:
    report = lockstep.lockstep_report()
    print(json.dumps(report, indent=2))
    if lockstep.is_green(report):
        print("LOCKSTEP OK")
        return 0
    print("LOCKSTEP DRIFT — fix SURVEY §2 / registry / full-bench artifact")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
