"""Fast no-Spark lockstep gate (VERDICT r5 item 3): run this file alone
(`python -m pytest tests/test_lockstep.py -q`, seconds) before any
commit that touches the registry. The same three-way drift — a query
registered in code without its SURVEY §2 row and/or its full-bench
artifact row — shipped in r3 and r5; this gate catches it without a
SparkSession or the 9-minute suite. tools/lockstep.py is the CLI twin.
"""

from __future__ import annotations

from hdfs_mr_spark import lockstep


def test_survey_registry_bench_lockstep():
    report = lockstep.lockstep_report()
    assert lockstep.is_green(report), report
