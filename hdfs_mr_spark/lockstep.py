"""Single source of truth for the three-way registry lockstep
(VERDICT r5 item 3): SURVEY.md §2 rows <-> registry `all_specs()` <->
the committed full-registry bench artifact (BENCH_r{N}_full.json).

The same drift shipped twice (r3, r5): a query registered in code but
missing its §2 row and/or its full-bench row, discovered only by the
9-minute suite or the judge. Everything here is plain-Python (no
SparkSession, no DuckDB) so `pytest tests/test_lockstep.py` and
`python tools/lockstep.py` both answer in seconds and can run as a
pre-commit gate.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def survey_section2_ids(md_path: Path | None = None) -> set[str]:
    """IDs from the FIRST cell of §2 table rows (descriptions may
    mention other ops, so only the first cell is normative). Combined
    cells like `join_left / join_right` expand to all ticked IDs."""
    md = (md_path or REPO / "SURVEY.md").read_text()
    sec2 = md.split("## §2.")[1].split("## §3.")[0]
    listed: set[str] = set()
    for line in sec2.splitlines():
        if not line.startswith("| `"):
            continue
        first_cell = line.split("|")[1]
        for tick in re.findall(r"`([^`]+)`", first_cell):
            listed.update(re.findall(r"[a-z0-9_]+", tick))
    return listed


def registry_ids() -> set[str]:
    from hdfs_mr_spark.registry import all_specs

    return set(all_specs())


def latest_full_bench(repo: Path | None = None) -> tuple[Path, dict] | None:
    files = sorted(
        (repo or REPO).glob("BENCH_r*_full.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not files:
        return None
    return files[-1], json.loads(files[-1].read_text())


def lockstep_report() -> dict:
    """Three-way diff. Empty lists everywhere == in lockstep."""
    survey = survey_section2_ids()
    registry = registry_ids()
    out = {
        "registered_not_in_survey": sorted(registry - survey),
        "survey_not_registered": sorted(survey - registry),
        "bench_artifact": None,
        "registered_not_in_bench": [],
        "bench_not_registered": [],
    }
    fb = latest_full_bench()
    if fb is not None:
        path, data = fb
        bench = set(data.get("queries", {}))
        out["bench_artifact"] = path.name
        out["registered_not_in_bench"] = sorted(registry - bench)
        out["bench_not_registered"] = sorted(bench - registry)
    return out


def is_green(report: dict) -> bool:
    return not (
        report["registered_not_in_survey"]
        or report["survey_not_registered"]
        or report["registered_not_in_bench"]
        or report["bench_not_registered"]
    )
