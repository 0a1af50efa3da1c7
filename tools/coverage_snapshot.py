#!/usr/bin/env python
"""Generate COVERAGE.md: one row per registered query — family, file:line,
latest CHECK_r*.json verdict, and steady-state bench time where measured. The
auditable crosswalk from SURVEY.md §2's inventory to the code and the
committed correctness artifact.

Usage: python tools/coverage_snapshot.py
"""

from __future__ import annotations

import inspect
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from hdfs_mr_spark.registry import all_specs

    specs = all_specs()
    check = {}
    # latest round's sweep; prefer the plain (sf0.01) artifact over
    # sf-suffixed siblings of the same round
    import re

    best = None
    for p in REPO.glob("CHECK_r*.json"):
        m = re.match(r"CHECK_r(\d+)", p.name)
        if not m:
            continue
        key = (int(m.group(1)), p.name == f"CHECK_r{m.group(1)}.json")
        if best is None or key > best[0]:
            best = (key, p)
    check_name = "-"
    if best:
        check_name = best[1].name
        check = json.loads(best[1].read_text()).get("queries", {})
    bench = {}
    bench_probe = None
    for p in sorted(REPO.glob("BENCH_r*.json")):
        bench_probe = p
    if bench_probe:
        raw = json.loads(bench_probe.read_text())
        bench = raw.get("queries", {}) if "queries" in raw else {}

    rows = []
    for name, spec in specs.items():
        fn = inspect.unwrap(spec.fn)
        src = Path(inspect.getsourcefile(fn)).relative_to(REPO)
        line = inspect.getsourcelines(fn)[1]
        c = check.get(name)
        status = ("PASS" if c["ok"] else "FAIL") if c is not None else "-"
        b = bench.get(name)
        rows.append((spec.family, name, f"{src}:{line}", status,
                     f"{b:.2f}" if b is not None else "-"))
    rows.sort()

    out = [
        "# Coverage crosswalk (auto-generated)\n",
        "`python tools/coverage_snapshot.py` — every registered query, its",
        f"implementation site, its verdict in the committed {check_name}",
        "full-sweep artifact (sf0.01 DuckDB oracle), and its steady-state",
        "bench time at sf0.1 where it is in the headline suite.\n",
        f"Total: {len(rows)} queries; "
        f"{sum(1 for r in rows if r[3] == 'PASS')} PASS in {check_name} "
        f"(rows marked '-' postdate that sweep or were checked separately).\n",
        f"| family | query | impl | {check_name} | bench s |",
        "|---|---|---|---|---|",
    ]
    for fam, name, loc, status, b in rows:
        out.append(f"| {fam} | `{name}` | {loc} | {status} | {b} |")
    (REPO / "COVERAGE.md").write_text("\n".join(out) + "\n")
    print(f"wrote COVERAGE.md ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
