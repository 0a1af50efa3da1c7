#!/usr/bin/env python
"""Overflow audit extractor (r11 — VERDICT r10 item 5, the agg_gini
lesson generalized): mechanically enumerate every integer SUM
accumulator in the engine source whose summand is a PRODUCT or SQUARE
(the quadratic-magnitude class that overflows int64 first) or an
explicit bigint-cast sum, and emit them as site records. The curated
twin tests/overflow_audit.json assigns each site a verdict + a bound
argument at the 100 TB design point (TPC-H sf ~1e5: orders ~1.5e11
rows, lineitem ~6e11 rows); tests/test_units.py::
test_overflow_audit_inventory_is_complete fails when a NEW un-audited
accumulator appears — the audit can't silently rot.

Heuristic (deliberately over-captures, curation marks false alarms):
a `F.sum(...)`/`SUM(...)` call whose argument multiplies two
column-valued terms or casts to bigint, in non-test engine source,
EXCEPT sites already in DECIMAL(38) (they are the fix, not the risk).

Usage: python tools/overflow_audit.py [--check]
  default: print the extracted site list as JSON
  --check: exit 1 if any extracted site is missing from the curated
           inventory (what the unit test runs)
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SRC = REPO / "hdfs_mr_spark"
INVENTORY = REPO / "tests" / "overflow_audit.json"

# a sum whose argument (possibly spanning lines) contains a `*` between
# non-literal terms, or a .cast("bigint") — conservative net
_SUM_OPEN = re.compile(r"(F\.sum\(|\bSUM\s*\()", re.IGNORECASE)


def _extract_arg(text: str, start: int) -> str:
    """Balanced-paren argument of the sum call opening at ``start``."""
    depth = 0
    for i in range(start, min(len(text), start + 2000)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start: i + 1]
    return text[start: start + 200]


def _is_candidate(arg: str) -> bool:
    a = arg.lower()
    if "decimal" in a or "_dec(" in a or "dsum" in a:
        return False  # already promoted — the fix, not the risk
    has_product = bool(re.search(r"[\w\)\]\"']\s*\*\s*[\w\(\"'F]", arg))
    has_bigcast = 'cast("bigint")' in a or "as bigint" in a
    return has_product or has_bigcast


def extract_sites() -> list[dict]:
    sites = []
    for py in sorted(SRC.rglob("*.py")):
        text = py.read_text()
        lines = text.splitlines()
        offs, total = [], 0
        for ln in lines:
            offs.append(total)
            total += len(ln) + 1
        for m in _SUM_OPEN.finditer(text):
            arg = _extract_arg(text, m.end() - 1)
            if not _is_candidate(arg):
                continue
            lineno = next(
                i + 1 for i in reversed(range(len(offs)))
                if offs[i] <= m.start()
            )
            norm = re.sub(r"\s+", " ", arg.strip())[:160]
            sites.append({
                "file": str(py.relative_to(REPO)),
                "line": lineno,
                "sum_arg": norm,
            })
    return sites


def site_key(s: dict) -> str:
    # line numbers shift under unrelated edits; key on file + the
    # normalized summand text (stable until the accumulator itself
    # changes, which SHOULD re-trigger curation)
    return f"{s['file']}::{s['sum_arg']}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    sites = extract_sites()
    if not args.check:
        print(json.dumps(sites, indent=1))
        print(f"# {len(sites)} candidate accumulators", file=sys.stderr)
        return 0
    inv = json.loads(INVENTORY.read_text())["sites"]
    missing = [s for s in sites if site_key(s) not in inv]
    stale = sorted(set(inv) - {site_key(s) for s in sites})
    if missing:
        print("UN-AUDITED integer accumulators (add to "
              "tests/overflow_audit.json with a bound argument):")
        for s in missing:
            print(f"  {s['file']}:{s['line']}  SUM({s['sum_arg']})")
    if stale:
        print("STALE inventory entries (accumulator gone — remove):")
        for k in stale:
            print(f"  {k}")
    return 1 if (missing or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
