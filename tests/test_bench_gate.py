"""Bench regression gate (VERDICT r1 item 8): the latest driver-recorded
BENCH_r{N}.json must not show any headline query at more than 2x its
round-1 recorded time. Locks the tuning wins in PERF.md — a refactor
that silently reverts one shows up here before the next judged round."""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Per-query seconds from BENCH_r01.json (sf0.1, local[32], noop sink) —
# the recorded baseline BASELINE.md:21-22 points at.
BASELINE_R01 = {
    "scan_parquet": 0.231,
    "filter_like": 0.251,
    "join_broadcast_inner": 0.537,
    "join_shuffle_inner": 1.6,
    "join_multiway_star": 1.017,
    "join_asof": 0.754,
    "agg_groupby": 1.295,
    "agg_stats": 2.14,
    "win_topk_per_group": 0.492,
    "sort_global": 0.463,
    "dedup_by_key": 0.449,
    "fn_json": 0.959,
    "mr_wordcount": 0.397,
    "mr_join_agg": 1.789,
    "llm_dedup_exact": 1.319,
    "llm_dedup_near": 2.669,
    "llm_dedup_minhash_lsh": 3.229,
    "llm_sim_knn": 0.93,
    "llm_sim_pairs": 1.946,
    "llm_sim_knn_ivf": 1.099,
    "llm_tfidf": 0.934,
    "llm_quality_filter": 0.345,
    "udf_grouped_map": 5.206,
    # session-3 additions, baselined from the 2026-08-13 local run
    # (BASELINE.md round-2 final row)
    "mr_tera_validate": 0.962,
    "mr_bfs": 2.249,
    "join_spatial_grid": 0.388,
    "agg_bitmap_distinct": 0.241,
}


def _latest_bench() -> dict | None:
    files = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not files:
        return None
    raw = json.loads(files[-1].read_text())
    if "queries" in raw:
        return raw
    # driver format wraps the emitted JSON line inside a "tail" transcript
    m = re.search(r'\{"metric".*\}', raw.get("tail", ""))
    return json.loads(m.group(0)) if m else None


def test_no_headline_query_regressed_past_2x():
    data = _latest_bench()
    if data is None:
        pytest.skip("no BENCH_r*.json recorded yet")
    offenders = {
        q: (t, BASELINE_R01[q])
        for q, t in data["queries"].items()
        if q in BASELINE_R01 and t > 2.0 * BASELINE_R01[q] + 0.5  # noise floor
    }
    assert not offenders, f"queries past 2x their r01 baseline: {offenders}"
