"""Bench regression gate (VERDICT r1 item 8, re-baselined per r2 item 8):
the latest driver-recorded BENCH_r{N}.json must not show any headline
query at more than 2x its recorded steady-state baseline. Locks the
tuning wins in PERF.md — a refactor that silently reverts one shows up
here before the next judged round.

Two baselines because the bench methodology changed in round 3 (PERF.md
round-2 postmortem): records carrying ``runs_per_query >= 2`` are
min-of-2 steady-state numbers and gate against the tight r3 baseline
with a small noise floor; legacy single-run records (r01/r02) keep the
original loose rule so the gate stays meaningful on old artifacts.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Steady-state (min-of-2) seconds from the 2026-08-13 r3 local run
# (sf0.1, local[32], noop sink) — bench.py's current methodology.
BASELINE_R3 = {
    "scan_parquet": 0.186,
    "filter_like": 0.246,
    "join_broadcast_inner": 0.485,
    "join_shuffle_inner": 1.17,
    "join_multiway_star": 0.831,
    "join_asof": 0.573,
    "agg_groupby": 1.588,
    "agg_stats": 1.992,
    "win_topk_per_group": 0.397,
    "sort_global": 0.556,
    "dedup_by_key": 0.455,
    "fn_json": 0.925,
    "mr_wordcount": 0.284,
    "mr_join_agg": 1.391,
    "llm_dedup_exact": 0.284,
    "llm_dedup_near": 1.921,
    "llm_dedup_minhash_lsh": 2.03,
    "llm_sim_knn": 0.616,
    "llm_sim_pairs": 1.586,
    "llm_sim_knn_ivf": 1.214,
    "llm_tfidf": 0.622,
    "llm_quality_filter": 0.37,
    "llm_dedup_near_decision": 1.97,
    "llm_chunk_split": 0.427,
    "mr_triangle_count": 2.133,
    # re-measured after the AQE-coalesce fix (explicit keyed repartition
    # un-serializes the Arrow stage — PERF.md round 3)
    "udf_grouped_map": 0.738,
    "mr_tera_validate": 1.286,
    "mr_bfs": 2.221,
    "join_spatial_grid": 0.403,
    "agg_bitmap_distinct": 0.178,
    # round-3 additions, baselined from the same-day extended run
    "llm_dedup_substring": 1.451,
    "llm_lm_score_bigram": 1.219,
    "llm_embed_gram": 0.852,
    "agg_countmin_sketch": 1.505,
    "sql_tpch_q5_local_supplier": 1.146,
    # round-6 headline additions, baselined from BENCH_r6_full.json
    # (the post-§2b-fix steady state these queries must hold)
    "llm_quality_ensemble": 0.753,
    "llm_ngram_novelty": 1.027,
}

# Per-query seconds from BENCH_r01.json (single-run-per-query era).
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
    for f in reversed(files):
        raw = json.loads(f.read_text())
        if "queries" not in raw:
            # driver format wraps the JSON line inside a "tail" transcript
            m = re.search(r'\{"metric".*\}', raw.get("tail", ""))
            if not m:
                continue
            raw = json.loads(m.group(0))
        # r8: scale-stress artifacts (zipf/ts corpora) time DIFFERENT
        # data than the sf0.1 baseline — only same-corpus records gate
        if raw.get("metric") in ("headline_suite_wall", "full_registry_wall"):
            return raw
    return None


def test_no_headline_query_regressed_past_2x():
    data = _latest_bench()
    if data is None:
        pytest.skip("no BENCH_r*.json recorded yet")
    if data.get("runs_per_query", 1) >= 2:
        # steady-state record: tight gate. The +0.3 s floor only shields
        # sub-0.3 s queries from scheduler jitter — any query at >=0.3 s
        # baseline FAILS on a genuine 2x slowdown (r2 verdict item 8).
        baseline, floor = BASELINE_R3, 0.3
    else:
        baseline, floor = BASELINE_R01, 0.5
    offenders = {
        q: (t, baseline[q])
        for q, t in data["queries"].items()
        if q in baseline and t > 2.0 * baseline[q] + floor
    }
    assert not offenders, f"queries past 2x steady-state baseline: {offenders}"


def test_full_sweep_wall_budget():
    """VERDICT r3 item 8: the headline gate above covers 35 queries; a
    quadratic regression in any of the other ~220 would previously pass
    CI unnoticed. Gate the latest committed full-sweep artifact
    (CHECK_r*.json, tools/check.py --json) against a committed budget:
    mean sec/query <= 2x the r3 baseline mean (normalized per query so
    registry growth doesn't move the bar) and no single query above an
    absolute cap (a quadratic blowup at sf0.01 concentrates in one
    query's wall time)."""
    budget = json.loads((REPO / "tests" / "full_sweep_budget.json").read_text())
    # latest round's PLAIN (sf0.01) artifact — the budget is calibrated
    # at sf0.01; sf-suffixed siblings of the same round time a bigger
    # input and would trip the mean for the wrong reason
    sweeps = sorted(
        p for p in REPO.glob("CHECK_r*.json")
        if re.fullmatch(r"CHECK_r\d+\.json", p.name)
    ) or sorted(REPO.glob("CHECK_r*.json"))
    sweeps.sort(key=lambda p: [int(x) for x in re.findall(r"\d+", p.name)])
    assert sweeps, "no committed CHECK_r*.json full-sweep artifact"
    latest = json.loads(sweeps[-1].read_text())
    qs = {
        name: rec for name, rec in latest["queries"].items()
        if isinstance(rec, dict) and rec.get("sec") is not None
    }
    assert qs, f"{sweeps[-1].name} has no per-query timings"
    mean = sum(rec["sec"] for rec in qs.values()) / len(qs)
    cap = budget["baseline_mean_sec_per_query"] * budget["max_mean_multiplier"]
    assert mean <= cap, (
        f"{sweeps[-1].name}: mean {mean:.3f}s/query exceeds budget {cap:.3f}s"
    )
    over = {n: r["sec"] for n, r in qs.items()
            if r["sec"] > budget["per_query_cap_sec"]}
    assert not over, f"queries over {budget['per_query_cap_sec']}s cap: {over}"


def test_full_registry_bench_artifact():
    """VERDICT r4 item 6: the committed BENCH_r{N}_full.json must cover
    the ENTIRE registry (min-of-2, same noop-sink methodology as the
    headline suite) so per-query scale regressions outside the headline
    set are diffable round-over-round — and no single query may exceed
    an absolute wall cap at sf0.1 (a quadratic blowup concentrates in
    one query's time)."""
    from hdfs_mr_spark.lockstep import latest_full_bench

    fb = latest_full_bench(REPO)
    if fb is None:
        pytest.skip("no BENCH_r*_full.json recorded yet")
    _, data = fb
    assert data.get("runs_per_query", 1) >= 2
    from hdfs_mr_spark.registry import all_specs

    missing = set(all_specs()) - set(data["queries"])
    assert not missing, f"full bench artifact missing queries: {sorted(missing)}"
    cap = 30.0  # seconds at sf0.1 on local[32]; slowest r5 query ~4 s
    over = {q: t for q, t in data["queries"].items() if t > cap}
    assert not over, f"queries over {cap}s at sf0.1: {over}"
