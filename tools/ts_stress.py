#!/usr/bin/env python
"""Time-series scale stress for the windows/ts family (r8).

The zipf stress covers documents/embeddings; this covers the THIRD
fixture axis: a deterministic 1M-row events table (10x sf0.1) with
production-shaped structure — Zipf-skewed users (the window-partition
skew case), 5 event types, value seasonality + trend + noise, and a
deterministic 2% timestamp-gap rate (so gap-aware operators exercise
their gap paths) — then measures the ts/window operators end-to-end
(noop sink, min-of-2).

Writes ONE JSON document (default BENCH_r9_ts.json). Deterministic:
numpy default_rng(SEED), fixed epoch base; no wall-clock in the data.

Usage: python tools/ts_stress.py [--out DIR] [--json PATH] [--rows N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SEED = 8
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros

BENCH_QUERIES = [
    "ts_resample_ohlc",
    "ts_gap_fill",
    "ts_interpolate_linear",
    "ts_ewma",
    "ts_anomaly_mad",
    "ts_decompose_classical",
    "ts_downsample_lttb",
    "ts_interval_merge",
    "ts_funnel",
    "ts_retention_cohort",
    "win_sessionize",
    "win_moving_median",
    "win_running_distinct",
    "win_rolling_regression",
    "dq_distribution_drift",
    "dq_benford_audit",
    # streaming twins (VERDICT r8 item 7): the 2.10 family's
    # foreachBatch/state-store drains against the SAME 1M corpus — any
    # per-micro-batch quadratic the batch twins hide shows up here as
    # superlinear scaling vs the sf0.1 numbers
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    "stream_stateful_custom",
    "stream_chained_agg",
    "stream_windowed_topk",
    # r11 sketch addition, first run at stress scale (r12 — VERDICT
    # r11 item 6): KMV set-intersection over the 1M-event corpus; the
    # per-(type,type) distinct-union rank windows scale with |users|
    "agg_kmv_intersect",
    # r13 (VERDICT r12 items 1+4): the streaming HDR sketch's state
    # stays <=~700 counters/window at 1M events or the claim is false;
    # the RocksDB-provider drain proves the production state store
    # holds at 10x the fixture volume
    "stream_hdr_rollup",
    "stream_rocksdb_state",
    # r13: the integer geohash codec is a pure codegen chain — at 1M
    # events any hidden per-row Python or expression blowup shows here
    "fn_geohash",
    # r13 late: per-user touch x conversion pairing and the stored-HLL
    # rollup both scale with |events|; the attribution join must stay
    # user-bounded (never cross) at 1M rows
    "ts_attribution_multitouch",
    "agg_sketch_rollup_table",
    "stream_rocksdb_restart",
    "agg_mann_whitney_u",
    # r14: watermark eviction and event-time-timeout sessionization at
    # 1M Zipf-skewed events — state must stay O(open windows)/O(users)
    # and the finalize batch must still fire timeouts at this volume
    "stream_state_eviction",
    "stream_session_timeout",
    # r15: STL's banded LOESS joins must scale with the RESAMPLED
    # series (~6200 hours at this span), never with the 1M raw rows —
    # superlinearity vs ts_decompose_classical here would falsify the
    # banded-join claim
    "ts_stl_loess",
    # r15 late: the matrix-profile pairwise join must run on the
    # CALENDAR-sized daily grid (one raw pass into the rollup, then
    # O(n_sub^2) bounded by days x types) — scaling with the 1M raw
    # rows here would falsify the single-full-data-pass claim
    "ts_matrix_profile",
    # r15 late: ESD's per-round medians/argmax run on the checkpointed
    # daily grid — rounds must cost O(types x days), not O(raw rows)
    "ts_anomaly_esd",
    # r15 late: the STL+ESD composition — front half must stay
    # rollup-bounded, rounds must cost the resampled frame only
    "ts_seasonal_hybrid_esd",
    # r15 late: AB-join candidate volume is the honest sum over type
    # pairs of |A-sub| x |B-sub| on the calendar grid — must stay
    # join-shaped (equi-spine), never a Cartesian, at 753-day series
    "ts_matrix_profile_ab",
]


def generate(out_dir: Path, n_rows: int) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    ids = np.arange(n_rows)
    # mean spacing ~22s -> ~8.5 months span at 1M rows; 2% of gaps are
    # 100x long (the dropout a gap-aware op must survive)
    gaps = rng.exponential(22_000_000, n_rows).astype(np.int64) + 1
    long_mask = rng.random(n_rows) < 0.02
    gaps[long_mask] *= 100
    ts_us = BASE_US + np.cumsum(gaps)
    # Zipf-skewed users: rank-frequency s=1.3 over 5000 users
    uranks = np.arange(1, 5001, dtype=np.float64)
    uw = 1.0 / uranks**1.3
    ucum = np.cumsum(uw / uw.sum())
    user_id = np.searchsorted(ucum, rng.random(n_rows)).astype(np.int64)
    etypes = np.array(["view", "click", "purchase", "error", "login"])
    event_type = etypes[(ids * 7 + user_id) % 5]
    # value: daily seasonality + slow trend + noise, 2dp positive
    hours = (ts_us - BASE_US) / 3.6e9
    value = (
        50.0
        + 20.0 * np.sin(2 * np.pi * (hours % 24) / 24.0)
        + 0.01 * hours
        + rng.normal(0, 5.0, n_rows)
    )
    value = np.round(np.maximum(value, 0.01), 2)
    props = np.array([f'{{"k": {int(k)}}}' for k in (ids % 100)])
    pq.write_table(
        pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(event_type, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }),
        out_dir / "events.parquet",
    )
    # tiny satellite tables some registered queries also read
    top_user, top_n = np.unique(user_id, return_counts=True)
    return {
        "n_rows": n_rows,
        "span_days": round(float(ts_us[-1] - BASE_US) / 8.64e10, 1),
        "n_users": int(len(top_user)),
        "top_user_share": round(float(top_n.max()) / n_rows, 4),
        "long_gaps": int(long_mask.sum()),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hmr_ts/sft")
    ap.add_argument("--json", default="BENCH_r9_ts.json")
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    out = Path(args.out)
    # satellite tables at sf0.1 (symlinks): some ts/window queries also
    # touch a dimension table; only events carries the 10x load
    out.mkdir(parents=True, exist_ok=True)
    import os

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        dst = out / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    gen_stats = generate(out, args.rows)
    print("generated:", json.dumps(gen_stats), flush=True)

    from hdfs_mr_spark.registry import all_specs
    from hdfs_mr_spark.session import get_spark

    spark = get_spark("ts-stress")
    specs = all_specs()
    sf = str(out)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    for name in BENCH_QUERIES:
        runs = []
        try:
            for _ in range(2):
                t0 = time.time()
                specs[name].fn(spark, sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(round(time.time() - t0, 3))
            timings[name] = min(runs)
            all_runs[name] = runs
            print(f"bench {name}: {runs} -> {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            failures[name] = repr(exc)[:160]
            print(f"FAIL {name}: {failures[name]}", flush=True)
        spark.sparkContext._jvm.System.gc()

    # environment control (r14): the r14 stress runs landed in a window
    # where the HOST itself ran 1.1-1.45x slow (hypervisor steal; zero
    # local CPU consumers) — embed the frozen bench_control probes so
    # every stress artifact self-documents its recording environment
    # exactly like BENCH_r{N}.json does.
    from tools.bench_control import run_control

    control = run_control(spark, "/root/testdata/sf0.1")
    print("control:", json.dumps(control), flush=True)

    result = {
        "metric": "ts_stress_wall",
        "control": control,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": all_runs,
        "failures": failures,
        "corpus": gen_stats,
        "seed": SEED,
    }
    Path(args.json).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
