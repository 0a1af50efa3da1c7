#!/usr/bin/env python
"""FROZEN environment-control workload for bench.py (VERDICT r11 item 1).

Cross-round BENCH absolutes on this host carry a proven ±10-30%
environment term (PERF.md r11: the r9-code A/B worktree replay landed
within 4% of current code while round-over-round absolutes drifted
+10.7%). Rounds 10 and 11 both burned judge/builder time adjudicating
that drift manually. This module makes the control automatic: a small,
SELF-CONTAINED set of plain-DataFrame probes over the same sf-dir
parquet — deliberately independent of every engine module, so its
timing can only move when the ENVIRONMENT moves — timed alongside every
bench run. bench.py embeds

    "control": {"sec": S, "ref_sec": R, "ratio": S/R, "probes": {...}}

in each artifact; PERF.md then reports drift-normalized numbers
(query_sec / ratio) and a |ratio - 1| > ~0.10 flags the recording
session itself as hot/cold.

DO NOT EDIT THE PROBES OR THE REFERENCE NUMBERS. The contract is that
this file never changes after its freeze commit (r12): any edit would
re-base the control and disconnect every prior artifact. If a probe
must ever change, add a new versioned module (bench_control_v2) and
record both ratios during the transition.

Probe design: one wide-scan aggregate (TPC-H Q1 shape — scan + partial
agg dominated), one big-x-big shuffle join with an aggregate (exchange
dominated), one global sort (range partitioning + spill path). All
three are pure Spark built-ins on the driver-provided session, forced
end-to-end through the noop sink exactly like the headline queries.

Reference timings (REF_SEC) were measured at the freeze commit on the
round-12 host: local[32], 128 GiB, sf0.1, quiet machine, min-of-3
after the same warmup bench.py always runs. sum = REF_TOTAL.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

# min-of-3 per probe, measured at freeze time (r12): two independent
# sessions on a quiet machine read (0.429/0.662/0.486) and
# (0.405/0.616/0.465); the per-probe MIN across both is frozen. See
# module doc.
REF_SEC = {
    "control_scan_agg": 0.405,
    "control_shuffle_join": 0.616,
    "control_sort": 0.465,
}
REF_TOTAL = round(sum(REF_SEC.values()), 3)


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _probe_scan_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("n"),
        )
    )


def _probe_shuffle_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # hint both sides merge-join so AQE can't silently flip the probe's
    # physical strategy between rounds — the probe must time the SAME
    # work every time
    return (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"),
             F.count("*").alias("n"))
    )


def _probe_sort(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")


PROBES = {
    "control_scan_agg": _probe_scan_agg,
    "control_shuffle_join": _probe_shuffle_join,
    "control_sort": _probe_sort,
}


def run_control(spark, sf_dir: str, runs: int = 3) -> dict:
    """Time the frozen probes (min-of-``runs`` each, noop-sink forced)
    and return the control record for the bench artifact."""
    probes: dict[str, float] = {}
    for name, fn in PROBES.items():
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        probes[name] = min(samples)
    sec = round(sum(probes.values()), 3)
    return {
        "sec": sec,
        "ref_sec": REF_TOTAL,
        "ratio": round(sec / REF_TOTAL, 3),
        "probes": probes,
    }
