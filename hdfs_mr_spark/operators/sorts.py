"""Sorts, limits, top-k (SURVEY.md §2.6).

MR heritage: TeraSort — a range-partitioned global sort. Spark's orderBy
plans exactly that (RangePartitioning sampled at runtime); global top-k
plans TakeOrderedAndProject (per-partition heap + driver merge, no full
sort), which is the scalable path at 100 TB. Every query materializes
its rank so the order itself is oracle-checked despite the
order-insensitive value hash.

Global rank materialization (sort_global here, mr_sort in mrjobs) is
the one place a naive ``row_number() OVER (ORDER BY ...)`` funnels the
whole table through a single task (Spark warns `WindowExec: No
Partition Defined`). The distributed formulation below is the TeraSort
one: deterministic range buckets aligned with the sort order, a
*partitioned* per-bucket row_number, and cumulative bucket-count
offsets added back — every stage shuffles on the bucket key, nothing
ever single-partitions (tests/test_plans.py locks the plan)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.6 sorts/limits/topk"


def bucketed_global_rank(df, bucket, order_cols, out_cols, rank_name):
    """Distributed global rank: TeraSort's two-level formulation.

    ``bucket`` must be a *deterministic pure projection* of the leading
    sort key, monotone non-decreasing along ``order_cols`` order (ties
    may share a bucket). Global rank = (rows in earlier buckets) +
    (row_number within my bucket). Three relational pieces, all
    bucket-keyed:

    - per-bucket counts: combiner-shape aggregate, O(#buckets) rows;
    - cumulative offsets: triangular self-join over the tiny counts
      relation (no window — an unpartitioned running sum over it would
      re-introduce the single-partition stage this exists to kill);
    - per-bucket ``row_number``: a *partitioned* window — the bucket
      hash shuffle spreads the sort across the cluster.

    Determinism: because the bucket is a pure function of the row (not
    sampled), the counts branch and the rank branch can't disagree on
    boundaries even if the optimizer evaluates the scan twice. At 100 TB
    the bucket fn is produced once from sampled split points
    (df.stat.approxQuantile — the TeraSort sampler) and baked in as
    literals; the fixed quantization used by the callers here stands in
    for that with the same plan shape."""
    t = df.withColumn("__bkt", bucket)
    counts = t.groupBy("__bkt").agg(F.count("*").alias("__n"))
    prior = counts.select(F.col("__bkt").alias("__pb"), F.col("__n").alias("__pn"))
    offs = (
        counts.join(prior, F.col("__pb") < F.col("__bkt"), "left")
        .groupBy("__bkt")
        .agg(F.coalesce(F.sum("__pn"), F.lit(0)).alias("__off"))
        .select(F.col("__bkt").alias("__ob"), "__off")
    )
    w = Window.partitionBy("__bkt").orderBy(*order_cols)
    return (
        t.withColumn("__lr", F.row_number().over(w))
        .join(F.broadcast(offs), F.col("__bkt") == F.col("__ob"))
        .select(
            *out_cols,
            (F.col("__off") + F.col("__lr")).cast("bigint").alias(rank_name),
        )
    )


@query(
    "sort_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       ) AS BIGINT) AS rn
FROM lineitem
WHERE l_extendedprice > 90000
""",
    family=_FAM,
)
def sort_global(spark, sf_dir):
    """Global multi-key sort with materialized rank, distributed: rank =
    bucket offsets + per-bucket row_number (see bucketed_global_rank).
    The bucket quantizes the leading DESC key into ~80 ranges; at scale
    the quantizer comes from sampled split points instead."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 90000)
    # price in (90000, ~105000]: descending order <=> ascending bucket
    bucket = F.floor((F.lit(110000.0) - F.col("l_extendedprice")) / F.lit(250.0))
    return bucketed_global_rank(
        li,
        bucket,
        [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
        "rn",
    )


@query(
    "sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
    family=_FAM,
    tags=("ordered",),
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k — plans TakeOrderedAndProject (heap per partition,
    merge of k·P rows at the driver), not a full sort. Total-order
    tiebreaker keeps it deterministic (and the emitted order is checked:
    tags=ordered)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


@query(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50 OFFSET 200
""",
    family=_FAM,
    tags=("ordered",),
)
def limit_offset(spark, sf_dir):
    """Pagination slice over a total order (Spark 3.4+ offset)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(200)
        .limit(50)
    )


@query(
    "sort_secondary_mr",
    oracle="""
SELECT CAST(8 AS BIGINT) AS n_partitions,
       TRUE AS all_sorted,
       TRUE AS users_colocated,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
""",
    family=_FAM,
)
def sort_secondary_mr(spark, sf_dir):
    """MR secondary sort — the classic Hadoop pattern (composite key,
    custom partitioner on the natural key, grouping comparator) that
    delivers each user's events to one reducer in timestamp order. In
    Spark it is two primitives: `repartition(8, user_id)` (the
    partitioner) + `sortWithinPartitions(user_id, ts, event_id)` (the
    comparator) — NO global sort, no single-partition funnel; each task
    sorts only its own slice, which is exactly what makes the pattern
    scale. The verification runs inside the partitions themselves (an
    Arrow mapInPandas pass that checks monotonicity and counts each
    partition's users), and the oracle pins: 8 partitions reported,
    every partition sorted, per-partition user counts summing to the
    GLOBAL distinct count — the last only holds if hashing really
    co-located every user, so colocation is itself oracle-checked."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    part = ev.repartition(8, "user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    )

    def check(batches):
        # Self-contained closure (engine rule: no module-level refs).
        import pandas as pd

        frames = [b for b in batches]
        pdf = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"user_id": [], "ts": [], "event_id": []})
        )
        keys = list(zip(pdf["user_id"], pdf["ts"], pdf["event_id"]))
        ok = all(a <= b for a, b in zip(keys, keys[1:]))
        out = pd.DataFrame(
            {
                "p_rows": [len(pdf)],
                "p_sorted": [bool(ok)],
                "p_users": [int(pdf["user_id"].nunique())],
            }
        )
        yield out.astype({"p_rows": "int64", "p_sorted": "bool", "p_users": "int64"})

    per_part = part.mapInPandas(
        check, "p_rows bigint, p_sorted boolean, p_users bigint"
    )
    ev2 = ev.agg(F.count_distinct("user_id").alias("global_users"))
    return (
        per_part.agg(
            F.count("*").cast("bigint").alias("n_partitions"),
            F.bool_and("p_sorted").alias("all_sorted"),
            F.sum("p_rows").cast("bigint").alias("n_rows"),
            F.sum("p_users").cast("bigint").alias("part_users"),
        )
        .crossJoin(ev2)
        .select(
            "n_partitions",
            "all_sorted",
            (F.col("part_users") == F.col("global_users")).alias("users_colocated"),
            "n_rows",
            F.col("global_users").cast("bigint").alias("n_users"),
        )
    )
