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
