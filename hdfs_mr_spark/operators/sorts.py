"""Sorts, limits, top-k (SURVEY.md §2.6).

MR heritage: TeraSort — a range-partitioned global sort. Spark's orderBy
plans exactly that (RangePartitioning sampled at runtime); global top-k
plans TakeOrderedAndProject (per-partition heap + driver merge, no full
sort), which is the scalable path at 100 TB. Every query materializes
its rank so the order itself is oracle-checked despite the
order-insensitive value hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.6 sorts/limits/topk"


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
    """Global multi-key sort with materialized rank (TeraSort analogue —
    Spark range-partitions by sampled split points, same idea)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 90000)
    w = Window.orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
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
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k — plans TakeOrderedAndProject (heap per partition,
    merge of k·P rows at the driver), not a full sort. Total-order
    tiebreaker keeps it deterministic."""
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
