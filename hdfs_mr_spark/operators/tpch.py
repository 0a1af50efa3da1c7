"""TPC-H-shape composite queries (SURVEY.md §2.9/§2.13 breadth).

The single-operator inventory proves each relational piece in
isolation; these three classics prove the COMPOSITIONS a warehouse
user actually runs — multi-join + filter + aggregate + top-k in one
plan — and that Catalyst assembles the right physical shape for each:
dimension broadcasts, map-side partial aggregation before the shuffle,
TakeOrderedAndProject for the bounded top-k (never a global sort).
Adapted to the fixture schema (no o_shippriority / c_address columns;
semantics otherwise the classic Q3 / Q5 / Q10 shapes).

Revenue sums ride the single-rounding decimal kernel (exprs.dsum) so
the hash-match against DuckDB is exact regardless of partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mr_spark.exprs import dsum, sql_dsum
from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.9 MR composite jobs"

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "sql_tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum(_REV)} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND l.l_shipdate > TIMESTAMP '1996-07-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 highest-revenue unshipped orders for one
    market segment. Physical shape that matters at 100 TB: the customer
    filter broadcasts into the orders join (no fact shuffle for the
    dimension), revenue partial-aggregates map-side on l_orderkey, and
    the LIMIT 10 plans as TakeOrderedAndProject — per-partition top-10
    heaps, never a global sort of the aggregate."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "sql_tpch_q5_local_supplier",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum(_REV)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: revenue by nation where the supplying and buying
    nation coincide, one region, one order year. The 6-way join is the
    scale test: lineitem (the only big fact) shuffles ONCE on orderkey
    for the orders join; supplier, customer-side nation equality, nation
    and region are all broadcast dimensions, and the same-nation
    predicate rides the supplier join condition instead of a
    post-join filter."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "sql_tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum(_REV)} AS revenue,
       c.c_acctbal, n.n_name, c.c_mktsegment
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter. Returned-lineitem filter pushes to the fact
    scan; customer and nation broadcast; the grouped revenue
    partial-aggregates before the customer-key shuffle; top-20 is
    TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(rev).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
