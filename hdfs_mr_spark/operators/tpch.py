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


@query(
    "sql_tpch_q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
""",
    family=_FAM,
)
def sql_tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure scan-filter-aggregate revenue forecast —
    the query whose ENTIRE cost is the scan, so it measures pushdown
    honesty: all three predicates reach the parquet reader as
    PushedFilters, the projection prunes to three columns, and the
    aggregate is one partial/final pair. No joins, no windows — if this
    query shuffles anything but two partial-agg rows per partition,
    something is wrong."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(rev).alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "sql_tpch_q12_shipmode_priority",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape (adapted: returnflag stands in for the missing
    shipmode column): priority-mix accounting per line class. The
    pattern being proved is conditional aggregation AFTER a fact-fact
    join — the CASE/WHEN counters partial-aggregate map-side, so the
    post-join shuffle carries two counters per (partition, flag), not
    the joined rows."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sql_tpch_q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {sql_dsum("l.l_quantity")} AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose line
    quantities sum past 300, re-joined to full detail, top-100 by
    price. The scale lesson is the semi-join: the HAVING aggregate
    reduces lineitem to a small key set FIRST, and that key set
    prefilters the detail join — the same aggregate-then-semi-join
    discipline as mr_matrix_multiply's sparsity patterns. Top-100 is
    TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
