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

from hdfs_mr_spark.exprs import davg, dsum, sql_davg, sql_dsum
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


@query(
    "sql_tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    family=_FAM,
)
def sql_tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: order-priority count of one quarter's orders that
    had at least one late lineitem. The fixture has no
    l_commitdate/l_receiptdate, so "late" adapts to shipped more than
    30 days after the order date — same correlated-EXISTS shape.
    Physical: the EXISTS decorrelates to a LEFT SEMI join on orderkey
    with the date residual; the orders quarter-filter pushes to the
    scan, and the priority count is a 5-group combiner aggregate."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "sql_tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution (how many
    customers placed 0, 1, 2, ... qualifying orders) — the classic
    LEFT-JOIN-with-join-condition-filter trap: the priority predicate
    must live IN the join condition, not a WHERE (a WHERE would turn
    the outer join inner and silently drop 0-order customers, the very
    rows Q13 exists to count). Two-level aggregate, both combiner-shape;
    the histogram is at most max-orders-per-customer rows."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "sql_tpch_q14_promo_revenue",
    oracle=f"""
SELECT (100.0 * {sql_dsum(f"CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0.0 END", 4)})
       / {sql_dsum(_REV, 4)} AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
    family=_FAM,
)
def sql_tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promotion revenue share for one month — a
    conditional aggregate over a fact-dimension join, emitting one
    scalar. Physical: part broadcasts (dimension), the month filter
    pushes to the lineitem scan, both sums share one aggregate pass.
    Both numerator and denominator are single-rounded decimal sums, so
    the final division is one deterministic IEEE op in both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            ((F.lit(100.0) * dsum(promo, 4)) / dsum(rev, 4)).alias("promo_revenue")
        )
    )


@query(
    "sql_tpch_q17_small_quantity_revenue",
    oracle=f"""
WITH pq AS (
  SELECT l_partkey,
         0.2 * ({sql_davg("l_quantity")}) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_dsum("l.l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#21'
  AND CAST(l.l_quantity AS DOUBLE) < pq.qty_threshold
""",
    family=_FAM,
)
def sql_tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average order quantity) went
    unfilled. The correlated scalar subquery decorrelates to a per-part
    aggregate joined back on partkey — the canonical correlated-agg
    rewrite. The threshold is a decimal-exact average times 0.2 (one
    IEEE multiply), so the comparison is bit-identical in both engines.
    Physical: per-part stats are a combiner agg over the same
    partkey-partitioned shuffle the probe join reuses; the brand filter
    broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg(F.col("l_quantity"))).alias("qty_threshold")
    ).select(F.col("l_partkey").alias("pq_partkey"), "qty_threshold")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21").select(
        "p_partkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .filter(F.col("l_quantity").cast("double") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "sql_tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT {sql_dsum(_REV, 4)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    family=_FAM,
)
def sql_tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under three disjunctive brand/size/
    quantity arms — the classic test of disjunction handling: the join
    key (partkey) must still be extracted as the equi-condition with
    the OR-of-ANDs evaluated as a residual, NOT a cartesian product;
    Catalyst also derives the implied common filters. One scalar out."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    arm1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 15) & q.between(20, 30)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(dsum(rev, 4).alias("revenue"))
    )


@query(
    "sql_tpch_q21_waiting_supplier",
    oracle="""
WITH fo AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN fo ON fo.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > fo.o_orderdate + INTERVAL 90 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 20
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape — the hardest classic: suppliers who were the
    SOLE late shipper on multi-supplier finalized orders ("who kept the
    order waiting"). Adapted lateness = shipped more than 90 days after
    the order date (no l_commitdate/l_receiptdate in the fixture).
    Composition: an EXISTS (another supplier participated) and a NOT
    EXISTS (no OTHER supplier was late) over the same order — planned
    as a LEFT SEMI then LEFT ANTI join on orderkey with the suppkey
    inequality as residual; late-line dedup by (order, supp) keeps the
    count per waiting incident, not per line. Top-20 via
    TakeOrderedAndProject."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cand = late.join(
        l2,
        (late.l_orderkey == l2.x_orderkey) & (late.l_suppkey != l2.x_suppkey),
        "left_semi",
    ).join(
        l3,
        (late.l_orderkey == l3.y_orderkey) & (late.l_suppkey != l3.y_suppkey),
        "left_anti",
    )
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@query(
    "sql_tpch_q22_global_sales_opportunity",
    oracle=f"""
WITH avg_bal AS (
  SELECT {sql_davg("c_acctbal")} AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_dsum("c.c_acctbal")} AS totacctbal
FROM customer c CROSS JOIN avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    family=_FAM,
)
def sql_tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: dormant high-value customers — above-average
    account balance but no order since mid-2000 — grouped by country
    (the fixture has no c_phone, so nationkey IS the country code; and
    every fixture customer has SOME order, so the classic zero-orders
    predicate is vacuous — "no recent orders" keeps the anti-join arm
    doing real work: 135 qualifying customers at sf0.01, 1331 at
    sf0.1). Composition: a global scalar aggregate (decimal-exact
    average over positive balances) broadcast as the filter threshold,
    then a LEFT ANTI join against recent orders — the shape a NOT IN
    would get wrong under nulls (sql_not_in_null_aware covers that
    trap); per-country combiner aggregate out."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("ab")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "sql_tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity")} AS sum_qty,
       {sql_dsum("l_extendedprice")} AS sum_base_price,
       {sql_dsum(_REV)} AS sum_disc_price,
       {sql_dsum("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")} AS sum_charge,
       {sql_davg("l_quantity")} AS avg_qty,
       {sql_davg("l_extendedprice")} AS avg_price,
       {sql_davg("l_discount")} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the pricing summary report — eight aggregates
    over one fact scan, grouped by the 6-cell (returnflag, linestatus)
    key. The scale story is pure map-side combine: every sum/avg
    partial-aggregates per partition, so the shuffle carries ~6 rows
    per partition no matter how many billions of lineitems feed it.
    All money sums ride the single-rounding decimal kernel; the charge
    expression is parenthesized identically in both engines so the
    per-row doubles are bit-equal before aggregation."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * (
        1 + F.col("l_tax")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "sql_tpch_q7_volume_shipping",
    oracle=f"""
WITH shipping AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum("volume")} AS revenue
FROM shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the two-role nation join (supplier's nation AND
    customer's nation, self-joined dimension under different aliases)
    with a symmetric either-direction predicate. Physical: both nation
    legs and supplier broadcast; the disjunctive nation-pair filter
    applies after the broadcast joins so lineitem still shuffles only
    once (on orderkey); the 2x2xyears group is a combiner aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
        | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "sql_tpch_q8_market_share",
    oracle=f"""
WITH all_sales AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
       / {sql_dsum("volume")} AS mkt_share
FROM all_sales
GROUP BY o_year
ORDER BY o_year
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's market share of a part type sold
    into a region, by order year — the deepest classic join tree
    (8 relations, nation joined twice in different roles) feeding a
    ratio-of-conditional-sums aggregate. Physical: every non-fact
    relation broadcasts, lineitem shuffles once on orderkey; numerator
    and denominator are computed in the SAME aggregate pass (no second
    scan) as single-rounded decimal sums, so the final division is one
    deterministic IEEE op per year row."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((dsum(target) / dsum(vol)).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "sql_tpch_q9_product_profit",
    oracle=f"""
WITH profit AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         (l.l_extendedprice * (1 - l.l_discount))
           - ((0.6 * p.p_retailprice) * l.l_quantity) AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE p.p_name LIKE '%bolt%'
)
SELECT nation, o_year, {sql_dsum("amount")} AS sum_profit
FROM profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on a product line by supplying nation and
    year. The fixture has no partsupp, so supply cost adapts to
    0.6 * p_retailprice per unit (same join tree, same profit
    arithmetic shape). Physical: the part-name filter prunes the
    broadcast build side BEFORE the fact join (partkey semi-filter
    rides the broadcast), supplier/nation broadcast, lineitem shuffles
    once on orderkey; the profit expression keeps identical
    parenthesization in both engines so per-row doubles are bit-equal
    and the decimal sum is order-independent."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        (F.lit(0.6) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@query(
    "sql_tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
ec AS (
  SELECT c.l_partkey, c.l_suppkey, c.unit_cost
  FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey
),
mn AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM ec GROUP BY l_partkey
)
SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, ec.unit_cost AS supply_cost
FROM part p
JOIN ec ON ec.l_partkey = p.p_partkey
JOIN mn ON mn.l_partkey = p.p_partkey AND ec.unit_cost = mn.min_cost
JOIN eu ON eu.s_suppkey = ec.l_suppkey
WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the European supplier
    offering the minimum supply cost. The fixture has no partsupp, so
    supply cost adapts to the supplier's minimum observed unit price
    (min of l_extendedprice / l_quantity per (part, supplier) pair) —
    the same correlated-scalar-MIN subquery decorrelated to a per-part
    aggregate joined back on (partkey, cost). Determinism: unit price
    is one IEEE division per row and MIN never rounds, so the
    cost-equality probe compares bit-identical doubles in both
    engines. Physical: per-pair and per-part mins are combiner aggs on
    the same partkey-shuffled exchange; the region-filtered supplier
    set broadcasts; ties (two EU suppliers at the same min) both
    survive, exactly like classic Q2."""
    li = table(spark, sf_dir, "lineitem")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ec = cost.join(F.broadcast(eu.select("s_suppkey")), cost.l_suppkey == F.col("s_suppkey")).drop(
        "s_suppkey"
    )
    mn = ec.groupBy(F.col("l_partkey").alias("mn_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    return (
        ec.join(F.broadcast(p), ec.l_partkey == p.p_partkey)
        .join(
            mn,
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(eu), F.col("l_suppkey") == eu.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("unit_cost").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@query(
    "sql_tpch_q11_important_stock",
    oracle=f"""
WITH nl AS (
  SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey = 8
),
per_part AS (
  SELECT l_partkey, {sql_dsum("val")} AS value FROM nl GROUP BY l_partkey
),
tot AS (
  SELECT {sql_dsum("val")} * 0.001 AS threshold FROM nl
)
SELECT pp.l_partkey AS p_partkey, pp.value
FROM per_part pp CROSS JOIN tot
WHERE pp.value > tot.threshold
ORDER BY pp.value DESC, p_partkey ASC
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: the parts representing a significant share of
    one nation's supplied value. No partsupp in the fixture, so value
    adapts from availqty*supplycost to the nation's shipped revenue
    per part — identical composition: per-key aggregate, a GLOBAL
    scalar aggregate over the same rows as the significance threshold,
    and a filter of one against the other. Physical: the nation's
    supplier keys broadcast into the fact scan; both aggregates are
    combiner-shape over one shuffle; the single-row threshold
    broadcasts back (scalar cross join), so nothing big moves twice.
    Threshold semantics are scale-invariant (a fraction of total), so
    the query returns the same concentration profile at any SF."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 8).select(
        "s_suppkey"
    )
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nl = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).select(
        "l_partkey", val.alias("val")
    )
    per_part = nl.groupBy("l_partkey").agg(dsum(F.col("val")).alias("value"))
    tot = nl.agg((dsum(F.col("val")) * F.lit(0.001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


@query(
    "sql_tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum(_REV)} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
),
mx AS (SELECT MAX(total_rev) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
CROSS JOIN mx
WHERE r.total_rev = mx.m
ORDER BY s.s_suppkey
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter — the classic view + scalar-MAX-subquery composition,
    decorrelated to a per-supplier combiner aggregate, a 1-row global
    MAX, and an equality probe. The revenue values are single-rounded
    decimal sums, so the MAX and the = probe compare bit-identical
    doubles in both engines (the reason the classic query is safe to
    write with = at all). Physical: per-supplier agg shuffles once;
    the scalar max broadcasts; supplier is a broadcast dim. Ties all
    survive, ordered by suppkey."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(dsum(rev_expr).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("m"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "sql_tpch_q16_supplier_part_counts",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    qualifying (brand, type, size) bucket, excluding flagged
    suppliers. The partsupp relation adapts to the observed DISTINCT
    (l_partkey, l_suppkey) pairs from lineitem; the classic
    customer-complaints NOT IN adapts to negative-balance suppliers —
    preserving the anti-join arm (suppkey is non-null so NOT IN is
    safe; the null-poisoned variant is sql_not_in_null_aware's job).
    Physical: the pair-dedup is a combiner distinct on the fact; part
    broadcasts with all three predicates pre-applied; the exclusion
    list broadcasts as a LEFT ANTI; COUNT(DISTINCT) expands partial
    per-group supplier sets before the final count."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


@query(
    "sql_tpch_q20_potential_promotion",
    oracle="""
WITH sp AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
shipped AS (
  SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
  FROM lineitem l JOIN sp ON sp.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
),
part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
)
SELECT DISTINCT s.s_name, s.s_acctbal
FROM supplier s
JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
JOIN part_total pt ON pt.l_partkey = sh.l_partkey
WHERE s.s_nationkey = 15
  AND sh.qty > 0.5 * pt.total_qty
ORDER BY s.s_name
""",
    family=_FAM,
    tags=("ordered",),
)
def sql_tpch_q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in one nation who dominated a product
    line's shipments in one year (shipped more than half of a
    qualifying part's annual volume — adapting the availqty-vs-half-
    shipped test to the fixture, which has no partsupp). Same nested
    composition: name-filtered part keys -> per-(part,supplier)
    aggregate -> correlated per-part total -> threshold semi-join ->
    DISTINCT suppliers. Quantities are integer-valued doubles, so
    plain SUM is exact and order-independent (every partial is an
    exact integer < 2^53) and 0.5 * total is one exact IEEE multiply.
    Physical: part keys broadcast into the fact scan; both aggregates
    are combiner-shape over one (partkey, suppkey) shuffle; the
    nation's suppliers broadcast."""
    sp = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(sp), li.l_partkey == sp.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 15).select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        shipped.join(part_total, F.col("l_partkey") == F.col("pt_partkey"))
        .filter(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )
