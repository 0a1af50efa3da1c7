"""SQL subqueries (SURVEY.md §2.13) — the spark.sql front-end plus
Catalyst's subquery decorrelation (SURVEY.md §4.2: "free", and these
queries prove it: each correlated subquery plans as a join + aggregate,
no per-row re-execution).

The correlated average is computed over DECIMAL, not DOUBLE: both
engines then produce the identical exact threshold, so boundary rows
can't flip on summation-order ulps (determinism rule, SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.13 sql subqueries"


def _register(spark, sf_dir, *names):
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_scalar_subquery_correlated",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(38,2)) >
      (SELECT AVG(CAST(o2.o_totalprice AS DECIMAL(38,2)))
       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
""",
    family=_FAM,
)
def sql_scalar_subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery: orders above their own customer's
    average order value. Catalyst decorrelates to aggregate-then-join —
    one pass over orders, not one subquery per row."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(38,2)) >
      (SELECT AVG(CAST(o2.o_totalprice AS DECIMAL(38,2)))
       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""
    )


@query(
    "sql_exists_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
""",
    family=_FAM,
)
def sql_exists_subquery(spark, sf_dir):
    """Correlated EXISTS: customers holding at least one large order —
    decorrelated to a left-semi join."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
"""
    )


@query(
    "sql_in_subquery",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
ORDER BY p_partkey
""",
    family=_FAM,
)
def sql_in_subquery(spark, sf_dir):
    """IN-subquery membership filter (semi-join under the hood)."""
    _register(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
ORDER BY p_partkey
"""
    )


_NOT_IN_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders
   WHERE o_custkey NOT IN
         (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
    AS n_not_in_clean,
  (SELECT COUNT(*) FROM orders
   WHERE o_custkey NOT IN
         (SELECT NULLIF(c_custkey, 1) FROM customer
          WHERE c_mktsegment = 'BUILDING'))
    AS n_not_in_nullable
"""


@query("sql_not_in_null_aware", oracle=_NOT_IN_SQL, family=_FAM)
def sql_not_in_null_aware(spark, sf_dir):
    """NOT IN with a nullable inner — the null-aware anti-join, SQL's
    most-misunderstood three-valued-logic trap: one NULL in the inner
    relation makes `x NOT IN (...)` never-true, so the second count
    collapses to 0 while the null-free twin stays populated. Spark plans
    this as a null-aware anti join (testdata has no native NULLs, so
    NULLIF manufactures one). Both engines must agree on both counts —
    an engine shortcutting NOT IN to a plain anti join fails the
    second."""
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(_NOT_IN_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@query("sql_lateral_topk", oracle=_LATERAL_SQL, family=_FAM)
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with LIMIT — top-2 orders per customer
    as a lateral join (the SQL spelling of per-group top-k; the window
    spelling is win_topk_per_group). Catalyst decorrelates it to a
    join + per-key limit rather than re-running the subquery per row;
    the total-order tiebreaker keeps the picked rows deterministic."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SPARK = """
WITH RECURSIVE tree(k, depth) AS (
  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
  UNION ALL
  SELECT s.s_suppkey + 1 AS k, t.depth + 1 AS depth
  FROM supplier s JOIN tree t ON (s.s_suppkey + 1) div 2 = t.k
  WHERE s.s_suppkey + 1 >= 2
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM tree GROUP BY depth ORDER BY depth
"""

_RECURSIVE_DUCK = """
WITH RECURSIVE tree(k, depth) AS (
  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
  UNION ALL
  SELECT s.s_suppkey + 1 AS k, t.depth + 1 AS depth
  FROM supplier s JOIN tree t ON (s.s_suppkey + 1) // 2 = t.k
  WHERE s.s_suppkey + 1 >= 2
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM tree GROUP BY depth ORDER BY depth
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_DUCK, family=_FAM)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE): BFS over the implicit
    binary tree parent(k) = k div 2 rooted at supplier key 1, reporting
    node count and key range per depth. Iterative graph traversal
    expressed in pure SQL — what MR runs as a driver-side loop of
    chained jobs — with each recursion step a join against the previous
    frontier only (frontier-sized, not graph-sized, intermediate state).
    The engine unions the per-level results; the depth histogram
    deterministically pins every level's membership (integer keys, no
    floats). The only dialect delta vs the DuckDB oracle is integer
    division spelling (`div` vs `//`)."""
    _register(spark, sf_dir, "supplier")
    return spark.sql(_RECURSIVE_SPARK)


@query(
    "sql_group_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
""",
    family=_FAM,
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB share the
    shorthand): every non-aggregate select item becomes a group key —
    kills the classic bug where a projection edit silently desyncs from
    a positional GROUP BY 1,2 list. Same physical plan as the explicit
    form (combiner-shape aggregate); purely a front-end surface, which
    is exactly why it's worth pinning cross-engine."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""
    )


@query(
    "sql_quantified_all_any",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice >= ALL (
        SELECT u.o_totalprice FROM orders u
        WHERE u.o_custkey = o.o_custkey
          AND u.o_orderpriority = '1-URGENT'
      )
  AND o.o_totalprice < ANY (
        SELECT l.o_totalprice FROM orders l
        WHERE l.o_custkey = o.o_custkey
          AND l.o_orderpriority = '5-LOW'
      )
ORDER BY o_orderkey
""",
    family=_FAM,
)
def sql_quantified_all_any(spark, sf_dir):
    """Correlated QUANTIFIED comparisons (>= ALL / < ANY) — an ANSI
    surface Spark SQL does not parse, expressed through the standard
    decorrelation every optimizer applies anyway: a quantified
    comparison against a correlated subquery is a comparison against
    that group's MAX plus the empty-set rule (ALL over an empty set is
    TRUE, ANY over an empty set is FALSE — the rule the naive
    max-rewrite gets wrong, because MAX of no rows is NULL and the
    comparison would three-value-logic away rows ALL must keep).

    Query: orders at least as expensive as EVERY urgent order of the
    same customer, and cheaper than AT LEAST ONE of that customer's
    low-priority orders. Plan: two per-customer combiner aggregates
    (max + count per priority class), broadcast-joined back to the
    fact scan; the quantifier semantics compile to
    (cnt IS NULL OR price >= mx) and (cnt IS NOT NULL AND price < mx)
    — no correlated re-execution per row, which is exactly how a
    100 TB engine must evaluate quantified predicates."""
    o = table(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("u_ck"))
        .agg(F.max("o_totalprice").alias("u_max"),
             F.count("*").alias("u_cnt"))
    )
    low = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.col("o_custkey").alias("l_ck"))
        .agg(F.max("o_totalprice").alias("l_max"),
             F.count("*").alias("l_cnt"))
    )
    return (
        o.join(F.broadcast(urgent), o.o_custkey == F.col("u_ck"), "left")
        .join(F.broadcast(low), o.o_custkey == F.col("l_ck"), "left")
        .filter(
            (F.col("u_cnt").isNull() | (F.col("o_totalprice") >= F.col("u_max")))
            & (F.col("l_cnt").isNotNull() & (F.col("o_totalprice") < F.col("l_max")))
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
