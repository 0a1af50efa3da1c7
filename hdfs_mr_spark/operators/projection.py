"""Projection, filters, predicates (SURVEY.md §2.2).

The map-phase of MR: field selection, derived fields, and grep-class
predicates. All expressed as Catalyst expressions so filters and column
pruning push into the parquet scan (verified via .explain PushedFilters)
— at 100 TB these queries read only the row groups and columns they
touch, which a record-reader MR job cannot do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.2 projection/filter"


@query(
    "project_select",
    oracle="""
SELECT l_orderkey AS order_key,
       l_linenumber AS line_no,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(l_extendedprice AS VARCHAR) AS price_str
FROM lineitem
""",
    family=_FAM,
)
def project_select(spark, sf_dir):
    """Column projection + rename + cast (map-phase field selection)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
    )


@query(
    "project_computed",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_quantity * 2.0 + 1.0 AS qty2,
       l_extendedprice / l_quantity AS unit_price
FROM lineitem
""",
    family=_FAM,
)
def project_computed(spark, sf_dir):
    """Derived columns — per-row IEEE double math is deterministic across
    engines, so these compare bit-exact with no rounding."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity") * F.lit(2.0) + F.lit(1.0)).alias("qty2"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


@query(
    "filter_comparison",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
""",
    family=_FAM,
)
def filter_comparison(spark, sf_dir):
    """Numeric + date comparison predicates, pushed to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "filter_boolean",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' OR o_totalprice > 300000)
  AND NOT (o_orderpriority = '5-LOW')
""",
    family=_FAM,
)
def filter_boolean(spark, sf_dir):
    """AND/OR/NOT compound predicate."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 300000))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_in_between",
    oracle="""
SELECT p_partkey, p_brand, p_size, p_retailprice
FROM part
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
  AND p_size BETWEEN 10 AND 30
  AND p_retailprice BETWEEN 1000.0 AND 1800.0
""",
    family=_FAM,
)
def filter_in_between(spark, sf_dir):
    """IN-set and BETWEEN-range predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_size").between(10, 30)
        & F.col("p_retailprice").between(1000.0, 1800.0)
    ).select("p_partkey", "p_brand", "p_size", "p_retailprice")


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%PROMO%'
  AND p_name LIKE 'a%'
  AND regexp_matches(p_name, '.*(red|blue).*')
""",
    family=_FAM,
)
def filter_like(spark, sf_dir):
    """Wildcard/regex match — the canonical distributed-grep predicate."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%")
        & F.col("p_name").like("a%")
        & F.col("p_name").rlike(".*(red|blue).*")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_null",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS null_safe_is_f
FROM orders
WHERE NULLIF(o_orderstatus, 'P') IS NULL
   OR (NULLIF(o_orderstatus, 'P') IS NOT NULL AND o_orderstatus = 'F')
""",
    family=_FAM,
)
def filter_null(spark, sf_dir):
    """NULL handling: isNull / isNotNull / null-safe equality (testdata has
    no native nulls, so NULLIF manufactures them)."""
    o = table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        status_or_null.eqNullSafe(F.lit("F")).alias("null_safe_is_f"),
    ).filter(
        status_or_null.isNull()
        | (status_or_null.isNotNull() & (F.col("o_orderstatus") == "F"))
    )
