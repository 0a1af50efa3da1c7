"""MapReduce-canonical composite jobs (SURVEY.md §2.9).

These are the end-to-end workloads the reference system class exists to
run — word count, grep, inverted index, TeraSort, reduce-side join —
re-expressed as single declarative DataFrame chains. Each one collapses
what MR runs as 1-3 chained jobs (with DFS materialization in between)
into one Catalyst plan with no intermediate materialization.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark.exprs import dsum, sql_dsum
from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.9 MR composite jobs"


@query(
    "mr_wordcount",
    oracle="""
SELECT u.word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
GROUP BY u.word
ORDER BY n DESC, u.word ASC
""",
    family=_FAM,
)
def mr_wordcount(spark, sf_dir):
    """THE MapReduce job: tokenize -> explode -> count per word. Catalyst
    plans partial aggregation before the shuffle — the combiner, free."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
    )


@query(
    "mr_grep",
    oracle="""
SELECT doc_id, lang, CAST(strpos(text, 'shuffle') AS INTEGER) AS match_pos
FROM documents
WHERE regexp_matches(text, 'shuffle (sort|merge)')
""",
    family=_FAM,
)
def mr_grep(spark, sf_dir):
    """Distributed grep with match position — the canonical MR filter job."""
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike("shuffle (sort|merge)")).select(
        "doc_id", "lang", F.instr("text", "shuffle").cast("int").alias("match_pos")
    )


@query(
    "mr_inverted_index",
    oracle="""
SELECT u.word, list_sort(list_distinct(array_agg(u.doc_id))) AS doc_ids,
       CAST(COUNT(DISTINCT u.doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) u
GROUP BY u.word
ORDER BY u.word
""",
    family=_FAM,
)
def mr_inverted_index(spark, sf_dir):
    """Inverted index: token -> sorted posting list of doc_ids (the shape
    every search engine's index build takes)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.sort_array(F.collect_set("doc_id")).alias("doc_ids"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy("word")
    )


@query(
    "mr_sort",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       ) AS BIGINT) AS global_rank
FROM lineitem
""",
    family=_FAM,
)
def mr_sort(spark, sf_dir):
    """TeraSort analogue: full-table range-partitioned global sort with the
    rank materialized (Spark samples split points exactly like TeraSort's
    partitioner)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice",
        F.row_number().over(w).cast("bigint").alias("global_rank"),
    )


@query(
    "mr_join_agg",
    oracle=f"""
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       COUNT(*) AS n_lineitems,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
ORDER BY n_name, order_year
""",
    family=_FAM,
)
def mr_join_agg(spark, sf_dir):
    """Reduce-side join + aggregate: revenue per nation per year. In MR
    this is two chained jobs (join, then agg) materialized through the
    DFS; here it is one plan — fact shuffles once, dims broadcast."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("n_name", "order_year")
    )
