"""Set operations & exact dedup (SURVEY.md §2.7).

MR heritage: bag union = multiple input dirs to one job; distinct =
identity map + identity reduce. Dedup-by-key uses a deterministic
row_number()=1 formulation instead of dropDuplicates (which keeps an
arbitrary row under parallel execution — a correctness bug at any
scale, invisible in single-threaded tests).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.7 setops/dedup"


def _hi(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_mktsegment")
    )


def _auto(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey", "c_mktsegment")
    )


_HI = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000"
_AUTO = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"


@query("set_union_all", oracle=f"{_HI} UNION ALL {_AUTO}", family=_FAM)
def set_union_all(spark, sf_dir):
    """Bag union (duplicates kept) — MR: one job over two input dirs."""
    return _hi(spark, sf_dir).unionByName(_auto(spark, sf_dir))


@query("set_union_distinct", oracle=f"{_HI} UNION {_AUTO}", family=_FAM)
def set_union_distinct(spark, sf_dir):
    """Set union (duplicates collapsed)."""
    return _hi(spark, sf_dir).unionByName(_auto(spark, sf_dir)).distinct()


@query("set_intersect", oracle=f"{_HI} INTERSECT {_AUTO}", family=_FAM)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics in both engines)."""
    return _hi(spark, sf_dir).intersect(_auto(spark, sf_dir))


@query("set_except", oracle=f"{_HI} EXCEPT ALL {_AUTO}", family=_FAM)
def set_except(spark, sf_dir):
    """EXCEPT ALL (bag difference)."""
    return _hi(spark, sf_dir).exceptAll(_auto(spark, sf_dir))


@query(
    "dedup_exact_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity AS INTEGER) AS qty
FROM lineitem
""",
    family=_FAM,
)
def dedup_exact_rows(spark, sf_dir):
    """Whole-row distinct — planned as a hash aggregate, so it gets the
    map-side partial dedup (combiner) for free."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", F.col("l_quantity").cast("int").alias("qty")
    ).distinct()


@query(
    "dedup_by_key",
    oracle="""
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
""",
    family=_FAM,
)
def dedup_by_key(spark, sf_dir):
    """Keep the latest event per user — deterministic row_number()=1 with a
    total-order tiebreaker (dropDuplicates is nondeterministic under
    parallelism; never use it where results are checked)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


@query(
    "sample_hash_stratified",
    oracle="""
WITH tagged AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM tagged
WHERE bucket < 10
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def sample_hash_stratified(spark, sf_dir):
    """Deterministic ~10% sample per language stratum via content-hash
    bucketing (md5(doc_id) mod 100 < 10) — the reproducible alternative
    to rand()-based sample() that training pipelines need: the same doc
    is in or out of the sample on every run, on every cluster layout,
    with no seed-plus-partitioning fragility. The summary per stratum is
    oracle-checked; md5 is the hash because both engines implement it
    identically (xxhash64 is Spark-only)."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


@query(
    "etl_upsert_merge",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS total
  FROM orders GROUP BY o_custkey
),
upd AS (SELECT o_custkey AS custkey, 'VIP' AS new_segment
        FROM spend WHERE total > 1500000),
merged AS (
  SELECT c.c_custkey,
         COALESCE(u.new_segment, c.c_mktsegment) AS segment,
         (u.custkey IS NOT NULL) AS updated
  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.custkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (WHERE updated) AS BIGINT) AS n_updated
FROM merged GROUP BY segment ORDER BY segment
""",
    family=_FAM,
)
def etl_upsert_merge(spark, sf_dir):
    """MERGE/upsert expressed relationally (no table format needed): a
    deterministic change set (customers whose lifetime spend crosses a
    threshold become 'VIP') is applied to the base table as
    outer-join + coalesce — the CDC-apply shape. WHEN MATCHED UPDATE is
    the coalesce, WHEN NOT MATCHED KEEP is the left join's null side; at
    100 TB the change set is the small side and broadcasts, so the base
    table never shuffles — the same property a format-native MERGE
    needs a join rewrite to get."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    upd = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("total"))
        .filter(F.col("total") > 1500000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("VIP").alias("new_segment"))
    )
    merged = c.join(F.broadcast(upd), c.c_custkey == upd.custkey, "left").select(
        F.coalesce("new_segment", "c_mktsegment").alias("segment"),
        F.col("custkey").isNotNull().alias("updated"),
    )
    return (
        merged.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.count_if(F.col("updated")).cast("bigint").alias("n_updated"),
        )
        .orderBy("segment")
    )


@query(
    "set_union_by_name",
    oracle="""
WITH v1 AS (SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
            FROM documents WHERE source = 'src0'),
v2 AS (SELECT doc_id, lang, n_chars FROM documents WHERE source = 'src1')
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
GROUP BY lang ORDER BY lang
""",
    family=_FAM,
)
def set_union_by_name(spark, sf_dir):
    """Schema-drift union: `unionByName(allowMissingColumns=True)` aligns
    columns BY NAME and null-fills the missing ones — where positional
    UNION ALL silently mismatches columns when two extracts evolved
    apart (the classic multi-source ingestion bug: same column count,
    different order, no error, garbage data). The null-fill is pinned by
    counting the populated column per language."""
    d = table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("source") == "src0").select("doc_id", "lang")
    v2 = d.filter(F.col("source") == "src1").select("n_chars", "doc_id", "lang")
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count("n_chars").cast("bigint").alias("n_with_chars"),
        )
        .orderBy("lang")
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT l_suppkey, l_returnflag
FROM lineitem WHERE l_quantity <= 25
INTERSECT ALL
SELECT l_suppkey, l_returnflag
FROM lineitem WHERE l_quantity >= 20
""",
    family=_FAM,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection keeping min(m, n) copies of
    each duplicated row (SURVEY.md §2.7). The two sides overlap on the
    20..25 quantity band, so genuine multiplicities survive: `intersect`
    (distinct semantics) would collapse them, which is why this is a
    separate surface. Physically one hash shuffle on the full row, same
    as the MR identity-map/count-min-reduce formulation."""
    li = table(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_quantity") <= 25).select("l_suppkey", "l_returnflag")
    hi = li.filter(F.col("l_quantity") >= 20).select("l_suppkey", "l_returnflag")
    return lo.intersectAll(hi)


@query(
    "etl_scd2",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL
                   OR prev_type <> event_type THEN 1 ELSE 0 END AS brk
  FROM e
),
versioned AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS version
  FROM flagged
),
spans AS (
  SELECT user_id, event_type, version,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM versioned GROUP BY user_id, event_type, version
)
SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL)
         AS is_current,
       CAST(n_events AS BIGINT) AS n_events
FROM spans
""",
    family=_FAM,
)
def etl_scd2(spark, sf_dir):
    """Slowly-changing-dimension type 2 build: collapse each user's
    event-type run-lengths into versioned validity intervals
    [valid_from, valid_to) with an is_current marker — the dimension-
    table ETL pattern (Kimball SCD2) expressed as gaps-and-islands:
    lag() change flags -> running-sum version ids -> per-version span
    aggregate -> lead() to close each interval.

    Scale: every window and the aggregate share ONE hash partitioning
    on user_id, so the whole build is a single shuffle however wide the
    history; no self-joins, no driver state. Timestamps leave as
    formatted strings so the hash compare is byte-stable."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("brk"),
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    spans = versioned.groupBy("user_id", "event_type", "version").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from").over(wv)
    return spans.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@query(
    "sample_weighted_priority",
    oracle="""
WITH pr AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':wsample'),
                              1, 8)) AS BIGINT) AS h
  FROM orders
)
SELECT o_orderkey, w_cents,
       CAST(w_cents * 4294967296 // (h + 1) AS BIGINT) AS priority
FROM pr
ORDER BY priority DESC, o_orderkey ASC
LIMIT 64
""",
    family=_FAM,
    tags=("ordered",),
)
def sample_weighted_priority(spark, sf_dir):
    """Weighted sample of 64 orders via priority sampling (Duffield-
    Lund-Thorup): each row draws u ~ U(0,1) from the md5 coin and gets
    priority w/u, and the global top-64 priorities form the sample —
    high-weight rows enter with probability ~min(1, w/threshold), the
    weighted-sampling scheme whose subset-sum estimates are provably
    near-optimal. All arithmetic is integer-exact and engine-portable:
    w in cents (the 2-dp money column is exact), u as a 32-bit md5
    uniform, priority = w_cents * 2^32 DIV (h+1) -- max ~2.4e17, inside
    int64, no libm and no float division anywhere (raw ln()/pow()
    priorities would be a cross-engine ulp hazard).

    Scale: the plan is TakeOrderedAndProject — each partition keeps its
    own top-64 and only 64 rows per partition reach the driver-side
    merge; no global sort, no single-partition stage, at any corpus
    size."""
    o = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":wsample"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    pr = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("w_cents"),
        h.alias("h"),
    )
    return (
        pr.select(
            "o_orderkey",
            "w_cents",
            F.expr("CAST(w_cents * 4294967296 DIV (h + 1) AS BIGINT)").alias(
                "priority"
            ),
        )
        .orderBy(F.col("priority").desc(), F.col("o_orderkey").asc())
        .limit(64)
    )


@query(
    "dq_constraint_audit",
    oracle="""
WITH checks AS (
  SELECT 'orders_fk_customer' AS check_name,
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_violations,
         (SELECT COUNT(*) FROM orders) AS n_checked
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'customer_pk_unique',
         (SELECT COALESCE(SUM(cnt - 1), 0) FROM
            (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey) g
          WHERE cnt > 1),
         (SELECT COUNT(*) FROM customer)
  UNION ALL
  SELECT 'lineitem_qty_range',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'lineitem_discount_range',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders_total_nonneg',
         (SELECT COUNT(*) FROM orders
          WHERE o_totalprice IS NULL OR o_totalprice < 0),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'events_value_notnull',
         (SELECT COUNT(*) FROM events WHERE value IS NULL),
         (SELECT COUNT(*) FROM events)
)
SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_checked AS BIGINT) AS n_checked,
       n_violations = 0 AS passed
FROM checks ORDER BY check_name
""",
    family=_FAM,
)
def dq_constraint_audit(spark, sf_dir):
    """Data-quality constraint audit — the pre-ingest gate every
    production training-data pipeline runs before a snapshot is blessed:
    referential integrity (FK orphans via LEFT-join-null probes, which
    Catalyst plans as the same shuffle as a dedicated anti-join),
    primary-key uniqueness (excess-row count per duplicated key), range
    and null checks. One summary row per constraint.

    Scale: each check is a single filter+aggregate or equi-join over one
    pass of its table (no per-check re-scan of anything wide; counts are
    map-side partial-aggregated). The seven checks are independent jobs
    unioned into a 7-row frame — at 100 TB a scheduler runs them
    concurrently; nothing here collects rows to the driver."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    def check(name, violations_df, checked_df):
        return (
            violations_df.agg(F.count("*").alias("n_violations"))
            .crossJoin(
                F.broadcast(checked_df.agg(F.count("*").alias("n_checked")))
            )
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_violations").cast("bigint").alias("n_violations"),
                F.col("n_checked").cast("bigint").alias("n_checked"),
                (F.col("n_violations") == 0).alias("passed"),
            )
        )

    fk_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    )
    fk_li = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    pk_dupes = (
        cust.groupBy("c_custkey").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_violations"))
        .crossJoin(F.broadcast(cust.agg(F.count("*").alias("n_checked"))))
        .select(
            F.lit("customer_pk_unique").alias("check_name"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
    qty_bad = li.filter(
        F.col("l_quantity").isNull()
        | (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    )
    disc_bad = li.filter(
        F.col("l_discount").isNull()
        | (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
    )
    total_bad = orders.filter(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") < 0)
    )
    val_null = ev.filter(F.col("value").isNull())
    out = (
        check("orders_fk_customer", fk_orders, orders)
        .unionAll(check("lineitem_fk_orders", fk_li, li))
        .unionAll(pk_dupes)
        .unionAll(check("lineitem_qty_range", qty_bad, li))
        .unionAll(check("lineitem_discount_range", disc_bad, li))
        .unionAll(check("orders_total_nonneg", total_bad, orders))
        .unionAll(check("events_value_notnull", val_null, ev))
    )
    return out.orderBy("check_name")


@query(
    "dq_freshness_lag",
    oracle="""
WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS global_max FROM events),
per AS (
  SELECT event_type, max(CAST(ts AS TIMESTAMP)) AS last_seen, COUNT(*) AS n
  FROM events GROUP BY event_type
)
SELECT p.event_type, p.last_seen, CAST(p.n AS BIGINT) AS n,
       CAST(floor((epoch(m.global_max) - epoch(p.last_seen)) / 60) AS BIGINT)
         AS lag_minutes,
       floor((epoch(m.global_max) - epoch(p.last_seen)) / 60) > 1440 AS stale
FROM per p CROSS JOIN mx m
ORDER BY p.event_type
""",
    family=_FAM,
)
def dq_freshness_lag(spark, sf_dir):
    """Per-feed freshness monitor — the pipeline-health check every
    ingest dashboard leads with: how far behind the most recent event
    does each feed's newest record sit? A feed lagging > 24 h is
    flagged stale (a dead producer shows up here long before volume
    alarms fire). Two combiner-shape MAX aggregates and one scalar
    broadcast — the cheapest query in the DQ family, which is the
    point: it runs every few minutes in production."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("global_max"))
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"), F.count("*").cast("bigint").alias("n")
    )
    lag_min = F.floor(
        (F.unix_timestamp("global_max") - F.unix_timestamp("last_seen")) / 60
    ).cast("bigint")
    return (
        per.crossJoin(F.broadcast(mx))
        .select(
            "event_type", "last_seen", "n",
            lag_min.alias("lag_minutes"),
            (lag_min > 1440).alias("stale"),
        )
        .orderBy("event_type")
    )


@query(
    "etl_cdc_apply",
    oracle="""
WITH changes AS (
  -- synthetic ordered change stream over orders: every 3rd key updates
  -- its price by +10.00 (one exact IEEE add — round(x*1.1) would hit
  -- engine-specific half-tie rounding), every 7th deletes
  SELECT o_orderkey AS key, o_custkey, o_totalprice + 10.0 AS price,
         'U' AS op
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 != 0
  UNION ALL
  SELECT o_orderkey, o_custkey, NULL, 'D' FROM orders WHERE o_orderkey % 7 = 0
),
applied AS (
  SELECT b.o_orderkey AS key,
         COALESCE(c.op, 'K') AS final_op,
         CASE WHEN c.op = 'U' THEN c.price ELSE b.o_totalprice END AS price
  FROM orders b LEFT JOIN changes c ON b.o_orderkey = c.key
)
SELECT final_op,
       CAST(COUNT(*) AS BIGINT) AS n,
       (CAST(CAST(SUM(CAST(price AS DECIMAL(38,8))) * 100000000 AS DECIMAL(38,0)) AS DOUBLE) / 100000000.0) AS total_price
FROM applied
WHERE final_op != 'D'
GROUP BY final_op
ORDER BY final_op
""",
    family=_FAM,
)
def etl_cdc_apply(spark, sf_dir):
    """CDC change-stream application — the Debezium-consumer / lakehouse
    MERGE shape: an ordered stream of upserts and deletes applied to a
    base snapshot, summarized by disposition (K kept untouched, U
    updated) over the surviving rows. Update rows override base values,
    delete keys drop out; the audit aggregate proves the application
    was exactly-once per key (a double-applied update or an unapplied
    delete shifts the decimal-exact totals and fails the hash).

    Scale: one equi-join of base to changes on the key (the change
    stream is normally <<1%% of base — AQE build-sides it; unhinted
    here so either side may grow), then a combiner-shape aggregate.
    Per-key ordering within a real stream collapses to last-write-wins
    before the join — etl_upsert_merge covers that window; this op
    covers the apply+audit."""
    o = table(spark, sf_dir, "orders")
    upd = o.filter(
        ((F.col("o_orderkey") % 3) == 0) & ((F.col("o_orderkey") % 7) != 0)
    ).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice") + 10.0).alias("new_price"),
        F.lit("U").alias("op"),
    )
    dele = o.filter((F.col("o_orderkey") % 7) == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("double").alias("new_price"),
        F.lit("D").alias("op"),
    )
    changes = upd.unionAll(dele)
    from hdfs_mr_spark.exprs import dsum

    applied = (
        o.join(changes, o.o_orderkey == changes.key, "left")
        .select(
            F.coalesce(F.col("op"), F.lit("K")).alias("final_op"),
            F.when(F.col("op") == "U", F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
        .filter(F.col("final_op") != "D")
    )
    return (
        applied.groupBy("final_op")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dsum(F.col("price")).alias("total_price"),
        )
        .orderBy("final_op")
    )


@query(
    "etl_snapshot_diff",
    oracle="""
WITH snap2 AS (
  -- deterministic second snapshot: every 5th customer changes segment,
  -- every 11th is removed, and 10 synthetic keys are added
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer WHERE c_custkey % 11 != 0
  UNION ALL
  SELECT 1000000 + r.r, 'new#' || CAST(1000000 + r.r AS VARCHAR), 'NEW'
  FROM (SELECT unnest(range(0, 10)) AS r) r
)
SELECT CASE WHEN a.c_custkey IS NULL THEN 'added'
            WHEN b.c_custkey IS NULL THEN 'removed'
            WHEN a.c_mktsegment != b.c_mktsegment THEN 'changed'
            ELSE 'unchanged' END AS diff_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer a FULL OUTER JOIN snap2 b ON a.c_custkey = b.c_custkey
GROUP BY 1
ORDER BY 1
""",
    family=_FAM,
)
def etl_snapshot_diff(spark, sf_dir):
    """Table snapshot diff — the regression gate between two versions of
    a dataset (yesterday's blessed snapshot vs today's candidate):
    FULL OUTER join on the key classifies every row as
    added / removed / changed / unchanged, and the count-by-class
    summary is what a publish pipeline thresholds on ("refuse to ship
    if >0.5%% of rows changed"). Column-level comparison here is the
    segment column; widening to a struct-equality mask is a projection
    change, not a plan change.

    Scale: ONE full-outer sort-merge join on the key + a combiner
    aggregate — at 100 TB this is strictly cheaper than the
    hash-the-whole-table alternative (mr_merkle_checksum) when you need
    to know WHICH rows moved, not just whether any did."""
    c = table(spark, sf_dir, "customer")
    changed_seg = F.when(
        (F.col("c_custkey") % 5) == 0, F.lit("CHANGED")
    ).otherwise(F.col("c_mktsegment"))
    kept = c.filter((F.col("c_custkey") % 11) != 0).select(
        "c_custkey", "c_name", changed_seg.alias("c_mktsegment")
    )
    added = spark.range(10).select(
        (F.lit(1000000) + F.col("id")).alias("c_custkey"),
        F.concat(F.lit("new#"), (F.lit(1000000) + F.col("id")).cast("string"))
        .alias("c_name"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    snap2 = kept.unionAll(added)
    a = c.select(
        F.col("c_custkey").alias("key_a"), F.col("c_mktsegment").alias("seg_a")
    )
    b = snap2.select(
        F.col("c_custkey").alias("key_b"), F.col("c_mktsegment").alias("seg_b")
    )
    diff_type = (
        F.when(F.col("key_a").isNull(), "added")
        .when(F.col("key_b").isNull(), "removed")
        .when(F.col("seg_a") != F.col("seg_b"), "changed")
        .otherwise("unchanged")
    )
    return (
        a.join(b, F.col("key_a") == F.col("key_b"), "full_outer")
        .select(diff_type.alias("diff_type"))
        .groupBy("diff_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("diff_type")
    )


@query(
    "etl_scd2_asof",
    oracle="""
SELECT user_id,
       arg_max(event_type,
               printf('%020d#%010d', epoch_us(CAST(ts AS TIMESTAMP)), event_id))
         AS state_at,
       strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS since,
       CAST(COUNT(*) AS BIGINT) AS n_events_before
FROM events
WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
GROUP BY user_id
ORDER BY user_id
""",
    family=_FAM,
)
def etl_scd2_asof(spark, sf_dir):
    """Point-in-time (AS OF) dimension lookup — the consumer side of the
    SCD2 build: what state was each user in at the snapshot instant
    T = 2024-01-15? One combiner-shape aggregate per user: max_by picks
    the latest event at-or-before T ((ts, event_id) tiebreak makes it
    total), with the since-timestamp and how much history preceded the
    snapshot. The time predicate pushes to the scan, so a partitioned
    history table prunes everything after T before any shuffle — this
    is why the as-of aggregate beats joining the materialized interval
    table when you need ONE instant (the intervals win when you need
    many)."""
    ev = table(spark, sf_dir, "events")
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        ev.filter(F.col("ts") <= t)
        .groupBy("user_id")
        .agg(
            # composite key as a zero-padded string: lexicographic order
            # == (ts, event_id) order, and BOTH engines' arg_max/max_by
            # accept it (DuckDB 1.x arg_max has no struct-key overload)
            F.max_by(
                "event_type",
                F.format_string(
                    "%020d#%010d", F.unix_micros("ts"), F.col("event_id")
                ),
            ).alias("state_at"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("since"),
            F.count("*").cast("bigint").alias("n_events_before"),
        )
        .orderBy("user_id")
    )


_PROFILE_COLS = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
)


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        mn = f"CAST(MIN({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_val, {mx} AS max_val FROM orders"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


@query("dq_profile_columns", oracle=_profile_oracle(), family=_FAM)
def dq_profile_columns(spark, sf_dir):
    """Column-level data profiling (the ANALYZE TABLE / data-catalog
    summary every ingestion pipeline runs before anything else): one
    row per column with row count, null count, exact distinct count,
    and numeric min/max (NULL for non-numeric columns).

    Plan: ONE scan — every per-column statistic is an aggregate over
    the same pass, so Catalyst plans a single Aggregate (the multi
    COUNT(DISTINCT) triggers one Expand of x|cols| rows, the standard
    exact-multi-distinct shape also used by agg_multi_distinct), and
    the single result row is exploded into the per-column frame by an
    inline array-of-structs — no per-column re-scan, no driver loop.
    At 100 TB the exact distincts swap for approx_count_distinct's HLL
    (agg_approx_distinct documents the contract), collapsing the
    Expand back to one combiner pass; null/min/max stats are free
    either way."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, numeric in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    one = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            (F.col(f"mn_{c}") if numeric else null_d).alias("min_val"),
            (F.col(f"mx_{c}") if numeric else null_d).alias("max_val"),
        )
        for c, numeric in _PROFILE_COLS
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


@query(
    "etl_orphan_repair",
    oracle="""
WITH probe AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
         (p.p_partkey IS NOT NULL) AS fk_ok
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
),
repaired AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN fk_ok THEN l_partkey ELSE -1 END AS part_fk,
         fk_ok
  FROM probe
)
SELECT (CASE WHEN fk_ok THEN 'kept' ELSE 'repaired' END) AS disposition,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(part_fk) AS BIGINT) AS fk_checksum,
       CAST(COUNT(DISTINCT part_fk) AS BIGINT) AS n_distinct_fk
FROM repaired
GROUP BY disposition
ORDER BY disposition
""",
    family=_FAM,
)
def etl_orphan_repair(spark, sf_dir):
    """Referential-integrity REPAIR (the action after
    dq_constraint_audit's detection): fact rows whose part FK has no
    dimension row are remapped to the sentinel dimension (-1, the
    Kimball 'unknown member' row) instead of being dropped — dropping
    facts silently corrupts additive measures downstream, remapping
    preserves totals while isolating the breakage. The disposition
    summary (counts + FK checksum per outcome) is the audit row a
    backfill job logs; this fixture has no orphans, so the 'repaired'
    arm proves itself by absence against the oracle (the CASE and the
    checksum still execute per row).

    Plan: one LEFT probe join against the dimension (broadcast when it
    fits, the usual dim-join shape) and one combiner-shape aggregate.
    At 100 TB the probe is the same join the fact load already does —
    repair costs one CASE."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey")
    probe = li.select("l_orderkey", "l_linenumber", "l_partkey").join(
        p, li.l_partkey == p.p_partkey, "left"
    )
    repaired = probe.select(
        F.when(F.col("p_partkey").isNotNull(), F.col("l_partkey"))
        .otherwise(F.lit(-1).cast("bigint"))
        .alias("part_fk"),
        F.col("p_partkey").isNotNull().alias("fk_ok"),
    )
    return (
        repaired.groupBy(
            F.when(F.col("fk_ok"), F.lit("kept"))
            .otherwise(F.lit("repaired"))
            .alias("disposition")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("part_fk").cast("bigint").alias("fk_checksum"),
            F.countDistinct("part_fk").alias("n_distinct_fk"),
        )
        .orderBy("disposition")
    )


@query(
    "etl_view_maintenance",
    oracle="""
WITH base AS (
  SELECT user_id, event_type,
         COUNT(*) AS n, SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events WHERE event_id % 10 <> 0
  GROUP BY user_id, event_type
),
delta AS (
  SELECT user_id, event_type,
         COUNT(*) AS n, SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events WHERE event_id % 10 = 0
  GROUP BY user_id, event_type
),
merged AS (
  SELECT COALESCE(b.user_id, d.user_id) AS user_id,
         COALESCE(b.event_type, d.event_type) AS event_type,
         COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
         COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS cents
  FROM base b FULL OUTER JOIN delta d
    ON b.user_id = d.user_id AND b.event_type = d.event_type
),
full_recompute AS (
  SELECT user_id, event_type,
         COUNT(*) AS n, SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, event_type
)
SELECT m.user_id, m.event_type, CAST(m.n AS BIGINT) AS n,
       CAST(m.cents AS DOUBLE) / 100.0 AS total_value,
       (m.n = f.n AND m.cents = f.cents) AS matches_recompute
FROM merged m
JOIN full_recompute f
  ON f.user_id = m.user_id AND f.event_type = m.event_type
ORDER BY m.user_id, m.event_type
""",
    family=_FAM,
)
def etl_view_maintenance(spark, sf_dir):
    """Incremental materialized-view maintenance — the warehouse
    pattern that makes aggregates affordable at 100 TB: the base
    aggregate (90% of events) absorbs an insert delta (the other 10%)
    by MERGING partial states (count and integer-cents sum are
    self-mergeable monoids — the same property that makes them
    combiner-shape), instead of recomputing over the full fact table.
    Every output row also carries `matches_recompute`, the inline
    self-audit comparing merged state against the ground-truth full
    recompute — the invariant a production maintenance job asserts
    before publishing. Exact integers make it a bit-equality, not a
    tolerance.

    Plan: two combiner-shape aggregates (each scans only its slice —
    the delta predicate is pushed to the scan), one FULL OUTER merge
    join on the group key, and the audit join; at scale the recompute
    arm drops out (it exists here to PROVE the merge) and maintenance
    cost is O(delta) + one state-table join. AVG/stddev maintain the
    same way via (sum, count, sum-of-squares) partials; MIN/MAX only
    under insert-only deltas; exact distinct needs the bitmap
    (agg_bitmap_distinct) or HLL state — noted for the op's contract."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")

    def agg_slice(df):
        return df.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n"), F.sum(cents).alias("cents")
        )

    base = agg_slice(e.filter(F.col("event_id") % 10 != 0)).select(
        F.col("user_id").alias("bu"), F.col("event_type").alias("bt"),
        F.col("n").alias("bn"), F.col("cents").alias("bc"),
    )
    delta = agg_slice(e.filter(F.col("event_id") % 10 == 0)).select(
        F.col("user_id").alias("du"), F.col("event_type").alias("dt"),
        F.col("n").alias("dn"), F.col("cents").alias("dc"),
    )
    merged = base.join(
        delta, (F.col("bu") == F.col("du")) & (F.col("bt") == F.col("dt")), "full"
    ).select(
        F.coalesce(F.col("bu"), F.col("du")).alias("user_id"),
        F.coalesce(F.col("bt"), F.col("dt")).alias("event_type"),
        (F.coalesce(F.col("bn"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        (F.coalesce(F.col("bc"), F.lit(0)) + F.coalesce(F.col("dc"), F.lit(0))).alias("cents"),
    )
    full = agg_slice(e).select(
        F.col("user_id").alias("fu"), F.col("event_type").alias("ft"),
        F.col("n").alias("fn"), F.col("cents").alias("fc"),
    )
    return (
        merged.join(
            full,
            (F.col("user_id") == F.col("fu")) & (F.col("event_type") == F.col("ft")),
        )
        .select(
            "user_id", "event_type",
            F.col("n").cast("bigint").alias("n"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias("total_value"),
            ((F.col("n") == F.col("fn")) & (F.col("cents") == F.col("fc"))).alias(
                "matches_recompute"
            ),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "set_except_all",
    oracle="""
SELECT l_suppkey, l_returnflag
FROM lineitem WHERE l_quantity <= 25
EXCEPT ALL
SELECT l_suppkey, l_returnflag
FROM lineitem WHERE l_quantity >= 20
""",
    family=_FAM,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference keeping max(m − n, 0) copies of
    each duplicated row, set_intersect_all's sibling and the last of
    the bag-semantics set ops: the overlapping 20..25 quantity band
    makes the subtraction arithmetic (not just membership) observable,
    which plain EXCEPT's distinct semantics would erase. Physically the
    same single hash shuffle on the full row — count per row on each
    side, emit the positive count difference."""
    li = table(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_quantity") <= 25).select("l_suppkey", "l_returnflag")
    hi = li.filter(F.col("l_quantity") >= 20).select("l_suppkey", "l_returnflag")
    return lo.exceptAll(hi)


@query(
    "etl_bitemporal_asof",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         o_orderdate AS valid_from,
         o_orderdate AS tx_ts
  FROM orders
),
v2 AS (  -- correction recorded 10 days later for every 7th order:
         -- priority re-stated retroactively (same valid_from)
  SELECT o_orderkey, '1-URGENT' AS prio,
         o_orderdate AS valid_from,
         o_orderdate + INTERVAL 10 DAY AS tx_ts
  FROM orders WHERE o_orderkey % 7 = 0
),
versions AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
picked AS (
  SELECT o_orderkey, prio, valid_from, tx_ts,
         row_number() OVER (
           PARTITION BY o_orderkey
           ORDER BY tx_ts DESC, prio ASC) AS rn
  FROM versions
  WHERE valid_from <= TIMESTAMP '1996-12-31 00:00:00'
    AND tx_ts     <= TIMESTAMP '1996-06-30 00:00:00'
)
SELECT prio AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM picked WHERE rn = 1
GROUP BY prio
ORDER BY prio
""",
    family=_FAM,
)
def etl_bitemporal_asof(spark, sf_dir):
    """BITEMPORAL as-of query — the two-axis time-travel read every
    audited warehouse needs (etl_scd2_asof tracks ONE time axis; real
    ledgers track two): each row versions on VALID time (when the fact
    was true) and TRANSACTION time (when the system learned it), and
    the query answers "what did we believe on tx-date T about the
    state as of valid-date V" — corrections recorded after T are
    invisible even though they restate earlier valid time. Versions
    are synthesized deterministically (every 7th order gets a
    retroactive priority correction recorded 10 days later), the
    as-of pick is one row_number window per key over the
    two-predicate-filtered version set, and the bitemporal filters are
    plain pushable range predicates — at 100 TB they prune partitions
    before the window sees a row."""
    o = table(spark, sf_dir, "orders")
    v1 = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderdate").alias("tx_ts"),
    )
    v2 = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("1-URGENT").alias("prio"),
        F.col("o_orderdate").alias("valid_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAYS")).alias("tx_ts"),
    )
    versions = v1.unionByName(v2)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("tx_ts").desc(), F.col("prio").asc()
    )
    asof = (
        versions.filter(
            (F.col("valid_from") <= F.lit("1996-12-31 00:00:00").cast("timestamp"))
            & (F.col("tx_ts") <= F.lit("1996-06-30 00:00:00").cast("timestamp"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        asof.groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "etl_fk_inference",
    oracle="""
WITH pairs AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS rel,
         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS child_distinct,
         (SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l
          WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders)) AS contained
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT COUNT(DISTINCT o_custkey) FROM orders),
         (SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
          WHERE o.o_custkey IN (SELECT c_custkey FROM customer))
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
         (SELECT COUNT(DISTINCT l.l_partkey) FROM lineitem l
          WHERE l.l_partkey IN (SELECT p_partkey FROM part))
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey',
         (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
         (SELECT COUNT(DISTINCT c.c_nationkey) FROM customer c
          WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation))
  UNION ALL
  SELECT 'orders.o_orderkey->customer.c_custkey',
         (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
         (SELECT COUNT(DISTINCT o.o_orderkey) FROM orders o
          WHERE o.o_orderkey IN (SELECT c_custkey FROM customer))
)
SELECT rel,
       CAST(child_distinct AS BIGINT) AS child_distinct,
       CAST(contained AS BIGINT) AS contained,
       CAST(contained * 10000 // child_distinct AS BIGINT)
         AS containment_bp,
       contained = child_distinct AS is_fk_candidate
FROM pairs ORDER BY rel
""",
    family=_FAM,
)
def etl_fk_inference(spark, sf_dir):
    """FOREIGN-KEY INFERENCE by inclusion-dependency scoring — the
    schema-discovery pass a pipeline runs over an undocumented data
    dump: for each candidate (child column -> parent column) pair,
    containment = |distinct(child) ∩ parent| / |distinct(child)|; a
    containment of 100% flags an FK candidate. Four true edges of the
    TPC-H graph score 1.0; a deliberately-wrong pair
    (o_orderkey -> c_custkey) scores low, pinning that the measure
    actually discriminates rather than saturating.

    Scale: each pair is distinct-project (combiner collapse to key
    cardinality) + a broadcast/shuffle SEMI-join count — never a full
    row join; the five probes are independent unioned jobs. At 100 TB
    the distinct-project is the whole cost, and it is exactly the
    statistics a catalog crawler materializes anyway. Integer
    basis-point ratio (contained * 10000 DIV child_distinct) keeps the
    score hash-exact."""
    probes = [
        ("lineitem.l_orderkey->orders.o_orderkey",
         table(spark, sf_dir, "lineitem").select(
             F.col("l_orderkey").alias("k")),
         table(spark, sf_dir, "orders").select(
             F.col("o_orderkey").alias("k"))),
        ("orders.o_custkey->customer.c_custkey",
         table(spark, sf_dir, "orders").select(
             F.col("o_custkey").alias("k")),
         table(spark, sf_dir, "customer").select(
             F.col("c_custkey").alias("k"))),
        ("lineitem.l_partkey->part.p_partkey",
         table(spark, sf_dir, "lineitem").select(
             F.col("l_partkey").alias("k")),
         table(spark, sf_dir, "part").select(
             F.col("p_partkey").alias("k"))),
        ("customer.c_nationkey->nation.n_nationkey",
         table(spark, sf_dir, "customer").select(
             F.col("c_nationkey").alias("k")),
         table(spark, sf_dir, "nation").select(
             F.col("n_nationkey").alias("k"))),
        ("orders.o_orderkey->customer.c_custkey",
         table(spark, sf_dir, "orders").select(
             F.col("o_orderkey").alias("k")),
         table(spark, sf_dir, "customer").select(
             F.col("c_custkey").alias("k"))),
    ]
    frames = []
    for rel, child, parent in probes:
        # r15-opt (guide §2.4): one pass instead of two — the semi-join
        # count and the distinct count consumed ck twice, re-running the
        # corpus-sized distinct-project per consumer (plan: 70 Exchanges /
        # 30 scans across the 5 probes). A left join against the distinct
        # parent keys yields BOTH counts from a single scan of ck:
        # count(*) is the child cardinality, count(hit) the contained
        # subset (parent is distinct, so the join cannot duplicate rows).
        ck = child.distinct()
        stats = ck.join(
            parent.distinct().withColumn("hit", F.lit(1)), "k", "left"
        ).agg(
            F.count("*").alias("child_distinct"),
            F.count("hit").alias("contained"),
        )
        frames.append(stats.select(
            F.lit(rel).alias("rel"),
            F.col("child_distinct").cast("bigint").alias("child_distinct"),
            F.col("contained").cast("bigint").alias("contained"),
            F.expr("CAST(contained * 10000 DIV child_distinct AS BIGINT)")
            .alias("containment_bp"),
            (F.col("contained") == F.col("child_distinct"))
            .alias("is_fk_candidate"),
        ))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("rel")


@query(
    "dq_reconcile_totals",
    oracle="""
WITH li AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
             * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS derived_e4
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) * 10000 AS stated_e4,
         li.derived_e4
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
),
b AS (
  SELECT CASE WHEN derived_e4 = stated_e4 THEN 'match'
              WHEN derived_e4 > stated_e4 THEN 'derived_over'
              ELSE 'derived_under' END AS bucket,
         derived_e4 - stated_e4 AS drift_e4
  FROM j
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(drift_e4) AS BIGINT) AS total_drift_e4,
       CAST(MAX(abs(drift_e4)) AS BIGINT) AS max_abs_drift_e4
FROM b
GROUP BY bucket
ORDER BY bucket
""",
    family=_FAM,
)
def dq_reconcile_totals(spark, sf_dir):
    """CROSS-TABLE RECONCILIATION — the financial-closing audit every
    warehouse runs: each order's stated o_totalprice against the total
    DERIVED from its own lineitems, sum(extendedprice * (1-discount) *
    (1+tax)), bucketed match / derived_over / derived_under with drift
    totals. The arithmetic is EXACT integers end-to-end: prices ride
    cents, discount/tax ride integer percent, so the derived total is
    a BIGINT in 10^-4-cent units and 'match' means bit-equal, not
    within-epsilon — the only way a reconciliation verdict is itself
    auditable (a float pipeline would classify boundary rows
    differently per engine and per run).

    Scale: one combiner aggregate over lineitem (map-side partial sums
    of the per-row products), one equi-join against orders on the
    order key, one 3-row rollup. At 100 TB this is a single shuffle on
    l_orderkey — the same plan as TPC-H Q18's large-order scan."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
            * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("bigint"))
        ).alias("derived_e4")
    )
    j = o.select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("bigint") * 10000)
        .alias("stated_e4"),
    ).join(derived, o.o_orderkey == derived.l_orderkey)
    drift = F.col("derived_e4") - F.col("stated_e4")
    return (
        j.select(
            F.when(drift == 0, "match")
            .when(drift > 0, "derived_over")
            .otherwise("derived_under").alias("bucket"),
            drift.alias("drift_e4"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("drift_e4").cast("bigint").alias("total_drift_e4"),
            F.max(F.abs(F.col("drift_e4"))).cast("bigint")
            .alias("max_abs_drift_e4"),
        )
        .orderBy("bucket")
    )


_KANON_K = 5
# generalization ladder: level -> the quasi-identifier tuple, coarsening
# left to right (acctbal 1000-band drops first, then nation coarsens to
# a 5-nation block, then only the segment remains)
_KANON_LEVELS = [
    ("nationkey,mktsegment,acctbal_band",
     "c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)"),
    ("nationkey,mktsegment", "c_nationkey, c_mktsegment"),
    ("nation_block,mktsegment", "c_nationkey // 5, c_mktsegment"),
    ("mktsegment", "c_mktsegment"),
]


@query(
    "dq_k_anonymity",
    oracle=f"""
WITH
{", ".join(
    f'''g{i} AS (
  SELECT COUNT(*) AS cnt FROM customer GROUP BY {cols}
),
l{i} AS (
  SELECT {i} AS level, '{name}' AS quasi_ids,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(MIN(cnt) AS BIGINT) AS min_group_size,
         CAST(SUM(CASE WHEN cnt < {_KANON_K} THEN cnt ELSE 0 END) AS BIGINT)
           AS rows_suppressed,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM g{i}
)'''
    for i, (name, cols) in enumerate(_KANON_LEVELS)
)}
SELECT level, quasi_ids, n_groups, min_group_size, rows_suppressed,
       CAST(10000 * rows_suppressed // n_rows AS BIGINT)
         AS suppressed_bp,
       min_group_size >= {_KANON_K} AS k_anonymous
FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
      UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
ORDER BY level
""",
    family=_FAM,
)
def dq_k_anonymity(spark, sf_dir):
    """K-ANONYMITY audit over a GENERALIZATION LADDER (r11 — the
    privacy-governance gate a training-data pipeline runs before
    releasing user-derived tables, a different axis from PII regex
    redaction: llm_pii_redact removes direct identifiers; this op
    measures whether QUASI-identifier combinations re-identify): at
    each of four generalization levels (full (nation, segment,
    balance-band) down to segment-only), every equivalence class's
    size is checked against k={_KANON_K}; classes below k would be
    suppressed, and the per-level report — group count, minimum class
    size, rows suppressed (absolute and basis points), and the
    k-anonymous verdict — is exactly the table a data-release review
    reads to pick the coarsest acceptable level. All counts are exact
    integers; the verdict column is a pure comparison, so the whole
    governance artifact hash-checks.

    Scale: each level is ONE combiner-shape aggregate (the group-by is
    the quasi-identifier tuple) followed by a level-summary aggregate
    over group counts — 4 passes that share the scan under Spark's
    union; no row-level data leaves the executors, only class-size
    histograms, which is itself the privacy-correct telemetry shape."""
    c = table(spark, sf_dir, "customer")
    level_exprs = [
        [F.col("c_nationkey"), F.col("c_mktsegment"),
         F.floor(F.col("c_acctbal") / 1000).cast("bigint")],
        [F.col("c_nationkey"), F.col("c_mktsegment")],
        [F.expr("c_nationkey DIV 5"), F.col("c_mktsegment")],
        [F.col("c_mktsegment")],
    ]
    frames = []
    for i, ((name, _), cols) in enumerate(zip(_KANON_LEVELS, level_exprs)):
        g = c.groupBy(*cols).agg(F.count("*").alias("cnt"))
        frames.append(g.agg(
            F.lit(i).alias("level"),
            F.lit(name).alias("quasi_ids"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.min("cnt").cast("bigint").alias("min_group_size"),
            F.sum(F.when(F.col("cnt") < _KANON_K, F.col("cnt"))
                  .otherwise(0)).cast("bigint").alias("rows_suppressed"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
        ))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "level", "quasi_ids", "n_groups", "min_group_size",
        "rows_suppressed",
        F.expr("10000 * rows_suppressed DIV n_rows").cast("bigint")
        .alias("suppressed_bp"),
        (F.col("min_group_size") >= _KANON_K).alias("k_anonymous"),
    ).orderBy("level")


_LDIV_L = 4
_LDIV_LEVELS = [
    ("nationkey,mktsegment", "c_nationkey, c_mktsegment"),
    ("nation_block,mktsegment", "c_nationkey // 5, c_mktsegment"),
    ("nationkey", "c_nationkey"),
    ("mktsegment", "c_mktsegment"),
]
# sensitive attribute: the account-balance bracket (income proxy) —
# NEVER part of the quasi-identifier ladder here, that's the point
_LDIV_SENS_SQL = "CAST(floor(c_acctbal / 2000) AS BIGINT)"


@query(
    "dq_l_diversity",
    oracle=f"""
WITH
{", ".join(
    f'''g{i} AS (
  SELECT COUNT(DISTINCT {_LDIV_SENS_SQL}) AS ldist, COUNT(*) AS cnt
  FROM customer GROUP BY {cols}
),
l{i} AS (
  SELECT {i} AS level, '{name}' AS quasi_ids,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(MIN(ldist) AS BIGINT) AS min_distinct,
         CAST(SUM(CASE WHEN ldist < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_below_l,
         CAST(SUM(CASE WHEN ldist < {_LDIV_L} THEN cnt ELSE 0 END) AS BIGINT)
           AS rows_at_risk,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM g{i}
)'''
    for i, (name, cols) in enumerate(_LDIV_LEVELS)
)}
SELECT level, quasi_ids, n_groups, min_distinct, groups_below_l,
       rows_at_risk,
       CAST(10000 * rows_at_risk // n_rows AS BIGINT) AS at_risk_bp,
       min_distinct >= {_LDIV_L} AS l_diverse
FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
      UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
ORDER BY level
""",
    family=_FAM,
)
def dq_l_diversity(spark, sf_dir):
    """L-DIVERSITY audit over dq_k_anonymity's generalization ladder
    (r12 — VERDICT r11 item 7, the companion gate every privacy review
    asks for right after k): k-anonymity bounds CLASS SIZE but a class
    of 50 people who all share one sensitive value still leaks it
    (homogeneity attack — Machanavajjhala et al., ICDE 2006). Here
    each equivalence class at each of four generalization levels must
    contain >= l={_LDIV_L} DISTINCT values of the sensitive attribute
    (l tuned so the finest level FAILS at the checked SFs while the
    coarser levels pass — both verdict branches fire, the r10
    dead-branch lesson)
    (the account-balance bracket, an income proxy deliberately absent
    from every quasi-identifier level). The per-level report — class
    count, minimum distinct-sensitive count, classes below l, rows in
    those classes (absolute and basis points), and the l-diverse
    verdict — is the release-review table: pick the coarsest level
    whose verdict holds. All counts exact; the verdict is a pure
    comparison, so the governance artifact hash-checks.

    Scale: each level is one combiner-shape aggregate keyed on the
    quasi-identifier tuple (COUNT(DISTINCT sensitive) over a BOUNDED
    ~6-value domain plans as a two-phase partial-distinct — no row
    explosion), then a level summary over class histograms; 4 passes
    share the scan under the union, and only class-level counts leave
    the executors — the privacy-correct telemetry shape."""
    c = table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    level_exprs = [
        [F.col("c_nationkey"), F.col("c_mktsegment")],
        [F.expr("c_nationkey DIV 5"), F.col("c_mktsegment")],
        [F.col("c_nationkey")],
        [F.col("c_mktsegment")],
    ]
    frames = []
    for i, ((name, _), cols) in enumerate(zip(_LDIV_LEVELS, level_exprs)):
        g = c.groupBy(*cols).agg(
            F.countDistinct(sens).alias("ldist"),
            F.count("*").alias("cnt"),
        )
        frames.append(g.agg(
            F.lit(i).alias("level"),
            F.lit(name).alias("quasi_ids"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.min("ldist").cast("bigint").alias("min_distinct"),
            F.sum(F.when(F.col("ldist") < _LDIV_L, 1).otherwise(0))
            .cast("bigint").alias("groups_below_l"),
            F.sum(F.when(F.col("ldist") < _LDIV_L, F.col("cnt"))
                  .otherwise(0)).cast("bigint").alias("rows_at_risk"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
        ))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "level", "quasi_ids", "n_groups", "min_distinct",
        "groups_below_l", "rows_at_risk",
        F.expr("10000 * rows_at_risk DIV n_rows").cast("bigint")
        .alias("at_risk_bp"),
        (F.col("min_distinct") >= _LDIV_L).alias("l_diverse"),
    ).orderBy("level")


_TCLOSE_T_PPM = 50000  # t = 0.05 in parts-per-million


def _tclose_level_sql(i: int, name: str, qexpr: str) -> str:
    """One generalization level's EMD pipeline as DuckDB CTEs (the
    UNION ALL replay shape dq_k_anonymity/dq_l_diversity established).
    HUGEINT cross-multiplication mirrors the Spark DECIMAL(38,0)
    promotion exactly."""
    exprs = [e.strip() for e in qexpr.split(",")]
    sel = ", ".join(f"{e} AS q{j}" for j, e in enumerate(exprs))
    qc = ", ".join(f"q{j}" for j in range(len(exprs)))
    joincond = " AND ".join(
        f"c.q{j} = k.q{j}" for j in range(len(exprs))
    )
    t = _TCLOSE_T_PPM
    return f"""
base{i} AS (SELECT {sel}, {_LDIV_SENS_SQL} AS s FROM customer),
gdist{i} AS (SELECT s, COUNT(*) AS g_cnt FROM base{i} GROUP BY s),
gcum{i} AS (
  SELECT s, SUM(g_cnt) OVER (ORDER BY s) AS cum_g,
         (SELECT COUNT(*) FROM base{i}) AS n_total,
         (SELECT COUNT(*) FROM gdist{i}) AS m
  FROM gdist{i}
),
keys{i} AS (SELECT {qc}, COUNT(*) AS n_cls FROM base{i} GROUP BY {qc}),
cls{i} AS (SELECT {qc}, s, COUNT(*) AS c_cnt FROM base{i} GROUP BY {qc}, s),
dense{i} AS (
  SELECT k.*, g.s, g.cum_g, g.n_total, g.m, COALESCE(c.c_cnt, 0) AS c_cnt
  FROM keys{i} k CROSS JOIN gcum{i} g
  LEFT JOIN cls{i} c ON c.s = g.s AND {joincond}
),
cum{i} AS (
  SELECT *, SUM(c_cnt) OVER (PARTITION BY {qc} ORDER BY s) AS cum_c
  FROM dense{i}
),
emd{i} AS (
  SELECT {qc}, ANY_VALUE(n_cls) AS n_cls, ANY_VALUE(m) AS m,
         ANY_VALUE(n_total) AS n_total,
         SUM(ABS(CAST(cum_c AS HUGEINT) * n_total
                 - CAST(cum_g AS HUGEINT) * n_cls)) AS num
  FROM cum{i} GROUP BY {qc}
),
scored{i} AS (
  SELECT n_cls,
         CAST(num * 1000000 // ((m - 1) * n_cls * n_total) AS BIGINT)
           AS emd_ppm
  FROM emd{i}
),
lvl{i} AS (
  SELECT {i} AS level, '{name}' AS quasi_ids,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(MAX(emd_ppm) AS BIGINT) AS max_emd_ppm,
         CAST(SUM(CASE WHEN emd_ppm > {t} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_above_t,
         CAST(SUM(CASE WHEN emd_ppm > {t} THEN n_cls ELSE 0 END)
              AS BIGINT) AS rows_at_risk,
         CAST(SUM(n_cls) AS BIGINT) AS n_rows
  FROM scored{i}
)"""


@query(
    "dq_t_closeness",
    oracle="WITH " + ",".join(
        _tclose_level_sql(i, name, qexpr)
        for i, (name, qexpr) in enumerate(_LDIV_LEVELS)
    ) + "\n" + "\nUNION ALL\n".join(
        f"""SELECT level, quasi_ids, n_groups, max_emd_ppm,
       groups_above_t, rows_at_risk,
       CAST(10000 * rows_at_risk // n_rows AS BIGINT) AS at_risk_bp,
       max_emd_ppm <= {_TCLOSE_T_PPM} AS t_close
FROM lvl{i}"""
        for i in range(len(_LDIV_LEVELS))
    ) + "\nORDER BY level",
    family=_FAM,
)
def dq_t_closeness(spark, sf_dir):
    """T-CLOSENESS audit over the k-anonymity generalization ladder
    (r12 — completes the release-gate triple: k bounds class SIZE
    [dq_k_anonymity], l bounds sensitive-value VARIETY
    [dq_l_diversity], t bounds sensitive-value DISTRIBUTION SKEW —
    Li, Li & Venkatasubramanian, ICDE 2007: an l-diverse class whose
    values are 99% one bracket still leaks; the class's sensitive
    distribution must stay CLOSE to the table-wide one). For the
    ordered sensitive attribute (the same account-balance bracket,
    absent from every quasi-identifier level) closeness is the Earth
    Mover's Distance, which for ordered categories reduces to the
    mean absolute difference of cumulative distributions:
    EMD = (1/(m-1)) * sum_i |CumP_i - CumQ_i|. Computed EXACTLY in
    integers: per class, |cum_c * n_total - cum_g * n_cls| summed in
    DECIMAL(38,0) (DuckDB: HUGEINT — the agg_gini promotion), scaled
    to parts-per-million by integer division, so the governance
    artifact hash-checks. t = 0.05 (50000 ppm) is tuned so the finest
    level FAILS at the checked SFs while the coarsest passes — both
    verdict branches fire (the r10 dead-branch lesson): at sf0.01
    levels 0-2 fail / 3 passes; at sf0.1 level 0 fails / 1-3 pass.

    Scale: per level, three combiner aggregates over the shared scan
    (global bracket histogram, class sizes, class x bracket counts),
    a 6-row broadcast of the global cumulative onto the class keys
    (dense bracket fill — classes MISSING a bracket still accumulate
    its global mass, which is exactly what the homogeneity leak looks
    like), a class-partitioned cumulative window, and one class-level
    fold. The global-cumulative window runs on the m<=6-row bracket
    frame only — never on row-scale data. Only class-level counts
    leave the executors."""
    c = table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    # r15-opt NOTE: materializing the shared 3-column projection once
    # (the 80-Exchange/32-scan plan suspicion) was A/B-REFUTED — 2.48/2.52
    # base vs 3.86/3.09 dirty; the re-expanded subtrees are cheap
    # projections the runtime already shares, and the barrier serialized
    # 12 otherwise-overlapping jobs. Left lazy.
    level_exprs = [
        [F.col("c_nationkey"), F.col("c_mktsegment")],
        [F.expr("c_nationkey DIV 5"), F.col("c_mktsegment")],
        [F.col("c_nationkey")],
        [F.col("c_mktsegment")],
    ]
    t = _TCLOSE_T_PPM
    frames = []
    for i, ((name, _), cols) in enumerate(zip(_LDIV_LEVELS, level_exprs)):
        qc = [f"q{j}" for j in range(len(cols))]
        base = c.select(
            *[e.alias(q) for e, q in zip(cols, qc)], sens.alias("s")
        )
        gdist = base.groupBy("s").agg(F.count("*").alias("g_cnt"))
        tot = gdist.agg(F.sum("g_cnt").alias("n_total"),
                        F.count("*").alias("m"))
        gcum = (
            gdist
            .withColumn("cum_g",
                        F.sum("g_cnt").over(Window.orderBy("s")))
            .crossJoin(F.broadcast(tot))
            .select("s", "cum_g", "n_total", "m")
        )
        keys = base.groupBy(*qc).agg(F.count("*").alias("n_cls"))
        cls = base.groupBy(*qc, "s").agg(F.count("*").alias("c_cnt"))
        dense = (
            keys.crossJoin(F.broadcast(gcum))
            .join(cls, [*qc, "s"], "left")
            .withColumn("c_cnt", F.coalesce("c_cnt", F.lit(0)))
        )
        cum = dense.withColumn(
            "cum_c",
            F.sum("c_cnt").over(Window.partitionBy(*qc).orderBy("s")),
        )
        emd = cum.groupBy(*qc).agg(
            F.first("n_cls").alias("n_cls"),
            F.first("m").alias("m"),
            F.first("n_total").alias("n_total"),
            F.sum(F.abs(
                F.col("cum_c").cast("decimal(38,0)") * F.col("n_total")
                - F.col("cum_g").cast("decimal(38,0)") * F.col("n_cls")
            )).alias("num"),
        )
        scored = emd.select(
            "n_cls",
            F.expr(
                "CAST(num * 1000000 DIV (CAST(m - 1 AS DECIMAL(38,0))"
                " * n_cls * n_total) AS BIGINT)"
            ).alias("emd_ppm"),
        )
        frames.append(scored.agg(
            F.lit(i).alias("level"),
            F.lit(name).alias("quasi_ids"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.max("emd_ppm").cast("bigint").alias("max_emd_ppm"),
            F.sum(F.when(F.col("emd_ppm") > t, 1).otherwise(0))
            .cast("bigint").alias("groups_above_t"),
            F.sum(F.when(F.col("emd_ppm") > t, F.col("n_cls"))
                  .otherwise(0)).cast("bigint").alias("rows_at_risk"),
            F.sum("n_cls").cast("bigint").alias("n_rows"),
        ))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "level", "quasi_ids", "n_groups", "max_emd_ppm",
        "groups_above_t", "rows_at_risk",
        F.expr("10000 * rows_at_risk DIV n_rows").cast("bigint")
        .alias("at_risk_bp"),
        (F.col("max_emd_ppm") <= t).alias("t_close"),
    ).orderBy("level")


@query(
    "dq_completeness_grid",
    oracle="""
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events
),
calendar AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS d
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
expected AS (SELECT d, event_type FROM calendar CROSS JOIN types),
arrived AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, event_type
  FROM events WHERE value > 300
),
j AS (
  SELECT e.event_type, e.d, a.d IS NOT NULL AS got
  FROM expected e
  LEFT JOIN arrived a ON a.d = e.d AND a.event_type = e.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS expected_days,
       CAST(SUM(CASE WHEN got THEN 1 ELSE 0 END) AS BIGINT)
         AS arrived_days,
       CAST(SUM(CASE WHEN got THEN 0 ELSE 1 END) AS BIGINT)
         AS missing_days,
       CAST(10000 * SUM(CASE WHEN got THEN 1 ELSE 0 END) // COUNT(*)
            AS BIGINT) AS completeness_bp,
       MIN(CASE WHEN NOT got THEN d END) AS first_missing_day,
       SUM(CASE WHEN got THEN 0 ELSE 1 END) = 0 AS sla_met
FROM j
GROUP BY event_type
ORDER BY event_type
""",
    family=_FAM,
)
def dq_completeness_grid(spark, sf_dir):
    """PARTITION-COMPLETENESS SLA audit (r12 — the 'did every source
    deliver every day?' gate that pages on-call before any consumer
    notices, complementing dq_freshness_lag's HOW-LATE with
    DID-IT-ARRIVE-AT-ALL): the EXPECTED grid is generated, not
    observed — a dense calendar spanning the table's own date bounds
    crossed with the live event-type dimension — so a day that
    delivered NOTHING still appears as a hole (deriving expectations
    from arrivals is the classic completeness bug: total silence looks
    complete). The monitored feed is the high-value slice
    (value > 300), genuinely partial at the checked SFs so both
    verdict branches fire; per type the report pins expected/arrived/
    missing day counts, completeness basis points, the FIRST missing
    day (where backfill starts), and the SLA verdict.

    Scale: the grid is |days| x |types| — metadata-sized however big
    the fact table is; arrival detection is one distinct combiner over
    the feed; the join is a broadcast of the grid. At 100 TB this
    reads the lake's partition METADATA instead of scanning rows —
    same plan shape, zero data IO."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    )
    types = ev.select("event_type").distinct()
    expected = F.broadcast(calendar.crossJoin(types))
    arrived = (
        ev.filter(F.col("value") > 300)
        .select(F.to_date("ts").alias("d"), "event_type")
        .distinct()
        .withColumn("got", F.lit(True))
    )
    j = expected.join(arrived, ["d", "event_type"], "left").select(
        "event_type", "d", F.coalesce("got", F.lit(False)).alias("got")
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("expected_days"),
            F.sum(F.col("got").cast("int")).cast("bigint")
            .alias("arrived_days"),
            F.sum((~F.col("got")).cast("int")).cast("bigint")
            .alias("missing_days"),
            F.expr(
                "CAST(10000 * SUM(CAST(got AS INT)) DIV COUNT(*)"
                " AS BIGINT)"
            ).alias("completeness_bp"),
            F.min(F.when(~F.col("got"), F.col("d")))
            .alias("first_missing_day"),
            (F.sum((~F.col("got")).cast("int")) == 0).alias("sla_met"),
        )
        .orderBy("event_type")
    )


@query(
    "etl_surrogate_key_assign",
    oracle="""
WITH dim AS (
  SELECT s_name AS nk,
         row_number() OVER (ORDER BY s_suppkey) AS sk
  FROM supplier WHERE s_suppkey % 4 <> 0
),
incoming AS (SELECT DISTINCT s_name AS nk FROM supplier),
novel AS (
  SELECT i.nk FROM incoming i ANTI JOIN dim d ON d.nk = i.nk
),
assigned AS (
  SELECT nk, sk, FALSE AS is_new FROM dim
  UNION ALL
  SELECT nk,
         (SELECT MAX(sk) FROM dim)
           + row_number() OVER (ORDER BY nk) AS sk,
         TRUE AS is_new
  FROM novel
)
SELECT nk, CAST(sk AS BIGINT) AS sk, is_new
FROM assigned
ORDER BY sk
""",
    family=_FAM,
)
def etl_surrogate_key_assign(spark, sf_dir):
    """SURROGATE-KEY ASSIGNMENT for dimension loads (r12 — the
    warehouse primitive every Kimball pipeline runs nightly: incoming
    natural keys that already exist keep their surrogate key; NOVEL
    keys get max(existing)+dense sequence — WITHOUT a database
    sequence, which does not exist on a data lake and would serialize
    the load if it did). The existing dimension is the suppliers with
    suppkey % 4 != 0 (so every 4th supplier arrives as genuinely new —
    both branches fire at every SF); new keys are ordered by natural
    key for a deterministic, gap-free assignment. The key invariants
    the oracle hash pins: existing keys keep their sk (stability),
    new sks start exactly at max+1 with no gaps and no collisions
    (ORDER BY sk in the output would expose either), and is_new
    partitions the dimension exactly.

    Scale: one anti-join to find novel members (broadcast of the
    incoming key set or the dim key set, whichever is smaller), one
    1-row max broadcast, one window over the NOVEL frame only — the
    window never sees the full dimension, so the single-partition
    cost is bounded by the batch's new-member count (the thing that
    is small by definition in a dimension load); at larger novel
    batches the same plan swaps to the sort_global bucketed-rank
    idiom."""
    s = table(spark, sf_dir, "supplier")
    dim = (
        s.filter(F.col("s_suppkey") % 4 != 0)
        .select(
            F.col("s_name").alias("nk"),
            F.row_number().over(
                Window.orderBy("s_suppkey")
            ).cast("bigint").alias("sk"),
        )
    ).localCheckpoint()
    incoming = s.select(F.col("s_name").alias("nk")).distinct()
    novel = incoming.join(dim.select("nk"), "nk", "left_anti")
    mx = dim.agg(F.max("sk").alias("mx"))
    assigned_new = (
        novel.crossJoin(F.broadcast(mx))
        .select(
            "nk",
            (F.col("mx") + F.row_number().over(Window.orderBy("nk")))
            .cast("bigint").alias("sk"),
            F.lit(True).alias("is_new"),
        )
    )
    return (
        dim.select("nk", "sk", F.lit(False).alias("is_new"))
        .unionByName(assigned_new)
        .orderBy("sk")
    )


@query(
    "etl_late_arriving_dim",
    oracle="""
WITH dim0 AS (
  SELECT c_custkey AS nk,
         row_number() OVER (ORDER BY c_custkey) AS sk,
         c_mktsegment AS seg
  FROM customer WHERE c_custkey % 5 <> 0
),
facts AS (
  SELECT o_custkey AS nk,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
unseen AS (
  SELECT DISTINCT f.nk FROM facts f ANTI JOIN dim0 d ON d.nk = f.nk
),
inferred AS (
  SELECT nk,
         (SELECT MAX(sk) FROM dim0) + row_number() OVER (ORDER BY nk) AS sk
  FROM unseen
),
dim1 AS (
  SELECT nk, sk, seg, FALSE AS inferred FROM dim0
  UNION ALL
  SELECT nk, sk, NULL AS seg, TRUE AS inferred FROM inferred
),
fact_sk AS (
  SELECT d.sk, COUNT(*) AS n_orders, SUM(f.cents) AS cents
  FROM facts f JOIN dim1 d ON d.nk = f.nk
  GROUP BY d.sk
),
late AS (
  SELECT c_custkey AS nk, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 5 = 0
),
healed AS (
  SELECT d.nk, d.sk, l.seg, TRUE AS was_inferred
  FROM dim1 d JOIN late l ON l.nk = d.nk
  WHERE d.inferred
),
late_new AS (
  SELECT l.nk,
         (SELECT MAX(sk) FROM dim1)
           + row_number() OVER (ORDER BY l.nk) AS sk,
         l.seg, FALSE AS was_inferred
  FROM late l ANTI JOIN dim1 d ON d.nk = l.nk
),
dim2 AS (
  SELECT nk, sk, seg, FALSE AS was_inferred FROM dim0
  UNION ALL SELECT nk, sk, seg, was_inferred FROM healed
  UNION ALL SELECT nk, sk, seg, was_inferred FROM late_new
)
SELECT d.seg AS c_mktsegment, d.was_inferred,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(d.sk) AS BIGINT) AS sk_sum,
       CAST(SUM(COALESCE(f.n_orders, 0)) AS BIGINT) AS n_orders,
       CAST(SUM(COALESCE(f.cents, 0)) AS BIGINT) AS cents
FROM dim2 d LEFT JOIN fact_sk f ON f.sk = d.sk
GROUP BY d.seg, d.was_inferred
ORDER BY c_mktsegment, was_inferred
""",
    family=_FAM,
)
def etl_late_arriving_dim(spark, sf_dir):
    """LATE-ARRIVING DIMENSION (inferred members) — the Kimball
    pattern the sentinel repair (etl_orphan_repair) and the surrogate
    assigner (etl_surrogate_key_assign) bracket but neither covers
    (r13): when a fact references a dimension member whose row hasn't
    landed yet, the load CREATES an INFERRED placeholder (real
    surrogate key, natural key carried, attributes NULL, inferred
    flag) so the fact keys to a real sk immediately — no -1 sentinel,
    no dropped fact, no reload later. When the member's true row
    finally arrives, it HEALS the placeholder IN PLACE (type-1 update:
    attributes filled, sk UNCHANGED — facts never rekey), while
    late-batch members nobody referenced yet get fresh surrogate keys
    past the current max (both late-batch branches fire at every SF:
    referenced %5==0 customers heal, unreferenced ones are new).

    Fixture: the dimension loads customers with custkey % 5 != 0; the
    withheld 20% arrive late. The oracle hash pins exactly the
    invariants that make the pattern safe: sk_sum per (segment,
    was_inferred) group proves healing preserved every inferred sk (a
    rekey shifts mass between groups), n_orders/cents prove facts
    keyed once at arrival stay correctly joined through the heal, and
    the was_inferred split partitions the final dimension.

    Scale: the initial dim0 sk load is a one-time dimension build
    (dimension-sized, the etl_surrogate_key_assign precedent); every
    per-load window after it runs over NOVEL frames only (unseen FKs,
    unreferenced late members), fact keying is the dim join the load
    already does, healing is a dim-sized join — no fact-table rewrite
    anywhere, which is the entire point of the pattern at 100 TB."""
    c = table(spark, sf_dir, "customer")
    dim0 = (
        c.filter(F.col("c_custkey") % 5 != 0)
        .select(
            F.col("c_custkey").alias("nk"),
            F.row_number().over(Window.orderBy("c_custkey"))
            .cast("bigint").alias("sk"),
            F.col("c_mktsegment").alias("seg"),
        )
        .localCheckpoint()
    )
    facts = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("nk"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    unseen = (
        facts.select("nk").distinct()
        .join(dim0.select("nk"), "nk", "left_anti")
    )
    mx0 = dim0.agg(F.max("sk").alias("mx"))
    inferred = (
        unseen.crossJoin(F.broadcast(mx0))
        .select(
            "nk",
            (F.col("mx") + F.row_number().over(Window.orderBy("nk")))
            .cast("bigint").alias("sk"),
            F.lit(None).cast("string").alias("seg"),
            F.lit(True).alias("inferred"),
        )
    )
    dim1 = (
        dim0.select("nk", "sk", "seg", F.lit(False).alias("inferred"))
        .unionByName(inferred)
        .localCheckpoint()
    )
    fact_sk = (
        facts.join(dim1.select("nk", "sk"), "nk")
        .groupBy("sk")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
    )
    late = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    healed = (
        dim1.filter("inferred")
        .drop("seg")
        .join(late, "nk")
        .select("nk", "sk", "seg", F.lit(True).alias("was_inferred"))
    )
    mx1 = dim1.agg(F.max("sk").alias("mx"))
    late_new = (
        late.join(dim1.select("nk"), "nk", "left_anti")
        .crossJoin(F.broadcast(mx1))
        .select(
            "nk",
            (F.col("mx") + F.row_number().over(Window.orderBy("nk")))
            .cast("bigint").alias("sk"),
            "seg",
            F.lit(False).alias("was_inferred"),
        )
    )
    dim2 = (
        dim0.select("nk", "sk", "seg", F.lit(False).alias("was_inferred"))
        .unionByName(healed)
        .unionByName(late_new)
    )
    return (
        dim2.join(fact_sk, "sk", "left")
        .groupBy(F.col("seg").alias("c_mktsegment"), "was_inferred")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("sk").cast("bigint").alias("sk_sum"),
            F.sum(F.coalesce(F.col("n_orders"), F.lit(0)))
            .cast("bigint").alias("n_orders"),
            F.sum(F.coalesce(F.col("cents"), F.lit(0)))
            .cast("bigint").alias("cents"),
        )
        .orderBy("c_mktsegment", "was_inferred")
    )
