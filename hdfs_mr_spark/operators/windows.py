"""Window functions (SURVEY.md §2.5).

The MR analogue is the "secondary sort" idiom (partition by key, sort
values in the reducer); Spark's WindowExec is that idiom as a first-
class operator: one shuffle on the partition key, one in-partition
sort, then a streaming frame evaluation. Per-group top-k additionally
benefits from the WindowGroupLimit rule (Spark 3.5+/4.x) which pushes
the k-limit below the shuffle.

Determinism: every ordered window carries a total-order tiebreaker;
rank-family queries that exercise *ties* never project row_number.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark.exprs import DEC
from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.5 windows"


@query(
    "win_row_number",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(row_number() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
       ) AS BIGINT) AS seq
FROM orders
""",
    family=_FAM,
)
def win_row_number(spark, sf_dir):
    """Order sequence within each customer (total order => deterministic)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@query(
    "win_rank",
    oracle="""
SELECT o_orderpriority, o_orderkey, price_bucket,
       CAST(rank()        OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()  OVER w AS BIGINT) AS drnk,
       percent_rank()     OVER w AS prnk,
       cume_dist()        OVER w AS cdist,
       CAST(ntile(4)      OVER w AS BIGINT) AS quartile
FROM (SELECT o_orderpriority, o_orderkey,
             CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket
      FROM orders)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_bucket DESC, o_orderkey ASC)
""",
    family=_FAM,
)
def win_rank(spark, sf_dir):
    """rank/dense_rank/percent_rank/cume_dist/ntile over a tie-prone
    bucketed ordering (ties are the interesting case for rank family;
    o_orderkey tiebreak keeps ntile deterministic)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("price_bucket"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("price_bucket").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderpriority", "o_orderkey", "price_bucket",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT user_id, event_id, ts,
       lag(ts)  OVER w AS prev_ts,
       lead(ts) OVER w AS next_ts,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    family=_FAM,
)
def win_lag_lead(spark, sf_dir):
    """Per-user event inter-arrival via lag/lead; the gap is integer
    microseconds so the comparison is exact."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id", "event_id", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
""",
    family=_FAM,
)
def win_running_sum(spark, sf_dir):
    """Cumulative spend per customer — decimal-exact inside the frame, so
    the running values hash-match despite double inputs."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(38,8))) OVER w5 AS DOUBLE)
         / COUNT(*) OVER w5 AS avg_last5,
       CAST(SUM(CAST(value AS DECIMAL(38,8))) OVER wr AS DOUBLE)
         / COUNT(*) OVER wr AS avg_last_hour
FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
WINDOW
  w5 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
  wr AS (PARTITION BY user_id ORDER BY ts_us ASC
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    family=_FAM,
)
def win_moving_avg(spark, sf_dir):
    """Sliding mean two ways: last-5-rows frame and one-hour RANGE frame
    over the epoch — time-series smoothing (decimal-exact numerators)."""
    ev = table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w5 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, Window.currentRow)
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(-3600_000_000, Window.currentRow)
    )
    vdec = F.col("value").cast(DEC)
    return ev.select(
        "user_id", "event_id", "ts",
        (F.sum(vdec).over(w5).cast("double") / F.count("*").over(w5)).alias("avg_last5"),
        (F.sum(vdec).over(wr).cast("double") / F.count("*").over(wr)).alias("avg_last_hour"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER w AS last_order,
       first_value(o_orderdate) OVER w AS first_date,
       last_value(o_orderdate)  OVER w AS last_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    family=_FAM,
)
def win_first_last(spark, sf_dir):
    """first_value/last_value with an explicit unbounded frame (the default
    frame would make last_value just the current row — classic footgun)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.first("o_orderdate").over(w).alias("first_date"),
        F.last("o_orderdate").over(w).alias("last_date"),
    )


@query(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
) <= 3
""",
    family=_FAM,
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — the classic MR secondary-sort job.
    Spark's WindowGroupLimit pushes the <=3 below the shuffle, so each
    map task forwards at most 3 rows per group."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "ts_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT CAST(time_bucket(INTERVAL '1 hour', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS lo,
         CAST(time_bucket(INTERVAL '1 hour', MAX(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
),
hourly AS (
  SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
         COUNT(*) AS n,
         (CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) * 100000000
               AS DECIMAL(38,0)) AS DOUBLE) / 100000000.0) AS total_value
  FROM events GROUP BY 1
)
SELECT s.hour,
       COALESCE(h.n, 0) AS n,
       COALESCE(h.total_value, 0.0) AS total_value,
       (h.hour IS NULL) AS gap_filled
FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
ORDER BY s.hour
""",
    family=_FAM,
)
def ts_gap_fill(spark, sf_dir):
    """Time-series resample with gap filling (the hypertable-rollup
    shape): hourly aggregate of events left-joined onto a dense hour
    spine spanning [min, max], empty buckets filled with zeros and
    flagged. The spine is generated with sequence()+explode from a
    2-row bounds aggregate — at 100 TB the spine is still tiny (hours
    in range) and broadcasts; the only big-data pass is the one
    hourly groupBy."""
    from hdfs_mr_spark.exprs import dsum

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    return (
        spine.join(hourly.withColumnRenamed("hour", "h_hour"),
                   spine.hour == F.col("h_hour"), "left")
        .select(
            "hour",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            F.col("h_hour").isNull().alias("gap_filled"),
        )
        .orderBy("hour")
    )


@query(
    "win_sessionize",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, event_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(us) AS start_us, MAX(us) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    family=_FAM,
)
def win_sessionize(spark, sf_dir):
    """Batch sessionization via gaps-and-islands: lag() flags a session
    break after a 30-minute silence, a running sum of flags numbers the
    sessions, one aggregate summarizes each — the window-function
    formulation of what streaming does with session_window
    (stream_session), useful for backfills over historical data. One
    shuffle on user_id shared by both windows and the final aggregate."""
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.when(
        F.lag("us").over(w).isNull()
        | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
        1,
    ).otherwise(0)
    sess = e.withColumn(
        "session_id",
        F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey, day_no,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_30d,
       CAST(SUM(price_cents) OVER w AS DOUBLE) / 100.0 AS trailing_30d_spend
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day_no,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
    family=_FAM,
)
def win_range_frame(spark, sf_dir):
    """RANGE frame (vs the ROWS frames elsewhere): trailing 30-day spend
    per customer — the frame is bounded by the ORDER-BY *value*, so all
    orders on the same day share one frame regardless of row order
    (deterministic without a tiebreaker, unlike ROWS). Money sums ride
    integer cents (exact, order-independent); the day number is an
    integer offset from a fixed epoch because Spark range frames need a
    numeric sort key."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("day_no"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_custkey", "o_orderkey", "day_no",
        F.count("*").over(w).cast("bigint").alias("n_trailing_30d"),
        (F.sum("price_cents").over(w).cast("double") / 100.0).alias("trailing_30d_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "win_ntile",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       NTILE(4)      OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
""",
    family=_FAM,
)
def win_ntile(spark, sf_dir):
    """Distribution window family: NTILE quartiles, PERCENT_RANK and
    CUME_DIST per market segment — the score-normalization shape every
    quality-ranking pipeline needs (e.g. keep the top quartile of
    documents per source). The window order carries c_custkey as a
    total-order tiebreaker so equal balances can't flip ranks between
    runs or engines; percent_rank/cume_dist are single IEEE divisions
    of the same two integers on both engines, hence bit-exact. Scales
    as one hash-partition shuffle on the segment key; no global sort."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    )
    return (
        table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy(F.col("c_mktsegment"), F.col("c_acctbal").desc(), F.col("c_custkey"))
    )


@query(
    "ts_resample_ohlc",
    oracle="""
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
    family=_FAM,
)
def ts_resample_ohlc(spark, sf_dir):
    """Time-series downsampling to hourly OHLC bars (open/high/low/close
    per event type) — the canonical resample every metrics store runs.
    Open/close are picked by a ROW_NUMBER over (ts, event_id) — the
    event_id tiebreaker makes same-microsecond ticks deterministic on
    both engines, where a naive first()/last() is partition-order-
    dependent and silently nondeterministic on any parallel engine.
    High/low/count are plain min/max (no summation-order exposure). At
    100 TB this is one hash shuffle on (type, hour); the two window
    ranks and the aggregate share the same partitioning, so Catalyst
    plans a single exchange."""
    ev = table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts")).alias("bucket")
    base = ev.select("event_type", bucket, "value", "ts", "event_id")
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        ranked.groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "ts_funnel",
    oracle="""
WITH stage1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
stage2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN stage1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1
  GROUP BY e.user_id
),
stage3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN stage2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM stage1) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM stage2) AS BIGINT) AS n_clicked_after,
       CAST((SELECT COUNT(*) FROM stage3) AS BIGINT) AS n_purchased_after
""",
    family=_FAM,
)
def ts_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase, strictly
    increasing timestamps per user) — the canonical product-analytics
    event query. Each stage is the MIN event time AFTER the previous
    stage's time, so the result is a pure function of the event set
    (no window-order luck); MIN makes timestamp ties harmless. Three
    stage joins all hash-partition on user_id — one logical shuffle
    key end to end, so AQE coalesces this into a short chain of
    co-partitioned joins, never a global sort. The funnel shrinks at
    every stage, so each successive join's build side is smaller."""
    ev = table(spark, sf_dir, "events")

    def stage(types, prev, tcol):
        e = ev.filter(F.col("event_type") == types)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev.columns[1]))
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = stage("view", None, "t1")
    s2 = stage("click", s1, "t2")
    s3 = stage("purchase", s2, "t3")
    return (
        s1.agg(F.count("*").cast("bigint").alias("n_viewed"))
        .crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_clicked_after")))
        .crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_purchased_after")))
    )


@query(
    "win_nth_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 2) OVER w AS second_order,
       first_value(CASE WHEN o_orderstatus <> 'O' THEN o_totalprice END
                   IGNORE NULLS) OVER w AS first_closed_price,
       lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate ASC, o_orderkey ASC)
         AS prev_or_sentinel
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    family=_FAM,
)
def win_nth_value(spark, sf_dir):
    """nth_value / IGNORE NULLS first_value / lag-with-default — the
    navigation-function corners beyond plain first/last (SURVEY.md §2.5):
    the customer's 2nd-ever order, the first non-open order's price
    (null-skipping scan over an unbounded frame), and lag with an
    explicit sentinel default so the partition head is distinguishable
    from a null value. One shuffle + one sort serves all three frames."""
    o = table(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wlag = Window.partitionBy("o_custkey").orderBy(*ordering)
    closed = F.when(F.col("o_orderstatus") != "O", F.col("o_totalprice"))
    return o.select(
        "o_custkey", "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.first(closed, ignorenulls=True).over(w).alias("first_closed_price"),
        F.lag("o_orderkey", 1, -1).over(wlag).alias("prev_or_sentinel"),
    )


# EWMA weights: round(1e6 * 0.8^k) for lags k = 0..9, frozen as integer
# literals so both engines run pure integer arithmetic — no pow()/exp()
# in the plan (libm rounding differs across engines; PERF.md determinism
# rules). The tail beyond lag 9 carries < 11% total weight for alpha=0.2
# and is dropped on both sides identically.
_EWMA_W = [1000000, 800000, 640000, 512000, 409600,
           327680, 262144, 209715, 167772, 134218]


@query(
    "ts_ewma",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
lagged AS (
  SELECT user_id, event_id, ts,
         {', '.join(f'lag(cents, {k}) OVER w AS c{k}' for k in range(10))}
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_id,
       CAST(({' + '.join(f'COALESCE(c{k} * {w}, 0)' for k, w in enumerate(_EWMA_W))})
            AS DOUBLE)
       / ({' + '.join(f'(CASE WHEN c{k} IS NOT NULL THEN {w} ELSE 0 END)' for k, w in enumerate(_EWMA_W))})
       / 100.0 AS ewma_value
FROM lagged
""",
    family=_FAM,
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average (alpha = 0.2, 10-lag
    truncation) of each user's event values — the time-series smoothing
    primitive behind anomaly baselines. EWMA is a recurrence, which SQL
    windows can't express directly; the truncated expansion
    sum(w_k * x_{{t-k}}) / sum(w_k) turns it into a fixed linear
    combination of lags, renormalized over however many lags exist near
    the partition head (so early rows are exact partial EWMAs, not
    zero-padded).

    Determinism: weights are frozen integer micro-unit literals (no
    runtime pow()), values ride integer cents, so the numerator/
    denominator are exact integers on both engines and the one double
    division at the end is a single IEEE op. Scale: ten lag() calls
    share ONE window sort — one shuffle on user_id, streaming frame
    evaluation, no self-joins."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lags = [F.lag("cents", k).over(w).alias(f"c{k}") for k in range(10)]
    lagged = base.select("user_id", "event_id", *lags)
    num = sum(
        (F.coalesce(F.col(f"c{k}") * wt, F.lit(0)) for k, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    den = sum(
        (F.when(F.col(f"c{k}").isNotNull(), wt).otherwise(0) for k, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    return lagged.select(
        "user_id", "event_id",
        (num.cast("double") / den / 100.0).alias("ewma_value"),
    )


@query(
    "ts_retention_cohort",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CAST(time_bucket(INTERVAL '1 week', CAST(ts AS TIMESTAMP))
                  AS TIMESTAMP)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(time_bucket(INTERVAL '1 week', CAST(ts AS TIMESTAMP))
              AS TIMESTAMP) AS active_week
  FROM events
),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_n FROM firsts GROUP BY cohort_week
)
SELECT f.cohort_week,
       CAST(date_diff('week', f.cohort_week, a.active_week) AS INTEGER)
         AS weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(MIN(cs.cohort_n) AS BIGINT) AS cohort_size,
       CAST(COUNT(*) AS DOUBLE) / MIN(cs.cohort_n) AS retention
FROM firsts f
JOIN activity a ON a.user_id = f.user_id
JOIN cohort_sizes cs ON cs.cohort_week = f.cohort_week
GROUP BY f.cohort_week, date_diff('week', f.cohort_week, a.active_week)
""",
    family=_FAM,
)
def ts_retention_cohort(spark, sf_dir):
    """Cohort retention matrix — the canonical product-analytics rollup:
    users cohorted by first-active week, then for every (cohort, weeks-
    since) cell the fraction of the cohort still active. Three
    aggregations and one join, all hash-partitioned on user_id /
    cohort_week; the distinct-week activity set collapses the event
    stream BEFORE the cohort join, so the join input is |users x weeks|,
    not |events|.

    Determinism: week buckets are fixed epoch-aligned truncations;
    retention is one IEEE division of exact integers. Scale: no window
    over the full stream, no driver loops — the biggest shuffle is the
    per-user MIN, a combiner-shape aggregate."""
    ev = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_n"))
    weeks_since = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        firsts.join(activity, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", weeks_since.alias("weeks_since"))
        .agg(
            F.count("*").cast("bigint").alias("n_active"),
            F.min("cohort_n").cast("bigint").alias("cohort_size"),
            (F.count("*").cast("double") / F.min("cohort_n")).alias("retention"),
        )
    )


@query(
    "ts_anomaly_mad",
    oracle="""
WITH base AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT user_id, quantile_cont(cents, 0.5) * 2 AS med2
  FROM base GROUP BY user_id
),
dev AS (
  SELECT b.user_id, b.event_id, b.cents, m.med2,
         abs(2 * b.cents - m.med2) AS dev2
  FROM base b JOIN med m ON m.user_id = b.user_id
),
mad AS (
  SELECT user_id, quantile_cont(dev2, 0.5) * 2 AS mad4
  FROM dev GROUP BY user_id
)
SELECT d.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE d.dev2 * 2 * 10000 > 44478 * m.mad4)
            AS BIGINT) AS n_anomalies,
       MIN(d.med2) / 2.0 / 100.0 AS median_value,
       MIN(m.mad4) / 4.0 / 100.0 AS mad_value
FROM dev d JOIN mad m ON m.user_id = d.user_id
GROUP BY d.user_id
""",
    family=_FAM,
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection via Median Absolute Deviation: per user,
    flag events where |x - median| > 3 * 1.4826 * MAD (the normal-
    consistent robust z-score — immune to the outliers it hunts, unlike
    stddev thresholds). Two exact per-group medians (values, then
    absolute deviations) and one integer comparison.

    Determinism: cents are integers, so 2*median and 4*MAD are exact
    integer-valued doubles in BOTH engines (percentile/quantile_cont
    midpoint-interpolate identically on integers); the 3-sigma_hat
    threshold compares integers scaled by 10^4 — no float rounding
    anywhere near the decision boundary. Scale: two combiner-friendly
    aggregations + one broadcastable per-user stats join; exact medians
    at 100 TB swap in the approx_percentile sketch with the same plan
    (agg_approx_quantile documents the error contract)."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = base.groupBy("user_id").agg(
        (F.expr("percentile(cents, 0.5)") * 2).alias("med2")
    )
    dev = base.join(med, "user_id").select(
        "user_id", "event_id", "cents", "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("user_id").agg(
        (F.expr("percentile(dev2, 0.5)") * 2).alias("mad4")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_if(
                F.col("dev2") * 2 * 10000 > 44478 * F.col("mad4")
            ).cast("bigint").alias("n_anomalies"),
            (F.min("med2") / 2.0 / 100.0).alias("median_value"),
            (F.min("mad4") / 4.0 / 100.0).alias("mad_value"),
        )
    )


@query(
    "win_moving_median",
    oracle="""
SELECT user_id, event_id,
       quantile_cont(cents, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) / 100.0 AS moving_median_value
FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
""",
    family=_FAM,
)
def win_moving_median(spark, sf_dir):
    """Moving median over the trailing 5 events per user — the robust
    sibling of win_moving_avg (a single spike shifts a mean, not a
    median). Spark has no percentile-over-frame, so the frame is
    materialized per row (collect_list over ROWS BETWEEN 4 PRECEDING),
    sorted, and the midpoint taken — O(k log k) per row for frame size
    k, the right trade at small fixed k; a large-k deployment would
    switch to the two-heap streaming median inside applyInPandas.

    Determinism: cents are integers, so the even-count midpoint
    (a+b)/2 is an exact half-integer in both engines (DuckDB's
    quantile_cont interpolation computes the same value bit-for-bit);
    one final division rescales."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("cents").over(w))
    n = F.size(frame)
    med2 = F.element_at(frame, ((n + 1) / 2).cast("int")) + F.element_at(
        frame, (n / 2 + 1).cast("int")
    )
    return base.select(
        "user_id", "event_id",
        (med2 / 2.0 / 100.0).alias("moving_median_value"),
    )


@query(
    "win_running_distinct",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(event_type) OVER (
                PARTITION BY user_id
                ORDER BY event_type ASC, ts ASC, event_id ASC)
              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS first_seen
  FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events)
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
""",
    family=_FAM,
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) per partition — window SQL can't say
    COUNT(DISTINCT x) OVER an arbitrary frame in either engine, so it
    decomposes into first-occurrence flags + a running SUM: each user's
    stream reports how many distinct event types it has seen so far
    (the 'feature adoption' curve). NOTE: the flag marks the first
    occurrence in (type, ts) order, and distinct-so-far counts in ts
    order — the combination is exact because a type's first ts-ordered
    occurrence is also its first in (type, ts) order within that type.

    Scale: BOTH windows partition by user_id alone — the flag window
    sorts by (event_type, ts) inside the same partitioning instead of
    re-keying on (user_id, event_type), so the plan is ONE exchange +
    two in-partition sorts (plan-gated; the naive two-keyed form pays a
    second full shuffle)."""
    ev = table(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy(
        F.col("event_type").asc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag("event_type").over(wf)
    flagged = ev.select(
        "user_id", "event_id", "ts",
        F.when(
            prev.isNull() | (prev != F.col("event_type")), 1
        ).otherwise(0).alias("first_seen"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id", "event_id",
        F.sum("first_seen").over(wrun).cast("bigint")
        .alias("distinct_types_so_far"),
    )


@query(
    "ts_active_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS day_no
  FROM events
),
runs AS (
  SELECT user_id, day_no,
         day_no - row_number() OVER (PARTITION BY user_id ORDER BY day_no ASC)
           AS run_id
  FROM days
),
streaks AS (
  SELECT user_id, run_id, COUNT(*) AS len,
         MIN(day_no) AS start_day, MAX(day_no) AS end_day
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MIN(start_day) AS BIGINT) AS first_active_day,
       CAST(MAX(end_day) AS BIGINT) AS last_active_day
FROM streaks GROUP BY user_id
""",
    family=_FAM,
)
def ts_active_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the retention
    metric product teams actually chase, and the cleanest gaps-and-
    islands instance: distinct active days, then `day_no − row_number`
    is constant exactly within a consecutive run, so one window + one
    aggregate finds every streak (vs win_sessionize, which islands on
    time gaps, this islands on calendar days).

    Scale: the distinct-day collapse shrinks the stream to
    |users × days| BEFORE any window; every stage shares the user_id
    hash partitioning — one exchange end to end (the distinct's finer
    (user, day) key satisfies its distribution via the subset rule).
    Day numbers are integer offsets from a fixed epoch — no date math
    ambiguity between engines."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint").alias("day_no"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day_no").asc())
    runs = days.withColumn("run_id", F.col("day_no") - F.row_number().over(w))
    streaks = runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("len"),
        F.min("day_no").alias("start_day"),
        F.max("day_no").alias("end_day"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.min("start_day").cast("bigint").alias("first_active_day"),
        F.max("end_day").cast("bigint").alias("last_active_day"),
    )


@query(
    "ts_interpolate_linear",
    oracle="""
WITH m AS (
  SELECT event_id, user_id, ts, value,
         (event_id % 5 = 0) AS missing,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE epoch_us(ts) END AS tus,
         epoch_us(ts) AS t
  FROM events
),
f AS (
  SELECT event_id, user_id, ts, value, missing, t,
         LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         LAST_VALUE(tus IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         FIRST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(tus IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM m
)
SELECT event_id, user_id, ts, missing AS was_missing,
       CASE WHEN NOT missing THEN value
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
            WHEN pv IS NOT NULL THEN pv
            ELSE nv END AS value_filled
FROM f
ORDER BY user_id, ts, event_id
""",
    family=_FAM,
    tags=("ordered",),
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation of missing sensor values — the time-series
    repair step gap-fill alone can't do (ts_gap_fill carries the LAST
    value forward; here the fill is time-proportional between the
    bracketing observations, with boundary rows falling back to
    nearest-neighbor). Missingness is a deterministic mask (event_id %
    5) so both engines repair the identical holes. The bracketing
    observation and its timestamp come from two IGNORE NULLS window
    frames per direction — one shuffle on user_id, one in-partition
    sort, all four frames evaluated in a single WindowExec pass.
    Interpolation arithmetic is a fixed-shape IEEE expression tree
    (sub, div, mul, add — one rounding each) over integer microsecond
    gaps, so results are bit-identical across engines without
    quantization.

    Scale: state per window frame is O(1) (running last / first
    non-null), frames never buffer the partition; the only shuffle is
    the user_id hash partitioning shared by all four frames."""
    e = table(spark, sf_dir, "events")
    missing = F.col("event_id") % 5 == 0
    m = e.select(
        "event_id", "user_id", "ts", "value",
        missing.alias("missing"),
        F.when(~missing, F.col("value")).alias("v"),
        F.when(~missing, F.unix_micros("ts")).alias("tus"),
        F.unix_micros("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    back = w.rowsBetween(Window.unboundedPreceding, -1)
    # forward pass as a REVERSED growing frame (r8 ts-stress finding):
    # first(ignorenulls) over (1 FOLLOWING, UNBOUNDED FOLLOWING) has no
    # incremental processor in Spark — the shrinking frame re-aggregates
    # the remaining rows PER ROW, O(p^2) per partition, which hung a
    # 272k-row Zipf-skewed user partition for 10+ minutes at 1M events.
    # last(ignorenulls) over the reverse ordering's growing frame is the
    # same value with the O(p) incremental processor.
    fwd_rev = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    f = m.select(
        "event_id", "user_id", "ts", "value", "missing", "t",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last("tus", ignorenulls=True).over(back).alias("pt"),
        F.last("v", ignorenulls=True).over(fwd_rev).alias("nv"),
        F.last("tus", ignorenulls=True).over(fwd_rev).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return f.select(
        "event_id", "user_id", "ts",
        F.col("missing").alias("was_missing"),
        F.when(~F.col("missing"), F.col("value"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .alias("value_filled"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "win_percent_rank_cume",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(CASE WHEN cume_dist() OVER w <= 0.25 THEN 'top_quartile'
                 WHEN cume_dist() OVER w <= 0.75 THEN 'mid'
                 ELSE 'bottom_quartile' END AS VARCHAR) AS band
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_mktsegment, pct_rank, c_custkey
""",
    family="2.5 windows",
)
def win_percent_rank_cume(spark, sf_dir):
    """Relative-standing window functions: percent_rank (rank-1)/(n-1)
    and cume_dist over account balance within market segment, banded
    into quartile labels. percent_rank/cume_dist are exact rational
    values both engines compute as one IEEE division, so the full
    doubles hash-match without quantization. One window sort serves
    both functions (single Exchange — same property test_plans locks
    for the other window ops)."""
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    )
    cume = F.cume_dist().over(w)
    return c.select(
        "c_mktsegment", "c_custkey", "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        cume.alias("cume"),
        F.when(cume <= 0.25, "top_quartile")
        .when(cume <= 0.75, "mid")
        .otherwise("bottom_quartile")
        .alias("band"),
    ).orderBy("c_mktsegment", "pct_rank", "c_custkey")


@query(
    "ts_seasonality_profile",
    oracle="""
WITH keyed AS (
  SELECT event_type,
         CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) + 4) % 7
              AS INTEGER) AS dow,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
         value
  FROM events
),
cells AS (
  SELECT event_type, dow, hod, COUNT(*) AS n,
         (CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) * 100000000 AS DECIMAL(38,0)) AS DOUBLE) / 100000000.0) AS total_value
  FROM keyed GROUP BY event_type, dow, hod
),
tot AS (
  SELECT event_type, SUM(n) AS type_n FROM cells GROUP BY event_type
)
SELECT c.event_type, c.dow, c.hod, CAST(c.n AS BIGINT) AS n, c.total_value,
       CAST(c.n AS DOUBLE) / t.type_n AS share
FROM cells c JOIN tot t ON c.event_type = t.event_type
ORDER BY c.event_type, dow, hod
""",
    family="2.5 windows",
)
def ts_seasonality_profile(spark, sf_dir):
    """Seasonal load profile: event count / value / within-type share per
    (event_type, day-of-week, hour-of-day) cell — the decomposition
    behind capacity planning and anomaly baselines ("is this Tuesday-3pm
    normal for Tuesday 3pm?"). Day-of-week comes from engine-common
    epoch arithmetic ((epoch_days + 4) % 7, Sunday=0) instead of each
    engine's dayofweek() — Spark counts 1=Sunday, DuckDB 0=Sunday, and
    that off-by-one is exactly the class of silent bug the oracle
    hash-check exists to catch. Two combiner-shape aggregates (cells,
    then per-type totals off the tiny cell frame) — the second groupBy
    re-aggregates 168xtypes cells, not events, so event rows shuffle
    once."""
    e = table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type",
        (
            (F.floor(F.unix_timestamp("ts") / 86400).cast("bigint") + 4) % 7
        ).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        "value",
    )
    from hdfs_mr_spark.exprs import dsum

    cells = keyed.groupBy("event_type", "dow", "hod").agg(
        F.count("*").alias("n"),
        dsum(F.col("value")).alias("total_value"),
    )
    tot = cells.groupBy("event_type").agg(F.sum("n").alias("type_n"))
    return (
        cells.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "dow", "hod",
            F.col("n").cast("bigint").alias("n"),
            "total_value",
            (F.col("n").cast("double") / F.col("type_n")).alias("share"),
        )
        .orderBy("event_type", "dow", "hod")
    )


@query(
    "ts_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
),
stats AS (
  SELECT AVG(c) AS mu,
         SUM(CAST(round((c - (SELECT AVG(c) FROM daily))
                        * (c - (SELECT AVG(c) FROM daily)) * 1000000.0)
             AS BIGINT)) AS den_micro
  FROM daily
),
lags AS (SELECT unnest(range(1, 8)) AS k),
pairs AS (
  SELECT l.k,
         SUM(CAST(round((a.c - s.mu) * (b.c - s.mu) * 1000000.0) AS BIGINT))
           AS num_micro,
         COUNT(*) AS n_pairs
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + l.k
  CROSS JOIN stats s
  GROUP BY l.k
)
SELECT CAST(p.k AS INTEGER) AS k,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(p.num_micro AS DOUBLE) / s.den_micro AS acf
FROM pairs p CROSS JOIN stats s
ORDER BY p.k
""",
    family="2.5 windows",
)
def ts_autocorrelation(spark, sf_dir):
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the weekly-pattern detector (a spike at k=7 says weekly
    seasonality; ts_seasonality_profile then shows WHERE). Textbook ACF
    with the series mean: numerator and denominator products are each
    quantized to integer micro-units BEFORE summing, so both sums are
    order-independent and the final ratio is one IEEE division —
    hash-exact without losing the statistic's shape.

    Scale: the daily series is a combiner-shape aggregate (events
    shuffle once); everything after operates on the tiny day-count
    frame (one row per day), where a 7-way lag self-join costs
    nothing — at 100 TB the day frame is still ~37k rows for a century.
    The series mean and the centered-sum denominator stay IN the plan
    as broadcast 1-row aggregates (no mid-plan .first() — VERDICT r6
    item 4): one lazy job instead of three, and the whole query is a
    single submitted DAG."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day")
    ).agg(F.count("*").cast("double").alias("c"))
    mu_df = daily.agg(F.avg("c").alias("mu"))
    stats = (
        daily.crossJoin(F.broadcast(mu_df))
        .agg(
            F.min("mu").alias("mu"),
            F.sum(
                F.round(
                    (F.col("c") - F.col("mu"))
                    * (F.col("c") - F.col("mu"))
                    * 1000000.0
                ).cast("bigint")
            ).alias("den_micro"),
        )
    )
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .crossJoin(F.broadcast(stats))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(
                    (F.col("ca") - F.col("mu"))
                    * (F.col("cb") - F.col("mu"))
                    * 1000000.0
                ).cast("bigint")
            ).alias("num_micro"),
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("den_micro").alias("den_micro"),
        )
    )
    return pairs.select(
        F.col("k").cast("int").alias("k"),
        "n_pairs",
        (F.col("num_micro").cast("double") / F.col("den_micro").cast("double"))
        .alias("acf"),
    ).orderBy("k")


@query(
    "ts_changepoint_cusum",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cum AS (
  SELECT user_id, event_id,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS BIGINT) AS t,
         SUM(cents) OVER (PARTITION BY user_id) AS total,
         COUNT(*)   OVER (PARTITION BY user_id) AS n
  FROM base
),
dev AS (
  SELECT user_id, event_id, t, n, n * cum - t * total AS d FROM cum
),
best AS (
  SELECT user_id, event_id AS cp_event_id, t AS cp_seq, n, abs(d) AS absd,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(d) DESC, t ASC) AS rn
  FROM dev
)
SELECT user_id, cp_event_id, CAST(cp_seq AS BIGINT) AS cp_seq,
       CAST(n AS BIGINT) AS n,
       CAST(absd AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS cusum_peak
FROM best WHERE rn = 1
ORDER BY user_id
""",
    family=_FAM,
)
def ts_changepoint_cusum(spark, sf_dir):
    """Offline CUSUM changepoint estimate per user series: the classic
    argmax_t |S_t| statistic where S_t = sum_{i<=t}(x_i - mean) — the
    point where the cumulative deviation from the series mean peaks is
    the max-likelihood single changepoint under a mean-shift model
    (Page's CUSUM, offline form).

    Determinism is the ts_ewma cents discipline taken one step
    further: values quantize to integer cents once, and instead of
    dividing by n early (mean as a double — engine-dependent rounding),
    the statistic is SCALED BY n: D_t = n*cum_t - t*total is exact
    BIGINT arithmetic, and argmax|D_t| == argmax|S_t| since n > 0. The
    only float op is the final |D|/(n*100) presentation division.

    Scale: one window exchange on user_id (ordered cum + per-partition
    totals share the hash partitioning), then the argmax collapses
    map-side as ONE combiner max(struct(absd, -t, ...)) — no second
    window, no sort of the full series after the frame evaluation. At
    100 TB a per-user series fits a partition by construction (user
    cardinality >> executor count); a single pathological mega-series
    would switch to the two-level bucketed cum-sum (the
    llm_global_shuffle formulation)."""
    e = table(spark, sf_dir, "events")
    base = e.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w_ord = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wcum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("user_id")
    dev = base.select(
        "user_id", "event_id",
        F.sum("cents").over(wcum).alias("cum"),
        F.row_number().over(w_ord).cast("bigint").alias("t"),
        F.sum("cents").over(wall).alias("total"),
        F.count("*").over(wall).alias("n"),
    ).select(
        "user_id", "event_id", "t", "n",
        (F.col("n") * F.col("cum") - F.col("t") * F.col("total")).alias("d"),
    )
    best = dev.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.abs("d").alias("absd"),
                (-F.col("t")).alias("nt"),
                F.col("event_id").alias("eid"),
                F.col("n").alias("n"),
            )
        ).alias("m")
    )
    return best.select(
        "user_id",
        F.col("m.eid").alias("cp_event_id"),
        (-F.col("m.nt")).alias("cp_seq"),
        F.col("m.n").alias("n"),
        (
            F.col("m.absd").cast("double")
            / (F.col("m.n").cast("double") * F.lit(100.0))
        ).alias("cusum_peak"),
    ).orderBy("user_id")


@query(
    "ts_theilsen_trend",
    oracle="""
WITH daily AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, day
),
slopes AS (
  SELECT a.user_id,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.day - a.day AS DOUBLE) AS slope,
         a.day AS day1, b.day AS day2
  FROM daily a JOIN daily b ON a.user_id = b.user_id AND a.day < b.day
),
ranked AS (
  SELECT user_id, slope,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY slope ASC, day1 ASC, day2 ASC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS k
  FROM slopes
),
med AS (
  SELECT user_id, CAST(k AS BIGINT) AS n_pairs,
         MIN(CASE WHEN rn = (k + 1) // 2 THEN slope END) AS lo,
         MIN(CASE WHEN rn = k // 2 + 1 THEN slope END) AS hi
  FROM ranked GROUP BY user_id, k
)
SELECT user_id, n_pairs, (lo + hi) / 2.0 / 100.0 AS theil_sen_slope
FROM med ORDER BY user_id
""",
    family=_FAM,
)
def ts_theilsen_trend(spark, sf_dir):
    """Theil-Sen robust trend per user series: the median of all
    pairwise slopes over the user's DAILY totals — the
    breakdown-point-0.29 estimator that shrugs off the outliers an
    OLS slope (agg_linreg) chases. Slopes are exact-integer deltas
    (cents, epoch days) divided once into doubles, so every slope is
    engine-identical; the median is an EXPLICIT rank selection
    (row_number with a total-order tiebreak, values at floor/ceil
    positions averaged) rather than either engine's percentile
    built-in, whose interpolation contracts differ.

    Plan: the daily rollup is a combiner-shape aggregate; the pair
    join is user-local (equi on user_id + day residual — a user's
    day count is bounded by the calendar, so per-user pairs are
    O(days^2) with a small constant, ~27 days -> 351 pairs here);
    one window exchange on user_id ranks the slopes; the selection
    collapses combiner-shape. At 100 TB user count scales but the
    per-user pair space does not — no quadratic blowup in n."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    a = daily.select(
        "user_id", F.col("day").alias("day1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "user_id", F.col("day").alias("day2"), F.col("cents").alias("c2")
    )
    slopes = a.join(b, "user_id").filter(F.col("day1") < F.col("day2")).select(
        "user_id", "day1", "day2",
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("day2") - F.col("day1")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("slope").asc(), F.col("day1").asc(), F.col("day2").asc()
    )
    ranked = slopes.select(
        "user_id", "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("k"),
    )
    med = ranked.groupBy("user_id", "k").agg(
        F.min(
            F.when(F.col("rn") == F.floor((F.col("k") + 1) / 2), F.col("slope"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.floor(F.col("k") / 2) + 1, F.col("slope"))
        ).alias("hi"),
    )
    return med.select(
        "user_id",
        F.col("k").cast("bigint").alias("n_pairs"),
        ((F.col("lo") + F.col("hi")) / F.lit(2.0) / F.lit(100.0)).alias(
            "theil_sen_slope"
        ),
    ).orderBy("user_id")


@query(
    "win_rolling_regression",
    oracle="""
WITH base AS (
  SELECT user_id, event_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
frames AS (
  SELECT user_id, event_id, x,
         COUNT(*)   OVER w AS n,
         SUM(x)     OVER w AS sx,
         SUM(y)     OVER w AS sy,
         SUM(x * y) OVER w AS sxy,
         SUM(x * x) OVER w AS sxx
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0
       END AS slope10
FROM frames
ORDER BY user_id, x
""",
    family=_FAM,
    tags=("ordered",),
)
def win_rolling_regression(spark, sf_dir):
    """Rolling OLS slope over the trailing 10 events per user — the
    windowed version of agg_linreg's closed form, the shape online
    trend monitors compute per tick. Every frame statistic (n, Σx, Σy,
    Σxy, Σx²) is an exact-integer windowed sum (cents and the per-user
    sequence index, which keeps products small), so the normal-equation
    numerator/denominator are exact BIGINTs and the only float op is
    the final division; degenerate frames (n=1, zero variance) emit
    NULL via the denominator guard in both engines identically.

    Plan: ONE window exchange on user_id serves the sequencing AND all
    five frame sums (same partition key + order); no join, no second
    shuffle. At 100 TB this is the canonical one-pass streaming-frame
    evaluation — WindowExec holds 10 rows of state per user."""
    e = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    base = e.select(
        "user_id", "event_id",
        F.row_number().over(w_ord).cast("bigint").alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("x").asc())
        .rowsBetween(-9, 0)
    )
    frames = base.select(
        "user_id", "event_id", "x",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return frames.select(
        "user_id", "event_id",
        F.col("n").cast("bigint").alias("n"),
        F.when(
            den != 0, num.cast("double") / den.cast("double") / F.lit(100.0)
        ).alias("slope10"),
        "x",
    ).orderBy("user_id", "x").drop("x")


@query(
    "ts_interval_merge",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
           + CAST(round(value * 60) AS BIGINT) AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id
                               ORDER BY s ASC, event_id ASC
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       CAST(MIN(s) AS BIGINT) AS span_start,
       CAST(MAX(e) AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id, island
ORDER BY user_id, island
""",
    family=_FAM,
)
def ts_interval_merge(spark, sf_dir):
    """Overlapping-interval merge (union of time intervals) per user —
    the other gaps-and-islands classic next to win_sessionize's
    gap-based form: each event claims [ts, ts + value minutes), and
    overlapping or touching claims coalesce into maximal spans. The
    standard relational formulation: an interval starts a NEW island
    exactly when its start exceeds the running MAX of all previous
    ends (not lag(e) — an earlier long interval can swallow several
    later ones), island ids are a conditional running sum, spans are a
    combiner-shape min/max per island. Everything is integer epoch
    seconds, so island boundaries are exact in both engines.

    Plan: one window exchange on user_id serves the running-max frame
    AND the island cumsum (same key + order), then one partial/final
    aggregate pair. No join, no self-join — the naive interval-overlap
    self-join is Theta(n^2) per user and is exactly what this
    formulation replaces at 100 TB."""
    e = table(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts")).cast("bigint")
    iv = e.select(
        "user_id", "event_id",
        sec.alias("s"),
        (sec + F.round(F.col("value") * 60).cast("bigint")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id", "event_id", "s", "e",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev), F.lit(-(1 << 63)).cast("bigint")
            ),
            1,
        ).otherwise(0).alias("new_island"),
    )
    # same TOTAL order as the flag window — a (s, e) tie between two
    # events would make the flag/cumsum pairing order-dependent
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("new_island").over(w_cum).alias("island"),
    )
    return (
        islands.groupBy("user_id", F.col("island").cast("bigint").alias("island"))
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "island")
    )


@query(
    "win_ratio_to_report",
    oracle="""
WITH g AS (
  SELECT o_orderstatus, o_orderpriority,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cents AS DOUBLE)
         / CAST(SUM(cents) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
         AS share_of_status,
       CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS DOUBLE)
         AS share_of_total
FROM g
ORDER BY o_orderstatus, o_orderpriority
""",
    family=_FAM,
)
def win_ratio_to_report(spark, sf_dir):
    """Ratio-to-report (share-of-parent / share-of-total) — the
    windowed division every BI rollup renders: per (status, priority)
    revenue as a fraction of its status subtotal and of the grand
    total. Sums ride integer cents (exact, order-independent); both
    shares are one double division each, so the only windows are
    unordered SUMs.

    Plan: the fact table collapses FIRST (combiner-shape group agg to
    |status|x|priority| = 15 rows); the windows — including the
    global-total one — run over that bounded grouped frame, so the
    single-partition exchange the global SUM implies holds 15 rows,
    not the fact table (the unpartitioned-window rule is about
    unbounded frames; a grouped-cardinality frame is the sanctioned
    exception, same reasoning as agg_stats' per-flag histogram)."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w_status = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    cd = F.col("cents").cast("double")
    return g.select(
        "o_orderstatus", "o_orderpriority",
        (cd / F.lit(100.0)).alias("revenue"),
        (cd / F.sum("cents").over(w_status).cast("double")).alias("share_of_status"),
        (cd / F.sum("cents").over(w_all).cast("double")).alias("share_of_total"),
    ).orderBy("o_orderstatus", "o_orderpriority")


@query(
    "ts_forecast_seasonal_naive",
    oracle="""
WITH hourly AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hr,
         SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY hr
),
fc AS (
  SELECT hr, cents,
         lag(cents, 168) OVER (ORDER BY hr ASC) AS forecast
  FROM hourly
)
SELECT CAST(COUNT(forecast) AS BIGINT) AS n_forecasts,
       CAST(SUM(abs(cents - forecast)) AS BIGINT) AS abs_err_cents,
       CAST(CAST(SUM(abs(cents - forecast)) AS DOUBLE)
            / CAST(COUNT(forecast) AS DOUBLE) / 100.0 AS DOUBLE) AS mae,
       CAST(SUM(CASE WHEN cents = forecast THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact
FROM fc
""",
    family=_FAM,
)
def ts_forecast_seasonal_naive(spark, sf_dir):
    """Seasonal-naive forecasting baseline (y_hat_t = y_{t-168h}: same
    hour last week) with its backtest error report — the baseline
    every forecasting pipeline must beat before a model earns its
    compute, and the cheapest one to run at 100 TB. Hourly totals
    collapse combiner-shape to integer cents; the forecast is one
    lag(168) over the bounded hourly frame (8 760 rows/year however
    big the fact table — the agg-then-window discipline), and MAE is
    an exact integer sum with one presentation division.

    The hourly frame is globally ordered, so the lag window is
    single-partition — sanctioned ONLY because the frame is
    calendar-bounded (same argument as ts_autocorrelation's day
    frame); the fact-table scan below it never single-partitions."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    w = Window.orderBy(F.col("hr").asc())
    fc = hourly.select(
        "cents", F.lag("cents", 168).over(w).alias("forecast")
    )
    err = F.abs(F.col("cents") - F.col("forecast"))
    return fc.agg(
        F.count("forecast").alias("n_forecasts"),
        F.sum(err).cast("bigint").alias("abs_err_cents"),
        (
            F.sum(err).cast("double")
            / F.count("forecast").cast("double")
            / F.lit(100.0)
        ).alias("mae"),
        F.sum(
            F.when(F.col("cents") == F.col("forecast"), 1).otherwise(0)
        ).cast("bigint").alias("n_exact"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
walked AS (
  SELECT event_type, h, x,
         CAST(row_number() OVER w AS BIGINT) AS i,
         SUM(x) OVER w AS prefix,
         SUM(x) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT event_type, h, i, n, prefix, total,
         CAST(n AS BIGINT) * prefix - i * CAST(total AS BIGINT)
           AS cusum_scaled
  FROM walked WHERE i < n
),
best AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type
           ORDER BY ABS(cusum_scaled) DESC, i ASC) AS r
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       h AS cp_hour,
       i AS cp_idx,
       CAST(ABS(cusum_scaled) AS BIGINT) AS cusum_scaled_abs,
       round(CAST(prefix AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_before,
       round(CAST(total - prefix AS DOUBLE) / CAST(n - i AS DOUBLE), 6)
         AS mean_after
FROM best WHERE r = 1
ORDER BY event_type
""",
    family=_FAM,
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection over the ARRIVAL RATE: per
    event_type, the hour i maximizing |Σ_{j<=i}(x_j - mean)| of the
    hourly COUNT series is the most likely rate-shift point (Page's
    CUSUM on a counting process — did this event type speed up or
    slow down, and when). Companion to ts_changepoint_cusum, which
    applies the same statistic to the VALUE series per user (did the
    amounts shift); the two watch different failure modes and share
    only the scaled-integer discipline.

    Determinism: the CUSUM value is kept INTEGER-exact by scaling with
    the series length — n·prefix_i − i·total equals n·Σ(x_j − mean)
    with identical sign and argmax — so no float accumulation order
    can perturb the winner; the two means are single per-row double
    divisions rounded to 6 dp. i = n is excluded (CUSUM_n ≡ 0, a
    degenerate candidate that would also divide by zero).

    Plan: hourly counts are one combiner-shape agg; both windows and
    the final pick share the event_type partitioning, so the whole
    query is two exchanges (agg shuffle + window shuffle reused).
    Partition height is bounded by the time range in hours, not by
    row count — safe at 100 TB."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("event_type")
    walked = hourly.select(
        "event_type", "h", "x",
        F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
        .cast("bigint").alias("i"),
        F.sum("x").over(w).alias("prefix"),
        F.sum("x").over(full).alias("total"),
        F.count("*").over(full).alias("n"),
    )
    scored = walked.filter(F.col("i") < F.col("n")).withColumn(
        "cusum_scaled",
        F.col("n") * F.col("prefix") - F.col("i") * F.col("total"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("i").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(pick))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("h").alias("cp_hour"),
            F.col("i").alias("cp_idx"),
            F.abs(F.col("cusum_scaled")).alias("cusum_scaled_abs"),
            F.round(
                F.col("prefix").cast("double") / F.col("i").cast("double"), 6
            ).alias("mean_before"),
            F.round(
                (F.col("total") - F.col("prefix")).cast("double")
                / (F.col("n") - F.col("i")).cast("double"),
                6,
            ).alias("mean_after"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_downsample_lttb",
    oracle="""
WITH pts AS (
  SELECT ts, value, epoch_us(ts) AS xe,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
mm AS (SELECT MIN(xe) AS x0, MAX(xe) AS x1 FROM pts),
bp AS (
  SELECT p.ts, p.value, p.xe - m.x0 AS x, p.y,
         LEAST(49, ((p.xe - m.x0) * 50) // GREATEST(m.x1 - m.x0, 1)) AS b
  FROM pts p, mm m
),
bs AS (SELECT b, SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS c FROM bp GROUP BY b),
sc AS (
  SELECT bp.ts, bp.value, bp.x, bp.y, bp.b,
         pv.sx AS sxp, pv.sy AS syp, pv.c AS cp,
         nx.sx AS sxn, nx.sy AS syn, nx.c AS cn
  FROM bp
  LEFT JOIN bs pv ON pv.b = bp.b - 1
  LEFT JOIN bs nx ON nx.b = bp.b + 1
),
ar AS (
  SELECT ts, value, b, x,
         COALESCE(ABS(
           (CAST(sxp AS DOUBLE) * CAST(cn AS DOUBLE)
            - CAST(sxn AS DOUBLE) * CAST(cp AS DOUBLE))
           * (CAST(y AS DOUBLE) * CAST(cp AS DOUBLE) - CAST(syp AS DOUBLE))
           - (CAST(sxp AS DOUBLE) - CAST(x AS DOUBLE) * CAST(cp AS DOUBLE))
           * (CAST(syp AS DOUBLE) * CAST(cn AS DOUBLE)
              - CAST(syn AS DOUBLE) * CAST(cp AS DOUBLE))
         ), 0.0) AS area
  FROM sc
),
pick AS (
  SELECT b, ts, value,
         row_number() OVER (PARTITION BY b ORDER BY
           (CASE WHEN b = 0 THEN -CAST(x AS DOUBLE)
                 WHEN b = 49 THEN CAST(x AS DOUBLE)
                 ELSE area END) DESC, x ASC) AS rn
  FROM ar
)
SELECT CAST(p.b AS INTEGER) AS bucket, p.ts, p.value,
       CAST(s.c AS BIGINT) AS n_in_bucket
FROM pick p JOIN bs s ON s.b = p.b
WHERE p.rn = 1
ORDER BY bucket
""",
    family=_FAM,
)
def ts_downsample_lttb(spark, sf_dir):
    """LTTB downsampling (Largest-Triangle-Three-Buckets, Steinarsson
    2013 — the visual downsample Grafana/Plotly ship) in its PARALLEL
    bucket-mean variant: 50 equal-TIME buckets over the event stream,
    and each bucket keeps the point maximizing the triangle area
    against the NEIGHBOR BUCKETS' mean points. Classic LTTB scores
    against the previously SELECTED point, which serializes the scan;
    the mean-anchor variant is embarrassingly parallel (each bucket
    scores independently against static neighbor aggregates — the
    published MinMaxLTTB/LTTB-parallel compromise) and is the only
    formulation that survives a 1000-executor corpus. First and last
    buckets keep their first/last point (LTTB's endpoint rule).

    Determinism: x rebases to micros-since-min (a broadcast 1-row
    aggregate — no driver scalar), y to exact integer cents; the area
    numerator multiplies out the mean denominators (constant within a
    bucket, so argmax is unchanged) and evaluates in DOUBLE with an
    identical expression tree in both engines — per-op IEEE identity,
    ties broken by x ascending. Empty neighbor buckets score 0 via
    COALESCE. Plan: one combiner aggregate for bucket stats, two
    broadcast-size self-joins on bucket id, one PARTITIONED window
    (by bucket) — no global sort, no single-partition exchange."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "ts", "value",
        F.unix_micros("ts").alias("xe"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    mm = pts.agg(F.min("xe").alias("x0"), F.max("xe").alias("x1"))
    bp = pts.crossJoin(F.broadcast(mm)).select(
        "ts", "value", (F.col("xe") - F.col("x0")).alias("x"), "y",
        F.least(
            F.lit(49),
            F.expr("((xe - x0) * 50) div greatest(x1 - x0, 1)"),
        ).alias("b"),
    )
    bs = bp.groupBy("b").agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.count("*").alias("c"),
    )
    pv = bs.select(
        (F.col("b") + 1).alias("pb"), F.col("sx").alias("sxp"),
        F.col("sy").alias("syp"), F.col("c").alias("cp"),
    )
    nx = bs.select(
        (F.col("b") - 1).alias("nb"), F.col("sx").alias("sxn"),
        F.col("sy").alias("syn"), F.col("c").alias("cn"),
    )
    sc = (
        bp.join(F.broadcast(pv), bp.b == F.col("pb"), "left")
        .join(F.broadcast(nx), bp.b == F.col("nb"), "left")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    area = F.coalesce(
        F.abs(
            (d("sxp") * d("cn") - d("sxn") * d("cp"))
            * (d("y") * d("cp") - d("syp"))
            - (d("sxp") - d("x") * d("cp"))
            * (d("syp") * d("cn") - d("syn") * d("cp"))
        ),
        F.lit(0.0),
    )
    ar = sc.select("ts", "value", "b", "x", area.alias("area"))
    key = (
        F.when(F.col("b") == 0, -d("x"))
        .when(F.col("b") == 49, d("x"))
        .otherwise(F.col("area"))
    )
    w = Window.partitionBy("b").orderBy(key.desc(), F.col("x").asc())
    return (
        ar.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(bs.select("b", F.col("c").alias("n_in_bucket"))), "b")
        .select(
            F.col("b").cast("int").alias("bucket"), "ts", "value",
            F.col("n_in_bucket").cast("bigint").alias("n_in_bucket"),
        )
        .orderBy("bucket")
    )


@query(
    "ts_decompose_classical",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hus,
         SUM(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
mm AS (SELECT MIN(hus) AS h0 FROM hourly),
ser AS (
  SELECT h.event_type, (h.hus - m.h0) // 3600000000 AS hidx,
         (h.sum_cents * 10000) // h.n AS mean_micro
  FROM hourly h, mm m
),
tr AS (
  SELECT event_type, hidx, mean_micro,
         SUM(mean_micro) OVER w AS wsum,
         COUNT(*) OVER w AS wcnt
  FROM ser
  WINDOW w AS (PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
dt AS (
  SELECT event_type, hidx, mean_micro,
         CASE WHEN wcnt = 25 THEN wsum // 25 END AS trend_micro,
         CASE WHEN wcnt = 25 THEN mean_micro - wsum // 25 END AS detr
  FROM tr
),
se AS (
  SELECT event_type, hidx % 24 AS hod,
         SUM(detr) // COUNT(detr) AS seasonal_micro
  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2
)
SELECT d.event_type, CAST(d.hidx AS BIGINT) AS hidx,
       CAST(d.mean_micro AS BIGINT) AS mean_micro,
       CAST(d.trend_micro AS BIGINT) AS trend_micro,
       CAST(s.seasonal_micro AS BIGINT) AS seasonal_micro,
       CAST(d.detr - s.seasonal_micro AS BIGINT) AS remainder_micro
FROM dt d
LEFT JOIN se s ON s.event_type = d.event_type AND s.hod = d.hidx % 24
ORDER BY d.event_type, d.hidx
""",
    family=_FAM,
)
def ts_decompose_classical(spark, sf_dir):
    """Classical additive seasonal-trend decomposition (the moving-
    average method STL descends from): per event type, the hourly mean
    series splits into trend (centered 25-hour moving average —
    defined only where the +/-12h RANGE window is complete, so edges
    and gap-adjacent hours are honestly NULL rather than biased),
    seasonal (per hour-of-day mean of the detrended series), and
    remainder. The monitoring decomposition behind 'is this spike
    seasonal or anomalous' — ts_seasonality_profile summarizes the
    cycle; this op returns the per-point decomposition a detector
    consumes.

    Determinism: the whole pipeline is exact INTEGER micro-units —
    hourly mean = (sum_cents * 10000) div n, trend = window-sum div
    25, seasonal = sum div count — floor divisions that replay
    bit-for-bit in both engines; the hour index rebases against a
    broadcast 1-row min (no driver scalar).

    Scale: hourly aggregation is combiner-shape over the raw corpus;
    everything downstream operates on the RESAMPLED series, whose row
    count is bounded by time-span x type-cardinality (not corpus
    size), partitioned by event type with a RANGE window on the hour
    index — gap-aware (a missing hour shrinks the window count and
    nulls the trend) and never a single-partition exchange over raw
    events."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hus"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
            F.count("*").alias("n"),
        )
    )
    mm = hourly.agg(F.min("hus").alias("h0"))
    ser = hourly.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.expr("(hus - h0) div 3600000000").alias("hidx"),
        F.expr("(sum_cents * 10000) div n").alias("mean_micro"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rangeBetween(-12, 12)
    )
    tr = ser.select(
        "event_type", "hidx", "mean_micro",
        F.sum("mean_micro").over(w).alias("wsum"),
        F.count("*").over(w).alias("wcnt"),
    )
    dt = tr.select(
        "event_type", "hidx", "mean_micro",
        F.when(F.col("wcnt") == 25, F.expr("wsum div 25")).alias(
            "trend_micro"
        ),
        F.when(
            F.col("wcnt") == 25, F.col("mean_micro") - F.expr("wsum div 25")
        ).alias("detr"),
    )
    se = (
        dt.filter(F.col("detr").isNotNull())
        .groupBy(
            F.col("event_type").alias("s_etype"),
            F.expr("hidx % 24").alias("hod"),
        )
        .agg(F.expr("sum(detr) div count(detr)").alias("seasonal_micro"))
    )
    return (
        dt.join(
            F.broadcast(se),
            (F.col("event_type") == F.col("s_etype"))
            & (F.expr("hidx % 24") == F.col("hod")),
            "left",
        )
        .select(
            "event_type",
            F.col("hidx").cast("bigint").alias("hidx"),
            F.col("mean_micro").cast("bigint").alias("mean_micro"),
            F.col("trend_micro").cast("bigint").alias("trend_micro"),
            F.col("seasonal_micro").cast("bigint").alias("seasonal_micro"),
            (F.col("detr") - F.col("seasonal_micro"))
            .cast("bigint")
            .alias("remainder_micro"),
        )
        .orderBy("event_type", "hidx")
    )


# ts_stl_loess integer tricube weights (compile-time constants shared
# verbatim by the Spark expressions and the DuckDB oracle): scale 100,
# w(d) = round(100 * (1 - (d/(h+1))^3)^3) for half-widths h=3 (cycle
# subseries) and h=6 (trend pass). Scale 100 keeps the weighted
# normal-equation products comfortably inside int64 (|y| <= ~1e9 micro,
# sy <= 13*100*1e9 = 1.3e12, sy*sxx <= 6e17 — 15x headroom).
_STL_W3 = {0: 100, 1: 95, 2: 67, 3: 19}
_STL_W6 = {0: 100, 1: 99, 2: 93, 3: 78, 4: 54, 5: 26, 6: 5}


def _stl_wcase(weights: dict, dcol: str) -> str:
    arms = " ".join(
        f"WHEN {k} THEN {v}" for k, v in sorted(weights.items())[:-1]
    )
    return (f"CASE abs({dcol}) {arms} "
            f"ELSE {weights[max(weights)]} END")


_STL_FIT = """
CASE WHEN sw * sxx - sx * sx <> 0
     THEN (sy * sxx - sx * sxy) {div} (sw * sxx - sx * sx)
     ELSE sy {div} sw END"""


def _stl_des_sql() -> str:
    """Shared STL front half (hourly resample -> cycle-subseries
    LOESS -> low-pass centering -> deseasonalized `des` frame) — the
    CTE prefix both ts_stl_loess and ts_seasonal_hybrid_esd replay."""
    return f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hus,
         SUM(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
mm AS (SELECT MIN(hus) AS h0 FROM hourly),
ser AS MATERIALIZED (
  SELECT h.event_type, (h.hus - m.h0) // 3600000000 AS hidx,
         (h.sum_cents * 10000) // h.n AS y
  FROM hourly h, mm m
),
sub AS (
  SELECT event_type, hidx, hidx // 24 AS cyc, hidx % 24 AS hod, y
  FROM ser
),
spair AS (
  SELECT a.event_type, a.hidx, b.cyc - a.cyc AS d, b.y,
         {_stl_wcase(_STL_W3, 'b.cyc - a.cyc')} AS wt
  FROM sub a JOIN sub b
    ON b.event_type = a.event_type AND b.hod = a.hod
   AND abs(b.cyc - a.cyc) <= 3
),
sfit AS (
  SELECT event_type, hidx,
         SUM(wt) AS sw, SUM(wt * d) AS sx, SUM(wt * y) AS sy,
         SUM(wt * d * d) AS sxx, SUM(wt * d * y) AS sxy
  FROM spair GROUP BY 1, 2
),
sraw AS (
  SELECT event_type, hidx, {_STL_FIT.format(div='//')} AS s_raw
  FROM sfit
),
lp AS (
  SELECT event_type, hidx, s_raw,
         SUM(s_raw) OVER w AS wsum, COUNT(*) OVER w AS wcnt
  FROM sraw
  WINDOW w AS (PARTITION BY event_type ORDER BY hidx
               RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
seas AS (
  SELECT event_type, hidx,
         CASE WHEN wcnt = 25 THEN s_raw - wsum // 25 END AS seasonal
  FROM lp
),
des AS MATERIALIZED (
  SELECT s.event_type, s.hidx, s.y, e.seasonal,
         s.y - e.seasonal AS dv
  FROM ser s JOIN seas e
    ON e.event_type = s.event_type AND e.hidx = s.hidx
)"""


def _stl_oracle() -> str:
    return _stl_des_sql() + f""",
tpair AS (
  SELECT a.event_type, a.hidx, b.hidx - a.hidx AS d, b.dv,
         {_stl_wcase(_STL_W6, 'b.hidx - a.hidx')} AS wt
  FROM des a JOIN des b
    ON b.event_type = a.event_type AND abs(b.hidx - a.hidx) <= 6
  WHERE a.seasonal IS NOT NULL AND b.seasonal IS NOT NULL
),
tfit AS (
  SELECT event_type, hidx,
         SUM(wt) AS sw, SUM(wt * d) AS sx, SUM(wt * dv) AS sy,
         SUM(wt * d * d) AS sxx, SUM(wt * d * dv) AS sxy
  FROM tpair GROUP BY 1, 2
),
trend AS (
  SELECT event_type, hidx, {_STL_FIT.format(div='//')} AS t
  FROM tfit
)
SELECT d.event_type, CAST(d.hidx AS BIGINT) AS hidx,
       CAST(d.y AS BIGINT) AS mean_micro,
       CAST(d.seasonal AS BIGINT) AS seasonal_micro,
       CAST(t.t AS BIGINT) AS trend_micro,
       CAST(d.dv - t.t AS BIGINT) AS remainder_micro
FROM des d
LEFT JOIN trend t ON t.event_type = d.event_type AND t.hidx = d.hidx
ORDER BY d.event_type, d.hidx
"""


def _stl_loess_fit(frame, key_cols, xcol, ycol, half, bucket, weights, out):
    """Banded locally-weighted linear regression: fitted value (the
    intercept at the centered abscissa) per left row. Module-level so
    both STL and the seasonal-hybrid composition share it."""
    wcase = _stl_wcase(weights, "d")
    lhs = frame.select(
        *key_cols, F.col(xcol).alias("x0"), "hidx"
    ).withColumn(
        "bb",
        F.explode(F.array(*[
            F.expr(f"x0 div {bucket} + {o}") for o in (-1, 0, 1)
        ])),
    )
    # every column name distinct across the two sides (r_ prefix +
    # r_bb) — expression self-joins on same-parent frames are
    # ambiguous otherwise (the mr_hits lesson)
    rhs = frame.select(
        *[F.col(k).alias(f"r_{k}") for k in key_cols],
        F.col(xcol).alias("x1"), F.col(ycol).alias("yv"),
    ).withColumn("r_bb", F.expr(f"x1 div {bucket}"))
    cond = F.col("bb") == F.col("r_bb")
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    pairs = (
        lhs.join(rhs, cond)
        .filter(F.abs(F.col("x1") - F.col("x0")) <= half)
        .select(
            *key_cols, "hidx",
            (F.col("x1") - F.col("x0")).alias("d"), "yv",
        )
        .withColumn("wt", F.expr(wcase))
    )
    fit = pairs.groupBy(*key_cols, "hidx").agg(
        F.sum("wt").alias("sw"),
        F.sum(F.expr("wt * d")).alias("sx"),
        F.sum(F.expr("wt * yv")).alias("sy"),
        F.sum(F.expr("wt * d * d")).alias("sxx"),
        F.sum(F.expr("wt * d * yv")).alias("sxy"),
    )
    return fit.select(
        *key_cols, "hidx",
        F.expr(_STL_FIT.format(div="DIV")).alias(out),
    )



def _stl_des(spark, sf_dir):
    """Shared STL front half (Spark side): hourly resample, cycle-
    subseries LOESS, low-pass centering, deseasonalized `des` frame
    (event_type, hidx, y, seasonal, dv) — checkpointed; the back
    half differs per op (trend LOESS vs ESD on the residual)."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hus"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
            F.count("*").alias("n"),
        )
    )
    mm = hourly.agg(F.min("hus").alias("h0"))
    ser = hourly.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.expr("(hus - h0) div 3600000000").alias("hidx"),
        F.expr("(sum_cents * 10000) div n").alias("y"),
    ).localCheckpoint()  # feeds the subseries join AND the des join


    sub = ser.select(
        "event_type", "hidx",
        F.expr("hidx div 24").alias("cyc"),
        F.expr("hidx % 24").alias("hod"), "y",
    )
    sraw = _stl_loess_fit(
        sub, ["event_type", "hod"], "cyc", "y",
        half=3, bucket=4, weights=_STL_W3, out="s_raw",
    )
    wlp = (
        Window.partitionBy("event_type").orderBy("hidx").rangeBetween(-12, 12)
    )
    seas = sraw.select(
        "event_type", "hidx", "s_raw",
        F.sum("s_raw").over(wlp).alias("wsum"),
        F.count("*").over(wlp).alias("wcnt"),
    ).select(
        "event_type", "hidx",
        F.when(
            F.col("wcnt") == 25, F.col("s_raw") - F.expr("wsum div 25")
        ).alias("seasonal"),
    )
    des = (
        ser.join(seas, ["event_type", "hidx"])
        .select(
            "event_type", "hidx", "y", "seasonal",
            (F.col("y") - F.col("seasonal")).alias("dv"),
        )
        .localCheckpoint()  # feeds the trend join (both sides) + output
    )
    return des


@query(
    "ts_stl_loess",
    oracle=_stl_oracle(),
    family=_FAM,
)
def ts_stl_loess(spark, sf_dir):
    """STL — seasonal-trend decomposition by LOESS (r15, VERDICT r14
    item 7: the family had the classical moving-average decomposition,
    Holt-Winters, and seasonal-naive; LOESS-based STL, Cleveland et al.
    1990, is the last widely-used decomposition missing). One inner
    STL pass, robustness iterations 0, period 24 h, on the per-type
    hourly mean series (ts_decompose_classical's base):

    1. CYCLE-SUBSERIES LOESS: each hour-of-day subseries is smoothed
       over cycle index by locally-weighted linear regression (window
       ±3 cycles, integer tricube weights — the win_rolling_regression
       normal equations with per-distance weights, fitted value =
       intercept at the centered abscissa, all-BIGINT trunc-div).
    2. LOW-PASS CENTERING: the raw seasonal minus its centered 25-h
       moving average (complete windows only — edges honestly NULL,
       the classical op's discipline), so trend can't leak into
       seasonal.
    3. TREND LOESS: the deseasonalized series smoothed over the hour
       index (window ±6 h, same integer machinery).
    4. remainder = y - seasonal - trend.

    Determinism: the tricube weights are integer literals shared by
    both engines; every weighted moment (Σw, Σwx, Σwy, Σwx², Σwxy) is
    an exact BIGINT sum; the fitted value is one trunc-div of exact
    integers (Spark DIV == DuckDB BIGINT //); zero-variance windows
    fall back to the weighted mean. No floats anywhere.

    Scale: the corpus-sized work is the hourly combiner aggregation;
    everything after runs on the RESAMPLED series (rows bounded by
    time-span × type-cardinality, not corpus size). The distance-
    weighted windows can't be RANGE frames (weights vary per row pair),
    so both LOESS passes are BANDED equi-joins — each row explodes to
    3 band buckets and joins on (keys, bucket), keeping candidate
    pairs O(series × window), never a per-key cross product."""
    des = _stl_des(spark, sf_dir)
    core = des.filter(F.col("seasonal").isNotNull())
    trend = _stl_loess_fit(
        core, ["event_type"], "hidx", "dv",
        half=6, bucket=7, weights=_STL_W6, out="t",
    )
    return (
        des.join(trend.select("event_type", "hidx", "t"),
                 ["event_type", "hidx"], "left")
        .select(
            "event_type",
            F.col("hidx").cast("bigint").alias("hidx"),
            F.col("y").cast("bigint").alias("mean_micro"),
            F.col("seasonal").cast("bigint").alias("seasonal_micro"),
            F.col("t").cast("bigint").alias("trend_micro"),
            (F.col("dv") - F.col("t")).cast("bigint")
            .alias("remainder_micro"),
        )
        .orderBy("event_type", "hidx")
    )


@query(
    "win_drawdown",
    oracle="""
WITH cents AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         MAX(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS runmax
  FROM events WHERE value IS NOT NULL
),
dd AS (
  SELECT user_id, runmax - c AS dd,
         CASE WHEN runmax > 0
              THEN ((runmax - c) * 1000000) // runmax ELSE 0 END AS ddm
  FROM cents
)
SELECT user_id,
       CAST(MAX(dd) AS BIGINT) AS max_dd_cents,
       CAST(MAX(ddm) AS BIGINT) AS max_dd_micro,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM dd GROUP BY user_id
HAVING MAX(dd) > 0
ORDER BY user_id
""",
    family=_FAM,
)
def win_drawdown(spark, sf_dir):
    """Maximum drawdown per user series — the classic running-peak
    window statistic (finance's risk gate, equally a sensor-health
    monitor): running max of the integer-cents value over (ts,
    event_id) order, drawdown = peak - current, reported as the worst
    absolute drop AND the worst relative drop in integer micro-units
    (floor-div — no float division order to disagree on). Only
    drawn-down users emit (HAVING > 0).

    Plan: ONE window exchange on user_id (growing ROWS frame — the
    O(p) incremental processor, never the shrinking-frame quadratic),
    then a combiner-shape re-aggregate on the same key; the second
    stage reuses the window's hash partitioning, so one shuffle total
    end-to-end. Scales to any user cardinality; per-user series length
    is the only frame cost."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = ev.select(
        "user_id", c.alias("c"), F.max(c).over(w).alias("runmax")
    )
    dd = cents.select(
        "user_id",
        (F.col("runmax") - F.col("c")).alias("dd"),
        F.when(
            F.col("runmax") > 0,
            F.expr("((runmax - c) * 1000000) div runmax"),
        ).otherwise(F.lit(0)).alias("ddm"),
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.max("dd").cast("bigint").alias("max_dd_cents"),
            F.max("ddm").cast("bigint").alias("max_dd_micro"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .filter(F.col("max_dd_cents") > 0)
        .orderBy("user_id")
    )


@query(
    "ts_mann_kendall",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, day
),
pairs AS (
  SELECT a.event_type,
         SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type
),
nn AS (SELECT event_type, COUNT(*) AS n FROM daily GROUP BY event_type)
SELECT n.event_type,
       CAST(COALESCE(p.s, 0) AS BIGINT) AS s,
       CAST(n.n AS BIGINT) AS n_days,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) AS BIGINT) AS var18,
       CASE WHEN COALESCE(p.s, 0) > 0 THEN 'increasing'
            WHEN COALESCE(p.s, 0) < 0 THEN 'decreasing'
            ELSE 'no trend' END AS direction,
       180000 * COALESCE(p.s, 0) * COALESCE(p.s, 0)
         > 38416 * n.n * (n.n - 1) * (2 * n.n + 5) AS significant
FROM nn n LEFT JOIN pairs p ON n.event_type = p.event_type
ORDER BY n.event_type
""",
    family=_FAM,
)
def ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per event type — the nonparametric
    monotone-trend gate (no distribution assumption, robust to the
    fixture's seasonality): S = sum over day pairs of
    sign(x_later - x_earlier) on the DAILY integer-cents series, with
    the normal-approximation significance test kept in exact integers
    (z^2 > 1.96^2 rewritten as 18e4*S^2 > 38416*n(n-1)(2n+5) — no
    sqrt, no float division for engines to disagree on).

    Scale shape: the O(d^2) pair comparison runs on the AGGREGATED
    daily series (d = days, bounded by the time span — the series
    compression every published MK-at-scale pipeline applies), never
    on raw events: raw rows collapse in one combiner-shape aggregate,
    and the per-type self-join is d^2/2 rows of 3 integers. A century
    of days is 36k rows -> 0.6G pairs per type at the absolute worst;
    the fixture's ~2 years is trivial everywhere."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("x"))
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"), F.col("x").alias("x2"),
    )
    s = (
        daily.join(
            b, (daily.event_type == b.et2) & (daily.day < b.day2)
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("x2") > F.col("x"), 1)
                .when(F.col("x2") < F.col("x"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count("*").alias("n"))
    sC = F.coalesce(F.col("s"), F.lit(0))
    var18 = F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
    return (
        nn.join(s, "event_type", "left")
        .select(
            "event_type",
            sC.cast("bigint").alias("s"),
            F.col("n").cast("bigint").alias("n_days"),
            var18.cast("bigint").alias("var18"),
            F.when(sC > 0, "increasing")
            .when(sC < 0, "decreasing")
            .otherwise("no trend").alias("direction"),
            (F.lit(180000) * sC * sC > F.lit(38416) * var18).alias(
                "significant"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "ts_holt_winters",
    oracle="""
WITH RECURSIVE series AS (
  SELECT o_orderstatus AS g,
         CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY g, d
),
idx AS MATERIALIZED (
  SELECT g, d, CAST(y AS BIGINT) AS y,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM series
),
rec AS (
  SELECT g, i, n, CAST(y AS BIGINT) AS lev, CAST(0 AS BIGINT) AS tr
  FROM idx WHERE i = 1
  UNION ALL
  SELECT x.g, x.i, x.n,
         CAST(((2*x.y + 8*(r.lev + r.tr)) - (((2*x.y + 8*(r.lev + r.tr)) % 10 + 10) % 10)) // 10 AS BIGINT) AS lev,
         CAST(((((((2*x.y + 8*(r.lev + r.tr)) - (((2*x.y + 8*(r.lev + r.tr)) % 10 + 10) % 10)) // 10) - r.lev) + 9*r.tr) - (((((((2*x.y + 8*(r.lev + r.tr)) - (((2*x.y + 8*(r.lev + r.tr)) % 10 + 10) % 10)) // 10) - r.lev) + 9*r.tr) % 10 + 10) % 10)) // 10 AS BIGINT) AS tr
  FROM rec r JOIN idx x ON x.g = r.g AND x.i = r.i + 1
)
SELECT g AS o_orderstatus,
       CAST(n AS BIGINT) AS n_weeks,
       lev AS level_final, tr AS trend_final,
       lev + tr AS fc_1, lev + 2 * tr AS fc_2, lev + 3 * tr AS fc_3
FROM rec WHERE i = n
ORDER BY g
""",
    family=_FAM,
)
def ts_holt_winters(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (the two-
    parameter member of the Holt-Winters family) over each order
    status's weekly-revenue series, with 3-step-ahead forecasts
    level + h*trend. A recurrence is inherently sequential per series,
    so the Spark side is applyInPandas per series key — the idiomatic
    shape for per-series state (parallelism = number of series, which
    is what a 100 TB deployment has thousands of, while each series
    stays memory-bounded); the DuckDB oracle replays the SAME
    recurrence as a recursive CTE advancing all series in lockstep
    (weekly buckets keep the oracle's recursion ~350 steps).

    Determinism across engines: floats drift over a multi-hundred-step
    recurrence, so the state is INTEGER cents with alpha=0.2 / beta=0.1
    as exact rational updates — level' = fd(2y + 8(level+trend), 10),
    trend' = fd((level'-level) + 9*trend, 10) — where fd is FLOOR
    division spelled (e - posmod(e,10))/10 in SQL (exact for negative
    trends, where DuckDB's // and Python's // could otherwise be
    conflated with truncation) and Python's native // in the kernel."""
    import pandas as pd

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderstatus",
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("y")
    )

    schema = (
        "o_orderstatus string, n_weeks bigint, level_final bigint, "
        "trend_final bigint, fc_1 bigint, fc_2 bigint, fc_3 bigint"
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = [int(v) for v in pdf["y"]]
        lev, tr = ys[0], 0
        for y in ys[1:]:
            nl = (2 * y + 8 * (lev + tr)) // 10
            tr = ((nl - lev) + 9 * tr) // 10
            lev = nl
        return pd.DataFrame([{
            "o_orderstatus": pdf["o_orderstatus"].iloc[0],
            "n_weeks": len(ys),
            "level_final": lev, "trend_final": tr,
            "fc_1": lev + tr, "fc_2": lev + 2 * tr, "fc_3": lev + 3 * tr,
        }])

    return (
        daily.groupBy("o_orderstatus")
        .applyInPandas(holt, schema)
        .orderBy("o_orderstatus")
    )


def _ets_damped_oracle() -> str:
    """Recursive-CTE lockstep replay of the damped-trend recurrence,
    exact floor-division rationals (the ts_holt_winters fd spelling)."""
    def fd(e: str, d: int) -> str:
        return f"(({e}) - ((({e}) % {d} + {d}) % {d})) // {d}"

    pb = fd("9*r.tr", 10)
    lev_new = fd(f"2*x.y + 8*(r.lev + {pb})", 10)
    tr_new = fd(f"(({lev_new}) - r.lev) + 9*({pb})", 10)
    db1 = fd("9*tr", 10)
    db2 = fd(f"9*({db1})", 10)
    db3 = fd(f"9*({db2})", 10)
    return f"""
WITH RECURSIVE series AS (
  SELECT o_orderstatus AS g,
         CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY g, d
),
idx AS MATERIALIZED (
  SELECT g, d, CAST(y AS BIGINT) AS y,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM series
),
rec AS (
  SELECT g, i, n, CAST(y AS BIGINT) AS lev, CAST(0 AS BIGINT) AS tr
  FROM idx WHERE i = 1
  UNION ALL
  SELECT x.g, x.i, x.n,
         CAST({lev_new} AS BIGINT) AS lev,
         CAST({tr_new} AS BIGINT) AS tr
  FROM rec r JOIN idx x ON x.g = r.g AND x.i = r.i + 1
)
SELECT g AS o_orderstatus,
       CAST(n AS BIGINT) AS n_weeks,
       lev AS level_final, tr AS trend_final,
       lev + ({db1}) AS fc_1,
       lev + ({db1}) + ({db2}) AS fc_2,
       lev + ({db1}) + ({db2}) + ({db3}) AS fc_3
FROM rec WHERE i = n
ORDER BY g
"""


@query("ts_forecast_ets_damped", oracle=_ets_damped_oracle(), family=_FAM)
def ts_forecast_ets_damped(spark, sf_dir):
    """DAMPED-TREND exponential smoothing (r15 — VERDICT r14 item 7's
    other half; Gardner & McKenzie 1985 — the single classical method
    the M-competitions showed hardest to beat, and the production
    default for horizon>1 forecasts because an undamped linear trend
    extrapolates without limit):

        l_t = α y_t + (1-α)(l_{{t-1}} + φ b_{{t-1}})
        b_t = β(l_t - l_{{t-1}}) + (1-β) φ b_{{t-1}}
        ŷ_{{t+h}} = l_t + Σ_{{i=1..h}} φ^i b_t

    with α=0.2, β=0.1, φ=0.9 as EXACT rational floor-division updates
    in integer cents (the ts_holt_winters discipline: floats drift
    over a multi-hundred-step recurrence; here every step is
    fd(2y + 8(l + fd(9b,10)), 10) with fd = true floor division —
    Python's native // in the kernel, the (e - posmod(e,10))//10
    spelling in SQL, exact for negative trends). The damped forecast
    sum is the iterated fd(9·,10) chain, so fc_3's trend contribution
    is visibly ≈ 2.44 b vs Holt's 3 b — the damping IS the output
    difference.

    Spark shape: recurrences are inherently sequential per series —
    applyInPandas per series key (parallelism = number of series; each
    series memory-bounded), the idiomatic per-series-state layout at
    100 TB. The oracle replays the same recurrence as a lockstep
    recursive CTE (~350 weekly steps)."""
    import pandas as pd

    o = table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        "o_orderstatus",
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("y")
    )

    schema = (
        "o_orderstatus string, n_weeks bigint, level_final bigint, "
        "trend_final bigint, fc_1 bigint, fc_2 bigint, fc_3 bigint"
    )

    def ets(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = [int(v) for v in pdf["y"]]
        lev, tr = ys[0], 0
        for y in ys[1:]:
            pb = (9 * tr) // 10
            nl = (2 * y + 8 * (lev + pb)) // 10
            tr = ((nl - lev) + 9 * pb) // 10
            lev = nl
        db1 = (9 * tr) // 10
        db2 = (9 * db1) // 10
        db3 = (9 * db2) // 10
        return pd.DataFrame([{
            "o_orderstatus": pdf["o_orderstatus"].iloc[0],
            "n_weeks": len(ys),
            "level_final": lev, "trend_final": tr,
            "fc_1": lev + db1, "fc_2": lev + db1 + db2,
            "fc_3": lev + db1 + db2 + db3,
        }])

    return (
        weekly.groupBy("o_orderstatus")
        .applyInPandas(ets, schema)
        .orderBy("o_orderstatus")
    )


@query(
    "ts_dtw",
    oracle="""
WITH RECURSIVE ser AS MATERIALIZED (
  SELECT o_orderstatus AS g,
         CAST(year(CAST(o_orderdate AS DATE)) * 12
              + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY g, t
),
idx AS MATERIALIZED (
  SELECT g, t, y,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) - 1 AS i,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM ser
),
pairs AS MATERIALIZED (
  SELECT a.g AS g1, b.g AS g2
  FROM (SELECT DISTINCT g FROM ser) a
  JOIN (SELECT DISTINCT g FROM ser) b ON a.g < b.g
),
av AS MATERIALIZED (
  SELECT p.g1, p.g2, x.i, x.y, x.n FROM pairs p JOIN idx x ON x.g = p.g1
),
bv AS MATERIALIZED (
  SELECT p.g1, p.g2, x.i AS j, x.y, x.n AS m
  FROM pairs p JOIN idx x ON x.g = p.g2
),
rec AS (
  SELECT a.g1, a.g2, a.i, b.j, abs(a.y - b.y) AS c, 0 AS age
  FROM av a JOIN bv b ON b.g1 = a.g1 AND b.g2 = a.g2
  WHERE a.i = 0 AND b.j = 0
  UNION ALL
  SELECT * FROM (
    SELECT g1, g2, i, j, c, 1 AS age FROM rec WHERE age = 0
    UNION ALL
    SELECT cd.g1, cd.g2, cd.i, cd.j,
           abs(a.y - b.y) + least(up.c, lf.c, dg.c) AS c, 0 AS age
    FROM (
      SELECT DISTINCT r.g1, r.g2, r.i + m.di AS i, r.j + m.dj AS j
      FROM rec r, (VALUES (1, 0), (0, 1)) AS m(di, dj)
      WHERE r.age = 0
    ) cd
    JOIN av a ON a.g1 = cd.g1 AND a.g2 = cd.g2 AND a.i = cd.i
    JOIN bv b ON b.g1 = cd.g1 AND b.g2 = cd.g2 AND b.j = cd.j
    LEFT JOIN rec up ON up.age = 0 AND up.g1 = cd.g1 AND up.g2 = cd.g2
                    AND up.i = cd.i - 1 AND up.j = cd.j
    LEFT JOIN rec lf ON lf.age = 0 AND lf.g1 = cd.g1 AND lf.g2 = cd.g2
                    AND lf.i = cd.i AND lf.j = cd.j - 1
    LEFT JOIN rec dg ON dg.age = 1 AND dg.g1 = cd.g1 AND dg.g2 = cd.g2
                    AND dg.i = cd.i - 1 AND dg.j = cd.j - 1
  )
),
nm AS (
  SELECT a.g1, a.g2, a.n, b.m
  FROM (SELECT DISTINCT g1, g2, n FROM av) a
  JOIN (SELECT DISTINCT g1, g2, m FROM bv) b
    ON b.g1 = a.g1 AND b.g2 = a.g2
)
SELECT r.g1, r.g2, CAST(nm.n AS BIGINT) AS n, CAST(nm.m AS BIGINT) AS m,
       CAST(r.c AS BIGINT) AS dtw_cost
FROM rec r JOIN nm ON nm.g1 = r.g1 AND nm.g2 = r.g2
WHERE r.age = 0 AND r.i = nm.n - 1 AND r.j = nm.m - 1
ORDER BY r.g1, r.g2
""",
    family=_FAM,
)
def ts_dtw(spark, sf_dir):
    """DYNAMIC TIME WARPING distance between every pair of order-status
    monthly-revenue series (integer cents, |.| local cost, the classic
    (i-1,j)/(i,j-1)/(i-1,j-1) recurrence) — the alignment-invariant
    series distance exact SQL windows cannot express. The Spark side is
    the idiomatic per-pair grouped-map: both series of a pair are
    tagged and co-grouped, the O(n*m) DP runs in one pandas kernel
    (parallelism = number of pairs — a production deployment aligns
    thousands of series pairs, each memory-bounded at months-
    granularity); the DuckDB oracle replays the SAME DP as an
    ANTI-DIAGONAL recursive CTE: the working set is the last two
    diagonals (age 0/1), each iteration derives diagonal d's cells from
    its up/left (age 0) and diagonal (age 1) predecessors — integer
    costs, so both engines agree exactly.

    Scale: all pair-expansion is an equi-join of the tiny pair spine
    against the monthly aggregate (the month-level combiner collapses the
    raw table first); nothing quadratic ever touches row-level data."""
    import pandas as pd

    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderstatus").alias("g"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint").alias("t"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("y")
    )
    gs = monthly.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g1"))
        .join(F.broadcast(gs.select(F.col("g").alias("g2"))),
              F.col("g1") < F.col("g2"))
    )
    expand = (
        pairs.join(monthly, monthly.g == pairs.g1)
        .select("g1", "g2", F.lit("a").alias("side"), "t", "y")
        .unionByName(
            pairs.join(monthly, monthly.g == pairs.g2)
            .select("g1", "g2", F.lit("b").alias("side"), "t", "y")
        )
    )

    schema = "g1 string, g2 string, n bigint, m bigint, dtw_cost bigint"

    def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == "a"].sort_values("t")["y"].tolist()
        b = pdf[pdf["side"] == "b"].sort_values("t")["y"].tolist()
        n, m = len(a), len(b)
        prev = None
        for i in range(n):
            cur = [0] * m
            for j in range(m):
                c = abs(int(a[i]) - int(b[j]))
                if i == 0 and j == 0:
                    cur[j] = c
                else:
                    best = None
                    for cand in (
                        prev[j] if i > 0 else None,
                        cur[j - 1] if j > 0 else None,
                        prev[j - 1] if i > 0 and j > 0 else None,
                    ):
                        if cand is not None and (best is None or cand < best):
                            best = cand
                    cur[j] = c + best
            prev = cur
        return pd.DataFrame([{
            "g1": pdf["g1"].iloc[0], "g2": pdf["g2"].iloc[0],
            "n": n, "m": m, "dtw_cost": prev[m - 1],
        }])

    return (
        expand.groupBy("g1", "g2")
        .applyInPandas(dtw, schema)
        .orderBy("g1", "g2")
    )


@query(
    "ts_pattern_match",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events WHERE event_type IN ('view', 'purchase')
),
runs0 AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM e
),
runs AS (
  SELECT user_id, event_type, grp,
         CAST(COUNT(*) AS BIGINT) AS run_len,
         MIN(pos) AS run_pos
  FROM runs0 GROUP BY user_id, event_type, grp
),
seq AS (
  SELECT user_id, event_type, run_len,
         lead(event_type) OVER w AS next_type,
         lead(run_len) OVER w AS next_len
  FROM runs
  WINDOW w AS (PARTITION BY user_id ORDER BY run_pos)
),
matches AS (
  SELECT user_id, run_len AS views_run, next_len AS purchases_run
  FROM seq
  WHERE event_type = 'view' AND next_type = 'purchase'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(SUM(views_run) AS BIGINT) AS views_consumed,
       CAST(SUM(purchases_run) AS BIGINT) AS purchases_consumed,
       CAST(MAX(views_run) AS BIGINT) AS longest_view_run
FROM matches
GROUP BY user_id
ORDER BY user_id
""",
    family=_FAM,
)
def ts_pattern_match(spark, sf_dir):
    """EVENT-PATTERN MATCHING (the MATCH_RECOGNIZE / Flink-CEP
    primitive, pattern `V+ P+`): per user, in event-time order, every
    maximal run of consecutive 'view's immediately followed by a run
    of 'purchase's is one match — the contiguity constraint is what
    neither ts_funnel (ordered steps, gaps allowed) nor win_sessionize
    (time-gap grouping) expresses. Runs come from the gaps-and-islands
    identity (row_number over the stream minus row_number within the
    type — both share ONE partition sort), adjacency from a lead()
    over the per-user run sequence ordered by each run's first STREAM
    POSITION (tied timestamps across adjacent runs would make a
    run_start-timestamp ordering ambiguous); total order (ts,
    event_id) makes positions engine-exact.

    Scale: two window functions over the same (user_id, ts, event_id)
    sort — Catalyst evaluates them in one shuffle + sort per user
    partition — then a run-level aggregate ~1000x smaller than the
    event stream; the adjacency lead() runs on run rows, not events.
    No self-join, no per-event Python: the CEP pattern compiles to
    relational windows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("user_id", "event_id", "ts", "event_type")
    w_all = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    runs0 = ev.withColumn(
        "pos", F.row_number().over(w_all)
    ).withColumn(
        "grp", F.col("pos") - F.row_number().over(w_type)
    )
    runs = runs0.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").cast("bigint").alias("run_len"),
        F.min("pos").alias("run_pos"),
    )
    w_seq = Window.partitionBy("user_id").orderBy(F.col("run_pos").asc())
    seq = runs.select(
        "user_id", "event_type", "run_len",
        F.lead("event_type").over(w_seq).alias("next_type"),
        F.lead("run_len").over(w_seq).alias("next_len"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("next_type") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_matches"),
            F.sum("run_len").cast("bigint").alias("views_consumed"),
            F.sum("next_len").cast("bigint").alias("purchases_consumed"),
            F.max("run_len").cast("bigint").alias("longest_view_run"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_peak_detect",
    oracle="""
WITH b AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
w AS (
  SELECT user_id, event_id, c,
         lag(c) OVER u AS pc, lead(c) OVER u AS nc,
         MIN(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS lmin,
         MIN(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS rmin,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM b WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)
),
p AS (
  SELECT user_id, event_id, n_events,
         c - GREATEST(lmin, rmin) AS prom
  FROM w
  WHERE pc IS NOT NULL AND nc IS NOT NULL AND c > pc AND c >= nc
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY prom DESC, event_id ASC) AS rn
  FROM p
)
SELECT user_id,
       CAST(ANY_VALUE(n_events) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_peaks,
       CAST(SUM(CASE WHEN prom >= 6000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_major,
       CAST(MAX(prom) AS BIGINT) AS max_prom,
       CAST(MAX(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
         AS top_peak_event
FROM r
GROUP BY user_id
ORDER BY user_id
""",
    family=_FAM,
)
def ts_peak_detect(spark, sf_dir):
    """LOCAL-MAXIMA PEAK DETECTION with windowed prominence (r12 — the
    alerting primitive next to ts_anomaly_mad: MAD flags level
    outliers, this finds SHAPE events, spikes that rise and fall,
    regardless of absolute level): a peak strictly exceeds its
    predecessor and is >= its successor (plateau-right rule, so flat
    tops count once; series endpoints are never peaks), and its
    prominence is height above the HIGHER of the two neighborhood
    floors (min over 5 rows on each side) — the scipy find_peaks
    prominence contract restricted to a bounded window, which is what
    makes it a streaming-friendly, shuffle-once computation instead of
    a global stack walk. Major peaks clear 60.00 value units
    (~the fixture's median prominence, so BOTH branches fire at every
    checked SF: ~50/50 major/minor). The per-user champion peak is
    pinned by (prominence DESC, event_id ASC) argmax.

    Determinism: cents are integers; lag/lead/min frames over the
    total (ts, event_id) order are exact in both engines. Scale: ONE
    shuffle on user_id serves every window (lag, lead, two bounded
    min-frames, the count, and the champion rank all share the sort),
    then one combiner-shape rollup — no join anywhere."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = b.select(
        "user_id", "event_id", "c",
        F.lag("c").over(u).alias("pc"),
        F.lead("c").over(u).alias("nc"),
        F.min("c").over(u.rowsBetween(-5, -1)).alias("lmin"),
        F.min("c").over(u.rowsBetween(1, 5)).alias("rmin"),
        F.count("*").over(Window.partitionBy("user_id"))
        .alias("n_events"),
    )
    p = w.filter(
        F.col("pc").isNotNull() & F.col("nc").isNotNull()
        & (F.col("c") > F.col("pc")) & (F.col("c") >= F.col("nc"))
    ).select(
        "user_id", "event_id", "n_events",
        (F.col("c") - F.greatest("lmin", "rmin")).alias("prom"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("prom").desc(), F.col("event_id").asc()
    )
    r = p.withColumn("rn", F.row_number().over(wr))
    return (
        r.groupBy("user_id")
        .agg(
            F.first("n_events").cast("bigint").alias("n_events"),
            F.count("*").cast("bigint").alias("n_peaks"),
            F.sum((F.col("prom") >= 6000).cast("int")).cast("bigint")
            .alias("n_major"),
            F.max("prom").cast("bigint").alias("max_prom"),
            F.max(F.when(F.col("rn") == 1, F.col("event_id")))
            .cast("bigint").alias("top_peak_event"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_attribution_multitouch",
    oracle="""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts, cents AS conv_cents
  FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, event_type AS channel,
         ts AS touch_ts
  FROM ev WHERE event_type IN ('click', 'view', 'signup')
),
j AS (
  SELECT c.conv_id, c.conv_cents, t.channel, t.touch_ts, t.touch_id
  FROM conv c JOIN touch t ON t.user_id = c.user_id
  WHERE t.touch_ts < c.conv_ts
    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
),
ranked AS (
  SELECT conv_id, conv_cents, channel,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts ASC, touch_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts DESC, touch_id DESC) AS rn_d,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM j
),
attributed AS (
  SELECT channel,
         CAST(1 AS BIGINT) AS n_touches,
         CASE WHEN rn_a = 1 THEN conv_cents ELSE 0 END AS first_cents,
         CASE WHEN rn_d = 1 THEN conv_cents ELSE 0 END AS last_cents,
         conv_cents // n
           + CASE WHEN rn_a = 1 THEN conv_cents % n ELSE 0 END
           AS linear_cents
  FROM ranked
  UNION ALL
  SELECT 'DIRECT' AS channel, CAST(1 AS BIGINT) AS n_touches,
         conv_cents AS first_cents, conv_cents AS last_cents,
         conv_cents AS linear_cents
  FROM conv c ANTI JOIN (SELECT DISTINCT conv_id FROM j) u
    ON u.conv_id = c.conv_id
)
SELECT channel,
       CAST(SUM(n_touches) AS BIGINT) AS n_touches,
       CAST(SUM(first_cents) AS BIGINT) AS first_touch_cents,
       CAST(SUM(last_cents) AS BIGINT) AS last_touch_cents,
       CAST(SUM(linear_cents) AS BIGINT) AS linear_cents
FROM attributed
GROUP BY channel
ORDER BY channel
""",
    family=_FAM,
)
def ts_attribution_multitouch(spark, sf_dir):
    """MULTI-TOUCH ATTRIBUTION (r13 — the marketing-analytics staple
    next to ts_funnel's ordered-step counts: every conversion's value
    is credited back across the touches that preceded it): purchases
    are conversions; click/view/signup events by the same user within
    a 7-day lookback are touches. THREE attribution models computed in
    one pass — first-touch (100% to the earliest touch), last-touch
    (100% to the latest), and linear (value split 1/n per touch) —
    with the classic DIRECT bucket for conversions that had no touch
    in the window (full credit under every model). Linear splits are
    INTEGER-EXACT: each touch gets cents DIV n and the remainder rides
    the first touch, so per-channel sums reconcile to total conversion
    value to the cent in both engines (no float shares), and the
    first/last tie-break is total ((touch_ts, touch_id)).

    Plan: the touch x conversion pairing joins on (user_id, WEEK
    BUCKET) — the join_range_bucketed idiom: each touch is exploded
    into its own week bucket and the next (a 7-day lookback can only
    cross one boundary), each conversion keeps its single bucket, so a
    pair is emitted at most once and candidate volume is bounded by
    per-(user, week) activity DENSITY, never by a user's lifetime
    event count. The naive per-user equi-join is quadratic inside a
    hot user — on the 1M-event stress corpus, where one user holds 27%
    of events, it materializes ~9 BILLION pairs and ran past 9
    minutes; the bucketed join runs the same result in 6.4 s
    (result-identical, so the oracle replays the plain join+filter).
    Two more measured scale levers on the same corpus: the pair stream
    collapses to (conversion, channel) rows via a HashAggregate-able
    DECIMAL time key BEFORE any window (a struct min/max would force
    SortAggregate over every pair), and the join's parallelism is
    pinned with repartition(defaultParallelism, keys) because its
    shuffle INPUTS are compact — AQE would coalesce to ~1 partition
    while the pair explosion happens after the exchange, invisible to
    the size estimate (the r8 lesson). After the collapse: one
    sum/min/max window over <=3 channel rows per conversion, one
    anti-join for DIRECT, one combiner rollup."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    week = lambda c: (F.unix_timestamp(c) / 604800).cast("bigint")  # noqa: E731
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id",
        F.col("ts").alias("conv_ts"),
        F.col("cents").alias("conv_cents"),
        week(F.col("ts")).alias("bkt"),
    )
    touch = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .select(
            F.col("event_id").alias("touch_id"), "user_id",
            F.col("event_type").alias("channel"),
            F.col("ts").alias("touch_ts"),
            week(F.col("ts")).alias("tb"),
        )
        .select(
            "touch_id", "user_id", "channel", "touch_ts",
            F.explode(
                F.array(F.col("tb"), F.col("tb") + 1)
            ).alias("bkt"),
        )
    )
    # tkey: (touch_ts, touch_id) as ONE DECIMAL(38,0) — micros x 10^7 +
    # id orders identically to the tuple (ids are < 10^7 in every
    # corpus; a wider id space widens the multiplier). A struct min/max
    # would force SortAggregate (structs have no mutable agg buffer),
    # sorting the full pair stream per partition — the decimal key
    # keeps the collapse a HashAggregate (measured 86 s -> ~7 s at the
    # 1M-event skew corpus).
    # pin the join parallelism: the shuffle INPUTS are compact (AQE
    # would coalesce them to ~1 partition) but the pair stream is
    # generated inside the join, invisible to AQE's size estimate —
    # the r8 lesson (repartition(defaultParallelism, cols) when the
    # work explodes after the exchange)
    par = spark.sparkContext.defaultParallelism
    conv = conv.repartition(par, "user_id", "bkt")
    touch = touch.repartition(par, "user_id", "bkt")
    j = conv.join(touch, ["user_id", "bkt"]).filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    ).select(
        "conv_id", "conv_cents", "channel",
        (
            F.unix_micros("touch_ts").cast("decimal(38,0)") * 10000000
            + F.col("touch_id")
        ).alias("tkey"),
    )
    # Collapse PAIRS -> (conversion, channel) with a combiner aggregate
    # BEFORE any window: the map side reduces each conversion's touch
    # list to <= 3 channel rows carrying (count, earliest, latest), so
    # the windows below run over per-conversion groups of <= 3 rows
    # instead of the full pair stream; per-touch semantics preserved
    # exactly — linear shares are per-touch DIV so a channel's share
    # = cnt * share.
    g = j.groupBy("conv_id", "conv_cents", "channel").agg(
        F.count("*").alias("cnt"),
        F.min("tkey").alias("first_t"),
        F.max("tkey").alias("last_t"),
    )
    wc = Window.partitionBy("conv_id")
    ranked = g.select(
        "conv_id", "conv_cents", "channel", "cnt",
        F.sum("cnt").over(wc).alias("n"),
        (F.col("first_t") == F.min("first_t").over(wc)).alias("is_first"),
        (F.col("last_t") == F.max("last_t").over(wc)).alias("is_last"),
    )
    attributed = ranked.select(
        "channel",
        F.col("cnt").cast("bigint").alias("n_touches"),
        F.when(F.col("is_first"), F.col("conv_cents")).otherwise(0)
        .alias("first_cents"),
        F.when(F.col("is_last"), F.col("conv_cents")).otherwise(0)
        .alias("last_cents"),
        (
            F.col("cnt") * F.expr("conv_cents div n")
            + F.when(F.col("is_first"), F.col("conv_cents") % F.col("n"))
            .otherwise(0)
        ).alias("linear_cents"),
    )
    direct = (
        conv.join(j.select("conv_id").distinct(), "conv_id", "left_anti")
        .select(
            F.lit("DIRECT").alias("channel"),
            F.lit(1).cast("bigint").alias("n_touches"),
            F.col("conv_cents").alias("first_cents"),
            F.col("conv_cents").alias("last_cents"),
            F.col("conv_cents").alias("linear_cents"),
        )
    )
    return (
        attributed.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.sum("n_touches").cast("bigint").alias("n_touches"),
            F.sum("first_cents").cast("bigint").alias("first_touch_cents"),
            F.sum("last_cents").cast("bigint").alias("last_touch_cents"),
            F.sum("linear_cents").cast("bigint").alias("linear_cents"),
        )
        .orderBy("channel")
    )


def _mp_sub_sql() -> str:
    """Shared matrix-profile front half (daily mean-cents rollup ->
    lead-widened 7-point subsequences -> den>0 live set) — the CTE
    prefix both the self-join and the AB-join profiles replay."""
    return """WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         SUM(CAST(round(value * 100) AS BIGINT))
           // COUNT(*) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, day
),
idxd AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
wide AS (
  SELECT event_type, i,
         x AS x0,
         lead(x, 1) OVER w AS x1, lead(x, 2) OVER w AS x2,
         lead(x, 3) OVER w AS x3, lead(x, 4) OVER w AS x4,
         lead(x, 5) OVER w AS x5, lead(x, 6) OVER w AS x6
  FROM idxd
  WINDOW w AS (PARTITION BY event_type ORDER BY i)
),
sub AS (
  SELECT event_type, i, x0, x1, x2, x3, x4, x5, x6,
         x0 + x1 + x2 + x3 + x4 + x5 + x6 AS s,
         7 * (x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6)
           - (x0 + x1 + x2 + x3 + x4 + x5 + x6)
             * (x0 + x1 + x2 + x3 + x4 + x5 + x6) AS den
  FROM wide WHERE x6 IS NOT NULL
),
live AS (SELECT * FROM sub WHERE den > 0)"""


def _matrix_profile_oracle() -> str:
    """Lockstep twin of ts_matrix_profile: daily mean-cents series ->
    lead-widened 7-point subsequences -> exclusion-zone pairwise
    correlation argmax, all in the exact integer algebra (HUGEINT //
    mirrors Spark's DECIMAL(38,0) div on the non-negative magnitude)."""
    x = " + ".join(f"a.x{k} * b.x{k}" for k in range(7))
    return _mp_sub_sql() + f""",
pairs AS (
  SELECT a.event_type, a.i AS i, b.i AS j,
         7 * ({x}) - a.s * b.s AS num,
         a.den AS den_a, b.den AS den_b
  FROM live a JOIN live b
    ON a.event_type = b.event_type AND abs(a.i - b.i) > 2
),
keyed AS (
  SELECT event_type, i, j,
         CASE WHEN num >= 0
              THEN (CAST(num AS HUGEINT) * num * 1000000)
                   // (CAST(den_a AS HUGEINT) * den_b)
              ELSE -((CAST(num AS HUGEINT) * num * 1000000)
                     // (CAST(den_a AS HUGEINT) * den_b)) END AS key
  FROM pairs
),
ranked AS (
  SELECT event_type, i, j, key,
         row_number() OVER (
           PARTITION BY event_type, i
           ORDER BY key DESC, j ASC) AS rk
  FROM keyed
)
SELECT event_type, CAST(i AS BIGINT) AS i,
       CAST(j AS BIGINT) AS nn_i,
       CAST(key AS BIGINT) AS corr2_signed_micro,
       CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_subseq
FROM ranked WHERE rk = 1
ORDER BY event_type, i
"""


def _mp_live(spark, sf_dir):
    """Shared matrix-profile front half (Spark side): one raw pass to
    the daily mean-cents grid, one WindowExec for row_number + six
    leads, exact S/SS/den moments, den>0 filter — localCheckpointed
    so every profile variant joins the calendar-sized frame without
    re-deriving it."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = F.round(F.col("value") * 100).cast("bigint")
    daily = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400)
            .cast("bigint").alias("day"),
        )
        .agg(F.expr("sum(cast(round(value * 100) as bigint)) div count(*)")
             .alias("x"))
    )
    # row_number AND the 6 leads share one window spec (partition by
    # type, order by day == order by i), so Catalyst plans ONE
    # WindowExec — one exchange+sort instead of two
    wi = Window.partitionBy("event_type").orderBy("day")
    xs = [F.col("x").alias("x0")] + [
        F.lead("x", k).over(wi).alias(f"x{k}") for k in range(1, 7)
    ]
    wide = daily.select(
        "event_type", F.row_number().over(wi).alias("i"), *xs
    )
    s = sum(F.col(f"x{k}") for k in range(7))
    ss = sum(F.col(f"x{k}") * F.col(f"x{k}") for k in range(7))
    sub = wide.filter(F.col("x6").isNotNull()).select(
        "event_type", "i", *[f"x{k}" for k in range(7)],
        s.alias("s"), (F.lit(7) * ss - s * s).alias("den"),
    )
    # ONE raw pass: the subsequence frame is calendar-sized (types x
    # days), so materialize it once and join the copy against itself —
    # without this the self-join + count lineage re-scans raw events
    # three times (the llm_rag_mmr / mr_hits reuse discipline)
    live = sub.filter(F.col("den") > 0).localCheckpoint()
    return live


@query("ts_matrix_profile", oracle=_matrix_profile_oracle(), family=_FAM)
def ts_matrix_profile(spark, sf_dir):
    """MATRIX PROFILE (r15 — Yeh et al. ICDM 2016, the all-pairs
    subsequence-similarity self-join that unified motif and discord
    discovery): for every length-7 subsequence of each event_type's
    daily series, find its nearest non-trivial neighbor under
    z-normalized distance and report the match index plus a signed
    squared-correlation score. Motifs are the high-corr2 rows, the
    discord is the per-type minimum.

    Exactness: the series value is the daily mean in integer cents
    (floor-div — bounded by max-cents regardless of SF, so every later
    product fits 128-bit headroom at ANY scale). z-normalized nearness
    orders identically to Pearson correlation, and for a fixed query
    subsequence corr^2 with sign is monotone in corr, so the argmax
    needs NO floats: num = 7*QT - S_a*S_b, den = 7*SS - S^2 are exact
    BIGINTs and the sort key is sign(num) * (num^2 * 1e6) div
    (den_a * den_b) in DECIMAL(38,0) — Spark div == DuckDB HUGEINT //
    on the non-negative magnitude (the agg_gini discipline). Floor
    quantization can only TIE truly-distinct corrs at the 1e-6 level;
    ties break on neighbor index, identically in both engines.
    Constant subsequences (den = 0) have no defined z-norm and are
    excluded from both sides; the trivial-match exclusion zone is
    |i - j| > 2 (STUMPY's ceil(m/4) default for m = 7).

    Plan: one groupBy to the daily grid, ONE window exchange per type
    for the lead-widening (row_number and all six leads share a window
    spec -> one WindowExec; 7 columns, no arrays — element arithmetic
    stays in whole-stage codegen, the r9 higher-order-function
    lesson). The calendar-sized subsequence frame is localCheckpointed
    ONCE so the self-join + profile count never re-derive it — the raw
    ->daily rollup is the single full-data pass (without the
    checkpoint the lineage re-scans raw events three times). The
    O(n_sub^2)-per-type join runs on the DOWNSAMPLED grid (types x
    days rows, the ts_mann_kendall bounded-spine shape); a
    raw-resolution profile would tile it (SCAMP-style diagonal blocks)
    without changing this algebra."""
    live = _mp_live(spark, sf_dir)
    a = live.select(
        "event_type", F.col("i").alias("ia"), F.col("s").alias("sa"),
        F.col("den").alias("den_a"),
        *[F.col(f"x{k}").alias(f"a{k}") for k in range(7)],
    )
    b = live.select(
        "event_type", F.col("i").alias("jb"), F.col("s").alias("sb"),
        F.col("den").alias("den_b"),
        *[F.col(f"x{k}").alias(f"b{k}") for k in range(7)],
    )
    qt = sum(F.col(f"a{k}") * F.col(f"b{k}") for k in range(7))
    pairs = (
        a.join(b, "event_type")
        .filter(F.abs(F.col("ia") - F.col("jb")) > 2)
        .select(
            "event_type", "ia", "jb", "den_a", "den_b",
            (F.lit(7) * qt - F.col("sa") * F.col("sb")).alias("num"),
        )
    )
    keyed = pairs.select(
        "event_type", "ia", "jb",
        F.expr(
            "CASE WHEN num >= 0"
            " THEN (CAST(num AS DECIMAL(38,0)) * num * 1000000)"
            "      div (CAST(den_a AS DECIMAL(38,0)) * den_b)"
            " ELSE -((CAST(num AS DECIMAL(38,0)) * num * 1000000)"
            "        div (CAST(den_a AS DECIMAL(38,0)) * den_b)) END"
        ).alias("key"),
    )
    # r15-opt (guide §2.3, the r13 decimal-key discipline — same swap as
    # ts_matrix_profile_ab): the nearest-neighbor pick was a row_number
    # window sorting the whole O(n_sub^2)-per-type pair stream; a plain
    # bigint MAX over the packed key collapses it map-side to one row
    # per subsequence. |key| <= 1e6 (Cauchy-Schwarz), jb < 1e9
    # (calendar-bounded), den>0 filtered upstream so key is never NULL.
    packed = keyed.select(
        "event_type", "ia",
        (
            (F.col("key").cast("bigint") + F.lit(1000000))
            * F.lit(1000000000)
            + (F.lit(999999999) - F.col("jb"))
        ).alias("pk"),
    )
    best = packed.groupBy("event_type", "ia").agg(F.max("pk").alias("pk"))
    return (
        best.withColumn(
            # profiled-subsequence count per type, windowless second
            # pass avoided: every live subsequence emits exactly one
            # profile row whenever it has >= 1 admissible neighbor
            # (always true past ~6 points), so counting emitted rows
            # IS the live count — same expression in the oracle
            "n_subseq",
            F.count("*").over(Window.partitionBy("event_type"))
            .cast("bigint"),
        )
        .select(
            "event_type",
            F.col("ia").cast("bigint").alias("i"),
            (F.lit(999999999) - F.expr("pmod(pk, 1000000000)"))
            .cast("bigint").alias("nn_i"),
            (F.expr("pk div 1000000000") - F.lit(1000000))
            .cast("bigint").alias("corr2_signed_micro"),
            "n_subseq",
        )
        .orderBy("event_type", "i")
    )


_ESD_ROUNDS = 3


def _esd_round_ctes(idc: str) -> str:
    """The Rosner round CTEs (lower-median, MAD, worst deviator,
    scaled-MAD test, anti-join removal), parameterized by the series
    id column so ts_anomaly_esd (day) and ts_seasonal_hybrid_esd
    (hidx) replay the identical machinery. Expects act0(event_type,
    {idc}, x); emits cand1..candK and the allc union."""
    parts = []
    for r in range(1, _ESD_ROUNDS + 1):
        q = r - 1
        parts.append(f"""
medx{r} AS MATERIALIZED (
  SELECT event_type, x AS med FROM (
    SELECT event_type, x,
           row_number() OVER (
             PARTITION BY event_type ORDER BY x, {idc}) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM act{q}) WHERE rn = (n + 1) // 2
),
dev{r} AS MATERIALIZED (
  SELECT a.event_type, a.{idc}, a.x, m.med, ABS(a.x - m.med) AS dev
  FROM act{q} a JOIN medx{r} m ON a.event_type = m.event_type
),
mad{r} AS MATERIALIZED (
  SELECT event_type, dev AS mad FROM (
    SELECT event_type, dev,
           row_number() OVER (
             PARTITION BY event_type ORDER BY dev, {idc}) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev{r}) WHERE rn = (n + 1) // 2
),
cand{r} AS MATERIALIZED (
  SELECT d.event_type, d.{idc}, d.x, d.med, d.dev, m.mad,
         CASE WHEN m.mad = 0 THEN d.dev > 0
              ELSE d.dev * 10000 > 44478 * m.mad END AS passed
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY dev DESC, {idc} ASC) AS rk
    FROM dev{r}) d
  JOIN mad{r} m ON d.event_type = m.event_type
  WHERE d.rk = 1
),
act{r} AS MATERIALIZED (
  SELECT a.event_type, a.{idc}, a.x FROM act{q} a
  ANTI JOIN cand{r} c
    ON a.event_type = c.event_type AND a.{idc} = c.{idc}
),""")
    union = "\nUNION ALL\n".join(
        f"  SELECT {r} AS esd_round, event_type, {idc}, x, med, dev, mad,"
        f" passed FROM cand{r}"
        for r in range(1, _ESD_ROUNDS + 1)
    )
    return "".join(parts) + f"""
allc AS MATERIALIZED (
{union}
)"""


def _esd_oracle() -> str:
    """Unrolled Rosner replay over the daily mean-cents series, then
    the backward-fill rule (all rounds up to the LAST passing one are
    anomalies)."""
    idc = "day"
    return f"""

WITH act0 AS MATERIALIZED (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, day
),{_esd_round_ctes(idc)},
nn AS MATERIALIZED (
  SELECT event_type, COUNT(*) AS n_days FROM act0 GROUP BY event_type
)
SELECT a.event_type,
       CAST(a.esd_round AS BIGINT) AS esd_round,
       a.day, CAST(a.x AS BIGINT) AS x_cents,
       CAST(a.med AS BIGINT) AS med_cents,
       CAST(a.dev AS BIGINT) AS dev_cents,
       CAST(a.mad AS BIGINT) AS mad_cents,
       a.passed,
       a.esd_round <= COALESCE(MAX(CASE WHEN a.passed THEN a.esd_round END)
         OVER (PARTITION BY a.event_type), 0) AS is_anomaly,
       CAST(n.n_days AS BIGINT) AS n_days
FROM allc a JOIN nn n ON a.event_type = n.event_type
ORDER BY a.event_type, a.esd_round
"""


def _esd_rounds_py(rows):
    """The Rosner rounds, driver side (shared by ts_anomaly_esd and
    ts_seasonal_hybrid_esd; r15-opt): `rows` is the collected active
    frame [(event_type, id, x)] — CALENDAR-BOUNDED (types x days or
    types x hours), never corpus-sized, the same model-sized-state
    argument as llm_topic_lsa's Gram collect. Returns the candidate
    list [(esd_round, event_type, id, x, med, dev, mad, passed)] plus
    {event_type: n} counts, with every step the exact integer twin of
    the Spark machinery it replaced (pinned by
    tests/test_units.py::test_esd_rounds_py_matches_window_form):

    - lower median: row (n+1) div 2 of the active set ordered by
      (x, id) — the old w_med row_number filter;
    - mad: lower median of |x - med| ordered by (dev, id);
    - candidate: worst deviator, (dev DESC, id ASC) tiebreak;
    - test: dev*10000 > 44478*mad, mad == 0 degenerates to dev > 0;
    - removal: anti-join of the one candidate, next round retests.

    All values are Python ints (collected BIGINTs), so there is no
    overflow or rounding surface at all; the old form's 7 eager
    localCheckpoint jobs and 12 rank-window shuffles per query fold
    into zero jobs on the already-collected rows."""
    by_type: dict = {}
    for et, i, x in rows:
        by_type.setdefault(et, []).append((int(i), int(x)))
    counts = {et: len(v) for et, v in by_type.items()}
    cands = []
    for r in range(1, _ESD_ROUNDS + 1):
        for et in sorted(by_type):
            active = by_type[et]
            if not active:
                continue
            n = len(active)
            med = sorted(active, key=lambda t: (t[1], t[0]))[
                (n + 1) // 2 - 1][1]
            devs = [(i, x, abs(x - med)) for i, x in active]
            mad = sorted(devs, key=lambda t: (t[2], t[0]))[
                (n + 1) // 2 - 1][2]
            i, x, dev = min(devs, key=lambda t: (-t[2], t[0]))
            passed = (dev > 0) if mad == 0 else (dev * 10000 > 44478 * mad)
            cands.append((r, et, i, x, med, dev, mad, passed))
            by_type[et] = [t for t in active if t[0] != i]
    return cands, counts


def _esd_stitch(spark, cands, counts, id_name, x_name, unit):
    """Stitch the driver-fold results into the returned frame: the
    backward anomaly rule (every round up to the LAST passing one),
    the per-type count column, and the oracle's column order/types."""
    maxp: dict = {}
    for r, et, _i, _x, _m, _d, _md, passed in cands:
        if passed:
            maxp[et] = max(maxp.get(et, 0), r)
    out = [
        (et, r, i, x, med, dev, mad, passed,
         r <= maxp.get(et, 0), counts[et])
        for r, et, i, x, med, dev, mad, passed in cands
    ]
    schema = (
        f"event_type string, esd_round bigint, {id_name} bigint, "
        f"{x_name}_{unit} bigint, med_{unit} bigint, dev_{unit} bigint, "
        f"mad_{unit} bigint, passed boolean, is_anomaly boolean, "
        f"n_{'days' if id_name == 'day' else 'hours'} bigint"
    )
    return spark.createDataFrame(out, schema).orderBy(
        "event_type", "esd_round"
    )


@query("ts_anomaly_esd", oracle=_esd_oracle(), family=_FAM)
def ts_anomaly_esd(spark, sf_dir):
    """GENERALIZED ESD anomaly detection (r15 — Rosner 1983, the
    remove-and-retest procedure Twitter's S-H-ESD popularized; the
    family's masking-aware tier above the single-pass ts_anomaly_mad):
    repeated outliers MASK each other under any single-pass rule — a
    second extreme inflates the dispersion estimate that should flag
    the first. ESD's fix: K=3 unrolled rounds of (recompute robust
    center+spread on the ACTIVE set) -> (flag the worst deviator) ->
    (remove it and retest), then Rosner's backward rule: every round
    up to the LAST passing one is an anomaly, even if an intermediate
    test failed (the definitional subtlety single-pass rules miss).

    Exactness: the series is the daily mean-cents rollup (the
    ts_matrix_profile spine); center = LOWER MEDIAN (row (n+1) div 2
    of the (x, day)-ordered active set — integer, no midpoint
    average), spread = MAD as the lower median of |x - med|; the test
    dev * 10000 > 44478 * mad is the 3-sigma scaled-MAD rule
    (3 * 1.4826) in exact integers, with the mad = 0 degenerate case
    (over half the set identical) flagging any nonzero deviation —
    identical CASE in both engines. The parametric t-quantile
    refinement of textbook ESD is deliberately replaced by the
    scaled-MAD threshold: bit-exact across engines, and the robust
    variant is what production monitors run.

    Plan (r15-opt, guide §2.4/§5.2): ONE raw pass to the daily grid —
    the only corpus-sized work — collected ONCE (types x days rows,
    calendar-bounded model state, the llm_topic_lsa discipline); the
    three Rosner rounds fold on the driver in exact Python ints
    (_esd_rounds_py — the bit-for-bit twin of the rank-window form it
    replaced, which spent 7 eager localCheckpoint jobs and 12 shuffles
    re-ranking a ~10^3-row frame). At 100 TB only the rollup touches
    raw data; rounds cost O(types x days) regardless of event
    volume."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    act = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400)
            .cast("bigint").alias("day"),
        )
        .agg(F.expr("sum(cast(round(value * 100) as bigint)) div count(*)")
             .alias("x"))
    )
    rows = [(r[0], r[1], r[2]) for r in act.collect()]
    cands, counts = _esd_rounds_py(rows)
    return _esd_stitch(spark, cands, counts, "day", "x", "cents")


@query(
    "ts_forecast_croston",
    oracle="""
WITH RECURSIVE dem AS MATERIALIZED (
  SELECT l_partkey,
         CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP)) / 604800)
              AS BIGINT) AS wk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY l_partkey, wk
),
mn AS MATERIALIZED (SELECT MIN(wk) AS minwk FROM dem),
idx AS MATERIALIZED (
  SELECT l_partkey, wk, y,
         row_number() OVER (PARTITION BY l_partkey ORDER BY wk) AS i,
         lag(wk) OVER (PARTITION BY l_partkey ORDER BY wk) AS pw,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n
  FROM dem
),
walk AS (
  SELECT l_partkey, i, n,
         y * 1000 AS z,
         (wk - (SELECT minwk FROM mn) + 1) * 1000 AS p
  FROM idx WHERE i = 1
  UNION ALL
  SELECT x.l_partkey, x.i, x.n,
         (x.y * 1000 + 4 * w.z) // 5,
         ((x.wk - x.pw) * 1000 + 4 * w.p) // 5
  FROM walk w JOIN idx x
    ON x.l_partkey = w.l_partkey AND x.i = w.i + 1
)
SELECT l_partkey AS p_partkey,
       CAST(n AS BIGINT) AS n_demand_weeks,
       CAST(z AS BIGINT) AS z_milli,
       CAST(p AS BIGINT) AS p_milli_weeks,
       CAST((z * 1000000) // p AS BIGINT) AS croston_rate_micro,
       CAST((z * 900000) // p AS BIGINT) AS sba_rate_micro
FROM walk WHERE i = n AND n >= 2
ORDER BY p_partkey
""",
    family=_FAM,
)
def ts_forecast_croston(spark, sf_dir):
    """CROSTON intermittent-demand forecast (r15 — Croston 1972, plus
    the Syntetos-Boylan bias correction: the forecaster for series
    that are MOSTLY ZERO, where every smoother in the family —
    ts_ewma, ts_holt_winters, ts_forecast_ets_damped — decays toward
    zero between demands and systematically under-forecasts): two
    EWMAs updated ONLY on demand events — demand SIZE z and
    inter-demand INTERVAL p — forecast rate z/p per period, SBA
    variant scaled by (1 - alpha/2). The fixture's textbook instance:
    weekly part-level order quantities (lineitem per partkey) run
    ~30-50 demand weeks over a ~350-week span — spare-parts shaped.

    Exactness (the ts_forecast_ets_damped discipline): alpha = 0.2 as
    the exact floor-division recurrence z' = (y*1000 + 4z) div 5,
    p' = (q*1000 + 4p) div 5 in milli-units (all terms non-negative,
    so floor == trunc in every engine and Python); init z = first
    demand * 1000, p = (first week - corpus min week + 1) * 1000;
    rates as single 128-bit-safe integer floor-divs, SBA via the
    equal-rational (z * 900000) div p spelling.

    Spark shape: recurrences are sequential per series, but one part
    is a TINY group — groups are hash-bucketed (partkey % 256, the r13
    applyInPandas 40x-overhead lesson) and the kernel walks ALL parts
    of a bucket in lockstep over the demand index (r15-opt, guide
    §4.2: one vectorized int64 step per index instead of a Python
    loop per part); parallelism = buckets, state = two int vectors.
    The corpus min week rides in as a broadcast 1-row aggregate
    column. The oracle replays the same walk as a lockstep recursive
    CTE over (part, demand-index)."""
    import pandas as pd

    li = table(spark, sf_dir, "lineitem")
    dem = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(unix_timestamp(CAST(l_shipdate AS TIMESTAMP))"
            " div 604800 AS BIGINT)"
        ).alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("y"))
    mn = dem.agg(F.min("wk").alias("minwk"))
    demb = (
        dem.crossJoin(F.broadcast(mn))
        .withColumn("bkt", F.col("l_partkey") % 256)
    )

    schema = (
        "p_partkey bigint, n_demand_weeks bigint, z_milli bigint, "
        "p_milli_weeks bigint, croston_rate_micro bigint, "
        "sba_rate_micro bigint"
    )

    cols = ["p_partkey", "n_demand_weeks", "z_milli", "p_milli_weeks",
            "croston_rate_micro", "sba_rate_micro"]

    def croston(pdf: pd.DataFrame) -> pd.DataFrame:
        # r15-opt (guide §4.2): the per-part Python loop (pandas groupby
        # + int walk per part, ~80 parts/bucket x ~40 steps each) is now
        # ONE vectorized walk over the demand INDEX: step k updates every
        # part still longer than k, so the python-level loop runs
        # max-series-length times per bucket instead of parts x length.
        # Exactness: the recurrence operands are non-negative int64s
        # (y <= ~3e3 weekly quantity sum, so z <= 3e6 milli-units and
        # z * 1e6 <= 3e12 << 2^63), and numpy int64 `//` IS Python's
        # floor-div — the walk is the bit-for-bit twin of the scalar
        # loop it replaced (pinned by test_croston_kernel_matches_loop).
        import numpy as np

        if not len(pdf):
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(["l_partkey", "wk"], kind="mergesort")
        pk = pdf["l_partkey"].to_numpy(np.int64)
        wk = pdf["wk"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        minwk = np.int64(pdf["minwk"].iloc[0])
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        lens = np.diff(np.r_[starts, len(pk)])
        keep = lens >= 2
        if not keep.any():
            return pd.DataFrame(columns=cols)
        s, ln = starts[keep], lens[keep]
        z = y[s] * 1000
        p = (wk[s] - minwk + 1) * 1000
        for k in range(1, int(ln.max())):
            m = ln > k
            i = s[m] + k
            z[m] = (y[i] * 1000 + 4 * z[m]) // 5
            p[m] = ((wk[i] - wk[i - 1]) * 1000 + 4 * p[m]) // 5
        return pd.DataFrame({
            "p_partkey": pk[s], "n_demand_weeks": ln.astype(np.int64),
            "z_milli": z, "p_milli_weeks": p,
            "croston_rate_micro": (z * 1000000) // p,
            "sba_rate_micro": (z * 900000) // p,
        })

    return (
        demb.groupBy("bkt")
        .applyInPandas(croston, schema)
        .orderBy("p_partkey")
    )


def _shesd_oracle() -> str:
    """S-H-ESD lockstep: the STL front-half CTEs verbatim, the per-type
    lower median of the hourly series, residual x = y - seasonal -
    median, then the shared Rosner round CTEs keyed by hidx."""
    idc = "hidx"
    return _stl_des_sql() + f""",
medy AS MATERIALIZED (
  SELECT event_type, y AS medy FROM (
    SELECT event_type, y,
           row_number() OVER (
             PARTITION BY event_type ORDER BY y, hidx) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM des WHERE seasonal IS NOT NULL) WHERE rn = (n + 1) // 2
),
act0 AS MATERIALIZED (
  SELECT d.event_type, d.hidx, d.dv - m.medy AS x
  FROM des d JOIN medy m ON d.event_type = m.event_type
  WHERE d.seasonal IS NOT NULL
),{_esd_round_ctes(idc)},
nn AS MATERIALIZED (
  SELECT event_type, COUNT(*) AS n_hours FROM act0 GROUP BY event_type
)
SELECT a.event_type,
       CAST(a.esd_round AS BIGINT) AS esd_round,
       CAST(a.hidx AS BIGINT) AS hidx,
       CAST(a.x AS BIGINT) AS resid_micro,
       CAST(a.med AS BIGINT) AS med_micro,
       CAST(a.dev AS BIGINT) AS dev_micro,
       CAST(a.mad AS BIGINT) AS mad_micro,
       a.passed,
       a.esd_round <= COALESCE(MAX(CASE WHEN a.passed THEN a.esd_round END)
         OVER (PARTITION BY a.event_type), 0) AS is_anomaly,
       CAST(n.n_hours AS BIGINT) AS n_hours
FROM allc a JOIN nn n ON a.event_type = n.event_type
ORDER BY a.event_type, a.esd_round
"""


@query("ts_seasonal_hybrid_esd", oracle=_shesd_oracle(), family=_FAM)
def ts_seasonal_hybrid_esd(spark, sf_dir):
    """SEASONAL-HYBRID ESD (r15 — Twitter/Hochenbaum et al. 2017, the
    production anomaly detector this family's pieces exist FOR, now
    composed from them): plain ESD on a raw seasonal series flags the
    daily rhythm itself; S-H-ESD first removes the STL seasonal
    component, re-centers on the MEDIAN (not the trend — the paper's
    robustness choice: a LOESS trend is itself dragged by anomalies),
    and runs generalized ESD on the residual x = y - seasonal -
    median(y).

    Composition, both engines: the STL front half is ts_stl_loess's
    shared machinery verbatim (_stl_des / _stl_des_sql — hourly
    mean-micro resample, cycle-subseries LOESS, low-pass centering;
    edge hours without complete low-pass windows are honestly
    excluded, the NULL-seasonal discipline), the rounds are
    ts_anomaly_esd's shared Rosner machinery verbatim (_esd_cands /
    _esd_round_ctes keyed by hidx): lower-median + MAD re-estimated
    on the active residual set per round, scaled-MAD test in exact
    integers, backward anomaly rule. Everything BIGINT end to end.

    Scale (r15-opt, guide §2.4/§5.2): the corpus-sized work is the
    hourly rollup inside the STL front half; the deseasonalized frame
    (time-span x type rows, calendar-bounded) is collected ONCE and
    the median re-centering plus all three Rosner rounds fold on the
    driver in exact Python ints (_esd_rounds_py — the bit-for-bit
    twin of the rank-window form, which re-ranked the tiny residual
    frame through 8 eager localCheckpoint jobs and 14 shuffles).
    Exactly the shape that serves a 100 TB metrics store: one heavy
    resample, then calendar-bounded robust statistics.

    Sparse-corpus note: at sf0.001 the hourly grid is mostly EMPTY
    hours, no 25-hour low-pass window completes, every seasonal is
    NULL and the result is honestly EMPTY (both engines agree) — the
    complete-window discipline refusing to fabricate a seasonal from
    a gappy series. sf0.01/sf0.1 are non-vacuous (15 rows, all
    value-checked)."""
    des = _stl_des(spark, sf_dir)
    core_rows = (
        des.filter(F.col("seasonal").isNotNull())
        .select("event_type", "hidx", "y", "dv")
        .collect()
    )
    # lower median of y per type, ordered by (y, hidx) — the exact
    # twin of the old w_med row_number filter, on the collected frame
    by_type: dict = {}
    for r in core_rows:
        by_type.setdefault(r[0], []).append((int(r[1]), int(r[2]), int(r[3])))
    rows = []
    for et, items in by_type.items():
        n = len(items)
        medy = sorted(items, key=lambda t: (t[1], t[0]))[(n + 1) // 2 - 1][1]
        rows.extend((et, i, dv - medy) for i, _y, dv in items)
    cands, counts = _esd_rounds_py(rows)
    return _esd_stitch(spark, cands, counts, "hidx", "resid", "micro")


def _mp_ab_oracle() -> str:
    """AB-join twin: the shared subsequence CTEs, a type-pair spine
    (distinct x distinct, ta <> tb), and the cross-series argmax with
    the same integer corr^2 sort key — no exclusion zone (different
    series cannot trivially match)."""
    x = " + ".join(f"a.x{k} * b.x{k}" for k in range(7))
    return _mp_sub_sql() + f""",
tys AS (SELECT DISTINCT event_type FROM live),
spine AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM tys a JOIN tys b ON a.event_type <> b.event_type
),
pairs AS (
  SELECT s.ta, s.tb, a.i AS i, b.i AS j,
         7 * ({x}) - a.s * b.s AS num,
         a.den AS den_a, b.den AS den_b
  FROM spine s
  JOIN live a ON a.event_type = s.ta
  JOIN live b ON b.event_type = s.tb
),
keyed AS (
  SELECT ta, tb, i, j,
         CASE WHEN num >= 0
              THEN (CAST(num AS HUGEINT) * num * 1000000)
                   // (CAST(den_a AS HUGEINT) * den_b)
              ELSE -((CAST(num AS HUGEINT) * num * 1000000)
                     // (CAST(den_a AS HUGEINT) * den_b)) END AS key
  FROM pairs
),
ranked AS (
  SELECT ta, tb, i, j, key,
         row_number() OVER (
           PARTITION BY ta, tb, i
           ORDER BY key DESC, j ASC) AS rk
  FROM keyed
)
SELECT ta AS event_type_a, tb AS event_type_b,
       CAST(i AS BIGINT) AS i,
       CAST(j AS BIGINT) AS nn_j,
       CAST(key AS BIGINT) AS corr2_signed_micro
FROM ranked WHERE rk = 1
ORDER BY event_type_a, event_type_b, i
"""


@query("ts_matrix_profile_ab", oracle=_mp_ab_oracle(), family=_FAM)
def ts_matrix_profile_ab(spark, sf_dir):
    """MATRIX PROFILE AB-JOIN (r15 — the STAMP paper's second half:
    the self-join finds motifs WITHIN a series; the AB-join finds
    where one series' patterns occur in ANOTHER — does the weekly
    'error' shape precede the 'purchase' shape, does a known failure
    signature appear in this sensor): for every length-7 subsequence
    of series A, its best z-normalized match anywhere in series B,
    for every ordered pair of distinct event types. No exclusion zone
    — different series cannot trivially match themselves.

    Shares ts_matrix_profile's machinery verbatim (_mp_live /
    _mp_sub_sql: one raw pass to the checkpointed daily grid, exact
    BIGINT moments) and its float-free sort key sign(num) * (num^2 *
    1e6) div (den_a * den_b). The pair enumeration goes through an
    aggregate-derived TYPE-PAIR SPINE (distinct x distinct, ta <> tb)
    joined by equality on each side, so the plan is two equi-joins on
    bounded keys, never a Cartesian node.

    Scale: candidate volume is sum over type pairs of |A-subseqs| x
    |B-subseqs| — the honest AB-join cost, calendar-bounded here; the
    production shape joins a SHORT query pattern (bounded subseq set)
    against long series, making the volume linear in the corpus. The
    same tiling that serves the self-join at raw resolution applies
    unchanged."""
    live = _mp_live(spark, sf_dir)
    tys = live.select("event_type").distinct()
    spine = (
        tys.select(F.col("event_type").alias("ta"))
        .join(
            F.broadcast(tys.select(F.col("event_type").alias("tb"))),
            F.col("ta") != F.col("tb"),
        )
    )
    a = live.select(
        F.col("event_type").alias("ta"), F.col("i").alias("ia"),
        F.col("s").alias("sa"), F.col("den").alias("den_a"),
        *[F.col(f"x{k}").alias(f"a{k}") for k in range(7)],
    )
    b = live.select(
        F.col("event_type").alias("tb"), F.col("i").alias("jb"),
        F.col("s").alias("sb"), F.col("den").alias("den_b"),
        *[F.col(f"x{k}").alias(f"b{k}") for k in range(7)],
    )
    qt = sum(F.col(f"a{k}") * F.col(f"b{k}") for k in range(7))
    pairs = (
        spine.join(a, "ta")
        .join(b, "tb")
        .select(
            "ta", "tb", "ia", "jb", "den_a", "den_b",
            (F.lit(7) * qt - F.col("sa") * F.col("sb")).alias("num"),
        )
    )
    keyed = pairs.select(
        "ta", "tb", "ia", "jb",
        F.expr(
            "CASE WHEN num >= 0"
            " THEN (CAST(num AS DECIMAL(38,0)) * num * 1000000)"
            "      div (CAST(den_a AS DECIMAL(38,0)) * den_b)"
            " ELSE -((CAST(num AS DECIMAL(38,0)) * num * 1000000)"
            "        div (CAST(den_a AS DECIMAL(38,0)) * den_b)) END"
        ).alias("key"),
    )
    # r15-opt (guide §2.3, the r13 decimal-key discipline): the best-match
    # pick was a row_number window — the ENTIRE quadratic AB pair stream
    # shuffled and sorted by (ta, tb, ia). A plain bigint MAX over the
    # packed key collapses it map-side to one row per subsequence before
    # the exchange. Packing is exact: |key| <= 1e6 (Cauchy-Schwarz bounds
    # corr^2 micro), jb < 1e9 (calendar-bounded subsequence index), so
    # pack = (key+1e6)*1e9 + (1e9-1-jb) <= ~2.1e15 < 2^63 and max(pack)
    # realizes (key DESC, jb ASC) exactly; den>0 (filtered in _mp_live)
    # means key is never NULL, so no group loses rows.
    packed = keyed.select(
        "ta", "tb", "ia",
        (
            (F.col("key").cast("bigint") + F.lit(1000000))
            * F.lit(1000000000)
            + (F.lit(999999999) - F.col("jb"))
        ).alias("pk"),
    )
    best = packed.groupBy("ta", "tb", "ia").agg(F.max("pk").alias("pk"))
    return (
        best.select(
            F.col("ta").alias("event_type_a"),
            F.col("tb").alias("event_type_b"),
            F.col("ia").cast("bigint").alias("i"),
            (F.lit(999999999) - F.expr("pmod(pk, 1000000000)"))
            .cast("bigint").alias("nn_j"),
            (F.expr("pk div 1000000000") - F.lit(1000000))
            .cast("bigint").alias("corr2_signed_micro"),
        )
        .orderBy("event_type_a", "event_type_b", "i")
    )
