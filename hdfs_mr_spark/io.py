"""Table loading (SURVEY.md §2.1 scans).

One parquet file per table per scale-factor directory (TESTDATA.md).
``table()`` is a bare ``spark.read.parquet`` — columnar, vectorized,
pushdown-capable; Catalyst prunes columns and pushes predicates into the
scan, so callers never pre-filter. At 100 TB the same call reads a
partitioned directory tree instead of one file; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamp semantics must match the (timezone-naive) DuckDB oracle no
    # matter what session the driver hands us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The driver may hand us a session without this conf; it is a
        # runtime-settable SQLConf, so set it here before the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, TimestampNTZType):
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
            # TIMESTAMP_NTZ in Spark 4. Every downstream query (unix_micros,
            # window ranges, watermarks) is written against TIMESTAMP; with
            # the session timezone pinned to UTC above, the NTZ->LTZ cast is
            # instant-preserving and matches DuckDB's naive read bit-for-bit.
            # Explicit TimestampType, not the "timestamp" string: the
            # string resolves via spark.sql.timestampType, and a session
            # pinned to TIMESTAMP_NTZ would make the cast a no-op.
            df = df.withColumn("ts", df["ts"].cast(TimestampType()))
        elif isinstance(ts_type, LongType):
            # ts is TIMESTAMP(NANOS) parquet, read as nanos-long via
            # spark.sql.legacy.parquet.nanosAsLong; normalize to µs
            # timestamp — same truncation DuckDB applies casting
            # TIMESTAMP_NS -> TIMESTAMP, so oracle comparisons see
            # identical instants (FIXTURES.md). Integer `div`, not `/`:
            # double division loses precision on ~1e18 ns epochs.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        # else: already TIMESTAMP(MICROS); both engines read it natively.
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def fan_out(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition a small-but-expensive frame to engage every core.

    The fixture tables arrive as ONE parquet row group -> one input
    partition, which serializes any per-row-expensive downstream work
    (interpreted folds, pair-join probes) onto a single task: measured
    10x on the 2M-pair cosine join (22 s -> 2 s) just from this. The
    tiny round-robin shuffle is order-insensitive, so set-semantics
    results are unchanged. At 100 TB inputs arrive pre-split and this
    becomes a no-op decision; the call sites document where parallelism
    is load-bearing.
    """
    return df.repartition(n or df.sparkSession.sparkContext.defaultParallelism)
