"""Query registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers here as a :class:`QuerySpec`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` paired with the ANSI
SQL string DuckDB runs as the independent oracle (or ``None`` for the
ops marked ⚠ in SURVEY.md §2, which get a rows-only check).

Design notes (100 TB stance, SURVEY.md §4.3):
- queries are *declarative* DataFrame plans; Catalyst picks the physical
  strategy. Nothing here collects to the driver.
- determinism is a hard requirement (hash-match oracle): seeded
  randomness only, total-order tiebreakers on every top-k, decimal-exact
  aggregation for checked double sums (see ``dsum``/``davg`` in
  ``hdfs_mr_spark.exprs``).

Reference parity: the reference snapshot at /root/reference is empty
(SURVEY.md §0), so parity citations are to SURVEY.md §2 rows, which are
the normative capability contract reconstructed from the reference's
system class (minimal HDFS + MapReduce).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    family: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregations"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    family: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            family=family,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


# DRIVER-SAMPLE ROTATION (VERDICT r12 item 2): the driver's hard
# CORRECTNESS signal checks the FIRST 50 entries of queries() in
# declaration order, and for three rounds that was the same
# scans/lake/filters slice — 12% of the surface re-verified forever
# while aggregations/windows/ts/mr/llm never earned a driver-green row.
# The registry therefore emits a curated 50-op rotation FIRST: ops from
# families the driver has NEVER sampled (disjoint from every name in
# CORRECTNESS_r12.json — pinned by tests/test_parity.py), then all
# remaining ops in declaration order. Rotate this list each round
# toward the least-recently-driver-verified families.
DRIVER_ROTATION: tuple[str, ...] = (
    # joins
    "join_broadcast_inner", "join_shuffle_inner", "join_anti",
    "join_semi", "join_asof",
    # aggregations
    "agg_groupby", "agg_global", "agg_cube", "agg_grouping_sets",
    "agg_approx_distinct", "agg_stats",
    # windows / time series
    "win_row_number", "win_rank", "win_lag_lead", "win_moving_avg",
    "win_sessionize", "ts_gap_fill",
    # sorts
    "sort_global", "sort_limit_topk",
    # setops / etl
    "dedup_by_key", "etl_scd2", "set_except", "sample_hash_stratified",
    # scalar functions
    "fn_string", "fn_date", "fn_json",
    # MR composite + TPC-H
    "mr_wordcount", "mr_inverted_index", "mr_pagerank",
    "sql_tpch_q1_pricing_summary", "sql_tpch_q3_shipping_priority",
    "sql_tpch_q6_forecast_revenue",
    # streaming
    "stream_tumbling", "stream_dedup", "stream_watermark_late",
    # llm dedup / similarity / text / multimodal
    "llm_dedup_exact", "llm_dedup_minhash_lsh", "llm_dedup_near",
    "llm_sim_knn", "llm_embed_quantize", "llm_sim_knn_ivf",
    "llm_text_stats", "llm_lang_id", "llm_quality_gopher",
    "llm_multimodal_decode", "llm_multimodal_phash",
    # udf surface
    "udf_scalar_pandas", "udf_grouped_map",
    # subqueries
    "sql_exists_subquery", "sql_not_in_null_aware",
)


def all_specs() -> dict[str, QuerySpec]:
    # Import family modules for their registration side effects.
    from hdfs_mr_spark import _load_all_families

    _load_all_families()
    ordered: dict[str, QuerySpec] = {
        name: REGISTRY[name] for name in DRIVER_ROTATION if name in REGISTRY
    }
    ordered.update(
        (name, spec) for name, spec in REGISTRY.items()
        if name not in ordered
    )
    return ordered
