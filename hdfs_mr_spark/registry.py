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


def all_specs() -> dict[str, QuerySpec]:
    # Import family modules for their registration side effects.
    from hdfs_mr_spark import _load_all_families

    _load_all_families()
    return dict(REGISTRY)
