"""Fast inner-loop parity: every registered query vs its DuckDB oracle at
sf0.001 (the driver's t2 runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from hdfs_mr_spark.registry import all_specs
from tests.conftest import SF_SMOKE

_SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_parity(name, spark, oracle_con):
    from hdfs_mr_spark.check import check_query

    res = check_query(_SPECS[name], spark, oracle_con, SF_SMOKE)
    assert res.ok, f"{name}: [{res.mode}] {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
