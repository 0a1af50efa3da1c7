"""Unit tests for engine helper APIs (non-query surface)."""

from __future__ import annotations

import pytest

from hdfs_mr_spark.functions.udfs import mm_decode
from hdfs_mr_spark.registry import all_specs


def test_mm_decode_fake_backend():
    payload = bytes(range(32))
    meta = mm_decode(payload, "image/png")
    assert meta["width"] == (0 << 8) | 1
    assert meta["height"] == (2 << 8) | 3
    assert meta["n_frames"] == 1
    assert meta["byte_sum"] == sum(range(32))
    video = mm_decode(payload, "video/mp4")
    assert video["n_frames"] == (4 % 30) + 1


def test_mm_decode_real_backend_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm_decode(b"\x00" * 32, "image/png", backend="pil")


def test_registry_hygiene():
    specs = all_specs()
    assert len(specs) >= 100
    for name, spec in specs.items():
        assert spec.fn.__doc__, f"{name} lacks a docstring"
        assert spec.family, f"{name} lacks a family tag"
    # every non-oracle query is a documented ⚠ exception, not an accident
    rows_only = sorted(n for n, s in specs.items() if s.oracle is None)
    assert rows_only == ["agg_approx_distinct", "fn_hash_native", "stream_watermark_late"]


def test_oracle_strings_are_ansi_parseable():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        # EXPLAIN parses + binds without executing the (possibly heavy) query
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"{name}: oracle SQL failed to bind: {exc}")
