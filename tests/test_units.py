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
    assert rows_only == [
        "agg_approx_distinct",
        "agg_approx_quantile",
        "fn_hash_native",
        "stream_watermark_late",
    ]


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


def test_blocked_cosine_pairs_equals_brute_force(spark):
    """The blocked kernel's block decomposition + off-diagonal pair
    canonicalization must reproduce the brute-force pair set exactly —
    same ids AND bit-identical cosines (left-fold op order)."""
    import numpy as np
    import pyarrow.parquet as pq

    from hdfs_mr_spark.operators.llm_similarity import blocked_cosine_pairs
    from tests.conftest import SF_SMOKE

    rows = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pylist()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    # brute-force reference with the SAME strict left fold
    n = len(ids)
    acc = np.zeros((n, n))
    nr = np.zeros(n)
    for k in range(E.shape[1]):
        acc += E[:, k : k + 1] * E[:, k]
        nr += E[:, k] * E[:, k]
    cos = acc / np.outer(np.sqrt(nr), np.sqrt(nr))
    i, j = np.nonzero((ids[:, None] < ids[None, :]) & (cos >= 0.35))
    expected = {(int(ids[a]), int(ids[b])): cos[a, b] for a, b in zip(i, j)}

    got = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in blocked_cosine_pairs(spark, SF_SMOKE, threshold=0.35).collect()
    }
    assert set(got) == set(expected)
    for key, c in got.items():
        assert c == expected[key], f"cosine mismatch at {key}"


def test_short_doc_ngram_guards(spark):
    """sequence(1, n) is DESCENDING for n < 1 in Spark, so un-guarded
    bigram/trigram transforms crash on 1-2-token docs with an
    element_at(toks, 0) error. The guarded expressions must yield empty
    arrays instead — short docs drop out exactly like the oracle's empty
    range() does."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a",), ("a b",), ("a b c",), ("a b c d",)], "text string"
    ).select(F.split("text", " ").alias("toks"))
    bigrams = F.expr(
        "IF(size(toks) >= 2,"
        " transform(sequence(1, size(toks) - 1),"
        "  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))),"
        " array())"
    )
    trigrams = F.expr(
        "IF(size(toks) >= 3,"
        " transform(sequence(1, size(toks) - 2),"
        "  i -> concat_ws(' ', element_at(toks, i),"
        "  element_at(toks, i+1), element_at(toks, i+2))),"
        " array())"
    )
    rows = df.select(
        F.size(bigrams).alias("nb"), F.size(trigrams).alias("nt")
    ).collect()
    assert [(r["nb"], r["nt"]) for r in rows] == [(0, 0), (1, 0), (2, 1), (3, 2)]
