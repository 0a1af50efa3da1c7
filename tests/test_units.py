"""Unit tests for engine helper APIs (non-query surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_mm_decode_unavailable_backend_raises():
    with pytest.raises(NotImplementedError):
        mm_decode(b"\x00" * 32, "image/png", backend="pil")


def test_png_roundtrip_and_parser():
    from hdfs_mr_spark.sources.media import make_png, parse_png_dims

    blob = make_png(123, 45, (10, 20, 30))
    assert parse_png_dims(blob) == (123, 45)
    # fully valid PNG: CRCs check out and the IDAT inflates to the
    # expected scanline volume (h * (1 filter byte + 3w))
    import struct
    import zlib

    pos, idat = 8, b""
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF
        if ctype == b"IDAT":
            idat += data
        pos += 12 + length
    assert len(zlib.decompress(idat)) == 45 * (1 + 3 * 123)
    with pytest.raises(ValueError):
        parse_png_dims(b"\x89PNX" + blob[4:])  # mangled signature


def test_jpeg_marker_scan_parser():
    from hdfs_mr_spark.sources.media import make_jpeg, parse_jpeg_dims

    blob = make_jpeg(640, 480)
    assert parse_jpeg_dims(blob) == (640, 480)
    # parser must SCAN markers, not peek a fixed offset: inject an extra
    # COM segment before SOF0 and it still finds the dimensions
    com = b"\xff\xfe\x00\x0chello jpeg"
    shifted = blob[:2] + com + blob[2:]
    assert parse_jpeg_dims(shifted) == (640, 480)
    # DHT (C4) must not be mistaken for an SOF marker
    dht = b"\xff\xc4\x00\x05" + bytes(3)
    with_dht = blob[:2] + dht + blob[2:]
    assert parse_jpeg_dims(with_dht) == (640, 480)
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\x00\x00" + blob)


def test_mm_decode_auto_dispatch():
    from hdfs_mr_spark.sources.media import make_jpeg, make_png

    png = mm_decode(make_png(33, 44, (1, 2, 3)), "image/png")
    assert (png["width"], png["height"]) == (33, 44)
    jpg = mm_decode(make_jpeg(55, 66), "image/jpeg")
    assert (jpg["width"], jpg["height"]) == (55, 66)
    # non-media bytes fall back to the deterministic fake
    fake = mm_decode(bytes(range(32)), "application/octet-stream")
    assert fake["byte_sum"] == sum(range(32))


def test_registry_hygiene():
    specs = all_specs()
    assert len(specs) >= 100
    for name, spec in specs.items():
        assert spec.fn.__doc__, f"{name} lacks a docstring"
        assert spec.family, f"{name} lacks a family tag"
    # the driver rejects oracle=None as `err: no_oracle` (VERDICT r1):
    # every query must carry a DuckDB oracle, no exceptions
    rows_only = sorted(n for n, s in specs.items() if s.oracle is None)
    assert rows_only == []


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


def test_winnowing_guarantee_on_synthetic_docs(spark):
    """Winnowing's defining property: two docs sharing a run of >= k+w+1
    tokens (k=3-gram, w=4 window => 6+ shared consecutive tokens around a
    full window of shared shingles) must share at least one fingerprint.
    Checked on synthetic docs the fixture can't represent."""
    import hashlib

    def fingerprints(text: str) -> set[int]:
        toks = text.split(" ")
        hs = [
            int(hashlib.sha256(" ".join(toks[i : i + 3]).encode()).hexdigest()[:8], 16)
            for i in range(len(toks) - 2)
        ]
        return {
            min(hs[j : j + 4])
            for j in range(max(len(hs) - 4, 0) + 1)
        }

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # 8 shared tokens -> 6 shared shingles
    a = "alpha beta " + shared + " gamma"
    b = "delta " + shared + " epsilon zeta"
    assert fingerprints(a) & fingerprints(b), "shared run must share a fingerprint"
    # and two token-disjoint docs share nothing
    c = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    assert not (fingerprints(a) & fingerprints(c))


def test_banded_range_join_equals_brute_force(spark):
    """The {b-1,b,b+1} bucket banding must reproduce the brute-force
    inequality join exactly: every |delta| <= w pair appears exactly once,
    including pairs straddling bucket boundaries."""
    import itertools

    from pyspark.sql import functions as F

    w_us = 5_000_000
    # timestamps engineered to straddle bucket edges: just-under/over
    # multiples of the 5s bucket width
    rows = [
        (1, 10, 4_999_999), (2, 20, 5_000_001), (3, 30, 9_999_999),
        (4, 40, 10_000_000), (5, 50, 15_000_000), (6, 60, 2_000_000),
        (7, 70, 2_000_000),  # equal ts, distinct users
    ]
    expected = {
        (min(u1, u2), max(u1, u2), e1 if u1 < u2 else e2, e2 if u1 < u2 else e1)
        for (e1, u1, t1), (e2, u2, t2) in itertools.combinations(rows, 2)
        if u1 != u2 and abs(t1 - t2) <= w_us
    }
    base = spark.createDataFrame(rows, "event_id long, user_id long, us long")
    a = base.select(
        F.col("user_id").alias("u1"), F.col("event_id").alias("e1"),
        F.col("us").alias("us1"), F.expr(f"us div {w_us}").alias("b"),
    )
    b = base.select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("e2"),
        F.col("us").alias("us2"),
        F.explode(
            F.expr(f"array(us div {w_us} - 1L, us div {w_us}, us div {w_us} + 1L)")
        ).alias("bb"),
    )
    got = {
        (r["u1"], r["u2"], r["e1"], r["e2"])
        for r in a.join(
            b,
            (F.col("b") == F.col("bb"))
            & (F.col("u1") < F.col("u2"))
            & (F.abs(F.col("us1") - F.col("us2")) <= w_us),
        )
        .select("u1", "u2", "e1", "e2")
        .collect()
    }
    assert got == expected


def test_blocked_kernel_block_size_is_bounded():
    """The pack-block SIZE must stay bounded as n grows (block COUNT
    scales instead — VERDICT r1 item 3): pack rows stay cache-sized at
    any n, so no single Arrow row grows with the input."""
    from hdfs_mr_spark.operators.llm_similarity import _TARGET_BLOCK_ROWS

    for n in (100, 10_000, 1_000_000, 100_000_000):
        nblocks = max(2, -(-n // _TARGET_BLOCK_ROWS))
        rows_per_block = -(-n // nblocks)  # ceil: worst-case pack row size
        assert rows_per_block <= _TARGET_BLOCK_ROWS
        if n > _TARGET_BLOCK_ROWS * 2:
            assert nblocks >= n // (_TARGET_BLOCK_ROWS * 2)


def test_stream_source_drains_multiple_batches(spark):
    """VERDICT r2 item 7 done-criterion: the default stream source must
    drain as MULTIPLE micro-batches (state carry-over is only exercised
    if batch count > 1), and the union of batches must cover every row."""
    import tempfile

    from hdfs_mr_spark.io import table
    from hdfs_mr_spark.streaming.queries import _event_stream
    from tests.conftest import SF_SMOKE

    s = _event_stream(spark, SF_SMOKE).select("event_id")
    ckpt = tempfile.mkdtemp(prefix="hmr_mb_ckpt_")
    q = (
        s.writeStream.format("memory")
        .queryName("hmr_multibatch_probe")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch_ids = {p["batchId"] for p in q.recentProgress}
    assert len(batch_ids) > 1, f"expected multi-batch drain, got {batch_ids}"
    got = spark.table("hmr_multibatch_probe").count()
    expect = table(spark, SF_SMOKE, "events").count()
    assert got == expect


def test_media_parsers_roundtrip_property():
    """Property test: ANY dimensions round-trip through the generators
    and the real parsers — the parsers read structure, not fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        make_jpeg, make_png, parse_jpeg_dims, parse_png_dims,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=4096),
        h=st.integers(min_value=1, max_value=4096),
        rgb=st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
    )
    def check(w, h, rgb):
        assert parse_png_dims(make_png(w, h, rgb)) == (w, h)
        assert parse_jpeg_dims(make_jpeg(w, h)) == (w, h)

    check()


def test_results_invariant_to_shuffle_partitioning(spark):
    """Determinism stress: the decimal-sum kernel, quantized LM scores,
    and bucketed ECDF must produce IDENTICAL results whether the shuffle
    runs in 5 partitions or 32 — partial-aggregation order must never
    leak into checked values (the core claim behind every dsum/quantize
    discipline in the repo)."""
    from hdfs_mr_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    specs = all_specs()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in ("agg_groupby", "llm_lm_score", "dq_distribution_drift"):
            results = []
            for n in ("5", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                rows = [
                    tuple(r) for r in specs[name].fn(spark, SF_SMOKE).collect()
                ]
                results.append(sorted(rows, key=str))
            assert results[0] == results[1], f"{name}: partition-count leak"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_results_invariant_to_session_timezone(spark):
    """Driver-proofing: a session arriving with a non-UTC timezone must
    not change any timestamp-derived result — io.table and the streaming
    reader re-pin UTC themselves (the DuckDB oracle is timezone-naive)."""
    from hdfs_mr_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    specs = all_specs()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = []
        for tz in ("America/New_York", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows = [
                tuple(r)
                for r in specs["ts_seasonality_profile"].fn(spark, SF_SMOKE).collect()
            ]
            results.append(rows)
        assert results[0] == results[1], "session timezone leaked into results"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_near_dedup_shuffled_equals_broadcast(spark):
    """The conf-driven shuffled (size, salt) path of _bitmask_near_pairs
    must return exactly the broadcast fast path's pairs — same set, same
    emitted order (both end in orderBy d1, d2)."""
    from tests.conftest import SF_SMOKE

    fn = all_specs()["llm_dedup_near"].fn
    base = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuf = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert len(base) > 0
    assert base == shuf


def test_distribution_drift_empty_cohort_guard(spark, tmp_path):
    """An events slice where one user_id-parity cohort is empty must
    yield a NULL-stat row, not a division-by-zero crash (ADVICE r3)."""
    from hdfs_mr_spark.io import table

    src = table(spark, "/root/testdata/sf0.001", "events")
    # keep only odd user_ids -> cohort s1 (even) is empty
    src.filter((F.col("user_id") % 2) == 1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    row = all_specs()["dq_distribution_drift"].fn(spark, str(tmp_path)).first()
    assert row.n1 == 0 and row.n2 > 0
    assert row.ks_stat is None and row.critical_005 is None and row.drift is None


def test_png_pixel_decode_roundtrip_all_filters():
    """make_gradient_png cycles all five PNG filter types; the decoder
    must unfilter back to the exact generative pixels, and the box
    downsample must floor-average with edge clamping (odd dims)."""
    from hdfs_mr_spark.sources.media import (
        box_downsample,
        make_gradient_png,
        media_px_dims,
        media_px_value,
        png_decode_pixels,
    )

    for did in (0, 1, 2, 3, 4, 7, 13):  # covers every starting filter type
        w, h, px = png_decode_pixels(make_gradient_png(did))
        assert (w, h) == media_px_dims(did)
        for x, y, c in [(0, 0, 0), (w - 1, h - 1, 2), (w // 2, h // 3, 1)]:
            assert px[(y * w + x) * 3 + c] == media_px_value(x, y, c, did)
        ow, oh, dpx = box_downsample(px, w, h)
        assert (ow, oh) == ((w + 1) // 2, (h + 1) // 2)
        # corner block is 2x2 when dims are even, clamped otherwise
        xs = range(2 * (ow - 1), min(2 * ow, w))
        ys = range(2 * (oh - 1), min(2 * oh, h))
        exp = sum(
            media_px_value(x, y, 0, did) for y in ys for x in xs
        ) // (len(xs) * len(ys))
        assert dpx[((oh - 1) * ow + (ow - 1)) * 3] == exp


def test_png_palette_decode_roundtrip_and_refusals():
    """Indexed-color (type 3) decode: 8-bit even docs and 4-bit PACKED
    odd docs (incl. odd width, where the trailing nibble is padding)
    round-trip pixel-exactly against the generative palette/index
    formulas; 16-bit and interlaced type-3 refuse rather than
    mis-decode."""
    import struct
    import zlib

    from hdfs_mr_spark.sources.media import (
        _png_chunk,
        make_gradient_png_palette,
        media_pal_channel,
        media_pal_index,
        media_pal_size,
        media_px_dims,
        png_decode_palette,
    )

    # doc 3: 4-bit, odd width (w = 8+111%56 = 63) -> nibble padding path
    for did in (0, 1, 2, 3, 5, 46, 47):
        blob = make_gradient_png_palette(did)
        w, h, npal, px = png_decode_palette(blob)
        assert (w, h) == media_px_dims(did)
        assert npal == media_pal_size(did)
        for x, y in [(0, 0), (w - 1, h - 1), (w // 2, h // 3), (w - 1, 0)]:
            idx = media_pal_index(x, y, did)
            for c in range(3):
                assert px[(y * w + x) * 3 + c] == media_pal_channel(
                    idx, c, did
                ), (did, x, y, c)

    # refusal contracts: depth-16 and Adam7-interlaced type-3 raise
    base = make_gradient_png_palette(0)
    w, h = media_px_dims(0)
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, interlace)
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", bytes(51))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            png_decode_palette(bad)
    # PLTE missing entirely also refuses
    sig_end = 8
    (ihdr_len,) = struct.unpack_from(">I", base, sig_end)
    cut = base[: sig_end + 12 + ihdr_len]
    rest = base[sig_end + 12 + ihdr_len :]
    (plte_len,) = struct.unpack_from(">I", rest, 0)
    no_plte = cut + rest[12 + plte_len :]
    with pytest.raises(ValueError):
        png_decode_palette(no_plte)


def test_png_palette_trns_alpha_roundtrip_and_refusal():
    """tRNS transparency: alphas attach to the right palette entries,
    short-tRNS tails default to opaque 255, plain-palette images come
    back fully opaque, and a tRNS longer than the palette refuses."""
    import struct

    from hdfs_mr_spark.sources.media import (
        _png_chunk,
        make_gradient_png_palette,
        make_gradient_png_palette_trns,
        media_pal_alpha,
        media_pal_index,
        media_pal_ntrns,
        media_pal_size,
        media_px_dims,
        png_decode_palette_rgba,
    )

    for did in (0, 1, 3, 4, 5, 9, 47):  # doc_id%5 covers 0..4 tails
        blob = make_gradient_png_palette_trns(did)
        w, h, npal, ntrns, px = png_decode_palette_rgba(blob)
        assert (w, h) == media_px_dims(did)
        assert npal == media_pal_size(did)
        assert ntrns == media_pal_ntrns(did)
        for x, y in [(0, 0), (w - 1, h - 1), (w // 2, h // 3)]:
            i = media_pal_index(x, y, did)
            assert px[(y * w + x) * 4 + 3] == media_pal_alpha(i, did)
    # no tRNS chunk -> fully opaque
    w, h, _, ntrns, px = png_decode_palette_rgba(make_gradient_png_palette(0))
    assert ntrns == 0
    assert all(px[p * 4 + 3] == 255 for p in range(w * h))
    # tRNS longer than PLTE refuses
    blob = make_gradient_png_palette(1)  # npal = 6
    npal = media_pal_size(1)
    pos = 8
    while True:
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        end = pos + 12 + length
        if ctype == b"PLTE":
            bad = blob[:end] + _png_chunk(b"tRNS", bytes(npal + 1)) + blob[end:]
            break
        pos = end
    with pytest.raises(ValueError):
        png_decode_palette_rgba(bad)


def test_png_palette_roundtrip_random_content():
    """Property (hypothesis): ARBITRARY palettes, index rasters, filter
    choices, and both bit depths survive encode -> decode exactly — the
    decoder must read the real PLTE (not assume the fixture formulas),
    unfilter at bpp=1, and unpack nibbles with row padding for any
    width parity."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _png_chunk,
        _png_filter_row,
        png_decode_palette,
    )

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def prop(data):
        depth = data.draw(st.sampled_from([8, 4]), label="depth")
        w = data.draw(st.integers(1, 12), label="w")
        h = data.draw(st.integers(1, 12), label="h")
        npal = data.draw(st.integers(2, 16 if depth == 4 else 40))
        plte = bytes(
            data.draw(st.integers(0, 255)) for _ in range(3 * npal)
        )
        idxs = [
            [data.draw(st.integers(0, npal - 1)) for _ in range(w)]
            for _ in range(h)
        ]
        stride = (w * depth + 7) // 8
        raw = bytearray()
        prior = bytes(stride)
        for y in range(h):
            row_idx = idxs[y]
            if depth == 8:
                row = bytes(row_idx)
            else:
                padded = row_idx + ([0] if w % 2 else [])
                row = bytes(
                    (padded[i] << 4) | padded[i + 1]
                    for i in range(0, len(padded), 2)
                )
            ft = data.draw(st.integers(0, 4), label="filter")
            raw.append(ft)
            raw += _png_filter_row(row, prior, ft, bpp=1)
            prior = row
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        dw, dh, dn, px = png_decode_palette(blob)
        assert (dw, dh, dn) == (w, h, npal)
        for y in range(h):
            for x in range(w):
                i = idxs[y][x]
                assert px[(y * w + x) * 3 : (y * w + x) * 3 + 3] == \
                    plte[3 * i : 3 * i + 3]

    prop()


def test_wav_ex_roundtrip_random_content():
    """Property (hypothesis): arbitrary channel counts (1-6) in both
    PCM16 and float32 layouts survive assemble -> parse_wav_ex exactly,
    with junk chunks spliced in (the parser must WALK, not seek)."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import parse_wav_ex

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def prop(data):
        fmt_code = data.draw(st.sampled_from([1, 3]))
        nch = data.draw(st.integers(1, 6))
        n = data.draw(st.integers(1, 40))
        rate = data.draw(st.sampled_from([8000, 16000, 44100]))
        samples = [
            data.draw(st.integers(-32768, 32767))
            for _ in range(n * nch)
        ]
        if fmt_code == 1:
            payload = b"".join(struct.pack("<h", v) for v in samples)
            bits = 16
        else:
            payload = b"".join(
                struct.pack("<f", v / 1024.0) for v in samples
            )
            bits = 32
        block = nch * bits // 8
        fmt = struct.pack(
            "<HHIIHH", fmt_code, nch, rate, rate * block, block, bits
        )
        junk = b"junk" + struct.pack("<I", 3) + b"odd" + b"\x00"
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + junk
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        blob = (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )
        r, c, f, d = parse_wav_ex(blob)
        assert (r, c, f) == (rate, nch, fmt_code)
        if fmt_code == 1:
            got = list(struct.unpack(f"<{n * nch}h", d))
            assert got == samples
        else:
            got = [
                int(round(v * 1024.0))
                for v in struct.unpack(f"<{n * nch}f", d)
            ]
            assert got == samples

    prop()


def test_no_shrinking_window_frames_in_source():
    """r8 ts-stress regression gate: Spark has NO incremental processor
    for aggregates over a SHRINKING frame (x .. UNBOUNDED FOLLOWING) —
    it re-aggregates the remaining rows per row, O(p^2) per partition,
    which hung a 272k-row skewed partition for 10+ minutes (PERF.md
    r8). Every unboundedFollowing in engine source must therefore be a
    FULL-partition frame (unboundedPreceding .. unboundedFollowing),
    which Spark evaluates once per partition; forward passes must use
    the reversed ordering's growing frame instead."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "hdfs_mr_spark"
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if "unboundedFollowing" in line and "unboundedPreceding" not in line:
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert offenders == [], (
        "shrinking window frame (O(p^2) per partition) — use the "
        f"reversed-ordering growing frame instead: {offenders}"
    )


def test_cas_publish_refuses_stale_pointer(tmp_path):
    """cas_publish_current (VERDICT r6 item 6): the _CURRENT pointer
    only advances from the generation the writer read — a concurrent
    publish in between must be refused, never clobbered."""
    from hdfs_mr_spark.operators.llm_dedup import (
        ConcurrentPublishError,
        cas_publish_current,
    )

    store = tmp_path / "store"
    store.mkdir()
    # fresh store: expected None -> v1
    cas_publish_current(store, "v1", None)
    assert (store / "_CURRENT").read_text() == "v1"
    # normal advance v1 -> v2
    cas_publish_current(store, "v2", "v1")
    assert (store / "_CURRENT").read_text() == "v2"
    # writer that read v1 but lost the race to the v2 publisher: refuse
    with pytest.raises(ConcurrentPublishError):
        cas_publish_current(store, "v2b", "v1")
    assert (store / "_CURRENT").read_text() == "v2"  # loser changed nothing
    # fresh-store writer racing an initialized store also refuses
    with pytest.raises(ConcurrentPublishError):
        cas_publish_current(store, "v1", None)


def test_ann_params_match_oracle_formulas():
    """_ann_params (Python) and _SQL_ANN_PARAMS (DuckDB) must agree for
    any corpus size — the contract that keeps scaled ANN queries
    hash-green at every scale factor."""
    import duckdb

    from hdfs_mr_spark.operators.llm_similarity import _SQL_ANN_PARAMS, _ann_params

    con = duckdb.connect()
    for n in (64, 100, 500, 2000, 4096, 65536, 10**6, 10**7, 123457):
        sql = (
            "WITH "
            + _SQL_ANN_PARAMS.replace("COUNT(*)", str(n)).replace(
                "FROM embeddings", ""
            )
            + " SELECT cells, nprobe, bits FROM p"
        )
        assert tuple(con.execute(sql).fetchone()) == _ann_params(n), n


def test_wav_chunk_walker_parser():
    import struct

    from hdfs_mr_spark.sources.media import (
        audio_params,
        audio_sample,
        make_wav,
        parse_wav,
    )

    blob = make_wav(5)
    rate, data = parse_wav(blob)
    er, en = audio_params(5)
    assert rate == er and len(data) == 2 * en
    samples = struct.unpack(f"<{en}h", data)
    assert [samples[i] for i in (0, 1, en - 1)] == [
        audio_sample(i, 5) for i in (0, 1, en - 1)
    ]
    # the parser must WALK chunks: an extra odd-sized junk chunk (with
    # its RIFF pad byte) spliced before data is skipped correctly
    pos = 12
    while blob[pos : pos + 4] != b"data":
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        pos += 8 + size + (size & 1)
    junk = b"junk" + struct.pack("<I", 3) + b"odd" + b"\x00"
    spliced = blob[:pos] + junk + blob[pos:]
    assert parse_wav(spliced) == (rate, data)
    with pytest.raises(ValueError):
        parse_wav(b"RIFX" + blob[4:])  # mangled magic
    # stereo/float formats refuse rather than silently mis-decode
    bad_fmt = bytearray(blob)
    fmt_off = blob.index(b"fmt ") + 8
    struct.pack_into("<H", bad_fmt, fmt_off + 2, 2)  # channels = 2
    with pytest.raises(ValueError):
        parse_wav(bytes(bad_fmt))


def test_wav_multichannel_and_float_parse():
    """parse_wav_ex: PCM16 surround (3-6 ch) and IEEE-float32 clips
    round-trip to the exact per-channel integer formula; ADPCM/24-bit
    refuse; parse_wav_multi keeps its mono/stereo-PCM16-only contract."""
    import struct

    from hdfs_mr_spark.sources.media import (
        audio_multi_layout,
        audio_params,
        audio_sample_ch,
        make_wav_multi,
        parse_wav_ex,
        parse_wav_multi,
    )

    for did in (0, 1, 2, 5, 6, 7, 46, 47):
        rate, n = audio_params(did)
        efmt, ench = audio_multi_layout(did)
        r, nch, fmt_code, data = parse_wav_ex(make_wav_multi(did))
        assert (r, nch, fmt_code) == (rate, ench, efmt)
        if fmt_code == 1:
            vals = struct.unpack(f"<{len(data) // 2}h", data)
        else:
            vals = [
                int(round(v * 1024.0))
                for v in struct.unpack(f"<{len(data) // 4}f", data)
            ]
        assert len(vals) == n * nch
        for i, c in [(0, 0), (1, nch - 1), (n - 1, 0), (n // 2, nch // 2)]:
            assert vals[i * nch + c] == audio_sample_ch(i, c, did), (did, i, c)

    # refusal contracts: ADPCM (fmt 2) and 24-bit PCM raise
    blob = bytearray(make_wav_multi(0))
    fmt_off = bytes(blob).index(b"fmt ") + 8
    bad = bytearray(blob)
    struct.pack_into("<H", bad, fmt_off, 2)  # ADPCM
    with pytest.raises(ValueError):
        parse_wav_ex(bytes(bad))
    bad = bytearray(blob)
    struct.pack_into("<H", bad, fmt_off + 14, 24)  # 24-bit
    with pytest.raises(ValueError):
        parse_wav_ex(bytes(bad))
    # the narrow parser still refuses surround and float layouts
    with pytest.raises(ValueError):
        parse_wav_multi(make_wav_multi(0))  # 3..6 channels
    with pytest.raises(ValueError):
        parse_wav_multi(make_wav_multi(1))  # float32


def test_phash_decode_matches_generative_formula():
    """Third implementation of the dHash: decode the real PNG bytes with
    the tested pixel decoder, grid-sample per llm_multimodal_phash's
    spec, and compare against the hash computed straight from the
    gradient formula (the DuckDB oracle's ground truth) — proves
    decoder, sampler, and formula agree without either engine."""
    from hdfs_mr_spark.sources.media import make_gradient_png, png_decode_pixels

    def formula_gray(x, y, doc_id):
        v = [((x + 2 * y + 7 * c + doc_id) % 256) for c in range(3)]
        return (v[0] + 2 * v[1] + v[2]) // 4

    for doc_id in (0, 5, 17, 40):
        w, h, px = png_decode_pixels(make_gradient_png(doc_id))
        hv_decoded = 0
        hv_formula = 0
        for k in range(63):
            gx, gy = k % 7, k // 7
            yq = (gy * h) // 9
            x1, x2 = (gx * w) // 8, ((gx + 1) * w) // 8
            base1, base2 = (yq * w + x1) * 3, (yq * w + x2) * 3
            g1 = (px[base1] + 2 * px[base1 + 1] + px[base1 + 2]) // 4
            g2 = (px[base2] + 2 * px[base2 + 1] + px[base2 + 2]) // 4
            if g2 > g1:
                hv_decoded |= 1 << k
            if formula_gray(x2, yq, doc_id) > formula_gray(x1, yq, doc_id):
                hv_formula |= 1 << k
        assert hv_decoded == hv_formula, doc_id


def test_sssp_matches_python_bellman_ford(spark):
    """mr_sssp vs an independent driver-side Bellman-Ford over the same
    edge list (third implementation, neither Spark-iterative nor
    recursive-CTE): 4-hop-bounded distances must agree exactly."""
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    edges = con.execute("""
        SELECT 'c' || o.o_custkey, 'p' || l.l_partkey,
               CAST(MIN(l.l_quantity) AS BIGINT)
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 40 GROUP BY 1, 2
    """).fetchall()
    adj: dict[str, list[tuple[str, int]]] = {}
    for c, p, w in edges:
        adj.setdefault(c, []).append((p, w))
        adj.setdefault(p, []).append((c, w))
    dist = {
        n: 0 for n in adj
        if n.startswith("c") and int(n[1:]) % 500 == 0
    }
    frontier = dict(dist)
    for _ in range(4):
        nxt: dict[str, int] = {}
        for n, d in frontier.items():
            for m, w in adj.get(n, ()):
                nd = d + w
                if nd < dist.get(m, 1 << 60) and nd < nxt.get(m, 1 << 60):
                    nxt[m] = nd
        if not nxt:
            break
        dist.update(nxt)
        frontier = nxt
    got = {
        r.node: r.dist
        for r in all_specs()["mr_sssp"].fn(spark, SF_SMOKE).collect()
    }
    assert got == dist


def test_theilsen_matches_python_reference(spark):
    """ts_theilsen_trend vs a statistics-free python reference (exact
    integer slopes, explicit middle selection)."""
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    rows = con.execute("""
        SELECT user_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT),
               SUM(CAST(round(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2
    """).fetchall()
    series: dict[int, list[tuple[int, int]]] = {}
    for u, day, cents in rows:
        series.setdefault(u, []).append((day, cents))
    expect = {}
    for u, pts in series.items():
        pts.sort()
        slopes = sorted(
            (c2 - c1) / (d2 - d1)
            for i, (d1, c1) in enumerate(pts)
            for (d2, c2) in pts[i + 1:]
        )
        k = len(slopes)
        if k == 0:
            continue
        lo, hi = slopes[(k + 1) // 2 - 1], slopes[k // 2]
        expect[u] = (k, (lo + hi) / 2.0 / 100.0)
    got = {
        r.user_id: (r.n_pairs, r.theil_sen_slope)
        for r in all_specs()["ts_theilsen_trend"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_containment_subset_semantics(spark):
    """llm_dedup_containment vs a python brute force over the distinct
    token sets: subset_of must be the lowest proper-superset (or
    identical-set lower id) holder, per doc."""
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: frozenset(t.split(" ")) for d, t in docs}
    expect = {}
    for d, s in toks.items():
        cands = [
            o for o, so in toks.items()
            if o != d and s <= so and (len(so) > len(s) or o < d)
        ]
        expect[d] = min(cands) if cands else None
    got = {
        r.doc_id: r.subset_of
        for r in all_specs()["llm_dedup_containment"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cusum_scaling_identity_property():
    """Property (hypothesis): argmax_t |n*cum_t - t*total| picks the
    same index as the textbook argmax_t |cum_t - t*mean| for any
    integer series — the identity ts_changepoint_cusum relies on to
    stay in exact BIGINTs (ties resolved to the earliest t in both
    forms)."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=50))
    def prop(xs):
        n = len(xs)
        total = sum(xs)
        cum = 0
        best_scaled = None
        best_exact = None
        for t, x in enumerate(xs, start=1):
            cum += x
            d_scaled = abs(n * cum - t * total)
            d_exact = abs(Fraction(cum) - Fraction(t * total, n))
            if best_scaled is None or d_scaled > best_scaled[0]:
                best_scaled = (d_scaled, t)
            if best_exact is None or d_exact > best_exact[0]:
                best_exact = (d_exact, t)
        assert best_scaled[1] == best_exact[1]

    prop()


def test_equi_depth_bucket_rule_property():
    """Property (hypothesis): the integer decile rule
    (cum_before * B) // total yields monotone bucket ids in 0..B-1,
    assigns each distinct value wholly to one bucket, and puts at
    most ceil(total/B) + (max value multiplicity - 1) rows per bucket
    — the value-granular equi-depth contract of
    agg_histogram_equi_depth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(1, 50), min_size=1, max_size=300))
    def prop(vals):
        from collections import Counter

        B = 10
        counts = sorted(Counter(vals).items())
        total = len(vals)
        cb = 0
        buckets = {}
        last_bucket = -1
        for v, c in counts:
            b = (cb * B) // total
            assert 0 <= b < B
            assert b >= last_bucket  # monotone in value order
            last_bucket = b
            buckets[b] = buckets.get(b, 0) + c
            cb += c
        max_mult = max(c for _, c in counts)
        cap = -(-total // B) + (max_mult - 1)
        assert all(n <= cap for n in buckets.values())

    prop()


def test_weighted_jaccard_blocking_bound_property():
    """Property (hypothesis): if bag-Jaccard(a, b) >= 0.7 then the
    partner's total count lies in [ceil(7t/10), floor(10t/7)] of the
    probe's — so llm_dedup_near_weighted's size-explode candidate
    generation can never miss a passing pair."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from("abcdefgh")

    @settings(max_examples=300, deadline=None)
    @given(st.lists(words, min_size=1, max_size=40),
           st.lists(words, min_size=1, max_size=40))
    def prop(xs, ys):
        ca, cb = Counter(xs), Counter(ys)
        mn = sum((ca & cb).values())
        ta, tb = len(xs), len(ys)
        if 17 * mn >= 7 * (ta + tb):  # J_w >= 0.7 in exact integers
            lo, hi = (7 * ta + 9) // 10, (10 * ta) // 7
            assert lo <= tb <= hi, (ta, tb, mn)

    prop()


def test_jpeg_pixel_decode_roundtrip_fixture():
    """The gradient JPEGs are constant per 8x8 block with DC quant step
    8 — the one family where the lossy pipeline is bit-exact — so the
    full baseline decoder (Huffman, dequantize, IDCT, MCU crop) must
    reproduce the generative block formula pixel-for-pixel."""
    from hdfs_mr_spark.sources.media import (
        jpeg_block_value,
        jpeg_decode_gray,
        jpeg_px_dims,
        make_gradient_jpeg,
    )

    for did in (0, 1, 5, 13, 31, 47):
        w, h, px = jpeg_decode_gray(make_gradient_jpeg(did))
        assert (w, h) == jpeg_px_dims(did)
        for y in range(h):
            for x in range(w):
                assert px[y * w + x] == jpeg_block_value(x // 8, y // 8, did)


def test_jpeg_entropy_roundtrip_random_coefficients():
    """Property (hypothesis): ARBITRARY quantized coefficient blocks
    survive encode -> decode exactly — Huffman tables, differential DC,
    AC runs/ZRL/EOB, byte stuffing, and block placement are all
    content-independent. Reference pixels come from the shared IDCT
    applied directly to the dequantized coefficients (no entropy layer),
    so any bitstream bug shows as a pixel diff."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def prop(data):
        # random quant table too: the decoder must READ it from DQT,
        # not assume the fixture's values
        qtab = [data.draw(st.integers(min_value=1, max_value=255))
                for _ in range(64)]
        w = data.draw(st.integers(min_value=1, max_value=24), label="w")
        h = data.draw(st.integers(min_value=1, max_value=24), label="h")
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        blocks = []
        for _ in range(nb):
            blk = data.draw(
                st.lists(
                    st.integers(min_value=-100, max_value=100),
                    min_size=64, max_size=64,
                )
            )
            blk[0] = max(-128, min(127, blk[0]))  # DC category <= 11
            blocks.append(blk)
        dw, dh, px = jpeg_decode_gray(jpeg_encode_gray(blocks, w, h, qtab))
        assert (dw, dh) == (w, h)
        mcux = (w + 7) // 8
        for bi, blk in enumerate(blocks):
            ref = _idct8x8([c * qtab[i] for i, c in enumerate(blk)])
            by, bx = divmod(bi, mcux)
            for yy in range(min(8, h - by * 8)):
                for xx in range(min(8, w - bx * 8)):
                    assert px[(by * 8 + yy) * w + bx * 8 + xx] == ref[yy * 8 + xx]

    prop()


def test_png_unfilter_property_random_scanlines():
    """Property (hypothesis, VERDICT r4 item 8): the PNG decoder's
    per-scanline unfilter inverts ALL five filter types on ARBITRARY
    pixel content — not just the gradient fixture. The test encodes
    random RGB rows with a random filter type per row (the same
    filter math make_gradient_png uses, applied to random data) and
    asserts the decoder returns the exact raw pixels."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import _paeth, _png_chunk, png_decode_pixels

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def prop(data):
        w = data.draw(st.integers(min_value=1, max_value=12), label="w")
        h = data.draw(st.integers(min_value=1, max_value=12), label="h")
        rows = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255), min_size=3 * w, max_size=3 * w
                    )
                )
            )
            for _ in range(h)
        ]
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h), label="fts"
        )
        bpp, raw, prior = 3, bytearray(), bytes(3 * w)
        for y in range(h):
            row, ft = rows[y], fts[y]
            raw.append(ft)
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                up = prior[i]
                upleft = prior[i - bpp] if i >= bpp else 0
                if ft == 0:
                    f = row[i]
                elif ft == 1:
                    f = row[i] - left
                elif ft == 2:
                    f = row[i] - up
                elif ft == 3:
                    f = row[i] - (left + up) // 2
                else:
                    f = row[i] - _paeth(left, up, upleft)
                raw.append(f & 0xFF)
            prior = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        dw, dh, px = png_decode_pixels(png)
        assert (dw, dh) == (w, h)
        assert px == b"".join(rows)

    prop()


def test_wav_chunk_walk_property_random_layouts():
    """Property (hypothesis, VERDICT r4 item 8): parse_wav must find
    fmt/data by WALKING chunks through arbitrary filler layouts —
    random unknown chunks (odd sizes included, exercising the RIFF pad
    byte) before, between, and after the real ones."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import parse_wav

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def prop(data):
        rate = data.draw(st.sampled_from([8000, 16000, 44100]), label="rate")
        n = data.draw(st.integers(min_value=1, max_value=64), label="n")
        pcm = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=2 * n, max_size=2 * n)
            )
        )
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)

        def filler():
            out = b""
            for _ in range(data.draw(st.integers(0, 2))):
                size = data.draw(st.integers(0, 9))
                body = bytes(
                    data.draw(
                        st.lists(st.integers(0, 255), min_size=size, max_size=size)
                    )
                )
                cid = data.draw(
                    st.sampled_from([b"LIST", b"fake", b"junk", b"bext"])
                )
                out += cid + struct.pack("<I", size) + body
                if size & 1:
                    out += b"\x00"  # RIFF pad to even
            return out

        chunks = (
            filler()
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + filler()
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b"")
            + filler()
        )
        blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        got_rate, got_pcm = parse_wav(blob)
        assert got_rate == rate
        assert got_pcm == pcm

    prop()


def test_ann_lsh_bits_scale_with_corpus():
    """VERDICT r4 item 4: lsh_bits is a FUNCTION of n, not a constant —
    it only looks constant at the two fixture scales because both land
    inside the bits=4 clamp. Assert the growth schedule (target bucket
    occupancy 64..128) and the probe-budget consequence: the radius-2
    multiprobe FRACTION of the corpus shrinks as bits grow."""
    from hdfs_mr_spark.operators.llm_similarity import _ann_params

    bits_at = {n: _ann_params(n)[2] for n in (500, 2000, 20_000, 100_000, 10_000_000)}
    assert bits_at[500] == 4 and bits_at[2000] == 4  # fixture scales: clamp floor
    assert bits_at[20_000] == 8
    assert bits_at[100_000] == 10
    assert bits_at[10_000_000] == 12  # clamp ceiling
    frac = {
        n: (1 + b + b * (b - 1) // 2) / (1 << b) for n, b in bits_at.items()
    }
    assert frac[500] > frac[20_000] > frac[100_000] > frac[10_000_000]
    assert frac[10_000_000] < 0.02  # ~1/50 of buckets probed at the clamp


def test_cc_star_chain_converges_in_log_rounds(spark):
    """VERDICT r4 item 5: on a 64-node chain (diameter 63 — the
    worst case for min-label propagation, which needs one round per
    hop), the alternating large-star/small-star kernel must converge
    in O(log^2 n) driver rounds (<= 8 observed) and still label every
    node with component 0."""
    from hdfs_mr_spark.operators.llm_dedup import _cc_star_components

    n = 64
    nodes = spark.range(n).selectExpr("id as doc_id")
    edges = spark.range(n - 1).selectExpr("id as d1", "id + 1 as d2")
    labels, rounds = _cc_star_components(spark, nodes, edges)
    assert rounds <= 8, rounds
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)


def test_cc_star_matches_min_label_on_fixture(spark):
    """Both connected-components algorithms must produce identical
    labels on the real near-dup graph (they share the recursive-CTE
    oracle, but this pins Spark-vs-Spark equality directly)."""
    from hdfs_mr_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    specs = all_specs()
    a = [tuple(r) for r in specs["llm_dedup_clusters"].fn(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in specs["llm_dedup_clusters_star"].fn(spark, SF_SMOKE).collect()]
    assert a == b


def test_cc_star_matches_union_find_on_random_graphs(spark):
    """Third-implementation cross-check: on seeded random graphs the
    star-contraction labels must equal a pure-python union-find's —
    independent of Spark, the fixture, and the oracle SQL."""
    import random

    from hdfs_mr_spark.operators.llm_dedup import _cc_star_components

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        n = rng.randrange(12, 28)
        edges = sorted({
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randrange(4, n))
        })
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want = {x: min(y for y in range(n) if find(y) == find(x))
                for x in range(n)}
        nodes = spark.range(n).selectExpr("id as doc_id")
        edf = spark.createDataFrame(edges or [(0, 0)], "d1 long, d2 long")
        labels, _rounds = _cc_star_components(spark, nodes, edf)
        got = {r.doc_id: r.component for r in labels.collect()}
        assert got == want, (seed, edges)


def test_containment_sparse_switch_fires_naturally(spark, tmp_path):
    """The containment regime switch must fire on vocabulary size
    ALONE (no conf override): a synthetic corpus whose vocabulary
    exceeds the default dense cap takes the posting-list path, and its
    decisions match a pure-python brute-force subset check."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hdfs_mr_spark.operators.llm_dedup import (
        _CONTAINMENT_VOCAB_CAP_CONF,
        _MASK_WORDS_CAP,
    )
    from hdfs_mr_spark.registry import all_specs

    # 120 docs over a >16384-token vocabulary (disjoint 160-token
    # ranges per doc); every 10th doc is a strict token-subset of its
    # predecessor, plus one identical pair
    docs = []
    for i in range(120):
        base = [f"w{i * 200 + j}" for j in range(160)]
        if i % 10 == 1:
            base = [f"w{(i - 1) * 200 + j}" for j in range(40)]
        if i == 77:
            base = [f"w{5 * 200 + j}" for j in range(160)]  # == doc 5
        docs.append((i, " ".join(base)))
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    assert spark.conf.get(_CONTAINMENT_VOCAB_CAP_CONF, None) is None
    result = {
        r.doc_id: (r.subset_of, r.kept)
        for r in all_specs()["llm_dedup_containment"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    sets = {i: set(t.split(" ")) for i, t in docs}
    for i in sets:
        supers = [
            j for j in sets
            if j != i and sets[i] <= sets[j]
            and (len(sets[j]) > len(sets[i]) or j < i)
        ]
        want = (min(supers) if supers else None, not supers)
        assert result[i] == want, (i, result[i], want)
    # and the vocabulary really was past the dense cap
    vocab = {w for s in sets.values() for w in s}
    assert len(vocab) > _MASK_WORDS_CAP * 64


def test_jpeg_color_roundtrip_fixture_and_random():
    """Color JPEG codec: the 3-component fixture must decode back to
    the per-channel generative formula, and random 3-component
    coefficient blocks must survive the interleaved-MCU entropy layer
    exactly (per-component DC predictors, shared tables)."""
    import random

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_block_value_c,
        jpeg_decode_baseline,
        jpeg_encode_baseline,
        jpeg_px_dims,
        make_gradient_jpeg_color,
    )

    for did in (0, 3, 21, 47):
        w, h, nc, px = jpeg_decode_baseline(make_gradient_jpeg_color(did))
        assert nc == 3 and (w, h) == jpeg_px_dims(did)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == jpeg_block_value_c(
                        x // 8, y // 8, c, did
                    )
    rng = random.Random(11)
    qtab = [8] + [16] * 63
    for _ in range(6):
        w, h = rng.randrange(1, 20), rng.randrange(1, 20)
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        comps = [
            [
                [rng.randrange(-60, 61) if rng.random() < 0.25 else 0
                 for _ in range(64)]
                for _ in range(nb)
            ]
            for _ in range(3)
        ]
        for ci in range(3):
            for blk in comps[ci]:
                blk[0] = rng.randrange(-128, 128)
        dw, dh, nc, px = jpeg_decode_baseline(
            jpeg_encode_baseline(comps, w, h, qtab)
        )
        assert (dw, dh, nc) == (w, h, 3)
        mcux = (w + 7) // 8
        for ci in range(3):
            for bi, blk in enumerate(comps[ci]):
                ref = _idct8x8([v * qtab[i] for i, v in enumerate(blk)])
                by, bx = divmod(bi, mcux)
                for yy in range(min(8, h - by * 8)):
                    for xx in range(min(8, w - bx * 8)):
                        assert (
                            px[((by * 8 + yy) * w + bx * 8 + xx) * 3 + ci]
                            == ref[yy * 8 + xx]
                        )


def test_jpeg_420_roundtrip_fixture():
    """The 4:2:0 gradient JPEGs are constant per 8x8 block PER
    COMPONENT at that component's resolution with DC quant step 8, and
    the decoder's replication upsample of a constant is exact — so the
    doubly-lossy pipeline (quantization + subsampling) must reproduce
    both generative formulas pixel-for-pixel."""
    from hdfs_mr_spark.sources.media import (
        jpeg420_px_dims,
        jpeg_block_value_c420,
        jpeg_block_value_y420,
        jpeg_decode_baseline,
        make_gradient_jpeg_420,
    )

    for did in (0, 1, 5, 13, 31, 47):
        w, h, nc, px = jpeg_decode_baseline(make_gradient_jpeg_420(did))
        assert (w, h) == jpeg420_px_dims(did) and nc == 3
        for y in range(h):
            for x in range(w):
                assert px[(y * w + x) * 3] == jpeg_block_value_y420(
                    x // 8, y // 8, did
                )
                for c in (1, 2):
                    assert px[(y * w + x) * 3 + c] == jpeg_block_value_c420(
                        x // 16, y // 16, c, did
                    )


def test_jpeg_420_entropy_roundtrip_random_coefficients():
    """Property (hypothesis): ARBITRARY quantized coefficient blocks
    survive the 4:2:0 encode -> decode exactly — interleaved
    4Y+Cb+Cr MCU scan order, per-component differential DC, and the
    replication upsample are all content-independent. Reference pixels
    come from the shared IDCT on the dequantized blocks plus the same
    (x*hi)//hmax index math applied to the reference planes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_decode_baseline,
        jpeg_encode_420,
    )

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def prop(data):
        qtab = [data.draw(st.integers(min_value=1, max_value=255))
                for _ in range(64)]
        w = data.draw(st.integers(min_value=1, max_value=40), label="w")
        h = data.draw(st.integers(min_value=1, max_value=40), label="h")
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16

        def rand_blocks(n):
            out = []
            for _ in range(n):
                blk = data.draw(
                    st.lists(
                        st.integers(min_value=-100, max_value=100),
                        min_size=64, max_size=64,
                    )
                )
                blk[0] = max(-128, min(127, blk[0]))
                out.append(blk)
            return out

        ys = rand_blocks(4 * mcux * mcuy)
        cbs = rand_blocks(mcux * mcuy)
        crs = rand_blocks(mcux * mcuy)
        dw, dh, nc, px = jpeg_decode_baseline(
            jpeg_encode_420(ys, cbs, crs, w, h, qtab)
        )
        assert (dw, dh, nc) == (w, h, 3)

        def plane_val(blocks, grid_w, sx, sy):
            bi = (sy // 8) * grid_w + sx // 8
            ref = _idct8x8([c * qtab[i] for i, c in enumerate(blocks[bi])])
            return ref[(sy % 8) * 8 + sx % 8]

        for y in range(h):
            for x in range(w):
                assert px[(y * w + x) * 3] == plane_val(ys, 2 * mcux, x, y)
                assert px[(y * w + x) * 3 + 1] == plane_val(
                    cbs, mcux, x // 2, y // 2
                )
                assert px[(y * w + x) * 3 + 2] == plane_val(
                    crs, mcux, x // 2, y // 2
                )

    prop()


def test_jpeg_byte_stuffing_and_truncation_edges():
    """Property (hypothesis, VERDICT r5 item 10 + ADVICE r5): streams
    whose entropy segment genuinely contains stuffed FF00 sequences
    round-trip exactly, and ANY truncation inside the entropy segment
    raises the decoder's ValueError contract — never a bare IndexError,
    never a silent wrong decode. Also: a real marker byte (FF followed
    by non-zero) inside the scan raises rather than desyncing."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def prop(data):
        # DC-heavy random blocks maximize the odds of 0xFF bytes in the
        # scan (long all-ones magnitude runs); assume() keeps only the
        # streams that actually exercise stuffing
        qtab = [1] * 64
        w = h = 16
        blocks = []
        for _ in range(4):
            blk = [0] * 64
            blk[0] = data.draw(st.integers(min_value=-128, max_value=127))
            for k in data.draw(
                st.lists(st.integers(min_value=1, max_value=63),
                         max_size=8, unique=True)
            ):
                blk[k] = data.draw(st.integers(min_value=-255, max_value=255))
            blocks.append(blk)
        b = jpeg_encode_gray(blocks, w, h, qtab)
        scan_start = b.index(b"\xff\xda") + 14  # SOS header is 12 + marker
        scan = b[scan_start:-2]  # strip EOI
        assume(b"\xff\x00" in scan)
        dw, dh, px = jpeg_decode_gray(b)  # stuffed stream decodes fine
        assert (dw, dh) == (w, h)
        # truncate mid-scan: every cut must fail loudly with ValueError
        cut = data.draw(
            st.integers(min_value=scan_start + 1, max_value=len(b) - 3)
        )
        try:
            jpeg_decode_gray(b[:cut])
        except ValueError:
            pass  # the contract
        except IndexError as exc:  # pragma: no cover
            raise AssertionError(f"bare IndexError on truncation: {exc}")
        else:
            # a cut can land exactly after the last needed bit — then
            # the decode legitimately succeeds and must match
            assert jpeg_decode_gray(b[:cut] + b"\xff\xd9")[2] == px
        # marker desync: overwrite a stuffed 00 with a marker id
        i = b.index(b"\xff\x00", scan_start)
        mangled = b[:i + 1] + b"\xc4" + b[i + 2:]
        try:
            jpeg_decode_gray(mangled)
        except ValueError:
            pass
        except IndexError as exc:  # pragma: no cover
            raise AssertionError(f"bare IndexError on marker desync: {exc}")
        else:
            raise AssertionError("marker inside scan decoded silently")

    prop()


def test_jpeg_restart_marker_roundtrip_random():
    """Property (hypothesis): random quantized blocks survive encode ->
    decode exactly WITH restart markers — byte-aligned RSTn cycling
    0..7, DC predictor resets, and DRI parsing are content-independent.
    Also pins the failure contract: a dropped or out-of-sequence RST
    raises ValueError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def prop(data):
        qtab = [data.draw(st.integers(min_value=1, max_value=255))
                for _ in range(64)]
        w = data.draw(st.integers(min_value=1, max_value=32), label="w")
        h = data.draw(st.integers(min_value=1, max_value=32), label="h")
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        blocks = []
        for _ in range(nb):
            blk = data.draw(
                st.lists(
                    st.integers(min_value=-100, max_value=100),
                    min_size=64, max_size=64,
                )
            )
            blk[0] = max(-128, min(127, blk[0]))
            blocks.append(blk)
        ri = data.draw(st.integers(min_value=1, max_value=max(1, nb)))
        b = jpeg_encode_gray(blocks, w, h, qtab, restart_interval=ri)
        dw, dh, px = jpeg_decode_gray(b)
        assert (dw, dh) == (w, h)
        mcux = (w + 7) // 8
        for bi, blk in enumerate(blocks):
            ref = _idct8x8([c * qtab[i] for i, c in enumerate(blk)])
            by, bx = divmod(bi, mcux)
            for yy in range(min(8, h - by * 8)):
                for xx in range(min(8, w - bx * 8)):
                    assert px[(by * 8 + yy) * w + bx * 8 + xx] == ref[yy * 8 + xx]
        # failure contract: mangle the first RST's index -> ValueError
        if nb > ri:
            i = b.index(b"\xff\xd0", b.index(b"\xff\xda"))
            mangled = b[:i + 1] + b"\xd5" + b[i + 2:]
            try:
                jpeg_decode_gray(mangled)
            except ValueError:
                pass
            else:
                raise AssertionError("out-of-sequence RST decoded silently")

    prop()


def test_jpeg_rst_fixture_matches_formula():
    """The restart-marker gradient fixture decodes to the SAME pixels
    as the plain gradient family (restart markers change the bitstream
    layout, not the image) — per generative formula."""
    from hdfs_mr_spark.sources.media import (
        jpeg_block_value,
        jpeg_decode_gray,
        jpeg_px_dims,
        make_gradient_jpeg_rst,
    )

    for did in (0, 1, 2, 5, 13, 47):
        b = make_gradient_jpeg_rst(did)
        assert b"\xff\xdd" in b  # DRI present
        w, h, px = jpeg_decode_gray(b)
        assert (w, h) == jpeg_px_dims(did)
        for y in range(h):
            for x in range(w):
                assert px[y * w + x] == jpeg_block_value(x // 8, y // 8, did)


def test_png_adam7_roundtrip_and_pass_dropping():
    """Adam7 interlace: the gradient fixture deinterlaces to the same
    media_px_value pixels as the progressive-scan family, and tiny
    images (where whole passes are empty) round-trip exactly — the two
    interlace subtleties (per-pass sub-image filtering, empty passes
    contributing no bytes) both exercised."""
    from hdfs_mr_spark.sources.media import (
        make_gradient_png_adam7,
        media_px_dims,
        media_px_value,
        png_decode_pixels,
        png_encode_adam7,
    )

    for did in (0, 1, 5, 13, 31, 47):
        w, h, px = png_decode_pixels(make_gradient_png_adam7(did))
        assert (w, h) == media_px_dims(did)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == media_px_value(
                        x, y, c, did
                    )
    for (w, h) in [(1, 1), (2, 1), (1, 2), (3, 3), (4, 5), (8, 1), (7, 7)]:
        def f(x, y, c):
            return (x * 7 + y * 11 + c * 5) % 256

        ww, hh, px = png_decode_pixels(png_encode_adam7(f, w, h, 2))
        assert (ww, hh) == (w, h)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == f(x, y, c), (w, h)


def test_png_adam7_random_pixels_property():
    """Property (hypothesis): ARBITRARY pixel content at arbitrary
    small dims survives Adam7 encode -> decode exactly — pass
    geometry, per-pass filtering, and reassembly are all
    content-independent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import png_decode_pixels, png_encode_adam7

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def prop(data):
        w = data.draw(st.integers(min_value=1, max_value=20), label="w")
        h = data.draw(st.integers(min_value=1, max_value=20), label="h")
        seed = data.draw(st.integers(min_value=0, max_value=4))
        vals = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=3 * w * h, max_size=3 * w * h,
            )
        )

        def f(x, y, c):
            return vals[(y * w + x) * 3 + c]

        ww, hh, px = png_decode_pixels(png_encode_adam7(f, w, h, seed))
        assert (ww, hh) == (w, h)
        assert list(px) == vals

    prop()


def test_wav_stereo_parse_and_formulas():
    """Stereo WAV: parse_wav_multi walks chunks, validates PCM16
    stereo, and the interleaved planes match both generative channel
    formulas; mono files still parse with nch=1; stereo files still
    REFUSE through the mono-only parse_wav."""
    import struct

    import pytest

    from hdfs_mr_spark.sources.media import (
        audio_params,
        audio_sample,
        audio_sample_r,
        make_wav,
        make_wav_stereo,
        parse_wav,
        parse_wav_multi,
    )

    for did in (0, 1, 7):
        blob = make_wav_stereo(did)
        rate, nch, data = parse_wav_multi(blob)
        er, en = audio_params(did)
        assert (rate, nch) == (er, 2) and len(data) == 4 * en
        frames = struct.unpack(f"<{2 * en}h", data)
        for i in (0, 1, en - 1):
            assert frames[2 * i] == audio_sample(i, did)
            assert frames[2 * i + 1] == audio_sample_r(i, did)
        with pytest.raises(ValueError):
            parse_wav(blob)  # mono-only API refuses stereo
        r2, n2, d2 = parse_wav_multi(make_wav(did))
        assert (r2, n2) == (er, 1)


def test_jpeg_progressive_roundtrip_random():
    """Property (hypothesis): random quantized blocks at 1 or 3
    components survive the progressive spectral-selection encode ->
    decode exactly — interleaved DC scan, per-component AC band scans,
    coalesced multi-block EOB runs, and the custom progressive AC
    Huffman table are all content-independent. Reference pixels from
    the shared IDCT on the dequantized blocks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_decode_progressive,
        jpeg_encode_progressive_ss,
    )

    @settings(max_examples=20, deadline=None)
    @given(st.data())
    def prop(data):
        ncomp = data.draw(st.sampled_from([1, 3]))
        qtab = [data.draw(st.integers(min_value=1, max_value=255))
                for _ in range(64)]
        w = data.draw(st.integers(min_value=1, max_value=32), label="w")
        h = data.draw(st.integers(min_value=1, max_value=32), label="h")
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        comps = []
        for _ in range(ncomp):
            blocks = []
            for _ in range(nb):
                blk = [0] * 64
                blk[0] = data.draw(st.integers(min_value=-128, max_value=127))
                # ~half the blocks stay DC-only so EOB runs span blocks
                if data.draw(st.booleans()):
                    for k in data.draw(
                        st.lists(st.integers(min_value=1, max_value=63),
                                 max_size=10, unique=True)
                    ):
                        blk[k] = data.draw(
                            st.integers(min_value=-255, max_value=255)
                        )
                blocks.append(blk)
            comps.append(blocks)
        dw, dh, nc, px = jpeg_decode_progressive(
            jpeg_encode_progressive_ss(comps, w, h, qtab)
        )
        assert (dw, dh, nc) == (w, h, ncomp)
        mcux = (w + 7) // 8
        for ci in range(ncomp):
            for bi in range(nb):
                ref = _idct8x8(
                    [c * qtab[i] for i, c in enumerate(comps[ci][bi])]
                )
                by, bx = divmod(bi, mcux)
                for yy in range(min(8, h - by * 8)):
                    for xx in range(min(8, w - bx * 8)):
                        assert (
                            px[((by * 8 + yy) * w + bx * 8 + xx) * ncomp + ci]
                            == ref[yy * 8 + xx]
                        )

    prop()


def test_jpeg_progressive_fixture_and_contracts():
    """The progressive gradient fixture decodes to jpeg_block_value_c
    pixels (scan order reorders bits, not values); the decoder refuses
    baseline streams (pointing at the baseline API) and genuinely
    HONORS the scan header's point transform: mangling the DC scan's
    Al rescales every decoded DC, so the pixels must change (the
    r5-era refusal contract became support — successive approximation
    is now decoded, see test_jpeg_progressive_sa_roundtrip_random)."""
    import struct

    import pytest

    from hdfs_mr_spark.sources.media import (
        jpeg_block_value_c,
        jpeg_decode_progressive,
        jpeg_px_dims,
        make_gradient_jpeg,
        make_gradient_jpeg_progressive,
    )

    for did in (0, 1, 5, 13, 47):
        b = make_gradient_jpeg_progressive(did)
        assert b"\xff\xc2" in b  # SOF2
        w, h, nc, px = jpeg_decode_progressive(b)
        assert (w, h, nc) == (*jpeg_px_dims(did), 3)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == jpeg_block_value_c(
                        x // 8, y // 8, c, did
                    )
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode_progressive(make_gradient_jpeg(0))
    # mangle the DC SOS's AhAl byte to Al=1: the decoder must APPLY the
    # point transform (values scale x2), not ignore the field
    b = bytearray(make_gradient_jpeg_progressive(0))
    i = b.index(b"\xff\xda")  # first SOS = DC scan
    (seglen,) = struct.unpack_from(">H", b, i + 2)
    assert b[i + 1 + seglen] == 0x00
    b[i + 1 + seglen] = 0x01  # AhAl byte: Ah=0, Al=1
    _, _, _, px0 = jpeg_decode_progressive(make_gradient_jpeg_progressive(0))
    _, _, _, px1 = jpeg_decode_progressive(bytes(b))
    assert px0 != px1


def test_jpeg_progressive_sa_roundtrip_random():
    """Property (hypothesis): random quantized blocks survive the FULL
    progressive encode -> decode (spectral selection + successive
    approximation at random Al ladders) exactly — the DC bit-ladder,
    newly-significant run coding, correction-bit buffering, and
    EOB-run-with-stashed-bits interplay of G.1.2.3 are all
    content-independent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import (
        _idct8x8,
        jpeg_decode_progressive,
        jpeg_encode_progressive_sa,
    )

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def prop(data):
        ncomp = data.draw(st.sampled_from([1, 3]))
        al = data.draw(st.integers(min_value=1, max_value=3))
        qtab = [data.draw(st.integers(min_value=1, max_value=255))
                for _ in range(64)]
        w = data.draw(st.integers(min_value=1, max_value=28), label="w")
        h = data.draw(st.integers(min_value=1, max_value=28), label="h")
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        comps = []
        for _ in range(ncomp):
            blocks = []
            for _ in range(nb):
                blk = [0] * 64
                blk[0] = data.draw(st.integers(min_value=-128, max_value=127))
                if data.draw(st.booleans()):
                    for k in data.draw(
                        st.lists(st.integers(min_value=1, max_value=63),
                                 max_size=12, unique=True)
                    ):
                        blk[k] = data.draw(
                            st.integers(min_value=-255, max_value=255)
                        )
                blocks.append(blk)
            comps.append(blocks)
        dw, dh, nc, px = jpeg_decode_progressive(
            jpeg_encode_progressive_sa(comps, w, h, qtab, al=al)
        )
        assert (dw, dh, nc) == (w, h, ncomp)
        mcux = (w + 7) // 8
        for ci in range(ncomp):
            for bi in range(nb):
                ref = _idct8x8(
                    [c * qtab[i] for i, c in enumerate(comps[ci][bi])]
                )
                by, bx = divmod(bi, mcux)
                for yy in range(min(8, h - by * 8)):
                    for xx in range(min(8, w - bx * 8)):
                        assert (
                            px[((by * 8 + yy) * w + bx * 8 + xx) * ncomp + ci]
                            == ref[yy * 8 + xx]
                        )

    prop()


def test_jpeg_progressive_sa_fixture():
    """The SA gradient fixture decodes to jpeg_block_value_c pixels:
    the DC bit-ladder (Al = 1 + doc_id % 3 -> 0) must reconstruct each
    constant block's value exactly via the two's-complement OR
    identity."""
    from hdfs_mr_spark.sources.media import (
        jpeg_block_value_c,
        jpeg_decode_progressive,
        jpeg_px_dims,
        make_gradient_jpeg_progressive_sa,
    )

    for did in (0, 1, 2, 5, 13, 47):
        b = make_gradient_jpeg_progressive_sa(did)
        w, h, nc, px = jpeg_decode_progressive(b)
        assert (w, h, nc) == (*jpeg_px_dims(did), 3)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == jpeg_block_value_c(
                        x // 8, y // 8, c, did
                    )


def test_gif_lzw_property_roundtrip():
    """Property (hypothesis): arbitrary index streams survive the
    GIF-variant LZW encode -> decode exactly — LSB-first variable-width
    packing, width growth, CLEAR-at-4096 resets, and the KwKwK case
    are all content-independent. Low-entropy streams force deep
    dictionaries; a truncated stream raises."""
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdfs_mr_spark.sources.media import _gif_lzw_decode, _gif_lzw_encode

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def prop(data):
        if data.draw(st.booleans()):
            idx = data.draw(
                st.lists(st.integers(min_value=0, max_value=255),
                         min_size=1, max_size=4000)
            )
        else:  # runs: deep-dictionary regime
            step = data.draw(st.integers(min_value=1, max_value=9))
            n = data.draw(st.integers(min_value=1, max_value=8000))
            idx = [(i // step) % 256 for i in range(n)]
        enc = _gif_lzw_encode(idx)
        assert list(_gif_lzw_decode(enc)) == idx
        with pytest.raises(ValueError):
            _gif_lzw_decode(enc[: max(0, len(enc) // 2 - 1)])

    prop()


def test_gif_fixture_matches_formulas():
    """The GIF fixture decodes (full container walk + LZW + palette)
    to the composed index/palette formulas, and the decoder skips
    extension blocks and validates magic."""
    import pytest

    from hdfs_mr_spark.sources.media import (
        gif_decode_pixels,
        gif_index,
        gif_palette,
        make_gradient_gif,
        media_px_dims,
    )

    for did in (0, 3, 17, 40):
        blob = make_gradient_gif(did)
        w, h, px = gif_decode_pixels(blob)
        assert (w, h) == media_px_dims(did)
        for y in range(h):
            for x in range(w):
                pal = gif_palette(gif_index(x, y, did), did)
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == pal[c]
    # an extension block (e.g. 89a graphics control) is walked over
    blob = make_gradient_gif(1)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + terminator
    spliced = blob[:13 + 768] + ext + blob[13 + 768:]
    assert gif_decode_pixels(spliced) == gif_decode_pixels(blob)
    with pytest.raises(ValueError):
        gif_decode_pixels(b"JIF87a" + blob[6:])


def test_gif_animated_frames_roundtrip():
    """Animated GIF: every frame decodes to its own frame-index
    formula, the frame count matches the generative schedule, the
    single-frame decoder reads frame 0 of an animated blob, and the
    inter-frame graphics-control extensions are genuinely walked."""
    from hdfs_mr_spark.sources.media import (
        gif_decode_frames,
        gif_decode_pixels,
        gif_frame_index,
        gif_n_frames,
        gif_palette,
        make_animated_gif,
        media_px_dims,
    )

    for did in (0, 5, 17, 40):
        blob = make_animated_gif(did)
        w, h, frames = gif_decode_frames(blob)
        assert (w, h) == media_px_dims(did)
        assert len(frames) == gif_n_frames(did)
        for f, px in enumerate(frames):
            for y in range(0, h, 5):
                for x in range(0, w, 3):
                    pal = gif_palette(gif_frame_index(x, y, f, did), did)
                    for c in range(3):
                        assert px[(y * w + x) * 3 + c] == pal[c]
        assert gif_decode_pixels(blob)[2] == frames[0]


def test_gif_interlaced_decode():
    """Interlaced GIF: rows stored in the 4-pass GIF order (8/8, 4/8,
    2/4, 1/2 offsets) must deinterlace back to raster — built by
    storing a known image's rows in interlace order with the interlace
    flag set, for dims where every pass is non-trivial and for tiny
    dims where later passes are empty."""
    import struct

    from hdfs_mr_spark.sources.media import (
        _gif_interlace_rows,
        _gif_lzw_encode,
        gif_decode_pixels,
        gif_palette,
    )

    for (w, h) in [(17, 23), (8, 8), (3, 2), (1, 1), (5, 9)]:
        doc = 7

        def pix(x, y):
            return (x * 3 + y * 5 + doc) % 256

        rows = _gif_interlace_rows(h)
        assert sorted(rows) == list(range(h))
        indices = [pix(x, y) for y in rows for x in range(w)]
        lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        gct = b"".join(bytes(gif_palette(i, doc)) for i in range(256))
        img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
        lzw = _gif_lzw_encode(indices)
        blocks = bytearray([8])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        blob = b"GIF87a" + lsd + gct + img + bytes(blocks) + b"\x3b"
        dw, dh, px = gif_decode_pixels(blob)
        assert (dw, dh) == (w, h)
        for y in range(h):
            for x in range(w):
                pal = gif_palette(pix(x, y), doc)
                for c in range(3):
                    assert px[(y * w + x) * 3 + c] == pal[c], (w, h, x, y)


def test_cdc_boundaries_resynchronize_after_insertion():
    """Property (hypothesis): the algorithmic CLAIM of content-defined
    chunking — inserting a prefix shifts only the chunks it touches,
    and every boundary at least a window-length past the edit
    re-synchronizes, so most chunk hashes survive. Verified with a
    pure-python replica of the engines' rolling-hash/cut/md5 rules:
    the suffix chunk sets (chunks fully after the first
    post-insertion boundary) must be identical between original and
    edited text."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    POWS = [31 ** j for j in range(8)]

    def chunks(text):
        n = len(text)
        cuts = [0]
        for i in range(8, n + 1):  # 1-based window end positions
            h = sum(p * ord(text[i - 8 + j]) for j, p in enumerate(POWS))
            if h % 64 == 0:
                cuts.append(i)
        if cuts[-1] != n:
            cuts.append(n)
        return [
            (cuts[k], hashlib.md5(
                text[cuts[k]: cuts[k + 1]].encode()).hexdigest())
            for k in range(len(cuts) - 1)
        ]

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def prop(data):
        body = data.draw(st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=120, max_size=400,
        ))
        prefix = data.draw(st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=40,
        ))
        orig = chunks(body)
        edited = chunks(prefix + body)
        # boundaries are content-anchored: any cut at position c >= 8
        # in the original reappears at c + len(prefix) in the edited
        # text (the window at that end position sees identical chars),
        # so every original chunk that STARTS at such a cut and is not
        # the final (cut-at-end) chunk survives with the same hash
        shift = len(prefix)
        orig_survivors = {h for (c, h) in orig if c >= 8}
        edited_hashes = {h for (c, h) in edited}
        missing = orig_survivors - edited_hashes
        # the only admissible loss is the LAST chunk (its end is the
        # text end, not a content boundary — unchanged here since we
        # prepend, so actually even it survives) — assert full survival
        assert not missing, (missing, len(orig), len(edited))

    prop()


def test_jpeg_progressive_dht_redefinition_between_scans():
    """Real progressive JPEGs routinely (re)define Huffman tables
    between scans; the decoder's marker walk must apply a DHT that
    appears mid-stream rather than assuming all tables precede the
    first SOS. Splicing a redefinition before an AC scan must not
    change the decode."""
    import struct

    from hdfs_mr_spark.sources.media import (
        _AC_PROG_BITS,
        _AC_PROG_VALS,
        jpeg_decode_progressive,
        make_gradient_jpeg_progressive,
    )

    b = make_gradient_jpeg_progressive(3)
    i = b.index(b"\xff\xda")
    j = b.index(b"\xff\xda", i + 2)  # second SOS = first AC scan
    dht = (
        b"\xff\xc4" + struct.pack(">H", 19 + len(_AC_PROG_VALS)) + b"\x11"
        + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    )
    assert jpeg_decode_progressive(b[:j] + dht + b[j:]) == \
        jpeg_decode_progressive(b)


def test_repo_kernel_unpickles_without_repo_on_path():
    """Regression for the arbitrary-cwd driver bug: a repo_kernel
    closure must deserialize AND run in a fresh interpreter whose
    sys.path does NOT contain the repo (cwd=/tmp) — exactly the Python
    worker environment under a driver launched from anywhere. Passing
    the module-level function directly would fail this (pickled by
    reference)."""
    import pickle
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    from hdfs_mr_spark.functions.udfs import repo_kernel

    kernel = repo_kernel("hdfs_mr_spark.functions.udfs", "vad_energy_batches")
    blob = cloudpickle.dumps(kernel)
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(blob)
        path = f.name
    # first prove the module is NOT importable in that environment
    probe = subprocess.run(
        [sys.executable, "-c", "import hdfs_mr_spark"],
        cwd="/tmp", capture_output=True, text=True,
    )
    assert probe.returncode != 0, "environment unexpectedly has the repo"
    # now the kernel must still run there (it injects the path itself)
    runner = (
        "import pickle, sys\n"
        f"k = pickle.load(open({path!r}, 'rb'))\n"
        "import pandas as pd\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from hdfs_mr_spark.sources.media import make_wav\n"
        "sys.path.remove('/root/repo')\n"
        "for m in list(sys.modules):\n"
        "    if m.startswith('hdfs_mr_spark'): del sys.modules[m]\n"
        "pdf = pd.DataFrame({'doc_id': [0], 'payload': [make_wav(0)]})\n"
        "out = list(k(iter([pdf])))\n"
        "assert len(out) == 1 and len(out[0]) > 0, out\n"
        "print('KERNEL_OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", runner], cwd="/tmp",
        capture_output=True, text=True,
    )
    assert "KERNEL_OK" in res.stdout, (res.stdout, res.stderr[-500:])


def test_corpus_stats_cache_matches_direct_counts(spark):
    """stats.py (the cached plan-time literals): values must equal the
    direct computations they replaced, and repeated calls must serve
    from the cache (no second job — asserted via the cache dict)."""
    from pyspark.sql import functions as F

    from hdfs_mr_spark import stats
    from hdfs_mr_spark.io import table
    from tests.conftest import SF_SMOKE

    d = table(spark, SF_SMOKE, "documents")
    expect_docs = d.count()
    expect_tokens = (
        d.select(F.explode(F.split("text", " ")).alias("w")).count()
    )
    expect_vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().count()
    )
    assert stats.n_docs(spark, SF_SMOKE) == expect_docs
    assert stats.n_tokens(spark, SF_SMOKE) == expect_tokens
    assert stats.vocab_size(spark, SF_SMOKE) == expect_vocab
    # cached: the keys exist and a poisoned cache value is what a
    # second call returns (proving no recomputation path)
    k = stats._key(spark, SF_SMOKE, "n_docs")
    assert k in stats._CACHE
    stats._CACHE[k] = -1
    try:
        assert stats.n_docs(spark, SF_SMOKE) == -1
    finally:
        stats._CACHE[k] = expect_docs


def _write_docs(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )


def test_near_ngram_dispatch_fires_naturally(spark, tmp_path):
    """llm_dedup_near_ngram's df-cap regime switch (VERDICT r8 item 1)
    must fire on the CORPUS STATS alone (no conf, no monkeypatch): a
    synthetic corpus whose boilerplate head-trigram df exceeds
    _NGRAM_DF_CAP takes the capped candidate-generation path, and the
    reported (d1, d2, jaccard3) rows still match a pure-python exact
    trigram-Jaccard brute force — i.e. the dispatch is recall-lossless
    here, not just on the committed Zipf artifact."""
    from hdfs_mr_spark import stats as corpus_stats
    from hdfs_mr_spark.operators.llm_dedup import _NGRAM_DF_CAP

    # 120 docs: a 3-token boilerplate head shared by ALL docs pushes
    # the head-shingle df to 120 (> cap 64); every 7th doc's successor
    # is a near-duplicate (last 4 unique tokens replaced) — trigram
    # Jaccard well above 0.5; everything else shares ONLY the head
    # shingles (J ~ 0.03, far below threshold).
    docs = []
    for i in range(120):
        toks = ["h0", "h1", "h2"] + [f"u{i}x{j}" for j in range(30)]
        if i % 7 == 1:
            toks = ["h0", "h1", "h2"] + [f"u{i-1}x{j}" for j in range(26)] \
                + [f"v{i}x{j}" for j in range(4)]
        docs.append((i, " ".join(toks)))
    _write_docs(tmp_path, docs)

    sf = str(tmp_path)
    assert corpus_stats.max_shingle_df(spark, sf) > _NGRAM_DF_CAP

    def tri(text):
        t = text.split(" ")
        return {" ".join(t[k : k + 3]) for k in range(len(t) - 2)}

    sets = {i: tri(t) for i, t in docs}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                inter = len(sets[i] & sets[j])
                jac = inter / len(sets[i] | sets[j])
                if jac >= 0.5:
                    want[(i, j)] = jac
    assert want, "corpus must contain >=0.5 pairs for the test to bite"

    rows = all_specs()["llm_dedup_near_ngram"].fn(spark, sf).collect()
    got = {(r.d1, r.d2): r.jaccard3 for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_ppjoin_sparse_branch_fires_naturally(spark, tmp_path):
    """llm_dedup_ppjoin's SPARSE prefix-join branch (ADVICE r8 medium:
    previously never correctness-verified — the fixture vocabulary is
    dense-regime, so every sweep and the bitmask-equality test took the
    dense branch) must produce exactly the brute-force J >= 0.8 pair
    set on a corpus whose vocabulary naturally exceeds the dense cap,
    with the real prefix + length filters doing the candidate
    pruning."""
    from hdfs_mr_spark import stats as corpus_stats
    from hdfs_mr_spark.operators.llm_dedup import _MASK_WORDS_CAP

    # 150 docs x ~150 distinct tokens over disjoint per-doc ranges
    # (vocab > 16384 tokens -> sparse regime). Near-dup structure:
    # every 10th doc's successor shares 140 of its 150 tokens
    # (J = 140/160 = 0.875 >= 0.8); doc 77 duplicates doc 5 exactly
    # (J = 1.0); every 10th-plus-5 doc's successor shares only 100
    # (J = 100/200 = 0.5 — a sub-threshold near-miss the length
    # filter must not discard into a false negative NOR admit).
    docs = []
    for i in range(150):
        base = [f"w{i * 200 + j}" for j in range(150)]
        if i % 10 == 1:
            base = [f"w{(i - 1) * 200 + j}" for j in range(140)] \
                + [f"w{i * 200 + j}" for j in range(10)]
        if i % 10 == 6:
            base = [f"w{(i - 1) * 200 + j}" for j in range(100)] \
                + [f"w{i * 200 + j}" for j in range(50)]
        if i == 77:
            base = [f"w{5 * 200 + j}" for j in range(150)]
        docs.append((i, " ".join(base)))
    _write_docs(tmp_path, docs)

    sf = str(tmp_path)
    assert corpus_stats.vocab_size(spark, sf) > _MASK_WORDS_CAP * 64

    sets = {i: set(t.split(" ")) for i, t in docs}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                inter = len(sets[i] & sets[j])
                jac = inter / len(sets[i] | sets[j])
                if jac >= 0.8:
                    want[(i, j)] = (inter, jac)
    assert want and any(j < 1.0 for _, j in want.values())

    rows = all_specs()["llm_dedup_ppjoin"].fn(spark, sf).collect()
    got = {(r.d1, r.d2): (r.n_common, r.jaccard) for r in rows}
    assert set(got) == set(want)
    for k, (n, jac) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - jac) < 1e-12


def test_stream_absorb_bloom_regime_equals_batch_twin(spark, tmp_path):
    """stream_dedup_lsh_absorb's band-key bloom prefilter (VERDICT r8
    item 5) is regime-gated on the sparse-vocabulary signal, so the
    fixture sweeps (dense ~31-token vocab) never execute it. This
    corpus naturally exceeds the dense cap -> the bloom path RUNS, and
    the drained verdicts must equal the batch twin's
    (llm_dedup_lsh_stored) exactly — the structural false-negative-
    impossibility claim (bloom covers base + every absorbed batch),
    checked end to end."""
    from hdfs_mr_spark import stats as corpus_stats
    from hdfs_mr_spark.operators.llm_dedup import _MASK_WORDS_CAP

    docs = []
    for i in range(90):
        toks = [f"w{i * 300 + j}" for j in range(280)]
        if i % 9 == 3:   # stream doc near-dups a BASE doc (i-2 % 3 != 0)
            toks = [f"w{(i - 2) * 300 + j}" for j in range(260)] \
                + [f"w{i * 300 + j}" for j in range(20)]
        if i % 9 == 6:   # stream doc near-dups an EARLIER stream doc
            toks = [f"w{(i - 6) * 300 + j}" for j in range(260)] \
                + [f"w{i * 300 + j}" for j in range(20)]
        docs.append((i, " ".join(toks)))
    _write_docs(tmp_path, docs)

    sf = str(tmp_path)
    assert corpus_stats.vocab_size(spark, sf) > _MASK_WORDS_CAP * 64

    stream_rows = sorted(
        tuple(r) for r in all_specs()["stream_dedup_lsh_absorb"]
        .fn(spark, sf).collect()
    )
    twin_rows = sorted(
        tuple(r) for r in all_specs()["llm_dedup_lsh_stored"]
        .fn(spark, sf).collect()
    )
    assert stream_rows == twin_rows and len(stream_rows) > 0
    assert any(r[1] != "keep" for r in stream_rows), \
        "corpus must contain duplicates for the test to bite"


def test_bmp_roundtrip_and_refusals():
    """make_gradient_bmp encodes BGR bottom-up with 4-byte row padding;
    bmp_decode_pixels must invert all three quirks back to the exact
    generative pixels, and refuse compressed / non-24bpp / top-down
    variants loudly."""
    import struct

    import pytest as _pytest

    from hdfs_mr_spark.sources.media import (
        bmp_decode_pixels,
        make_gradient_bmp,
        media_px_dims,
        media_px_value,
    )

    for doc_id in (0, 1, 5, 13):  # both row-padding parities
        blob = make_gradient_bmp(doc_id)
        w, h, buf = bmp_decode_pixels(blob)
        assert (w, h) == media_px_dims(doc_id)
        for x, y in ((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1),
                     (w // 2, h // 2)):
            for c in range(3):
                assert buf[3 * (y * w + x) + c] == media_px_value(
                    x, y, c, doc_id
                ), (doc_id, x, y, c)
    blob = bytearray(make_gradient_bmp(3))
    with _pytest.raises(ValueError, match="signature"):
        bmp_decode_pixels(b"XX" + bytes(blob[2:]))
    bad_bpp = bytearray(blob); struct.pack_into("<H", bad_bpp, 28, 32)
    with _pytest.raises(ValueError, match="unsupported"):
        bmp_decode_pixels(bytes(bad_bpp))
    topdown = bytearray(blob)
    w, h = media_px_dims(3)
    struct.pack_into("<i", topdown, 22, -h)
    with _pytest.raises(ValueError, match="unsupported"):
        bmp_decode_pixels(bytes(topdown))


def test_lake_commit_log_primitives(tmp_path):
    """The lakehouse commit/snapshot kernel, no Spark: put-if-absent
    commits (os.link EEXIST = detected conflict), log-fold snapshots
    with remove-tombstones, as-of reads, and checkpoint-rooted folds
    that skip the replayed tail."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hdfs_mr_spark.sources.lake import (
        _commit,
        _log_versions,
        _snapshot_files,
    )

    root = tmp_path
    log = root / "_log"
    assert _commit(log, 0, {"add": ["data/a", "data/b"], "remove": []})
    assert _commit(log, 1, {"add": ["data/c"], "remove": []})
    # conflicting writer loses, then retries at the next version
    assert not _commit(log, 1, {"add": ["data/x"], "remove": []})
    assert _commit(log, 2, {"add": ["data/x"], "remove": []})
    # the losing attempt must not have clobbered v1's content
    v1 = json.loads((log / "v0000000001.json").read_text())
    assert v1["add"] == ["data/c"]
    # COW rewrite: v3 tombstones a+b, adds d
    assert _commit(log, 3, {"add": ["data/d"], "remove": ["data/a", "data/b"]})
    assert _log_versions(root) == [0, 1, 2, 3]
    assert _snapshot_files(root) == ["data/c", "data/d", "data/x"]
    assert _snapshot_files(root, as_of=1) == ["data/a", "data/b", "data/c"]
    assert _snapshot_files(root, as_of=0) == ["data/a", "data/b"]
    # checkpoint at v2: folds rooted there must match the full fold
    pq.write_table(
        pa.table({"path": pa.array(sorted({"data/a", "data/b", "data/c",
                                           "data/x"}), pa.string())}),
        log / "ckpt_0000000002.parquet",
    )
    assert _snapshot_files(root) == ["data/c", "data/d", "data/x"]
    # as-of BELOW the checkpoint must ignore it
    assert _snapshot_files(root, as_of=1) == ["data/a", "data/b", "data/c"]


def test_lake_stats_skipping_kernel(tmp_path):
    """Data-skipping kernel, no Spark: stats-carrying add actions fold
    through remove-tombstones; pruning keeps exactly the overlapping
    [min,max] files, keeps stat-less files CONSERVATIVELY, and the
    boundary is inclusive on both ends (a file whose max == lo or
    min == hi must be scanned)."""
    from hdfs_mr_spark.sources.lake import (
        _commit,
        _pruned_files,
        _snapshot_adds,
        _snapshot_files,
    )

    log = tmp_path / "_log"
    s = lambda a, b: {"k": {"min": a, "max": b}}  # noqa: E731
    assert _commit(log, 0, {"add": [
        {"path": "data/a", "stats": s(0, 9)},
        {"path": "data/b", "stats": s(10, 19)},
    ], "remove": []})
    assert _commit(log, 1, {"add": [
        {"path": "data/c", "stats": s(20, 29)},
        {"path": "data/nostats"},  # bare-path r9 format: no stats
    ], "remove": []})
    # COW rewrite of b — new file, new stats; old tombstoned
    assert _commit(log, 2, {"add": [
        {"path": "data/b2", "stats": s(12, 17)},
    ], "remove": ["data/b"]})
    assert _snapshot_files(tmp_path) == [
        "data/a", "data/b2", "data/c", "data/nostats"]
    adds = _snapshot_adds(tmp_path)
    assert adds["data/b2"]["k"]["min"] == 12 and adds["data/nostats"] == {}
    files, live = _pruned_files(tmp_path, "k", 12, 17)
    assert live == 4 and files == ["data/b2", "data/nostats"]
    # inclusive boundaries both ends
    assert _pruned_files(tmp_path, "k", 9, 9)[0] == ["data/a", "data/nostats"]
    assert _pruned_files(tmp_path, "k", 29, 40)[0] == [
        "data/c", "data/nostats"]
    # disjoint range: only the conservative stat-less file survives
    assert _pruned_files(tmp_path, "k", 100, 200)[0] == ["data/nostats"]
    # as-of prunes against the HISTORICAL file set (pre-COW b, not b2)
    files_v1, live_v1 = _pruned_files(tmp_path, "k", 12, 17, as_of=1)
    assert live_v1 == 4 and files_v1 == ["data/b", "data/nostats"]


def test_lake_version_adds_refuses_removes(tmp_path):
    """The streaming-tail unit (one commit's added files) serves append
    commits and REFUSES remove-carrying versions — an append tail
    cannot represent data changes (Delta-without-ignoreChanges)."""
    import pytest as _pytest

    from hdfs_mr_spark.sources.lake import _commit, version_adds

    log = tmp_path / "_log"
    assert _commit(log, 0, {"add": ["data/a"], "remove": []})
    assert _commit(log, 1, {"add": [
        {"path": "data/b", "stats": {"k": {"min": 1, "max": 2}}}
    ], "remove": []})
    assert _commit(log, 2, {"add": ["data/c"], "remove": ["data/a"]})
    assert version_adds(tmp_path, 0) == ["data/a"]
    assert version_adds(tmp_path, 1) == ["data/b"]  # dict add normalized
    with _pytest.raises(ValueError, match="remove-actions"):
        version_adds(tmp_path, 2)


def test_avi_container_walk_and_refusals():
    """The MJPEG-AVI kernel, no Spark: real RIFF walk returns exactly
    the encoded frames with header-consistent dims; pixel decode of a
    sampled frame matches the generative block formula; non-MJPG
    codecs, truncated headers, and non-AVI RIFFs are REFUSED."""
    import struct

    import pytest as _pytest

    from hdfs_mr_spark.sources.media import (
        avi_decode_frames,
        avi_frame_block_value,
        avi_n_frames,
        jpeg_decode_gray,
        jpeg_px_dims,
        make_mjpeg_avi,
    )

    did = 7
    blob = make_mjpeg_avi(did)
    w, h, nf, frames = avi_decode_frames(blob)
    assert (w, h) == jpeg_px_dims(did) and nf == avi_n_frames(did)
    assert len(frames) == nf
    dw, dh, px = jpeg_decode_gray(frames[2])
    assert (dw, dh) == (w, h)
    assert sum(px) == sum(
        avi_frame_block_value(x // 8, y // 8, 2, did)
        for y in range(h) for x in range(w)
    )
    # refusal: foreign codec fourcc in strf
    t = bytearray(blob)
    i = t.find(b"MJPG", t.find(b"strf"))
    t[i:i + 4] = b"XVID"
    with _pytest.raises(ValueError, match="unsupported AVI codec"):
        avi_decode_frames(bytes(t))
    # refusal: not an AVI RIFF
    t2 = bytearray(blob)
    t2[8:12] = b"WAVE"
    with _pytest.raises(ValueError, match="not a RIFF/AVI"):
        avi_decode_frames(bytes(t2))
    # refusal: header/movi frame-count disagreement
    t3 = bytearray(blob)
    ai = t3.find(b"avih") + 8
    struct.pack_into("<I", t3, ai + 16, nf + 1)
    with _pytest.raises(ValueError, match="frame count"):
        avi_decode_frames(bytes(t3))


def test_transform_with_state_blocked_by_missing_protobuf():
    """ENVIRONMENT TRIPWIRE (r11, VERDICT r10 item 4):
    ``transformWithStateInPandas`` — the Spark 4 stateful successor API
    (timers, TTL, composite state) — is blocked in this sandbox: its
    TransformWithStateInPySpark driver worker speaks the state-server
    protocol via ``pyspark.sql.streaming.proto.StateMessage_pb2``,
    which needs the ``google.protobuf`` runtime; the sandbox ships no
    protobuf and has no network (probed r11: the worker crashes at
    query start with ``ImportError: cannot import name 'descriptor'
    from 'google.protobuf'`` — PERF.md r11). Same blocker class as
    spark-avro (VERDICT r10 "what's missing" item 4).

    If this test ever FAILS, protobuf has appeared in the environment:
    implement the `stream_state_v2` operator (value+list state, an
    event-time timer, batch-twin oracle) instead of re-documenting."""
    import importlib.util

    assert importlib.util.find_spec("google") is None or (
        importlib.util.find_spec("google.protobuf") is None
    ), (
        "google.protobuf is now importable: transformWithStateInPandas "
        "is unblocked — build stream_state_v2 (see VERDICT r10 item 4)"
    )


def test_overflow_audit_inventory_is_complete():
    """Overflow-audit gate (r11 — VERDICT r10 item 5, the agg_gini
    lesson made structural): tools/overflow_audit.py mechanically
    extracts every integer product-sum / bigint-cast SUM accumulator in
    the engine source; each must carry a curated bound argument at the
    100 TB design point in tests/overflow_audit.json (classes: cents
    sums 4x headroom at sf1e5, dim-bounded PQ squares, per-order
    revenue products, top-k-capped regression moments, ... — DuckDB
    oracle SUMs are HUGEINT by engine semantics, so the audit is about
    SPARK-side accumulators). A new un-audited accumulator, or a stale
    entry for a removed one, fails here — the audit cannot rot. The one
    unprovable bound found (mr_matrix_multiply's av*bw block product,
    ~9.5e18/term at sf1e5) was promoted to a DECIMAL(38,0) accumulator
    in r11."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "overflow_audit.py"),
         "--check"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, f"overflow audit drift:\n{r.stdout}{r.stderr}"


def test_scene_avi_generator_and_cut_ground_truth():
    """Scene fixture kernel (r11): the scene-stepped AVI round-trips
    through the container walk + JPEG decode bit-exactly, frames
    within a scene are IDENTICAL, and the mean-abs-delta statistic is
    0 within scenes and >= 29000 milli at every scene boundary — the
    ground truth llm_multimodal_scene_detect and its oracle both
    replay."""
    from hdfs_mr_spark.sources.media import (
        avi_decode_frames,
        avi_n_frames,
        avi_scene_block_value,
        jpeg_decode_gray,
        make_mjpeg_avi,
        scene_len,
    )

    for did in (3, 4, 11):
        blob = make_mjpeg_avi(did, avi_scene_block_value)
        w, h, nf, frames = avi_decode_frames(blob)
        assert nf == avi_n_frames(did)
        slen = scene_len(did)
        assert nf > slen, "fixture must contain at least one cut"
        pxs = []
        for f in range(nf):
            dw, dh, px = jpeg_decode_gray(frames[f])
            assert (dw, dh) == (w, h)
            # bit-exact decode against the generative formula
            assert px[0] == avi_scene_block_value(0, 0, f, did)
            pxs.append(px)
        for f in range(1, nf):
            sad = sum(abs(a - b) for a, b in zip(pxs[f], pxs[f - 1]))
            milli = 1000 * sad // (w * h)
            if f % slen == 0:  # scene boundary
                assert milli >= 29000, (did, f, milli)
            else:  # within a scene: frames are identical
                assert milli == 0, (did, f, milli)


def test_avro_blocked_by_missing_connector_jar():
    """ENVIRONMENT TRIPWIRE (r12, VERDICT r11 item 5): the Avro data
    source (``spark.read.format("avro")`` and the
    ``pyspark.sql.avro.functions`` to_avro/from_avro pair) is an
    EXTERNAL module since Spark 2.4 — it needs the spark-avro connector
    jar, which is absent from this sandbox's pyspark/jars, and there is
    no network/--packages path to fetch it. Probed r12:
    ``df.write.format("avro")`` fails with ``AnalysisException: Failed
    to find data source: avro`` and ``to_avro`` with
    ``[AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE]`` (PERF.md r12). Same
    blocker class as transformWithStateInPandas (protobuf tripwire
    above).

    If this test ever FAILS, the spark-avro jar has appeared: implement
    `scan_avro` + `fn_avro` (write/read round trip with a decimal-exact
    aggregate oracle; to_avro/from_avro struct round trip) instead of
    re-documenting the refusal."""
    from pathlib import Path

    import pyspark

    jars = Path(pyspark.__file__).parent / "jars"
    avro_jars = list(jars.glob("*spark-avro*.jar"))
    assert not avro_jars, (
        f"spark-avro connector present ({avro_jars}): Avro is unblocked"
        " — build scan_avro + fn_avro (see VERDICT r11 item 5)"
    )


def test_native_spark_avro_connector_blocked(spark):
    """ENVIRONMENT TRIPWIRE (r12, VERDICT r11 missing item 3): the
    distribution bundles avro CORE jars but not the spark-avro
    CONNECTOR module, so ``format("avro")`` raises AnalysisException
    (probed r12: "Failed to find data source: avro ... external data
    source module since Spark 2.4"). The engine therefore ships a
    self-contained OCF codec (sources/avro_codec.py) behind scan_avro/
    fn_avro — same discipline as the media decoders and the blocked
    transformWithStateInPandas API.

    If this test ever FAILS, the spark-avro jar has appeared: port
    scan_avro to the native ``format("avro")`` reader (keeping the
    module codec as the writer twin) and add from_avro/to_avro to
    fn_avro instead of re-documenting."""
    import pytest
    from pyspark.errors import AnalysisException

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(AnalysisException):
        df.write.format("avro").mode("overwrite").save(
            "/tmp/avro_tripwire_probe"
        )


def test_avro_codec_roundtrip_and_split_ownership(tmp_path):
    """sources/avro_codec.py contract: (a) encode->OCF->decode is the
    identity over the supported working set (longs incl. negatives,
    strings, booleans, doubles, arrays incl. empty, null unions);
    (b) BYTE-RANGE SPLITS partition the file exactly — for ANY split
    count, the union of iter_split_rows over the ranges is the row
    multiset exactly once, in file order (the Hadoop AvroInputFormat
    ownership rule scan_avro's DataSource relies on)."""
    import os

    from hdfs_mr_spark.sources.avro_codec import (
        iter_split_rows,
        read_ocf,
        write_ocf,
    )

    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "u", "type": ["null", "string"]},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
        ],
    }
    rows = [
        {
            "a": i * 7 - 50, "s": f"row{i}",
            "arr": [f"x{j}" for j in range(i % 4)],
            "u": None if i % 3 == 0 else f"c{i}",
            "b": i % 2 == 0, "d": i * 0.5 - 3,
        }
        for i in range(100)
    ]
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        n_blocks = write_ocf(p, schema, rows, codec=codec, block_rows=8)
        assert n_blocks == 13
        assert read_ocf(p) == rows
        size = os.path.getsize(p)
        # every partitioning — including degenerate 1-byte ranges —
        # must reassemble the exact row sequence
        for nsplits in (1, 2, 3, 7, size):
            step = max(1, size // nsplits)
            bounds = [i * step for i in range(nsplits)] + [size]
            got = []
            for i in range(nsplits):
                got.extend(iter_split_rows(p, bounds[i], bounds[i + 1]))
            assert got == rows, f"{codec} nsplits={nsplits}"


def test_avro_union_branch_matched_by_value_type():
    """r13 (VERDICT r12 ADVICE): unions beyond ["null", X] must select
    the branch by the VALUE's type — ["null","long","string"] encodes a
    str against the string branch (index 2), an int against long
    (index 1) — and a value matching no branch raises instead of
    mis-encoding."""
    import pytest

    from hdfs_mr_spark.sources.avro_codec import decode_value, encode_value

    u = ["null", "long", "string"]
    for val, want_idx in ((None, 0), (7, 1), ("hi", 2)):
        buf = bytearray()
        encode_value(buf, u, val)
        assert buf[0] >> 1 == want_idx  # zigzag(idx) for small non-neg
        out, _ = decode_value(bytes(buf), 0, u)
        assert out == val
    with pytest.raises(ValueError, match="no union branch"):
        encode_value(bytearray(), u, 1.5)  # float matches neither
    # bool is NOT an int for branch matching
    with pytest.raises(ValueError, match="no union branch"):
        encode_value(bytearray(), ["null", "long"], True)


def test_avro_union_float_overflow_widens_to_double():
    """r15 (ADVICE r14): a finite double beyond float32 range
    (|v| > ~3.4e38) used to crash the losslessness probe with
    OverflowError inside struct.pack('<f', ...); it must instead select
    the double branch — mirroring the int path's widen-to-long."""
    from hdfs_mr_spark.sources.avro_codec import decode_value, encode_value

    u = ["float", "double"]
    for big in (1e300, -1e300, 3.5e38):
        buf = bytearray()
        encode_value(buf, u, big)
        assert buf[0] >> 1 == 1  # double branch
        out, _ = decode_value(bytes(buf), 0, u)
        assert out == big
    # a float32-exact value still takes the narrow branch
    buf = bytearray()
    encode_value(buf, u, 0.5)
    assert buf[0] >> 1 == 0


def test_materialize_xml_guard_is_fnf_narrow(tmp_path):
    """r15 (VERDICT r14 item 6): the import-time materialize_xml guard
    must tolerate ONLY FileNotFoundError (incomplete testdata) and let
    any other failure propagate loudly — the discipline
    materialize_fixtures already follows (scans.py:101-115). Pins (a)
    that materialize_xml raises FNF for missing testdata but a distinct
    error class for corrupt testdata, and (b) that the module-level
    guard catches nothing broader than FileNotFoundError."""
    import ast
    import inspect

    from hdfs_mr_spark.sources import scans

    # (a) error classes out of materialize_xml itself
    empty = tmp_path / "sfempty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        scans.materialize_xml(str(empty))
    bad = tmp_path / "sfbad"
    bad.mkdir()
    (bad / "supplier.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception) as ei:
        scans.materialize_xml(str(bad))
    assert not isinstance(ei.value, FileNotFoundError)

    # (b) every try/except that wraps a materialize_xml CALL at module
    # top level handles only FileNotFoundError
    tree = ast.parse(inspect.getsource(scans))
    guards = [
        node for node in tree.body
        if isinstance(node, (ast.Try, ast.If))
        and "materialize_xml(" in ast.unparse(node)
        and "def materialize_xml" not in ast.unparse(node)
    ]
    assert guards, "import-time materialize_xml guard not found"
    for g in guards:
        for t in ast.walk(g):
            if isinstance(t, ast.ExceptHandler):
                assert ast.unparse(t.type) == "FileNotFoundError", (
                    f"guard swallows more than FNF: {ast.unparse(t.type)}"
                )


def test_avro_split_reads_are_byte_bounded(tmp_path):
    """r13 (VERDICT r12 ADVICE): iter_split_rows must NOT read the
    whole file per split — with a tiny window chunk, a split at the
    tail of a multi-block file still decodes exactly its owned blocks
    (bounded seek+read), and the union of disjoint splits is the whole
    file exactly once."""
    from hdfs_mr_spark.sources.avro_codec import (iter_split_rows,
                                                  read_ocf, write_ocf)

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "s", "type": "string"}],
    }
    rows = [{"k": i, "s": f"v{i:04d}" * 7} for i in range(500)]
    p = str(tmp_path / "t.avro")
    n_blocks = write_ocf(p, schema, rows, codec="deflate", block_rows=37)
    assert n_blocks > 4
    import os

    size = os.path.getsize(p)
    # 4 KiB window: forces the sliding-window ensure/compact machinery
    cuts = [0, size // 3, 2 * size // 3, size]
    got = []
    for lo, hi in zip(cuts, cuts[1:]):
        got.extend(iter_split_rows(p, lo, hi, chunk=4096))
    assert sorted(r["k"] for r in got) == list(range(500))
    assert read_ocf(p) == rows


def test_classifier_apply_consistent_with_train_trace():
    """r15: llm_quality_classifier_apply scores with the FINAL reported
    training round's weights (w_{R-1}), so its corpus-level counts must
    agree with the train trace's round R-1 row: n_pred_pos == tp+fp and
    n_correct == tp+tn — a pure-DuckDB lockstep check that the apply
    oracle's weight chain replays the train oracle's exactly."""
    import duckdb

    from hdfs_mr_spark.operators.llm_text import (_QC_ROUNDS, _qc_apply_oracle,
                                                  _qc_oracle)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    trace = con.execute(_qc_oracle()).fetchdf()
    final = trace[trace["round"] == _QC_ROUNDS - 1].iloc[0]
    ap = con.execute(_qc_apply_oracle()).fetchdf().iloc[0]
    assert int(ap.tp + ap.fp) == int(final.n_pred_pos)
    assert int(ap.tp + ap.tn) == int(final.n_correct)
    assert int(ap.tp + ap.fp + ap.tn + ap.fn) == len(
        con.execute("SELECT doc_id FROM documents").fetchdf()
    )


def test_hnsw_compact_equals_one_shot(spark):
    """r15: graph compaction folds the absorbed base+delta state into a
    one-shot rebuild — and because the graph index has no frozen model
    component (unlike IVF-PQ's codebook), the rebuilt index must
    reproduce the one-shot llm_sim_knn_hnsw results EXACTLY (same
    (qid, vec_id, rank) triples)."""
    from hdfs_mr_spark.registry import all_specs

    qs = all_specs()
    one_shot = {
        (r.qid, r.vec_id, r["rank"])
        for r in qs["llm_sim_knn_hnsw"].fn(
            spark, "/root/testdata/sf0.001").collect()
    }
    compact = {
        (r.qid, r.vec_id, r["rank"])
        for r in qs["llm_sim_knn_hnsw_compact"].fn(
            spark, "/root/testdata/sf0.001").collect()
    }
    assert compact == one_shot and len(one_shot) > 0


def test_lm_score_kn_rounding_margin():
    """r13 ADVICE (llm_text.py llm_lm_score_kn): ln() is not correctly
    rounded IEEE, so round(-ln(p)*1e6) could in principle flip at a .5
    boundary on a 1-ulp cross-engine difference. Pin the MEASURED
    margin on the smoke corpus: the minimum distance of any
    transition's -ln(p)*1e6 to a .5 boundary must exceed the maximum
    possible ulp of that value by ≥1000x (measured ~1.5e6x at
    sf0.001)."""
    import duckdb

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    n, margin, max_ulp = con.execute("""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
big AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM tok, LATERAL unnest(range(1, len(l))) AS u(i)
),
train_big AS (
  SELECT w1, w2, COUNT(*) AS bcnt FROM big WHERE doc_id % 2 = 0
  GROUP BY w1, w2
),
hist AS (
  SELECT w1, SUM(bcnt) AS cw1, COUNT(*) AS n1fwd FROM train_big GROUP BY w1
),
cont AS (SELECT w2, COUNT(*) AS n1bwd FROM train_big GROUP BY w2),
tot AS (
  SELECT (SELECT COUNT(*) FROM train_big) AS n1p_total,
         (SELECT COUNT(DISTINCT w) FROM (
            SELECT unnest(l) AS w FROM tok WHERE doc_id % 2 = 0)) AS v
),
x AS (
  SELECT -ln(
           CASE WHEN h.cw1 IS NOT NULL THEN
             greatest(CAST(COALESCE(tb.bcnt, 0) AS DOUBLE) - 0.75, 0.0)
               / CAST(h.cw1 AS DOUBLE)
             + 0.75 * CAST(h.n1fwd AS DOUBLE) / CAST(h.cw1 AS DOUBLE)
               * ((CAST(COALESCE(c.n1bwd, 0) AS DOUBLE) + 1.0)
                  / (CAST(t.n1p_total AS DOUBLE) + CAST(t.v AS DOUBLE) + 1.0))
           ELSE
             (CAST(COALESCE(c.n1bwd, 0) AS DOUBLE) + 1.0)
               / (CAST(t.n1p_total AS DOUBLE) + CAST(t.v AS DOUBLE) + 1.0)
           END) * 1000000.0 AS x
  FROM big b
  LEFT JOIN train_big tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
  LEFT JOIN hist h ON b.w1 = h.w1
  LEFT JOIN cont c ON b.w2 = c.w2
  CROSS JOIN tot t
)
SELECT COUNT(*), MIN(abs(x - floor(x) - 0.5)),
       MAX(abs(x) * 2.220446049250313e-16)
FROM x
""").fetchone()
    assert n > 10_000
    assert margin > 1000.0 * max_ulp, (
        f"KN micro-quantization margin too thin: {margin} vs ulp {max_ulp}"
    )


def test_lake_connector_jars_blocked(spark):
    """ENVIRONMENT TRIPWIRE (r14, VERDICT r13 missing item 6, the avro
    discipline): the distribution carries NEITHER the Delta Lake nor
    the Iceberg connector jar — probed r14: ``format("delta")`` and
    ``format("iceberg")`` both raise DATA_SOURCE_NOT_FOUND
    (SparkClassNotFoundException under AnalysisException), and the
    kafka source module is likewise absent. The transactional-lake
    capability is carried by the engine's own lake (sources/lake.py:
    ACID append/merge/time-travel/vacuum/checkpoint/CDF/deletion
    vectors/z-order, all oracle-checked).

    If this test ever FAILS, a connector jar has appeared: adopt it for
    ONE interop op (`lake_delta_interop`: write/read + time travel
    cross-checked against the engine lake's own result) instead of
    re-documenting."""
    df = spark.createDataFrame([(1,)], "id int")
    for fmt in ("delta", "iceberg"):
        try:
            df.write.format(fmt).mode("overwrite").save(
                f"/tmp/lake_tripwire_probe_{fmt}"
            )
        except Exception as exc:
            assert "DATA_SOURCE_NOT_FOUND" in str(exc), (fmt, str(exc)[:300])
        else:
            raise AssertionError(
                f"{fmt} connector jar has APPEARED — adopt it for a "
                "lake_delta_interop-style op (see docstring)"
            )


def test_matrix_profile_exclusion_and_bounds(spark):
    """r15: every matrix-profile neighbor honors the trivial-match
    exclusion zone (|i - nn_i| > 2), the corr^2 proxy obeys
    Cauchy-Schwarz (|key| <= 1e6), and each subsequence emits exactly
    one profile row (n_subseq == emitted rows per type)."""
    from hdfs_mr_spark.registry import all_specs

    rows = all_specs()["ts_matrix_profile"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    per_type: dict = {}
    for r in rows:
        assert abs(r.i - r.nn_i) > 2, (r.i, r.nn_i)
        assert abs(r.corr2_signed_micro) <= 1_000_000
        per_type.setdefault(r.event_type, [0, r.n_subseq])
        per_type[r.event_type][0] += 1
    for t, (emitted, pinned) in per_type.items():
        assert emitted == pinned, (t, emitted, pinned)


def test_topic_lsa_invariants(spark):
    """r15: LSA alignments obey Cauchy-Schwarz (|signed cos^2 micro|
    <= 1e6), both norm pins are positive (non-degenerate components on
    the fixture), the dominant-topic choice agrees with the emitted
    alignments under the exact cross-multiplied rule, and every doc
    appears exactly once."""
    from hdfs_mr_spark.registry import all_specs

    rows = all_specs()["llm_topic_lsa"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows and len({r.doc_id for r in rows}) == len(rows)
    s1, s2 = rows[0].s1_pin, rows[0].s2_pin
    assert s1 > 0 and s2 > 0
    for r in rows:
        c1, c2 = r.cos2_t1_signed_micro, r.cos2_t2_signed_micro
        assert abs(c1) <= 1_000_000 and abs(c2) <= 1_000_000
        assert r.topic in (1, 2)
        # the emitted micro alignments are floor-quantized from the
        # same exact ratios the topic rule compares, so a STRICT
        # alignment gap must agree with the choice (ties can quantize
        # either way — only check the strict direction)
        if r.topic == 1:
            assert abs(c1) >= abs(c2) - 1
        else:
            assert abs(c2) >= abs(c1) - 1


def test_esd_backward_rule_unmasks(spark, tmp_path):
    """r15: the Rosner backward rule is the op's whole point — a
    deviation that FAILS its own round's test still counts as an
    anomaly when a LATER round passes (removal tightened the spread
    and unmasked it). Series [10,15,17,3,11,13,10,19,20,6,17,15,14,16]
    (one point per day) produces exactly that: round 1 fails
    (dev 11 vs mad 3), round 2 passes (dev 9 vs mad 2), round 3 fails
    -> is_anomaly must be (True, True, False)."""
    import datetime

    vals = [10, 15, 17, 3, 11, 13, 10, 19, 20, 6, 17, 15, 14, 16]
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1 + i, 12, 0, 0),
            1,
            "probe",
            float(v),
            "{}",
        )
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        all_specs()["ts_anomaly_esd"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.esd_round,
    )
    assert [r.passed for r in out] == [False, True, False]
    assert [r.is_anomaly for r in out] == [True, True, False]
    assert [r.dev_cents for r in out] == [1100, 900, 500]
    assert [r.mad_cents for r in out] == [300, 200, 200]


def test_matrix_profile_ab_pairs_complete(spark):
    """r15: the AB-join emits every ordered DISTINCT type pair (no
    self pairs — those are the self-join op's domain), one row per
    A-subsequence per pair, and the corr^2 key obeys Cauchy-Schwarz."""
    from hdfs_mr_spark.registry import all_specs

    rows = all_specs()["ts_matrix_profile_ab"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    pairs = {(r.event_type_a, r.event_type_b) for r in rows}
    tys = {t for p in pairs for t in p}
    assert pairs == {(a, b) for a in tys for b in tys if a != b}
    for r in rows:
        assert r.event_type_a != r.event_type_b
        assert abs(r.corr2_signed_micro) <= 1_000_000


def test_whitening_equalizes_spectrum(spark):
    """r15: the whitening op's claim in one assertion — the twin's
    top-2 variance ratio starts anisotropic (lam1/lam2 well above 1)
    and the MEASURED variance ratio of the whitened coordinates lands
    near 1 (within 30% — floor-sqrt scale quantization is the only
    slack). Pins are constant per run, one row suffices."""
    from hdfs_mr_spark.registry import all_specs

    r = all_specs()["llm_embed_whitening"].fn(
        spark, "/root/testdata/sf0.001").first()
    assert r.lam1_pin > r.lam2_pin > 0
    assert r.ratio_before_micro > 5_000_000
    assert 700_000 <= r.ratio_after_micro <= 1_300_000


def test_whitening_moment_identity_matches_pair_form():
    """r15-opt: llm_embed_whitening now derives the centered covariance
    from ONE pass of raw moments (S, C = X^T X, n) via
    sum((xi-mui)(xj-muj)) = Cij - mui*Sj - muj*Si + n*mui*muj instead
    of the 64^2-per-vector centered pair self-join. This pins the
    identity + trunc-div recipe against the literal pair form (the
    oracle's covw CTE semantics) on a hostile little matrix — negative
    values, trunc-div asymmetry, n not dividing the sums."""
    import numpy as np

    def tdiv(x: int, y: int) -> int:
        q = abs(x) // y
        return q if x >= 0 else -q

    rng = np.random.RandomState(7)
    X = rng.randint(-1_000_000, 1_000_000, size=(13, 5)).astype(object)
    n = X.shape[0]
    S = [int(s) for s in X.sum(axis=0)]
    C = [[int((X[:, j] * X[:, k]).sum()) for k in range(5)]
         for j in range(5)]
    mu = [tdiv(s, n) for s in S]
    # literal pair form: trunc-mean center, exact sum, trunc-div by n
    centered = X - np.array(mu, dtype=object)[None, :]
    for j in range(5):
        for k in range(5):
            pair = tdiv(int((centered[:, j] * centered[:, k]).sum()), n)
            ident = tdiv(
                C[j][k] - mu[j] * S[k] - mu[k] * S[j] + n * mu[j] * mu[k],
                n,
            )
            assert pair == ident, (j, k)
    # the projection fold: sum_j (x_j - mu_j) v_j == x·v - mu·v, and the
    # numpy sign/abs floor-div spelling is trunc-toward-zero like `div`
    v = rng.randint(-4096, 4096, size=5).astype(object)
    off = int((np.array(mu, dtype=object) * v).sum())
    for d in (1, 7):
        for row in X:
            p = int((row * v).sum()) - off
            q = int(np.sign(p)) * (abs(p) // d)
            assert q == tdiv(p, d)


def test_opq_encode_kernel_matches_literal_long_form():
    """r15-opt: llm_embed_opq's dual PQ encode moved from long-format
    joins/groupBys to wide numpy kernels. Pin the kernel recipe
    (argmin-first tie order over code-value-sorted codebooks, trunc-div
    Lloyd means over winners only, per-subspace min-dist error) against
    a literal per-row Python replica of the old join semantics —
    including deliberate exact-tie rows."""
    import numpy as np

    def tdiv(x: int, y: int) -> int:
        q = abs(x) // y
        return q if x >= 0 else -q

    rng = np.random.RandomState(11)
    n, k, n_sub, dsub = 40, 6, 4, 3
    dims = n_sub * dsub
    X = rng.randint(-50, 50, size=(n, dims)).astype(np.int64)
    X[1] = X[0]          # exact tie: identical vector -> equal dists
    cb = X[:k].copy()    # seed codebook = k lowest ids, code==row index

    # literal replay of assign(cb): per (vec, sub) min struct(dist, code)
    def assign(cbm):
        out = np.zeros((len(cbm[0][1]) and n or n, n_sub), dtype=np.int64)
        codes = [c for c, _ in cbm]
        for v in range(n):
            for s in range(n_sub):
                best = None
                for c, row in cbm:
                    d = int(
                        ((X[v, s * dsub:(s + 1) * dsub] - row[s]) ** 2)
                        .sum()
                    )
                    if best is None or (d, c) < best:
                        best = (d, c)
                out[v, s] = codes.index(best[1])
        return out

    cbm0 = [(c, cb[c].reshape(n_sub, dsub)) for c in range(k)]
    lit1 = assign(cbm0)

    # kernel form: vectorized argmin over code axis
    Xs = X.reshape(n, n_sub, dsub)
    cbs = cb.reshape(k, n_sub, dsub)
    dist = ((Xs[:, None, :, :] - cbs[None, :, :, :]) ** 2).sum(axis=3)
    ker1 = dist.argmin(axis=1)
    assert (lit1 == ker1).all()

    # Lloyd round: trunc-div means over winners, then literal vs kernel
    # second assignment error per subspace
    cbm1 = []
    for s in range(n_sub):
        pass  # per-sub candidate codebooks built below
    lit_err = np.zeros(n_sub, dtype=object)
    ker_err = np.zeros(n_sub, dtype=object)
    for s in range(n_sub):
        ent = []
        for c in range(k):
            won = np.where(lit1[:, s] == c)[0]
            if len(won):
                ent.append([
                    tdiv(int(X[won, s * dsub + d].sum()), len(won))
                    for d in range(dsub)
                ])
        cm = np.array(ent, dtype=np.int64)
        d2 = ((Xs[:, s, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        ker_err[s] = int(d2.min(axis=1).sum())
        tot = 0
        for v in range(n):
            tot += min(
                int(((X[v, s * dsub:(s + 1) * dsub] - row) ** 2).sum())
                for row in cm
            )
        lit_err[s] = tot
        assert lit_err[s] == ker_err[s], s


def test_qc_dense_features_match_join_form(spark):
    """r15-opt: llm_quality_classifier_* now builds dense per-doc
    feature vectors + Gopher teacher labels in ONE Arrow kernel pass
    (_qc_wide) instead of the explode + conv(md5) long chain and the
    separate llm_quality_gopher pass. Pin the kernel bit-for-bit
    against BOTH replaced Spark forms on the real smoke fixture: the
    sparse (doc_id, bucket, x) rows must equal the dense vector's
    non-zero slots (slot = bucket + 2), and the kernel's y must equal
    the Gopher op's keep — this is the python-md5 == Spark-md5/conv
    and python-regex == rlike parity evidence."""
    from pyspark.sql import functions as F

    from hdfs_mr_spark.operators.llm_text import (_QC_B, _qc_wide,
                                                  llm_quality_gopher)
    from hdfs_mr_spark.io import table
    from tests.conftest import SF_SMOKE

    wide = {
        r.doc_id: (list(r.xs), r.y)
        for r in _qc_wide(spark, SF_SMOKE)[0].collect()
    }

    # literal replica of the replaced sparse join chain
    d = table(spark, SF_SMOKE, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    nw = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    cnt = (
        tok.withColumn(
            "bucket",
            F.expr(
                "CAST(conv(substr(md5(w), 1, 6), 16, 10) AS BIGINT)"
                f" % {_QC_B}"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    feats = (
        cnt.join(nw, "doc_id")
        .select("doc_id", "bucket", F.expr("(c * 10000) DIV n").alias("x"))
        .unionByName(d.select(
            "doc_id", F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(10000).cast("bigint").alias("x")))
        .unionByName(nw.select(
            "doc_id", F.lit(-2).cast("bigint").alias("bucket"),
            (F.col("n") * 100).cast("bigint").alias("x")))
    )
    sparse: dict = {}
    for r in feats.collect():
        sparse.setdefault(r.doc_id, {})[r.bucket] = r.x
    labels = {
        r.doc_id: int(r.keep)
        for r in llm_quality_gopher(spark, SF_SMOKE).collect()
    }

    assert set(wide) == set(labels) and len(wide) > 0
    for doc, (xs, y) in wide.items():
        assert y == labels[doc], doc
        want = [0] * 66
        for bucket, x in sparse.get(doc, {}).items():
            want[int(bucket) + 2] = int(x)
        assert xs == want, doc


def test_qc_kernel_round_matches_join_form(spark):
    """r15-opt: one GD round through the Arrow kernel + driver fold
    (_qc_round_pass) must reproduce the replaced join-form round —
    margins, rational sigmoid, gradient, Brier/accuracy trace — as a
    literal python-int replay over the collected dense rows, for a
    non-trivial (post-first-update) weight vector."""
    from hdfs_mr_spark.operators.llm_text import (_QC_LRDEN, _QC_S,
                                                  _qc_round_pass, _qc_tdiv,
                                                  _qc_wide)
    from tests.conftest import SF_SMOKE

    wide, n_docs = _qc_wide(spark, SF_SMOKE)
    rows = [(list(r.xs), int(r.y)) for r in wide.collect()]
    assert len(rows) == n_docs

    def literal_round(wts):
        grad = [0] * 66
        brier = n_correct = n_pred_pos = 0
        for xs, y in rows:
            m = sum(x * w for x, w in zip(xs, wts))
            p = 500000 + _qc_tdiv(500000 * m, _QC_S + abs(m))
            r = p - y * 1000000
            for i, x in enumerate(xs):
                grad[i] += r * x
            brier += r * r
            n_correct += int((p > 500000) == (y == 1))
            n_pred_pos += int(p > 500000)
        return grad, brier, n_correct, n_pred_pos

    w = [0] * 66
    for _ in range(2):  # round 0 and a non-trivial round 1
        lit = literal_round(w)
        ker = _qc_round_pass(wide, w)
        assert tuple(ker[0]) == tuple(lit[0])
        assert ker[1:] == lit[1:]
        w = [wv - _qc_tdiv(g, n_docs * _QC_LRDEN)
             for wv, g in zip(w, lit[0])]
    assert any(v != 0 for v in w)  # the second round exercised real weights


def test_unigram_train_kernel_matches_join_form(spark):
    """r15-opt: llm_tokenizer_unigram_train now runs its 3 EM rounds as
    driver-folded Arrow kernel passes over the word frame (cost table
    as a dict closure) instead of the cand-explode + per-round
    broadcast-join + 512-bucket applyInPandas + recount-shuffle chain.
    Pin the FULL returned frame bit-for-bit against a literal replica
    of the replaced Spark pipeline on the real smoke fixture — seed
    support counts, all 3 prune/E/M rounds (tuple-min DP tie-break,
    coalesced charset survival, 64x modal rule), and the top-40 tail
    with its global n_vocab2/cnt2_sum."""
    import pandas as pd
    from pyspark.sql import Window

    from hdfs_mr_spark.io import table
    from hdfs_mr_spark.operators.llm_text import (_toks,
                                                  llm_tokenizer_unigram_train)
    from tests.conftest import SF_SMOKE

    # literal replica of the replaced r13 Spark form
    d = table(spark, SF_SMOKE, "documents")
    words = (
        d.select(F.explode(_toks()).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= 24))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .withColumn("L", F.length("w").cast("int"))
        .localCheckpoint()
    )
    cand = (
        words.select(
            "w", "freq", "L",
            F.explode(F.sequence(F.lit(1), F.col("L"))).alias("p"),
        )
        .select(
            "w", "freq", "L", "p",
            F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)]))
            .alias("len"),
        )
        .filter(F.col("len") <= F.col("p"))
        .withColumn("piece", F.expr("substring(w, p - len + 1, len)"))
        .localCheckpoint()
    )
    seed = cand.groupBy("piece", "len").agg(
        F.sum("freq").cast("bigint").alias("cnt")
    )
    chars = seed.filter(F.col("len") == 1).select("piece").localCheckpoint()

    def prune(counts):
        c2 = counts.filter(F.col("len") >= 2)
        mx = c2.agg(F.max("cnt").alias("mx"))
        kept2 = (
            c2.crossJoin(F.broadcast(mx))
            .filter(64 * F.col("cnt") >= F.col("mx"))
            .select("piece", "len", "cnt")
        )
        kept1 = (
            chars.join(
                counts.filter(F.col("len") == 1).select("piece", "cnt"),
                "piece", "left",
            )
            .select(
                "piece", F.lit(1).alias("len"),
                F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint")
                .alias("cnt"),
            )
        )
        return kept1.unionByName(kept2).localCheckpoint()

    vocab = prune(seed)

    kern_schema = "piece string, wfreq long"
    ENC = {4: "a", 3: "b", 2: "c", 1: "d"}
    DEC = {v: k for k, v in ENC.items()}

    def estep(pdf: pd.DataFrame) -> pd.DataFrame:
        out_piece: list = []
        out_freq: list = []
        for w, g in pdf.groupby("w", sort=False):
            L = int(g["L"].iloc[0])
            freq = int(g["freq"].iloc[0])
            by_p: dict = {}
            for p, ln, c in zip(g["p"], g["len"], g["cost"]):
                by_p.setdefault(int(p), []).append((int(ln), int(c)))
            best: list = [(0, "")] + [None] * L
            for p in range(1, L + 1):
                b = None
                for ln, c in by_p.get(p, ()):
                    prev = best[p - ln]
                    if prev is None:
                        continue
                    st = (prev[0] + c, prev[1] + ENC[ln])
                    if b is None or st < b:
                        b = st
                best[p] = b
            off = 0
            for ch in best[L][1]:
                ln = DEC[ch]
                out_piece.append(w[off:off + ln])
                out_freq.append(freq)
                off += ln
        return pd.DataFrame({"piece": out_piece, "wfreq": out_freq})

    for _r in range(3):
        cost = vocab.select(
            "piece", "len",
            (
                F.lit(2 ** 40)
                + (F.lit(2 ** 20) - F.least(F.col("cnt"), F.lit(2 ** 20 - 1)))
            ).cast("bigint").alias("cost"),
        )
        edges = cand.join(F.broadcast(cost), ["piece", "len"]).select(
            "w", "freq", "L", "p", "len", "cost",
            F.pmod(F.xxhash64("w"), F.lit(512)).alias("bkt"),
        )
        mstep = (
            edges.groupBy("bkt")
            .applyInPandas(estep, kern_schema)
            .groupBy("piece")
            .agg(F.sum("wfreq").cast("bigint").alias("cnt"))
            .withColumn("len", F.length("piece").cast("int"))
        )
        vocab = prune(mstep)

    v2 = vocab.filter(F.col("len") >= 2)
    tot = v2.agg(
        F.count("*").cast("bigint").alias("n_vocab2"),
        F.sum("cnt").cast("bigint").alias("cnt2_sum"),
    )
    top = (
        v2.orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(40)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
            ).cast("bigint"),
        )
    )
    old = (
        top.crossJoin(F.broadcast(tot))
        .select(
            "rank", "piece", F.col("len").cast("bigint").alias("len"),
            "cnt", "n_vocab2", "cnt2_sum",
        )
        .orderBy("rank")
        .collect()
    )
    new = llm_tokenizer_unigram_train(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]
    assert len(new) > 0


def _esd_window_form(act, id_col):
    """Literal replica of the pre-r15-opt Spark Rosner machinery
    (rank windows + broadcast median joins + per-round checkpoints)
    that _esd_rounds_py replaced — kept verbatim here so the driver
    fold stays pinned bit-for-bit to the old semantics."""
    from pyspark.sql import Window

    w_med = Window.partitionBy("event_type").orderBy("x", id_col)
    w_cnt = Window.partitionBy("event_type")
    cands = []
    for r in range(1, 4):
        med = (
            act.withColumn("rn", F.row_number().over(w_med))
            .withColumn("n", F.count("*").over(w_cnt))
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col("x").alias("med"))
        )
        dev = (
            act.join(F.broadcast(med), "event_type")
            .select(
                "event_type", id_col, "x", "med",
                F.abs(F.col("x") - F.col("med")).alias("dev"),
            )
            .localCheckpoint()
        )
        w_dev = Window.partitionBy("event_type").orderBy("dev", id_col)
        mad = (
            dev.withColumn("rn", F.row_number().over(w_dev))
            .withColumn("n", F.count("*").over(w_cnt))
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col("dev").alias("mad"))
        )
        w_top = Window.partitionBy("event_type").orderBy(
            F.col("dev").desc(), F.col(id_col).asc()
        )
        cand = (
            dev.withColumn("rk", F.row_number().over(w_top))
            .filter(F.col("rk") == 1)
            .join(F.broadcast(mad), "event_type")
            .select(
                F.lit(r).alias("esd_round"),
                "event_type", id_col, "x", "med", "dev", "mad",
                F.when(F.col("mad") == 0, F.col("dev") > 0)
                .otherwise(F.col("dev") * 10000 > 44478 * F.col("mad"))
                .alias("passed"),
            )
            .localCheckpoint()
        )
        cands.append(cand)
        act = (
            act.join(
                cand.select("event_type", id_col),
                ["event_type", id_col], "left_anti",
            )
            .localCheckpoint()
        )
    return cands


def _esd_window_tail(cands, nn, id_col):
    from pyspark.sql import Window

    allc = cands[0]
    for c in cands[1:]:
        allc = allc.unionByName(c)
    w_pass = Window.partitionBy("event_type")
    return (
        allc.withColumn(
            "maxp",
            F.coalesce(
                F.max(F.when(F.col("passed"), F.col("esd_round")))
                .over(w_pass),
                F.lit(0),
            ),
        )
        .join(nn, "event_type")
        .select(
            "event_type",
            F.col("esd_round").cast("bigint").alias("esd_round"),
            F.col(id_col).cast("bigint").alias(id_col),
            F.col("x").cast("bigint"),
            F.col("med").cast("bigint"),
            F.col("dev").cast("bigint"),
            F.col("mad").cast("bigint"),
            "passed",
            (F.col("esd_round") <= F.col("maxp")).alias("is_anomaly"),
            "n",
        )
        .orderBy("event_type", "esd_round")
    )


def test_esd_rounds_py_matches_window_form(spark):
    """r15-opt pin: ts_anomaly_esd's driver-folded Rosner rounds
    reproduce the replaced rank-window Spark pipeline bit-for-bit on
    the sf0.001 daily grid (every column, every row)."""
    from hdfs_mr_spark.io import table
    from hdfs_mr_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    act = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400)
            .cast("bigint").alias("day"),
        )
        .agg(F.expr("sum(cast(round(value * 100) as bigint)) div count(*)")
             .alias("x"))
        .localCheckpoint()
    )
    nn = act.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    old = _esd_window_tail(
        _esd_window_form(act, "day"), nn, "day"
    ).collect()
    new = all_specs()["ts_anomaly_esd"].fn(spark, SF_SMOKE).collect()
    assert len(new) > 0
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


def test_shesd_driver_fold_matches_window_form(spark):
    """r15-opt pin: ts_seasonal_hybrid_esd's driver-folded median
    re-centering + Rosner rounds reproduce the replaced window form
    bit-for-bit at sf0.01 (sf0.001's hourly grid is all-NULL seasonal
    — honestly empty — so the non-vacuous pin runs one SF up)."""
    from pyspark.sql import Window

    from hdfs_mr_spark.operators.windows import _stl_des
    from hdfs_mr_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    des = _stl_des(spark, sf)
    core = des.filter(F.col("seasonal").isNotNull())
    w_med = Window.partitionBy("event_type").orderBy("y", "hidx")
    w_cnt = Window.partitionBy("event_type")
    medy = (
        core.withColumn("rn", F.row_number().over(w_med))
        .withColumn("n", F.count("*").over(w_cnt))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("y").alias("medy"))
    )
    act = (
        core.join(F.broadcast(medy), "event_type")
        .select(
            "event_type", "hidx",
            (F.col("dv") - F.col("medy")).alias("x"),
        )
        .localCheckpoint()
    )
    nn = act.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    old = _esd_window_tail(
        _esd_window_form(act, "hidx"), nn, "hidx"
    ).collect()
    new = all_specs()["ts_seasonal_hybrid_esd"].fn(spark, sf).collect()
    assert len(new) > 0
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


def test_croston_kernel_matches_loop(spark):
    """r15-opt pin: ts_forecast_croston's vectorized index-lockstep
    walk reproduces the replaced per-part scalar loop bit-for-bit on
    the sf0.001 demand frame (full returned frame compare)."""
    import pandas as pd

    from hdfs_mr_spark.io import table
    from hdfs_mr_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    li = table(spark, SF_SMOKE, "lineitem")
    dem = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(unix_timestamp(CAST(l_shipdate AS TIMESTAMP))"
            " div 604800 AS BIGINT)"
        ).alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("y"))
    mn = dem.agg(F.min("wk").alias("minwk"))
    pdf = dem.crossJoin(F.broadcast(mn)).toPandas()

    # literal replica of the pre-r15-opt scalar kernel
    out = []
    for pk, g in pdf.groupby("l_partkey"):
        g = g.sort_values("wk")
        wks = [int(w) for w in g["wk"]]
        ys = [int(v) for v in g["y"]]
        if len(wks) < 2:
            continue
        minwk = int(g["minwk"].iloc[0])
        z = ys[0] * 1000
        p = (wks[0] - minwk + 1) * 1000
        for k in range(1, len(wks)):
            z = (ys[k] * 1000 + 4 * z) // 5
            p = ((wks[k] - wks[k - 1]) * 1000 + 4 * p) // 5
        out.append((int(pk), len(wks), z, p,
                    (z * 1000000) // p, (z * 900000) // p))
    out.sort()
    new = [tuple(r) for r in
           all_specs()["ts_forecast_croston"].fn(spark, SF_SMOKE).collect()]
    assert len(new) > 0
    assert new == out


def test_hnsw_driver_search_matches_spark_form(spark):
    """r15-opt pin: the driver-coordinated HNSW beam search reproduces
    the replaced Spark pipeline (per-round rank windows + shuffled
    joins + localCheckpoints) bit-for-bit — full (qid, vec_id, cosine,
    rank) frame compare over the sf0.001 stored graph."""
    from pyspark.sql import Window

    from hdfs_mr_spark.io import fan_out, table
    from hdfs_mr_spark.operators.llm_similarity import (
        _HNSW_BEAM, _HNSW_ENTRIES, _HNSW_ROUNDS, _ann_params, _dot,
        _n_embeddings, _norm, _hnsw_beam_search,
    )
    from hdfs_mr_spark.registry import all_specs
    from hdfs_mr_spark.sources.scans import _fixture_dir
    from tests.conftest import SF_SMOKE

    # ensure the stored graph exists (the owning op builds+publishes)
    all_specs()["llm_sim_knn_hnsw"].fn(spark, SF_SMOKE)
    e = table(spark, SF_SMOKE, "embeddings")
    cells, _np_, _b = _ann_params(_n_embeddings(spark, SF_SMOKE))
    nodes = fan_out(
        e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    )
    c = nodes.filter(F.col("vec_id") < cells).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    edges = spark.read.parquet(
        str(_fixture_dir(SF_SMOKE) / "hnsw_store" / "edges")
    )

    # literal replica of the pre-r15-opt Spark beam search
    q = nodes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    visited = (
        q.join(F.broadcast(c))
        .select(
            "qid",
            F.col("cid").alias("vec_id"),
            (_dot(F.col("qe"), F.col("ce"))
             / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _HNSW_ENTRIES)
        .select("qid", "vec_id", "cosine")
        .localCheckpoint()
    )
    for _round in range(_HNSW_ROUNDS):
        beam = (
            visited.withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") <= _HNSW_BEAM)
            .select("qid", "vec_id")
        )
        cand = (
            beam.join(edges, beam.vec_id == edges.src)
            .select("qid", F.col("dst").alias("vec_id"))
            .distinct()
        )
        new = cand.join(
            visited.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti"
        )
        scored_new = (
            new.join(nodes, "vec_id")
            .join(F.broadcast(q), "qid")
            .select(
                "qid", "vec_id",
                (_dot(F.col("qe"), F.col("embedding"))
                 / (F.col("qn") * F.col("nrm"))).alias("cosine"),
            )
        )
        visited = visited.unionByName(scored_new).localCheckpoint()
    old = (
        visited.filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rank", F.row_number().over(wq).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", "cosine", "rank")
        .orderBy("qid", "rank")
        .collect()
    )
    new_rows = (
        _hnsw_beam_search(nodes, c, edges).orderBy("qid", "rank").collect()
    )
    assert len(new_rows) > 0
    assert [tuple(r) for r in new_rows] == [tuple(r) for r in old]


def test_wordpiece_kernel_matches_join_form(spark):
    """r16-opt: llm_tokenizer_wordpiece's greedy walk now runs as one
    bucketed Arrow kernel over the step function instead of 16 chained
    left-join rounds (+4 localCheckpoint barriers). Pin the FULL
    returned frame bit-for-bit against a literal replica of the
    replaced join-walk pipeline on the smoke fixture."""
    from hdfs_mr_spark.io import table
    from hdfs_mr_spark.operators.llm_text import llm_tokenizer_wordpiece
    from tests.conftest import SF_SMOKE

    # literal replica of the replaced r12 join-walk form
    d = table(spark, SF_SMOKE, "documents")
    ws = d.select(
        "lang", F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "").select(
        "lang", F.substring("w", 1, 16).alias("word")
    )
    occ = ws.groupBy("lang", "word").agg(F.count("*").alias("occ"))
    wd = (
        occ.groupBy("word")
        .agg(F.sum("occ").alias("wcnt"))
        .withColumn("wlen", F.length("word"))
        .localCheckpoint()
    )
    tot = wd.agg(F.sum("wcnt").alias("occ_total"))
    cand = (
        wd.select(
            "word", "wcnt", "wlen",
            F.explode(F.sequence(F.lit(1), F.col("wlen"))).alias("p"),
        )
        .select(
            "word", "wcnt", "wlen", "p",
            F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)]))
            .alias("len"),
        )
        .filter(F.col("p") + F.col("len") - 1 <= F.col("wlen"))
        .select(
            "word", "wcnt", "p", "len",
            F.expr("substring(word, p, len)").alias("piece"),
            F.when(F.col("p") == 1, F.lit("init"))
            .otherwise(F.lit("cont")).alias("kind"),
        )
    )
    vocab = (
        cand.groupBy("kind", "len", "piece")
        .agg(F.sum("wcnt").alias("c"))
        .crossJoin(F.broadcast(tot))
        .filter(
            (F.col("len") == 1)
            | (F.col("c") >= F.expr("occ_total DIV 64"))
        )
        .select("kind", "len", "piece")
    )
    step = (
        cand.join(vocab, ["kind", "len", "piece"])
        .groupBy("word", "p")
        .agg(F.max("len").alias("blen"))
        .select(F.col("word").alias("sw"), F.col("p").alias("sp"), "blen")
        .localCheckpoint()
    )
    state = wd.select(
        "word", "wlen", F.lit(1).alias("pos"), F.lit(0).alias("toks"),
    )
    for i in range(16):
        state = (
            state.join(
                step,
                (state.word == step.sw) & (state.pos == step.sp),
                "left",
            )
            .select(
                "word", "wlen",
                F.when(F.col("pos") <= F.col("wlen"),
                       F.col("pos") + F.col("blen"))
                .otherwise(F.col("pos")).alias("pos"),
                F.when(F.col("pos") <= F.col("wlen"),
                       F.col("toks") + 1)
                .otherwise(F.col("toks")).alias("toks"),
            )
        )
        if i % 4 == 3:
            state = state.localCheckpoint()
    j = occ.join(state.select("word", "wlen", "toks"), "word")
    old = (
        j.groupBy("lang")
        .agg(
            F.sum("occ").cast("bigint").alias("words_total"),
            F.sum(F.col("occ") * F.col("toks")).cast("bigint")
            .alias("tokens_total"),
            F.sum(F.col("occ") * F.col("wlen")).cast("bigint")
            .alias("chars_total"),
            F.expr(
                "CAST(CAST(SUM(occ * toks) AS DECIMAL(38,0)) * 1000000"
                " DIV SUM(occ) AS BIGINT)"
            ).alias("fertility_micro"),
            F.expr(
                "CAST(CAST(SUM(occ * toks) AS DECIMAL(38,0)) * 1000000"
                " DIV SUM(occ * wlen) AS BIGINT)"
            ).alias("tokens_per_char_micro"),
        )
        .orderBy("lang")
        .collect()
    )
    new = llm_tokenizer_wordpiece(spark, SF_SMOKE).collect()
    assert len(new) > 0
    assert [tuple(r) for r in new] == [tuple(r) for r in old]
