"""Scalar function families (SURVEY.md §2.8).

One oracle-checked query per family, exercising the listed functions
over real testdata columns. Everything stays in Catalyst expressions
(JVM-side, whole-stage-codegen) — no Python UDFs in any of these.

Cross-engine semantics deltas handled here (verified empirically):
- DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday -> oracle adds 1
- DuckDB date_trunc('month', ts) returns DATE -> oracle casts back
- DuckDB regexp_replace needs 'g' to replace all (Spark default)
- DuckDB ceil/floor/sign return types differ -> cast both sides
- transcendentals (exp/log/pow) are not correctly-rounded in either
  engine -> ROUND(...,6) on both sides (diff ~1e-16 vs 1e-6 granule)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.8 scalar functions"


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       substr(p_name, 1, 8) AS name_prefix,
       concat(p_brand, ':', p_type) AS brand_type,
       concat_ws('|', p_brand, p_type) AS brand_type_ws,
       CAST(length(p_name) AS INTEGER) AS name_len,
       array_to_string(string_split(p_name, ' '), ',') AS name_tokens,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       lpad(p_brand, 12, '_') AS brand_padded,
       CAST(strpos(p_name, 'a') AS INTEGER) AS first_a
FROM part
""",
    family=_FAM,
)
def fn_string(spark, sf_dir):
    """String family: case/trim/substr/concat/split/regex/pad/instr."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type_ws"),
        F.length("p_name").cast("int").alias("name_len"),
        F.array_join(F.split("p_name", " "), ",").alias("name_tokens"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.lpad("p_brand", 12, "_").alias("brand_padded"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
    )


@query(
    "fn_string_distance",
    oracle="""
SELECT a.p_partkey,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
""",
    family=_FAM,
)
def fn_string_distance(spark, sf_dir):
    """Levenshtein edit distance between adjacent part names (the string-
    similarity primitive behind fuzzy dedup)."""
    a = table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_name").alias("name_a")
    )
    b = table(spark, sf_dir, "part").select(
        (F.col("p_partkey") - 1).alias("join_key"), F.col("p_name").alias("name_b")
    )
    return a.join(b, a.p_partkey == b.join_key).select(
        "p_partkey", "name_a", "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mon,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) + 7 AS week_later,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
         AS days_to_2002,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
""",
    family=_FAM,
)
def fn_date(spark, sf_dir):
    """Date/time family: parts, trunc, arithmetic, last_day, epoch.
    DuckDB dayofweek is 0-based from Sunday; Spark 1-based — oracle
    shifts by one."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mon"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(F.to_date(d), 7).alias("week_later"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date(d))
        .cast("int")
        .alias("days_to_2002"),
        F.last_day(F.to_date(d)).alias("month_end"),
        F.unix_timestamp(d).cast("bigint").alias("epoch_s"),
        F.to_date(d).alias("order_date"),
    )


@query(
    "fn_math",
    oracle="""
SELECT p_partkey, p_retailprice,
       abs(p_retailprice - 1500.0) AS dist_from_mid,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       sqrt(p_retailprice) AS price_sqrt,
       round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
       round(exp(CAST(p_size AS DOUBLE) / 50.0), 6) AS size_exp,
       round(ln(p_retailprice), 6) AS price_ln,
       greatest(p_retailprice, 1500.0) AS at_least_mid,
       least(p_retailprice, 1500.0) AS at_most_mid,
       CAST(sign(p_retailprice - 1500.0) AS INTEGER) AS side_of_mid,
       CAST(((p_size % 7) + 7) % 7 AS INTEGER) AS size_mod7
FROM part
""",
    family=_FAM,
)
def fn_math(spark, sf_dir):
    """Math family. sqrt is IEEE-correctly-rounded (exact both engines);
    pow/exp/ln are not, so both sides round to 6 dp; pmod rendered as
    ((a%b)+b)%b for DuckDB."""
    p = table(spark, sf_dir, "part")
    price, size = F.col("p_retailprice"), F.col("p_size")
    return p.select(
        "p_partkey", "p_retailprice",
        F.abs(price - 1500.0).alias("dist_from_mid"),
        F.ceil(price).cast("bigint").alias("price_ceil"),
        F.floor(price).cast("bigint").alias("price_floor"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.pow(size.cast("double"), F.lit(2.0)), 6).alias("size_sq"),
        F.round(F.exp(size.cast("double") / 50.0), 6).alias("size_exp"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.greatest(price, F.lit(1500.0)).alias("at_least_mid"),
        F.least(price, F.lit(1500.0)).alias("at_most_mid"),
        F.signum(price - 1500.0).cast("int").alias("side_of_mid"),
        F.pmod(size, F.lit(7)).cast("int").alias("size_mod7"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT l_orderkey, l_linenumber, l_discount,
       CASE WHEN l_discount = 0.0 THEN 'none'
            WHEN l_discount < 0.05 THEN 'low'
            ELSE 'high' END AS discount_band,
       COALESCE(NULLIF(l_returnflag, 'N'), 'NOT-RETURNED') AS return_desc,
       CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS order_size
FROM lineitem
""",
    family=_FAM,
)
def fn_conditional(spark, sf_dir):
    """when/otherwise, coalesce, nullif, if — discount banding."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_discount",
        F.when(F.col("l_discount") == 0.0, "none")
        .when(F.col("l_discount") < 0.05, "low")
        .otherwise("high")
        .alias("discount_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NOT-RETURNED"))
        .alias("return_desc"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("order_size"),
    )


@query(
    "fn_array",
    oracle="""
SELECT d.doc_id,
       CAST(len(e.embedding) AS INTEGER) AS dim,
       CAST(e.embedding[1] AS DOUBLE) AS first_component,
       CAST(e.embedding[2] AS DOUBLE) AS head2,
       CAST(e.embedding[3] AS DOUBLE) AS head3,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         (acc, x) -> acc + x) AS sq_norm,
       list_contains(string_split(d.text, ' '), 'data') AS mentions_data,
       array_to_string(list_sort(list_distinct(string_split(d.text, ' '))), ',')
         AS vocab,
       CAST(len(list_filter(string_split(d.text, ' '), t -> length(t) > 4))
            AS INTEGER) AS n_long_tokens
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    family=_FAM,
)
def fn_array(spark, sf_dir):
    """Array family + higher-order functions (transform/filter/aggregate)
    over the 64-dim embeddings and tokenized text. The squared-norm fold
    is a left fold from 0.0 in both engines — deterministic without
    rounding. This is the JVM-side kernel the similarity ops reuse.
    Array outputs leave the query as scalars (element projections for
    the double slice — float->string formatting is engine-specific — and
    ``array_join`` for the string vocab): the driver's value hasher
    takes scalar cells only."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    toks = F.split(F.col("text"), " ")
    emb = F.col("embedding")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.size(emb).cast("int").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_component"),
        F.element_at(emb, 2).cast("double").alias("head2"),
        F.element_at(emb, 3).cast("double").alias("head3"),
        F.aggregate(
            emb,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("sq_norm"),
        F.array_contains(toks, "data").alias("mentions_data"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("int").alias("n_long_tokens"),
    )


@query(
    "fn_explode",
    oracle="""
SELECT doc_id, CAST(u.unnest[2] AS INTEGER) AS pos, u.unnest[1] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d,
     LATERAL unnest(list_zip(d.l, range(0, len(d.l)))) AS u(unnest)
""",
    family=_FAM,
)
def fn_explode(spark, sf_dir):
    """posexplode: tokens -> (pos, token) rows — the word-count tokenizer
    with ordinality."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


@query(
    "fn_map_struct",
    oracle="""
SELECT event_id,
       map_extract(map(['type','user'], [event_type, CAST(user_id AS VARCHAR)]),
                   'type')[1] AS type_from_map,
       array_to_string(list_sort(map_keys(map(['type','user'],
                 [event_type, CAST(user_id AS VARCHAR)]))), ',') AS mkeys,
       struct_extract(struct_pack(etype := event_type, val := value), 'etype')
         AS type_from_struct,
       struct_extract(struct_pack(etype := event_type, val := value), 'val')
         AS val_from_struct
FROM events
""",
    family=_FAM,
)
def fn_map_struct(spark, sf_dir):
    """map/struct construction and field access (scalars projected out so
    the comparison is engine-neutral)."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    s = F.named_struct(F.lit("etype"), F.col("event_type"), F.lit("val"), F.col("value"))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("mkeys"),
        s.getField("etype").alias("type_from_struct"),
        s.getField("val").alias("val_from_struct"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id, props,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER)))
            AS VARCHAR) AS rebuilt
FROM events
""",
    family=_FAM,
)
def fn_json(spark, sf_dir):
    """JSON family: get_json_object / from_json / to_json over the
    events.props JSON-string column."""
    ev = table(spark, sf_dir, "events")
    k_int = F.from_json(F.col("props"), "k INT").getField("k")
    return ev.select(
        "event_id", "props",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.named_struct(F.lit("k"), k_int)).alias("rebuilt"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT doc_id,
       sha256(text) AS text_sha256,
       md5(text) AS text_md5,
       sha256(concat(lang, ':', text)) AS keyed_sha
FROM documents
""",
    family=_FAM,
)
def fn_hash(spark, sf_dir):
    """Content hashing (the HDFS block-checksum heritage; dedup keys)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.concat(F.col("lang"), F.lit(":"), F.col("text")), 256).alias("keyed_sha"),
    )


@query(
    "fn_hash_native",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT text) AS n_distinct_text,
       TRUE AS xxh64_injective,
       TRUE AS crc32_near_injective,
       TRUE AS murmur_near_injective
FROM documents
""",
    family=_FAM,
)
def fn_hash_native(spark, sf_dir):
    """xxhash64 / crc32 / murmur hash — Spark-native shuffle/dedup-key
    workhorses with no DuckDB twin. The checked output is therefore the
    engine-invariant property the raw values can't give: hash-distinct
    counts against input-distinct counts. xxhash64 (64-bit) must be
    collision-free on the corpus (P[collision] ~ n^2/2^65); the 32-bit
    crc32/murmur get a 99.5% near-injectivity floor (birthday collisions
    are expected above ~2^16 keys). The oracle asserts the booleans TRUE
    — a broken hash column fails the hash-match."""
    d = table(spark, sf_dir, "documents")
    agg = d.select(
        "text",
        F.xxhash64("text").alias("_xxh"),
        F.crc32("text").alias("_crc"),
        F.hash("text", "lang").alias("_mur"),
    ).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("text").alias("n_distinct_text"),
        F.countDistinct("_xxh").alias("_n_xxh"),
        F.countDistinct("_crc").alias("_n_crc"),
        F.countDistinct("_mur").alias("_n_mur"),
    )
    nd = F.col("n_distinct_text").cast("double")
    return agg.select(
        "n_rows",
        "n_distinct_text",
        (F.col("_n_xxh") == F.col("n_distinct_text")).alias("xxh64_injective"),
        (F.col("_n_crc").cast("double") >= nd * 0.995).alias("crc32_near_injective"),
        (F.col("_n_mur").cast("double") >= nd * 0.995).alias("murmur_near_injective"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS set_bit,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
""",
    family=_FAM,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise function family: and/or/xor, shifts, popcount — the bit
    math the engine's own kernels lean on (bitmask Jaccard, SimHash,
    banding). All codegen'd integer ops."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("set_bit"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).cast("int").alias("popcount"),
    ).orderBy("o_orderkey")


@query(
    "fn_format",
    oracle="""
SELECT p_partkey,
       printf('%s#%08d', p_brand, p_partkey) AS tagged,
       translate(p_brand, '#', '-') AS debranded,
       reverse(p_name) AS reversed_name,
       repeat('*', CAST(p_size % 8 AS INTEGER)) AS size_bar,
       array_to_string(regexp_extract_all(lower(p_type), '[a-z]+'), '|') AS type_words
FROM part
ORDER BY p_partkey
""",
    family=_FAM,
)
def fn_format(spark, sf_dir):
    """printf-style formatting, translate/reverse/repeat, and
    regexp_extract_all (all matches, stringified — the tokenizer
    primitive) — the string-building half of the scalar surface,
    complementing fn_string's parsing half."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s#%08d", F.col("p_brand"), F.col("p_partkey")).alias("tagged"),
        F.translate(F.col("p_brand"), "#", "-").alias("debranded"),
        F.reverse(F.col("p_name")).alias("reversed_name"),
        F.repeat(F.lit("*"), (F.col("p_size") % 8).cast("int")).alias("size_bar"),
        F.array_join(
            F.expr("regexp_extract_all(lower(p_type), '[a-z]+', 0)"), "|"
        ).alias("type_words"),
    ).orderBy("p_partkey")


@query(
    "fn_datetime_format",
    oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
       dayname(CAST(o_orderdate AS DATE)) AS day_name,
       monthname(CAST(o_orderdate AS DATE)) AS month_name,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       make_date(CAST(year(o_orderdate) AS INTEGER),
                 CAST(month(o_orderdate) AS INTEGER),
                 CAST(day(o_orderdate) AS INTEGER)) AS rebuilt_date
FROM orders
ORDER BY o_orderkey
""",
    family=_FAM,
)
def fn_datetime_format(spark, sf_dir):
    """Datetime rendering + reconstruction: format patterns (Spark JDK
    'yyyy-MM' vs DuckDB strftime '%Y-%m' — different syntax, same
    string), day/month names, quarter, ISO week, and a
    make_date(year, month, day) rebuild proving the part-extraction
    round trip. Complements fn_date's arithmetic half."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.make_date(F.year(d), F.month(d), F.dayofmonth(d)).alias("rebuilt_date"),
    ).orderBy("o_orderkey")


@query(
    "fn_try_safe",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN (l_quantity - l_quantity) = 0 THEN NULL
            ELSE l_extendedprice / (l_quantity - l_quantity) END AS div_by_zero,
       l_extendedprice / l_quantity AS safe_div,
       TRY_CAST(CASE WHEN l_orderkey % 20 = 0 THEN l_returnflag
                     ELSE CAST(l_linenumber AS VARCHAR) END
                AS INTEGER) AS flag_as_int,
       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS roundtrip_int
FROM lineitem
""",
    family=_FAM,
)
def fn_try_safe(spark, sf_dir):
    """Error-safe expression family (try_divide / try_cast): malformed
    input yields NULL instead of a task failure — at 100 TB one poison
    row must not kill a 10-hour job. Division by zero and an
    unparseable cast go NULL; the valid twins prove the happy path is
    unchanged. The poison column is SPARSE (an unparseable string on
    every 20th row, a parseable one elsewhere) — the production shape:
    try_cast's failure path is JVM-exception-driven, so a
    100%-unparseable column costs ~25 us/row (the r6 bench's 6 s for a
    pure 600k-row projection traced entirely to this), while 5% poison
    exercises both paths at scan speed."""
    li = table(spark, sf_dir, "lineitem")
    poison = F.when(
        F.col("l_orderkey") % 20 == 0, F.col("l_returnflag")
    ).otherwise(F.col("l_linenumber").cast("string"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("safe_div"),
        poison.try_cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("roundtrip_int"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || lower(source) || '.example.com/' || lang || '/doc-'
           || doc_id
           || CASE WHEN doc_id % 3 = 0
                   THEN '?ref=feed&page=' || (doc_id % 7) ELSE '' END AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path,
       NULLIF(regexp_extract(url, '\\?([^#]*)', 1), '') AS query,
       NULLIF(regexp_extract(url, '[?&]page=([^&#]*)', 1), '') AS page
FROM u ORDER BY doc_id
""",
    family=_FAM,
)
def fn_url(spark, sf_dir):
    """URL parsing family — `parse_url` (HOST / PATH / QUERY / keyed
    query param), the first thing a web-crawl pipeline does to every
    record. URLs are built deterministically from document columns (the
    corpus has no organic URLs), with a query string on every third doc
    so the NULL path (parse_url returns NULL for an absent component /
    param) is exercised and pinned — the DuckDB twin gets the same via
    NULLIF(regexp_extract, ''). Pure JVM per-row projection: no
    shuffle, whole-stage-codegen, scales as a straight scan."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.lower("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?ref=feed&page="), F.col("doc_id") % 7),
        ).otherwise(F.lit("")),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    ).orderBy("doc_id")


@query(
    "fn_timezone",
    oracle="""
SELECT event_id,
       strftime(timezone('America/New_York',
                to_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0)),
                '%Y-%m-%d %H:%M:%S') AS ny_wall,
       strftime(timezone('Asia/Tokyo',
                to_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0)),
                '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
       CAST(hour(timezone('America/New_York',
                 to_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0)))
            AS INTEGER) AS ny_hour,
       CAST((CAST(ts AS TIMESTAMP)
             = timezone('UTC',
               to_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0)))
            AS BOOLEAN) AS utc_roundtrip
FROM events
""",
    family=_FAM,
)
def fn_timezone(spark, sf_dir):
    """Timezone conversion (SURVEY.md §2.8 date family): UTC instants to
    wall-clock time in named IANA zones, DST-correct (America/New_York
    spans EST/EDT across the events range). The session timezone is
    pinned to UTC (session.py), so `convert_timezone` is the only zone
    math and results stay engine-portable. Outputs are formatted strings
    / integers, never zoned-timestamp cells, so the hash compare is
    byte-stable. The DuckDB twin goes through epoch-microseconds ->
    TIMESTAMPTZ -> `timezone(zone, ...)`, which is instant-preserving
    regardless of the oracle connection's local zone setting."""
    ev = table(spark, sf_dir, "events")
    def wall(zone):
        return F.date_format(
            F.expr(f"convert_timezone('UTC', '{zone}', ts)"),
            "yyyy-MM-dd HH:mm:ss",
        )
    return ev.select(
        "event_id",
        wall("America/New_York").alias("ny_wall"),
        wall("Asia/Tokyo").alias("tokyo_wall"),
        F.hour(F.expr("convert_timezone('UTC', 'America/New_York', ts)"))
        .cast("int").alias("ny_hour"),
        (F.col("ts") == F.expr("convert_timezone('UTC', 'UTC', ts)"))
        .cast("boolean").alias("utc_roundtrip"),
    )


@query(
    "fn_interval",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 WEEK AS DATE) AS minus2w,
       CAST(CAST(o_orderdate AS DATE)
            + CAST(CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0
                        THEN 7
                        ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7 END
                   AS INTEGER) AS DATE) AS next_mon,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qstart,
       CAST((1998 - year(o_orderdate)) * 12 + (6 - month(o_orderdate))
            AS BIGINT) AS whole_months_to_jun98
FROM orders
""",
    family=_FAM,
)
def fn_interval(spark, sf_dir):
    """Calendar-interval arithmetic (SURVEY.md §2.8 date family, beyond
    fn_date's field extraction): month addition with end-of-month clamp
    (add_months — Jan 31 + 1 month = Feb 28 on both engines), week
    subtraction, next-Monday (Spark's next_day vs an isodow formula in
    the oracle — same function, independently derived), quarter
    truncation, and whole-month distance to a fixed anchor expressed in
    year/month integers (portable, unlike fractional months_between
    whose 31-day convention is engine-specific). Pure per-row projection
    — no shuffle at any scale."""
    o = table(spark, sf_dir, "orders")
    d = F.expr("CAST(o_orderdate AS DATE)")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.date_sub(d, 14).alias("minus2w"),
        F.next_day(d, "Mon").alias("next_mon"),
        F.expr("CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)")
        .alias("qstart"),
        (
            (F.lit(1998) - F.year("o_orderdate")) * 12
            + (F.lit(6) - F.month("o_orderdate"))
        ).cast("bigint").alias("whole_months_to_jun98"),
    )


@query(
    "fn_collation",
    oracle="""
WITH mixed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_mixed,
         text
  FROM documents
)
SELECT lower(lang_mixed) AS lang_ci,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE contains(lower(text), 'the')) AS BIGINT)
         AS n_contains_the
FROM mixed
GROUP BY lower(lang_mixed)
""",
    family=_FAM,
)
def fn_collation(spark, sf_dir):
    """Collation-aware string semantics (Spark 4 collations): grouping
    and substring search under UTF8_LCASE merge case variants WITHOUT
    rewriting the data — the engine hashes/compares collation-aware, so
    'DE' and 'de' land in one group and contains() matches any case.
    The oracle lowers explicitly (DuckDB has no per-column collation in
    this form) — result equality proves the collated semantics equal
    the normalize-then-compare formulation.

    Scale: collation is metadata on the comparison, not a projection —
    no extra pass over 100 TB of text to normalize case before a
    group-by, and the aggregate still gets map-side partials."""
    d = table(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed"),
        "text",
    )
    ci = F.collate(F.col("lang_mixed"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("lang_grp"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_if(
                F.contains(F.collate(F.col("text"), "UTF8_LCASE"), F.lit("THE"))
            ).cast("bigint").alias("n_contains_the"),
        )
        .select(
            F.lower(F.col("lang_grp")).alias("lang_ci"),
            "n_docs",
            "n_contains_the",
        )
    )


@query(
    "fn_variant",
    oracle="""
WITH built AS (
  SELECT event_id,
         '{"k": ' || CAST(json_extract(props, '$.k') AS VARCHAR)
         || ', "who": {"user": ' || CAST(user_id AS VARCHAR)
         || ', "type": "' || event_type
         || '"}, "trail": [' || CAST(event_id % 7 AS VARCHAR)
         || ', ' || CAST(event_id % 11 AS VARCHAR) || ']}' AS doc
  FROM events
)
SELECT event_id,
       CAST(json_extract(doc, '$.k') AS INTEGER) AS k,
       CAST(json_extract(doc, '$.who.user') AS BIGINT) AS who_user,
       CAST(json_extract_string(doc, '$.who.type') AS VARCHAR) AS who_type,
       CAST(json_extract(doc, '$.trail[1]') AS INTEGER) AS trail_second,
       CAST((json_extract(doc, '$.missing') IS NULL) AS BOOLEAN) AS missing_is_null
FROM built
""",
    family=_FAM,
)
def fn_variant(spark, sf_dir):
    """Spark 4 VARIANT ingestion of semi-structured data: a nested JSON
    document (object-in-object + array, built deterministically from row
    fields so every path is NON-null and the test can't pass vacuously)
    is parsed ONCE by `parse_json`, then typed `variant_get` paths walk
    it — object field, nested field, array index, and an absent path
    (NULL). Repeated get_json_object re-tokenizes the string per call;
    the variant is parsed once and each path is an O(path) binary walk —
    1 vs k parses per row when k fields are read, the cost model for
    wide event props at 100 TB. The oracle reads identical paths through
    DuckDB's JSON extraction."""
    ev = table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"k": '), F.get_json_object("props", "$.k"),
        F.lit(', "who": {"user": '), F.col("user_id").cast("string"),
        F.lit(', "type": "'), F.col("event_type"),
        F.lit('"}, "trail": ['), (F.col("event_id") % 7).cast("string"),
        F.lit(", "), (F.col("event_id") % 11).cast("string"), F.lit("]}"),
    )
    v = ev.select("event_id", F.parse_json(doc).alias("vp"))
    return v.select(
        "event_id",
        F.variant_get(F.col("vp"), "$.k", "int").alias("k"),
        F.variant_get(F.col("vp"), "$.who.user", "bigint").alias("who_user"),
        F.variant_get(F.col("vp"), "$.who.type", "string").alias("who_type"),
        F.variant_get(F.col("vp"), "$.trail[1]", "int").alias("trail_second"),
        F.variant_get(F.col("vp"), "$.missing", "string")
        .isNull().alias("missing_is_null"),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
WITH h AS (
  SELECT o_orderkey, md5('hmr:order:' || CAST(o_orderkey AS VARCHAR)) AS hx
  FROM orders
)
SELECT o_orderkey,
       substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
         || '3' || substr(hx, 14, 3) || '-'
         || 'a' || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS surrogate_id
FROM h
ORDER BY o_orderkey
""",
    family=_FAM,
)
def fn_uuid_deterministic(spark, sf_dir):
    """Deterministic surrogate-key minting — name-based UUIDs (the
    v3/v5 idea: hash a namespaced natural key, format as UUID) instead
    of uuid()/monotonically_increasing_id(), both of which are
    nondeterministic across retries and partitionings and therefore
    poison at 100 TB: a retried task would mint DIFFERENT ids and
    downstream joins silently fork. md5(namespace || natural_key)
    formatted 8-4-4-4-12 with fixed version/variant nibbles is
    replayable everywhere — the oracle hash-matches every minted id."""
    o = table(spark, sf_dir, "orders")
    hx = F.md5(F.concat(F.lit("hmr:order:"), F.col("o_orderkey").cast("string")))
    return (
        o.select("o_orderkey", hx.alias("hx"))
        .select(
            "o_orderkey",
            F.concat(
                F.substring("hx", 1, 8), F.lit("-"),
                F.substring("hx", 9, 4), F.lit("-"),
                F.lit("3"), F.substring("hx", 14, 3), F.lit("-"),
                F.lit("a"), F.substring("hx", 18, 3), F.lit("-"),
                F.substring("hx", 21, 12),
            ).alias("surrogate_id"),
        )
        .orderBy("o_orderkey")
    )


def _phonetic_sql(word: str) -> str:
    """Soundex-class phonetic code of ``word``, built ONLY from
    primitives both engines share bit-for-bit: letter-class translate,
    adjacent-duplicate collapse as a nested replace chain (4 rounds of
    'dd'->'d' per digit class — handles runs up to 16, and RE2/DuckDB
    has NO regex backreferences, the trap a '(\\d)\\1+' collapse
    silently no-ops into), vowel-class drop, pad/truncate to 4. This
    is deliberately the SIMPLIFIED variant (the first letter also
    participates in duplicate collapse), documented as such — the
    point is a deterministic engine-portable blocking key, not Knuth
    compliance."""
    up = f"upper({word})"
    collapsed = (
        f"translate({up}, 'BFPVCGJKQSXZDTLMNRAEIOUHWY', "
        f"'11112222222233455600000000')"
    )
    for _ in range(4):
        for d in "123456":
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    return (
        f"substr(concat(substr({up}, 1, 1), "
        f"replace(substr({collapsed}, 2), '0', ''), '000'), 1, 4)"
    )


@query(
    "fn_phonetic",
    oracle=f"""
WITH w AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word
  FROM part
),
coded AS (
  SELECT word, {_phonetic_sql('word')} AS code FROM w
)
SELECT code,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       string_agg(word, ',' ORDER BY word) AS words,
       COUNT(*) > 1 AS is_collision_block
FROM coded
GROUP BY code
ORDER BY code
""",
    family=_FAM,
)
def fn_phonetic(spark, sf_dir):
    """Phonetic (Soundex-class) encoding — the third blocking key the
    entity-resolution playbook calls for (join_fuzzy_string's
    docstring: 'real pipelines run multiple passes with different keys
    — prefix, suffix, phonetic — and union them'; this supplies the
    phonetic pass). The code is built ONLY from primitives both
    engines share bit-for-bit (upper/translate/regexp-collapse/
    replace/substr — no engine soundex() builtin, whose edge-case
    behavior differs between implementations), so the blocking key is
    engine-portable by construction. Output groups the distinct
    part-name vocabulary by code: is_collision_block marks codes that
    merge multiple words — exactly the recall a phonetic pass adds
    over exact/prefix blocking (sound-alike, spell-different names
    land in one block and get the expensive comparator).

    Scale: a per-row codegen'd expression chain producing a
    low-cardinality key — the ideal blocking shape (hash-joinable,
    skew bounded by class sizes); vocabulary collapses BEFORE the
    rollup (the family discipline)."""
    p = table(spark, sf_dir, "part")
    w = p.select(
        F.explode(F.split("p_name", " ")).alias("word")
    ).distinct()
    coded = w.select(
        "word",
        F.expr(_phonetic_sql("word")).alias("code"),
    )
    return (
        coded.groupBy("code")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.array_join(F.array_sort(F.collect_set("word")), ",")
            .alias("words"),
            (F.count("*") > 1).alias("is_collision_block"),
        )
        .orderBy("code")
    )


@query(
    "fn_ip_cidr",
    oracle="""
WITH ips AS (
  SELECT event_id,
         (event_id * 2654435761) % 4294967296 AS ip
  FROM events
),
oct AS (
  SELECT event_id, ip,
         ip // 16777216 AS o1, (ip // 65536) % 256 AS o2,
         (ip // 256) % 256 AS o3, ip % 256 AS o4
  FROM ips
),
strs AS (
  SELECT event_id, ip, o1,
         o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str
  FROM oct
),
parsed AS (
  SELECT event_id, ip, o1, ip_str,
         CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip2
  FROM strs
),
classed AS (
  SELECT *,
         CASE WHEN ip // 16777216 = 10 THEN 'rfc1918_10/8'
              WHEN ip // 1048576 = 2753 THEN 'rfc1918_172.16/12'
              WHEN ip // 65536 = 49320 THEN 'rfc1918_192.168/16'
              WHEN ip // 268435456 = 14 THEN 'multicast_224/4'
              ELSE 'public' END AS net_class
  FROM parsed
)
SELECT net_class,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN ip2 <> ip THEN 1 ELSE 0 END) AS BIGINT)
         AS roundtrip_failures,
       MIN(ip_str) AS min_ip_str,
       CAST(MIN(ip) AS BIGINT) AS min_ip
FROM classed
GROUP BY net_class
ORDER BY net_class
""",
    family=_FAM,
)
def fn_ip_cidr(spark, sf_dir):
    """IPv4 PARSE + CIDR CLASSIFICATION — the log-pipeline staple
    (every clickstream/security corpus carries IP columns that need
    dotted-quad <-> integer conversion and netblock matching): each
    event synthesizes a deterministic IP (Knuth multiplicative hash of
    event_id mod 2^32 — uniform over the address space, identical in
    both engines by integer arithmetic), renders it as a dotted quad,
    PARSES IT BACK (split + reassemble), and classifies it against the
    RFC-1918 private blocks plus the multicast /4 — CIDR containment
    expressed as the pure integer prefix test ip DIV 2^(32-prefix) =
    net DIV 2^(32-prefix), never string prefix matching (which
    misclassifies '19.2.x' vs '192.x'). roundtrip_failures pins the
    string round trip exactly (must be 0 in every class); per-class
    counts pin the block arithmetic since the synthetic IPs are
    uniform (a /8 catches ~n/256).

    Scale: codegen'd per-row integer/string expressions, one combiner
    rollup — no shuffle beyond the 5-class aggregate."""
    ev = table(spark, sf_dir, "events")
    ips = ev.select(
        "event_id",
        ((F.col("event_id") * 2654435761) % 4294967296).alias("ip"),
    )
    oct_ = ips.select(
        "event_id", "ip",
        F.expr("ip DIV 16777216").alias("o1"),
        F.expr("(ip DIV 65536) % 256").alias("o2"),
        F.expr("(ip DIV 256) % 256").alias("o3"),
        (F.col("ip") % 256).alias("o4"),
    )
    strs = oct_.select(
        "event_id", "ip", "o1",
        F.concat_ws(
            ".", F.col("o1").cast("string"), F.col("o2").cast("string"),
            F.col("o3").cast("string"), F.col("o4").cast("string"),
        ).alias("ip_str"),
    )
    sp = F.split(F.col("ip_str"), "\\.")
    parsed = strs.select(
        "event_id", "ip", "ip_str",
        (
            sp.getItem(0).cast("bigint") * 16777216
            + sp.getItem(1).cast("bigint") * 65536
            + sp.getItem(2).cast("bigint") * 256
            + sp.getItem(3).cast("bigint")
        ).alias("ip2"),
    )
    classed = parsed.withColumn(
        "net_class",
        F.when(F.expr("ip DIV 16777216") == 10, "rfc1918_10/8")
        .when(F.expr("ip DIV 1048576") == 2753, "rfc1918_172.16/12")
        .when(F.expr("ip DIV 65536") == 49320, "rfc1918_192.168/16")
        .when(F.expr("ip DIV 268435456") == 14, "multicast_224/4")
        .otherwise("public"),
    )
    return (
        classed.groupBy("net_class")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum((F.col("ip2") != F.col("ip")).cast("int"))
            .cast("bigint").alias("roundtrip_failures"),
            F.min("ip_str").alias("min_ip_str"),
            F.min("ip").cast("bigint").alias("min_ip"),
        )
        .orderBy("net_class")
    )


def _geohash_sql(div: str) -> dict[str, str]:
    """Shared integer geohash expression text for BOTH engines (the
    fn_ip_cidr discipline: one generator, a ``div`` token per dialect —
    Spark ``div``, DuckDB ``//``). 25-bit geohash (13 lon + 12 lat
    bits, precision 5): quantize, bit-SPREAD each coordinate (zeros
    interleaved), v = spread(lon) + 2*spread(lat), then 5 base32
    chars; decode reverses via alphabet position and bit gather."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lonb = " + ".join(
        f"((lon_b {div} {1 << j}) % 2) * {1 << (2 * j)}" for j in range(13)
    )
    latb = " + ".join(
        f"((lat_b {div} {1 << i}) % 2) * {1 << (2 * i + 1)}" for i in range(12)
    )
    enc = " || ".join(
        f"substr('{alpha}', CAST((v {div} {32 ** m}) % 32 AS INT) + 1, 1)"
        for m in range(4, -1, -1)
    )
    dec_v = " + ".join(
        f"(instr('{alpha}', substr(gh, {5 - m}, 1)) - 1) * {32 ** m}"
        for m in range(4, -1, -1)
    )
    lon_back = " + ".join(
        f"((v2 {div} {1 << (2 * j)}) % 2) * {1 << j}" for j in range(13)
    )
    lat_back = " + ".join(
        f"((v2 {div} {1 << (2 * i + 1)}) % 2) * {1 << i}" for i in range(12)
    )
    return {
        "lat_b": f"(lat_i * 4096) {div} 1800000",
        "lon_b": f"(lon_i * 8192) {div} 3600000",
        "v": f"({lonb}) + ({latb})",
        "gh": enc,
        "v2": dec_v,
        "lon_back": lon_back,
        "lat_back": lat_back,
    }


_GH_SPARK = _geohash_sql("div")
_GH_DUCK = _geohash_sql("//")


@query(
    "fn_geohash",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         event_id % 1800000 AS lat_i,
         (event_id * 7919) % 3600000 AS lon_i
  FROM events
),
quant AS (
  SELECT event_id, lat_i, lon_i,
         {_GH_DUCK['lat_b']} AS lat_b, {_GH_DUCK['lon_b']} AS lon_b
  FROM pts
),
enc AS (
  SELECT event_id, lat_b, lon_b, v, {_GH_DUCK['gh']} AS gh
  FROM (SELECT *, {_GH_DUCK['v']} AS v FROM quant)
),
dec AS (
  SELECT event_id, lat_b, lon_b, v, gh, v2,
         {_GH_DUCK['lon_back']} AS lon_back,
         {_GH_DUCK['lat_back']} AS lat_back
  FROM (SELECT *, {_GH_DUCK['v2']} AS v2 FROM enc)
)
SELECT substr(gh, 1, 2) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT gh) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS v_sum,
       CAST(SUM(CASE WHEN v2 != v OR lon_back != lon_b
                       OR lat_back != lat_b
                THEN 1 ELSE 0 END) AS BIGINT) AS roundtrip_failures
FROM dec
GROUP BY substr(gh, 1, 2)
ORDER BY prefix
""",
    family=_FAM,
)
def fn_geohash(spark, sf_dir):
    """GEOHASH encode/decode (r13 — the spatial-indexing staple next to
    join_spatial_grid's raw cells: geohash's interleaved base32 makes
    PREFIX = CONTAINMENT, so equal prefixes bucket neighbors for joins
    and range scans — the S2/H3-class trick in its public-domain form).
    Deterministic lat/lon derive from event_id (Knuth-multiplier lon so
    the two coordinates decorrelate); the full codec is INTEGER-EXACT
    in both engines: quantize to 12/13 bits by integer mul-div, SPREAD
    the bits (zeros interleaved, the closed form v = spread(lon) +
    2*spread(lat) — lon leads, per the geohash spec), emit 5 base32
    chars, then DECODE the string back (alphabet position -> v' -> bit
    gather) with roundtrip_failures PINNED at 0 — a wrong interleave
    order, alphabet, or bit width cannot hash-match because v_sum pins
    the interleave arithmetic per 2-char-prefix cell.

    Scale: pure codegen'd per-row integer/string chains + one combiner
    rollup — zero shuffles before the final group-by; at 100 TB the
    same expressions geohash-bucket any point table for a co-located
    spatial join (prefix equality) with no UDF in the path. Shared
    expression text generates BOTH dialects (div vs //) so the engines
    replay identical integer ops."""
    from hdfs_mr_spark.io import fan_out

    # fan_out: the events fixture is a single parquet file (1-2 scan
    # partitions), which would run the ~400-node integer chain nearly
    # serial — measured 11.6 s -> ~2 s at the 1M-event stress corpus
    e = fan_out(table(spark, sf_dir, "events")).select(
        "event_id",
        (F.col("event_id") % 1800000).alias("lat_i"),
        ((F.col("event_id") * 7919) % 3600000).alias("lon_i"),
    )
    g = _GH_SPARK
    enc = (
        e.withColumn("lat_b", F.expr(g["lat_b"]))
        .withColumn("lon_b", F.expr(g["lon_b"]))
        .withColumn("v", F.expr(g["v"]))
        .withColumn("gh", F.expr(g["gh"]))
    )
    dec = (
        enc.withColumn("v2", F.expr(g["v2"]))
        .withColumn("lon_back", F.expr(g["lon_back"]))
        .withColumn("lat_back", F.expr(g["lat_back"]))
    )
    return (
        dec.groupBy(F.substring("gh", 1, 2).alias("prefix"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_distinct("gh").cast("bigint").alias("n_cells"),
            F.sum("v").cast("bigint").alias("v_sum"),
            F.sum(
                F.when(
                    (F.col("v2") != F.col("v"))
                    | (F.col("lon_back") != F.col("lon_b"))
                    | (F.col("lat_back") != F.col("lat_b")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("roundtrip_failures"),
        )
        .orderBy("prefix")
    )
