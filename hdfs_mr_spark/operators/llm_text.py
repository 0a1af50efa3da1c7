"""LLM-pipeline text analysis (SURVEY.md §2.11, mandate: "text analysis").

Per-document statistics, corpus profiling, TF-IDF, n-grams, lexicon
sentiment, quality gates, and multimodal binary-column handling — the
operators a training-data pipeline runs over 100 TB of raw text. All
JVM-side (higher-order functions, no Python UDFs); every aggregate is
either integer-exact or decimal-exact, and every transcendental is
rounded identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_mr_spark import stats as corpus_stats
from hdfs_mr_spark.io import fan_out, table
from hdfs_mr_spark.registry import query

_FAM = "2.11 llm text analysis"

def _toks():
    return F.split(F.col("text"), " ")


@query(
    "llm_text_stats",
    oracle="""
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
              t -> CAST(length(t) AS INTEGER))), (a,b) -> a+b) AS BIGINT) AS total_token_chars,
       CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
              t -> CAST(length(t) AS INTEGER))), (a,b) -> a+b) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS type_token_ratio,
       (CAST(length(text) AS BIGINT) = n_chars) AS n_chars_valid
FROM documents
""",
    family=_FAM,
)
def llm_text_stats(spark, sf_dir):
    """Per-doc text statistics: token count, avg token length, type-token
    ratio; validates the fixture's n_chars column. Integer folds keep it
    exact."""
    d = table(spark, sf_dir, "documents")
    tok_chars = F.aggregate(
        F.transform(_toks(), lambda t: F.length(t).cast("int")),
        F.lit(0),
        lambda a, b: a + b,
    )
    n_tok = F.size(_toks())
    return d.select(
        "doc_id", "lang",
        n_tok.cast("int").alias("n_tokens"),
        tok_chars.cast("bigint").alias("total_token_chars"),
        (tok_chars.cast("double") / n_tok).alias("avg_token_len"),
        (F.size(F.array_distinct(_toks())).cast("double") / n_tok).alias("type_token_ratio"),
        (F.length("text").cast("bigint") == F.col("n_chars")).alias("n_chars_valid"),
    )


@query(
    "llm_lang_profile",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    family=_FAM,
)
def llm_lang_profile(spark, sf_dir):
    """Corpus profile per language x source (integer sums — exact)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_toks())).cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars").cast("bigint").cast("double") / F.count("*")).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "llm_tfidf",
    oracle="""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tf_lang AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY lang, term),
scored AS (
  SELECT t.lang, t.term,
         round(CAST(t.tf AS DOUBLE)
               * (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(d.df AS DOUBLE) + 1.0)) + 1.0),
               6) AS score
  FROM tf_lang t, n_docs n
  JOIN df d ON t.term = d.term
)
SELECT lang, term, score,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, term ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY lang, rank
""",
    family=_FAM,
)
def llm_tfidf(spark, sf_dir):
    """TF-IDF top-5 terms per language, pure DataFrame math (tf = corpus
    term count per lang, idf = ln((N+1)/(df+1))+1). Scores rounded to
    6 dp on both engines BEFORE ranking, so the ln() ulp difference can
    neither flip values nor ordering."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(_toks()).alias("term"))
    n_docs = corpus_stats.n_docs(spark, sf_dir)  # cached corpus stat (stats.py)
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf_lang = tok.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    idf = (
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)) + 1.0
    )
    # Unhinted shuffle join on term: the document-frequency table is
    # vocabulary-sized, and vocabulary grows with the corpus (Heaps'
    # law) — a broadcast hint here dies at 100 TB. Both sides are
    # already term-keyed aggregates off the same shuffle key.
    scored = (
        tf_lang.join(df, "term")
        .select(
            "lang", "term",
            F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .orderBy("lang", "rank")
    )


@query(
    "llm_ngrams",
    oracle="""
WITH big AS (
  SELECT lang, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
  FROM (SELECT lang, string_split(text, ' ') AS l FROM documents) d
)
SELECT lang, bigram, COUNT(*) AS n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, bigram ASC)
            AS BIGINT) AS rank
FROM big
GROUP BY lang, bigram
QUALIFY rank <= 10
ORDER BY lang, rank
""",
    family=_FAM,
)
def llm_ngrams(spark, sf_dir):
    """Top-10 bigrams per language — adjacent-token pairs built with a
    JVM-side index transform (no Python)."""
    d = table(spark, sf_dir, "documents")
    # token array materialized before the lambda: element_at(split(...), i)
    # would re-run the split per bigram index in the interpreted evaluator
    # (same pathology as the shingle kernel, PERF.md finding 2)
    toks = fan_out(d.select("lang", F.split("text", " ").alias("toks"))).localCheckpoint()
    # size guard: sequence(1, 0) is DESCENDING for 1-token docs and
    # element_at(toks, 0) raises — they contribute no bigrams (= oracle)
    bigrams = F.expr(
        "IF(size(toks) >= 2,"
        " transform(sequence(1, size(toks) - 1),"
        "  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))),"
        " array())"
    )
    big = toks.select("lang", F.explode(bigrams).alias("bigram"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        big.groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .orderBy("lang", "rank")
    )


# Seed-fixed literal lexicon over the measured corpus vocabulary.
_LEXICON = [("fast", 2), ("big", 1), ("small", -1), ("slow", -2), ("dup", -5)]
_LEX_VALUES = ", ".join(f"('{w}', {s})" for w, s in _LEXICON)


@query(
    "llm_sentiment_lexicon",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
scores AS (
  SELECT t.doc_id, CAST(COALESCE(SUM(l.weight), 0) AS BIGINT) AS sentiment
  FROM tok t LEFT JOIN (VALUES {_LEX_VALUES}) AS l(word, weight) ON t.w = l.word
  GROUP BY t.doc_id
)
SELECT d.doc_id, d.lang, s.sentiment,
       CASE WHEN s.sentiment > 0 THEN 'positive'
            WHEN s.sentiment < 0 THEN 'negative'
            ELSE 'neutral' END AS polarity
FROM documents d JOIN scores s ON d.doc_id = s.doc_id
""",
    family=_FAM,
)
def llm_sentiment_lexicon(spark, sf_dir):
    """Lexicon sentiment: integer word weights broadcast-joined to the
    exploded token stream, summed per doc (exact integer math)."""
    d = table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(_LEXICON, "word string, weight int")
    tok = d.select("doc_id", F.explode(_toks()).alias("w"))
    scores = (
        tok.join(F.broadcast(lex), tok.w == lex.word, "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("bigint").alias("sentiment"))
    )
    return d.select("doc_id", "lang").join(scores, "doc_id").select(
        "doc_id", "lang", "sentiment",
        F.when(F.col("sentiment") > 0, "positive")
        .when(F.col("sentiment") < 0, "negative")
        .otherwise("neutral")
        .alias("polarity"),
    )


@query(
    "llm_quality_filter",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE len(string_split(text,' ')) < 15) AS BIGINT)
         AS n_too_short,
       CAST(COUNT(*) FILTER (WHERE n_chars > 500) AS BIGINT) AS n_too_long,
       CAST(COUNT(*) FILTER (WHERE lang NOT IN ('en','de','fr','es')) AS BIGINT)
         AS n_wrong_lang,
       CAST(COUNT(*) FILTER (WHERE len(string_split(text,' ')) >= 15
                               AND n_chars <= 500
                               AND lang IN ('en','de','fr','es')) AS BIGINT) AS n_kept
FROM documents
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def llm_quality_filter(spark, sf_dir):
    """C4-style quality gates (min tokens, max length, target languages)
    with per-rule kept/dropped accounting — one conditional-aggregate
    pass, no data rewritten."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(_toks())
    too_short = n_tok < 15
    too_long = F.col("n_chars") > 500
    wrong_lang = ~F.col("lang").isin("en", "de", "fr", "es")
    kept = ~too_short & ~too_long & ~wrong_lang
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            cnt(too_short).alias("n_too_short"),
            cnt(too_long).alias("n_too_long"),
            cnt(wrong_lang).alias("n_wrong_lang"),
            cnt(kept).alias("n_kept"),
        )
        .orderBy("lang")
    )


@query(
    "llm_multimodal_cols",
    oracle="""
WITH payloads AS (
  SELECT doc_id,
         CASE lang WHEN 'en' THEN 'image/png' WHEN 'de' THEN 'audio/wav'
                   WHEN 'fr' THEN 'video/mp4' WHEN 'es' THEN 'image/jpeg'
                   ELSE 'application/octet-stream' END AS mime,
         unhex(sha256(text)) AS payload
  FROM documents
)
SELECT doc_id, mime,
       CAST(octet_length(payload) AS INTEGER) AS n_bytes,
       lower(hex(payload)) AS payload_hex
FROM payloads
WHERE mime LIKE 'image/%'
""",
    family=_FAM,
)
def llm_multimodal_cols(spark, sf_dir):
    """Multimodal columns: opaque binary payloads + typed metadata
    (struct<mime,bytes>), filtered by mime with byte-length inspection.
    Payloads are deterministic fakes (sha256 of the text — real decode
    is stubbed in functions.udfs.mm_decode); the Spark-side plumbing
    (BinaryType column, struct metadata, mime dispatch) is real."""
    d = table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("lang") == "en", "image/png")
        .when(F.col("lang") == "de", "audio/wav")
        .when(F.col("lang") == "fr", "video/mp4")
        .when(F.col("lang") == "es", "image/jpeg")
        .otherwise("application/octet-stream")
    )
    payload = F.to_binary(F.sha2(F.col("text"), 256), F.lit("hex"))
    blobs = d.select(
        "doc_id",
        F.struct(mime.alias("mime"), payload.alias("bytes")).alias("media"),
    )
    return blobs.filter(F.col("media.mime").like("image/%")).select(
        "doc_id",
        F.col("media.mime").alias("mime"),
        F.octet_length("media.bytes").cast("int").alias("n_bytes"),
        F.lower(F.hex("media.bytes")).alias("payload_hex"),
    )


@query(
    "llm_lang_id",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
prof AS (
  SELECT d.lang, t.w, COUNT(*) AS cnt
  FROM documents d JOIN tok t ON d.doc_id = t.doc_id
  GROUP BY d.lang, t.w
),
totals AS (SELECT lang, SUM(cnt) AS total FROM prof GROUP BY lang),
langs AS (SELECT DISTINCT lang AS cand_lang FROM documents),
scored AS (
  SELECT t.doc_id, l.cand_lang,
         CAST(SUM(CAST(round(ln((CAST(COALESCE(p.cnt, 0) AS DOUBLE) + 1.0)
                               / (CAST(tt.total AS DOUBLE) + CAST(v.v AS DOUBLE)))
                         * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
  FROM tok t
  CROSS JOIN langs l
  CROSS JOIN vocab v
  JOIN totals tt ON tt.lang = l.cand_lang
  LEFT JOIN prof p ON p.lang = l.cand_lang AND p.w = t.w
  GROUP BY t.doc_id, l.cand_lang
),
best AS (
  SELECT doc_id, cand_lang AS pred_lang, score_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, cand_lang ASC) AS rk
  FROM scored
)
SELECT d.doc_id, d.lang, b.pred_lang, b.score_micro,
       (d.lang = b.pred_lang) AS correct
FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rk = 1
ORDER BY d.doc_id
""",
    family=_FAM,
)
def llm_lang_id(spark, sf_dir):
    """N-gram-heuristic language ID: per-language unigram profiles learned
    from the corpus itself (add-one smoothing), each doc scored against
    every profile, argmax predicted (naive-Bayes log-likelihood).

    Determinism: each token's log-probability is quantized to integer
    micro-units BEFORE summing, so group sums are order-independent and
    engine-exact. Profiles are tiny (vocab x langs) and broadcast; the
    doc-side token stream is scanned once — at 100 TB the only shuffle
    is the per-doc score aggregation."""
    d = table(spark, sf_dir, "documents")
    # r15-opt NOTE: checkpointing tok/prof here (the duplicate-subtree
    # suspicion from the 14-scan plan) was A/B-REFUTED — runtime
    # ReusedExchange already dedupes the repeated subtrees and the eager
    # barriers only serialized the jobs (1.76/1.64 base vs 1.82/2.16
    # dirty). Left lazy on purpose.
    tok = d.select("doc_id", F.explode(_toks()).alias("w"))
    v = corpus_stats.vocab_size(spark, sf_dir)  # cached corpus stat (stats.py)
    prof = (
        d.select("doc_id", "lang")
        .join(tok, "doc_id")
        .groupBy(F.col("lang").alias("p_lang"), F.col("w").alias("p_w"))
        .agg(F.count("*").alias("cnt"))
    )
    totals = prof.groupBy(F.col("p_lang").alias("t_lang")).agg(
        F.sum("cnt").alias("total")
    )
    langs = d.select(F.col("lang").alias("cand_lang")).distinct()
    term = F.round(
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + 1.0)
            / (F.col("total").cast("double") + F.lit(float(v)))
        )
        * 1000000.0
    ).cast("bigint")
    scored = (
        tok.crossJoin(F.broadcast(langs))
        .join(F.broadcast(totals), F.col("cand_lang") == F.col("t_lang"))
        .join(
            F.broadcast(prof),
            (F.col("cand_lang") == F.col("p_lang")) & (F.col("w") == F.col("p_w")),
            "left",
        )
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum(term).cast("bigint").alias("score_micro"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("cand_lang").asc()
    )
    best = (
        scored.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "score_micro")
    )
    return (
        d.select("doc_id", "lang")
        .join(best, "doc_id")
        .select(
            "doc_id", "lang", "pred_lang", "score_micro",
            (F.col("lang") == F.col("pred_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS INTEGER)
         AS n_re_tokens,
       CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
              t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS INTEGER))),
            (a, b) -> a + b) AS INTEGER) AS n_bpe_pieces
FROM documents
""",
    family=_FAM,
)
def llm_token_count(spark, sf_dir):
    """Token counting three ways: whitespace split, regex tokenizer
    (letter runs / digit runs / symbol runs — the pre-tokenization pass
    real BPE tokenizers use), and a BPE-ish piece count (<=4-char chunks
    per word — the fixed-merge approximation). All JVM-side; the regex
    is shared verbatim with the oracle."""
    d = table(spark, sf_dir, "documents")
    n_re = F.expr(
        "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0))"
    )
    n_bpe = F.aggregate(
        F.transform(
            _toks(), lambda t: F.ceil(F.length(t).cast("double") / 4.0).cast("int")
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    return d.select(
        "doc_id",
        F.size(_toks()).cast("int").alias("n_ws_tokens"),
        n_re.cast("int").alias("n_re_tokens"),
        n_bpe.cast("int").alias("n_bpe_pieces"),
    )


@query(
    "llm_fingerprint_simhash",
    oracle="""
WITH hashed AS (
  SELECT doc_id, lang,
         list_transform(list_distinct(string_split(text, ' ')),
                        w -> CAST(('0x' || substr(sha256(w), 1, 8)) AS BIGINT)) AS hs
  FROM documents
),
fp AS (
  SELECT doc_id, lang,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(0, 32), b ->
             CASE WHEN list_reduce(list_prepend(0,
                    list_transform(hs, h -> CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
                                                 THEN 1 ELSE -1 END)),
                    (a, x) -> a + x) > 0
                  THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END)),
           (a, x) -> a + x) AS simhash
  FROM hashed
)
SELECT doc_id, lang, simhash,
       CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same_fingerprint
FROM fp
""",
    family=_FAM,
)
def llm_fingerprint_simhash(spark, sf_dir):
    """SimHash-32 document fingerprint over the distinct-token set (token
    hash = first 8 hex digits of sha256, bit-majority vote), plus the
    bucket size per fingerprint — identical fingerprints are near-dup
    candidates in O(n), no pairwise join. Entirely JVM-side bit math."""
    d = table(spark, sf_dir, "documents")
    # materialize the token-hash array BEFORE the 32-bit vote (PERF.md 2b):
    # inlined, `aggregate(hs, ...)` re-evaluates hs — sha256 of every
    # distinct token — once per bit, a 32x overhang
    hs_expr = (
        "transform(array_distinct(split(text, ' ')), "
        "w -> cast(conv(substring(sha2(w, 256), 1, 8), 16, 10) as bigint))"
    )
    hashed = fan_out(
        d.select("doc_id", "lang", F.expr(hs_expr).alias("hs"))
    ).localCheckpoint()
    bit_vote = "aggregate(hs, 0, (a, h) -> a + IF(shiftright(h, b) & 1 = 1, 1, -1))"
    simhash = (
        f"aggregate(transform(sequence(0, 31), b -> "
        f"IF(({bit_vote}) > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), "
        f"cast(0 as bigint), (a, x) -> a + x)"
    )
    fp = hashed.select("doc_id", "lang", F.expr(simhash).alias("simhash"))
    w = Window.partitionBy("simhash")
    return fp.withColumn("n_same_fingerprint", F.count("*").over(w).cast("bigint"))


@query(
    "llm_fingerprint_winnow",
    oracle="""
WITH sh AS (
  SELECT doc_id, lang,
         list_transform(range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
           i -> CAST(('0x' || substr(sha256(array_to_string(
                  string_split(text, ' ')[i + 1 : i + 3], ' ')), 1, 8)) AS BIGINT)) AS hs
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
fp AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(0, greatest(len(hs) - 4, 0) + 1),
           j -> list_min(hs[j + 1 : j + 4]))) AS fps
  FROM sh
),
ex AS (SELECT doc_id, lang, unnest(fps) AS fingerprint FROM fp)
SELECT doc_id, lang, fingerprint,
       CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_docs_sharing
FROM ex
ORDER BY doc_id, fingerprint
""",
    family=_FAM,
)
def llm_fingerprint_winnow(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS rolling-hash scheme): hash every token 3-gram, slide a window
    of 4 consecutive shingle hashes, keep the minimum per window; the
    distinct selected hashes are the doc's fingerprints. Guarantees any
    shared run of >= 6 tokens yields a shared fingerprint, so equal
    fingerprints are O(n) near-dup/plagiarism candidates — the third
    fingerprinting regime next to SimHash (bit-majority sketch) and
    exact content hash. All JVM-side array math; the per-fingerprint
    sharing count is a window over the exploded posting list (at 100 TB
    that list is exactly the inverted index the candidate join uses)."""
    d = table(spark, sf_dir, "documents").filter(F.size(_toks()) >= 3)
    # token array materialized before the shingle lambda (PERF.md 2):
    # slice(split(text), ...) inside the transform would re-split per index
    toks = fan_out(
        d.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    ).localCheckpoint()
    hs = (
        "transform(sequence(0, greatest(size(toks) - 3, 0)), "
        "i -> cast(conv(substring(sha2(concat_ws(' ', slice(toks, i + 1, 3)), 256), "
        "1, 8), 16, 10) as bigint))"
    )
    # materialize the hash array BEFORE the window lambda (PERF.md 3b):
    # `slice(hs, j+1, 4)` re-evaluates its argument per window index in the
    # interpreted evaluator, so inlining hs costs O(windows x shingles)
    # sha256 calls — measured 7.8 s -> 1.3 s at sf0.01 from this barrier
    hashed = toks.select("doc_id", "lang", F.expr(hs).alias("hs")).localCheckpoint()
    fps = (
        "array_distinct(transform(sequence(0, greatest(size(hs) - 4, 0)), "
        "j -> array_min(slice(hs, j + 1, 4))))"
    )
    fp = hashed.select("doc_id", "lang", F.explode(F.expr(fps)).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("n_docs_sharing", F.count("*").over(w).cast("bigint"))
        .orderBy("doc_id", "fingerprint")
    )


@query(
    "llm_quality_repetition",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
topw AS (SELECT doc_id, MAX(c) AS top_word_n FROM wc GROUP BY doc_id),
big AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM big GROUP BY doc_id, b),
topb AS (
  SELECT doc_id, MAX(c) AS top_bigram_n,
         SUM(c) AS n_bigrams,
         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_bigram_n
  FROM bc GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_tok AS INTEGER) AS n_tokens,
       CAST(t.top_word_n AS DOUBLE) / CAST(s.n_tok AS DOUBLE) AS top_word_frac,
       CAST(b.top_bigram_n AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE) AS top_bigram_frac,
       CAST(b.dup_bigram_n AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE) AS dup_bigram_frac,
       (CAST(t.top_word_n AS DOUBLE) / CAST(s.n_tok AS DOUBLE) <= 0.2
        AND CAST(b.top_bigram_n AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE) <= 0.18) AS keep
FROM sizes s
JOIN topw t ON s.doc_id = t.doc_id
JOIN topb b ON s.doc_id = b.doc_id
ORDER BY s.doc_id
""",
    family=_FAM,
)
def llm_quality_repetition(spark, sf_dir):
    """Repetition-based quality gates (the Gopher-rule family): per doc,
    the fraction of tokens taken by the most frequent word, the top
    bigram's share, and the share of bigrams occurring twice or more;
    `keep` applies the published-style thresholds (top word <= 20%, top
    bigram <= 18%). Pure relational formulation — explode + two-level
    aggregates, fully codegen, map-side partial aggs do the heavy
    counting before any shuffle — so it runs unchanged over 100 TB of
    text. Complements llm_quality_filter's length/lang gates."""
    d = table(spark, sf_dir, "documents")
    # one scan + one split: the checkpointed token frame feeds both the
    # word-level stats (exploded) and the bigram path (PERF.md 3b)
    toks2 = fan_out(d.select("doc_id", F.split("text", " ").alias("toks"))).localCheckpoint()
    tok = toks2.select("doc_id", F.explode("toks").alias("w"))
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    topw = (
        tok.groupBy("doc_id", "w").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_word_n"))
    )
    # size guard: sequence(1, 0) is DESCENDING for 1-token docs and
    # element_at(toks, 0) raises — they contribute no bigrams (= oracle,
    # whose inner join to the bigram CTE drops them too)
    bigrams = F.expr(
        "IF(size(toks) >= 2,"
        " transform(sequence(1, size(toks) - 1),"
        "  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))),"
        " array())"
    )
    bc = (
        toks2.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b").count()
    )
    topb = bc.groupBy("doc_id").agg(
        F.max("count").alias("top_bigram_n"),
        F.sum("count").alias("n_bigrams"),
        F.sum(F.when(F.col("count") >= 2, F.col("count")).otherwise(0)).alias("dup_bigram_n"),
    )
    top_word_frac = F.col("top_word_n").cast("double") / F.col("n_tok").cast("double")
    top_bigram_frac = F.col("top_bigram_n").cast("double") / F.col("n_bigrams").cast("double")
    dup_bigram_frac = F.col("dup_bigram_n").cast("double") / F.col("n_bigrams").cast("double")
    return (
        sizes.join(topw, "doc_id").join(topb, "doc_id")
        .select(
            "doc_id",
            F.col("n_tok").cast("int").alias("n_tokens"),
            top_word_frac.alias("top_word_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            dup_bigram_frac.alias("dup_bigram_frac"),
            ((top_word_frac <= 0.2) & (top_bigram_frac <= 0.18)).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_pack_sequences",
    oracle="""
WITH t AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM t
)
SELECT lang, doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(tok_start // 2048 AS BIGINT) AS start_bin,
       CAST((tok_start + n_tokens - 1) // 2048 AS BIGINT) AS end_bin,
       CAST(tok_start % 2048 AS BIGINT) AS offset_in_bin
FROM c
ORDER BY lang, doc_id
""",
    family=_FAM,
)
def llm_pack_sequences(spark, sf_dir):
    """Sequence packing for training: concatenate each language shard's
    documents in doc_id order and cut fixed 2048-token bins; each doc
    reports its start bin, end bin (straddling allowed — the GPT-style
    packing), and offset. The cumulative token count is a running-sum
    window per shard — packing is embarrassingly parallel across shards
    (lang here; date/source buckets at 100 TB), which is what keeps the
    global-order anti-pattern out: no single-partition window, one
    shuffle by shard key."""
    d = table(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id", F.size(_toks()).alias("n_tokens"))
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        "lang", "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.col("tok_start") / 2048).cast("bigint").alias("start_bin"),
        ((F.col("tok_start") + F.col("n_tokens") - 1) / 2048).cast("bigint").alias("end_bin"),
        F.pmod(F.col("tok_start"), F.lit(2048)).cast("bigint").alias("offset_in_bin"),
    ).orderBy("lang", "doc_id")


@query(
    "llm_decontaminate",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 3),
           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4]))) AS g
  FROM toks WHERE len(l) >= 5
),
eval_sh AS (SELECT DISTINCT g FROM sh WHERE doc_id < 3),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_shared_5grams
  FROM sh s JOIN eval_sh e ON s.g = e.g
  WHERE s.doc_id >= 3
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared_5grams, 0) AS BIGINT) AS n_shared_5grams,
       (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id >= 3
ORDER BY d.doc_id
""",
    family=_FAM,
)
def llm_decontaminate(spark, sf_dir):
    """Eval-set decontamination: docs 0-2 stand in for a benchmark shard;
    every training doc (id >= 3) is flagged if it shares any word 5-gram
    with the shard, with the shared-shingle count (the published
    decontamination recipe: n-gram overlap against eval benchmarks).
    Posting-list shape: explode distinct 5-grams, broadcast the (tiny)
    eval shingle set, equi-join — at 100 TB the eval side stays a
    broadcast no matter how big training gets, so the scan stays single
    pass, shuffle-free."""
    d = table(spark, sf_dir, "documents")
    toks = fan_out(
        d.filter(F.size(_toks()) >= 5)
        .select("doc_id", F.split("text", " ").alias("toks"))
    ).localCheckpoint()
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(toks) - 4),"
            " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1),"
            " element_at(toks, i+2), element_at(toks, i+3), element_at(toks, i+4)))"
        )
    )
    sh = toks.select("doc_id", F.explode(grams).alias("g"))
    eval_sh = sh.filter(F.col("doc_id") < 3).select("g").distinct()
    hits = (
        sh.filter(F.col("doc_id") >= 3)
        .join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_5grams"))
    )
    return (
        d.filter(F.col("doc_id") >= 3)
        .select("doc_id")
        .join(hits.withColumnRenamed("doc_id", "hdoc"),
              F.col("doc_id") == F.col("hdoc"), "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_5grams", F.lit(0)).cast("bigint").alias("n_shared_5grams"),
            F.col("hdoc").isNotNull().alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_domain_mix",
    oracle="""
WITH tl AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY lang
),
m AS (SELECT MIN(total_tokens) AS min_tokens FROM tl),
rates AS (
  SELECT lang, total_tokens,
         CAST(m.min_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS rate
  FROM tl, m
),
kept AS (
  SELECT d.lang,
         COUNT(*) AS n_kept,
         CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS kept_tokens
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000) < CAST(floor(r.rate * 1000000.0) AS BIGINT)
  GROUP BY d.lang
)
SELECT r.lang, r.total_tokens, round(r.rate, 6) AS rate,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
ORDER BY r.lang
""",
    family=_FAM,
)
def llm_domain_mix(spark, sf_dir):
    """Domain/language mixing: downsample every language shard to the
    smallest shard's token budget (equal-token target mix). Per-lang
    rates are computed relationally (no driver scalars), and the keep
    decision is the deterministic md5-bucket coin from
    sample_hash_stratified — reproducible across runs and cluster
    layouts, which is what makes a data mix auditable. The integer
    floor(rate*1e6) bucket comparison avoids float-boundary flakiness
    between engines."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(_toks())
    tl = d.groupBy("lang").agg(F.sum(n_tok).cast("bigint").alias("total_tokens"))
    m = tl.agg(F.min("total_tokens").alias("min_tokens"))
    rates = tl.crossJoin(F.broadcast(m)).select(
        "lang", "total_tokens",
        (F.col("min_tokens").cast("double") / F.col("total_tokens").cast("double")).alias("rate"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000000
    )
    kept = (
        d.select("lang", "doc_id", n_tok.alias("nt"), bucket.alias("bucket"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("bucket") < F.floor(F.col("rate") * 1000000.0).cast("bigint"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("nt").cast("bigint").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang", "total_tokens",
            F.round(F.col("rate"), 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "llm_shard_assignment",
    oracle="""
WITH sh AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8))
              AS BIGINT) % 16 AS shard,
         n_chars
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM sh GROUP BY shard ORDER BY shard
""",
    family=_FAM,
)
def llm_shard_assignment(spark, sf_dir):
    """Deterministic output sharding — the writer-partitioning step of a
    training-data pipeline: shard = hash(doc_id) mod 16, reported with
    per-shard doc/char totals (the balance audit that decides whether the
    layout needs salting). Engine-portable hash: DuckDB's hash() and
    Spark's xxhash64 differ, so BOTH engines hash the same string key
    through md5 — of which we take 8 hex chars as an integer — giving an
    identical assignment everywhere (the property a persistent layout
    needs: any engine can recompute which shard a doc lives in)."""
    d = table(spark, sf_dir, "documents")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":shard"))), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(16),
    )
    return (
        d.select(shard.alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard")
    )


@query(
    "llm_split_holdout",
    oracle="""
WITH b AS (
  SELECT doc_id, lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))
              AS BIGINT) % 100 AS bucket
  FROM documents
),
labeled AS (
  SELECT CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val'
              ELSE 'test' END AS split,
         lang, n_chars
  FROM b
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM labeled
GROUP BY split, lang
ORDER BY split, lang
""",
    family=_FAM,
)
def llm_split_holdout(spark, sf_dir):
    """Deterministic train/val/test split (90/5/5) via the md5-bucket
    coin — the holdout assignment a training pipeline must be able to
    recompute from the raw corpus forever (no stored split table, no
    RNG state): bucket = md5(doc_id||':split') mod 100, identical in
    any engine. Per-(split, lang) doc/char totals are the audit the
    contamination checks start from."""
    d = table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":split"))), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "llm_pii_redact",
    oracle=f"""
WITH seeded AS (
  SELECT source,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' contact user' || doc_id || '@example.com now'
                      ELSE '' END
              || CASE WHEN doc_id % 7 = 0 THEN ' call 555-0142' ELSE '' END
           AS t
  FROM documents
),
red AS (
  SELECT source, t,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phone,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM seeded
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(COUNT(*) FILTER (WHERE n_email + n_phone > 0) AS BIGINT) AS docs_touched,
       CAST(SUM(len(clean)) AS BIGINT) AS clean_chars
FROM red GROUP BY source ORDER BY source
""",
    family=_FAM,
)
def llm_pii_redact(spark, sf_dir):
    """PII redaction — the compliance pass every training-data pipeline
    runs before anything else. The synthetic corpus carries no organic
    PII, so a deterministic seeding step (doc_id-keyed email/phone
    suffixes, identical formula on both engines) plants known positives
    first; the redactor then regexp-counts and regexp-replaces emails
    and phone numbers and reports per-source hit counts plus the total
    redacted-text length (which pins the replacement output itself, not
    just the counts). Patterns stay in the Java-regex/RE2 common subset
    so both engines match identical spans. Pure per-row JVM string ops:
    embarrassingly parallel, no shuffle until the final small
    aggregate — the 100 TB plan is scan -> project -> partial agg."""
    d = table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-0142")).otherwise(F.lit("")),
    )
    t = d.select("source", seeded.alias("t"))
    red = t.select(
        "source",
        F.regexp_count("t", F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count("t", F.lit(_PHONE_RE)).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails_redacted"),
            F.sum("n_phone").cast("bigint").alias("phones_redacted"),
            F.count_if(F.col("n_email") + F.col("n_phone") > 0)
            .cast("bigint")
            .alias("docs_touched"),
            F.sum(F.length("clean")).cast("bigint").alias("clean_chars"),
        )
        .orderBy("source")
    )


@query(
    "llm_chunk_split",
    oracle="""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
spans AS (
  SELECT doc_id, toks, n,
         (GREATEST(0, n - 32) + 23) // 24 + 1 AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, n_chunks)) AS chunk_id,
         toks, n
  FROM spans
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT)
         AS n_tokens,
       md5(array_to_string(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32),
                           ' ')) AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_id
""",
    family=_FAM,
)
def llm_chunk_split(spark, sf_dir):
    """Sliding-window document chunking (size 32 tokens, stride 24,
    overlap 8) — the context-window packing precursor: every RAG index
    and pretraining tokenizer shards long documents this way. Chunk
    count is computed with non-negative integer arithmetic only
    (GREATEST(0, n-32) guard), because floored vs truncated negative
    division differs between engines; each chunk row carries its token
    count and an md5 of the joined chunk text, so the oracle pins exact
    chunk boundaries and content, not just counts. The explode
    duplicates only (doc_id, array-ref) per chunk — at 100 TB the
    overlap factor (~1.33x here) is the only data amplification, and
    chunk rows inherit the document partitioning (no shuffle at all:
    scan -> generate -> project)."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    spans = base.withColumn(
        "n_chunks",
        F.expr("(GREATEST(0, n - 32) + 23) div 24 + 1"),
    )
    chunks = spans.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id"),
        "toks",
    )
    sl = F.expr("slice(toks, chunk_id * 24 + 1, 32)")
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(sl).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(sl, " ").cast("binary")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "llm_quality_gopher",
    oracle="""
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS words, text FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(words) AS n_words,
         length(replace(text, ' ', '')) AS n_word_chars,
         len(list_filter(words, x -> regexp_full_match(x, '[a-z]+'))) AS n_alpha,
         len(list_intersect(list_distinct(words),
                            ['the','a','of','and','to','in'])) AS n_stop
  FROM w
)
SELECT doc_id, lang,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_word_chars AS DOUBLE) / n_words AS mean_word_len,
       CAST(n_alpha AS DOUBLE) / n_words AS frac_alpha,
       CAST(n_stop AS INTEGER) AS n_stopword_hits,
       (n_words BETWEEN 50 AND 100000) AS words_ok,
       (CAST(n_word_chars AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0) AS wordlen_ok,
       (CAST(n_alpha AS DOUBLE) / n_words >= 0.8) AS alpha_ok,
       (n_stop >= 2) AS stopwords_ok,
       ((n_words BETWEEN 50 AND 100000)
        AND (CAST(n_word_chars AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
        AND (CAST(n_alpha AS DOUBLE) / n_words >= 0.8)
        AND n_stop >= 2) AS keep
FROM m
""",
    family=_FAM,
)
def llm_quality_gopher(spark, sf_dir):
    """Gopher-style document quality battery (Rae et al. 2021 §A1.1, the
    non-repetition rules — the repetition family lives in
    llm_quality_repetition): word-count bounds, mean word length in
    [3,10], >=80% alphabetic words, and >=2 distinct English stopwords
    present. Emits the raw metrics plus per-rule booleans and the final
    keep decision, so downstream mixes can re-threshold without a
    rescan.

    Scale notes: everything is a per-row projection — no shuffle at all;
    the only divisions are single IEEE ops over exact integer counts, so
    doubles hash-match the oracle. The token array is materialized once
    (localCheckpoint) before the higher-order filter, since interpreted
    lambdas re-evaluate referenced expressions per element (PERF.md 2b)."""
    d = table(spark, sf_dir, "documents")
    w = fan_out(
        d.select("doc_id", "lang", "text", F.split("text", " ").alias("words"))
    ).localCheckpoint()
    m = w.select(
        "doc_id", "lang",
        F.size("words").alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_word_chars"),
        F.size(F.filter("words", lambda x: x.rlike("^[a-z]+$"))).alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct("words"),
                F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "to", "in"]]),
            )
        ).alias("n_stop"),
    )
    n_w = F.col("n_words")
    mean_wl = F.col("n_word_chars").cast("double") / n_w
    frac_alpha = F.col("n_alpha").cast("double") / n_w
    words_ok = n_w.between(50, 100000)
    wordlen_ok = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    alpha_ok = frac_alpha >= 0.8
    stop_ok = F.col("n_stop") >= 2
    return m.select(
        "doc_id", "lang",
        n_w.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha"),
        F.col("n_stop").cast("int").alias("n_stopword_hits"),
        words_ok.alias("words_ok"),
        wordlen_ok.alias("wordlen_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stopwords_ok"),
        (words_ok & wordlen_ok & alpha_ok & stop_ok).alias("keep"),
    )


@query(
    "llm_corpus_summary",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, source, len(string_split(text, ' ')) AS n_tok,
         md5(text) AS h
  FROM documents
),
top_lang AS (
  SELECT lang FROM tok GROUP BY lang
  ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS mean_doc_tokens,
       CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dup_docs,
       CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS exact_dup_rate,
       (SELECT lang FROM top_lang) AS top_lang
FROM tok
""",
    family=_FAM,
)
def llm_corpus_summary(spark, sf_dir):
    """Dataset datasheet (the 'datasets card' summary block): corpus
    cardinalities, token totals, exact-duplicate rate (docs beyond the
    first per content hash), and the dominant language — the one-row
    report a training-data pipeline publishes per snapshot.

    Scale: one scan computes every metric — counts, distincts and token
    sums ride a single aggregate; the dominant language is a tiny
    count-then-rank (deterministic lang tiebreak) broadcast-joined onto
    the one-row summary. No collect, no second pass over text."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    summary = tok.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        (F.sum("n_tok").cast("double") / F.count("*")).alias("mean_doc_tokens"),
        (F.count("*") - F.countDistinct("h")).cast("bigint").alias(
            "n_exact_dup_docs"
        ),
        (
            (F.count("*") - F.countDistinct("h")).cast("double") / F.count("*")
        ).alias("exact_dup_rate"),
    )
    top = (
        tok.groupBy("lang")
        .count()
        .orderBy(F.col("count").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    return summary.crossJoin(F.broadcast(top))


@query(
    "llm_lm_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
lm AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
total AS (SELECT SUM(cnt) AS t FROM lm),
scored AS (
  SELECT tok.doc_id,
         COUNT(*) AS n_tokens,
         SUM(CAST(round(-ln((CAST(lm.cnt AS DOUBLE) + 1.0)
                            / (CAST(total.t AS DOUBLE) + CAST(vocab.v AS DOUBLE)))
                        * 1000000.0) AS BIGINT)) AS nll_micro
  FROM tok
  JOIN lm ON lm.w = tok.w
  CROSS JOIN total CROSS JOIN vocab
  GROUP BY tok.doc_id
),
thresh AS (
  SELECT (CAST(CAST(SUM(CAST(CAST(nll_micro AS DOUBLE) / n_tokens
                             AS DECIMAL(38,8))) * 100000000 AS DECIMAL(38,0))
               AS DOUBLE) / 100000000.0) / COUNT(*) AS mean_of_means
  FROM scored
)
SELECT s.doc_id,
       CAST(s.n_tokens AS INTEGER) AS n_tokens,
       CAST(s.nll_micro AS BIGINT) AS nll_micro,
       CAST(s.nll_micro AS DOUBLE) / s.n_tokens AS mean_nll_micro,
       (CAST(s.nll_micro AS DOUBLE) / s.n_tokens <= t.mean_of_means)
         AS keep_fluent
FROM scored s CROSS JOIN thresh t
""",
    family=_FAM,
)
def llm_lm_score(spark, sf_dir):
    """CCNet-style LM quality scoring: a corpus-learned unigram language
    model (add-one smoothing) scores each document by mean negative
    log-likelihood per token — low = fluent/common, high = noise — and
    docs at or below the corpus mean-of-means are flagged keep. The
    LM-filtering stage of the CCNet/RefinedWeb pipelines, with the LM
    itself built relationally in the same plan.

    Determinism: the score stays in the LOG domain (no exp(): libm
    exp/pow rounding is engine-specific) and each token's -ln p is
    quantized to integer micro-units BEFORE summing, so per-doc sums
    are order-independent; per-doc means are one IEEE division and the
    keep threshold rides the decimal-exact mean-of-means. Scale: the LM
    is vocabulary-sized, and vocab grows with the corpus (Heaps' law) —
    so the token->LM join is an UNHINTED shuffle equi-join on the word
    (both sides come off the same shuffle key; AQE may still build-side
    a genuinely small LM at runtime). Only the single-row token total is
    broadcast. The token stream shuffles once for the per-doc aggregate."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("w"))
    v = corpus_stats.vocab_size(spark, sf_dir)  # cached corpus stat (stats.py)
    lm = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    t = lm.agg(F.sum("cnt").alias("t"))
    scored = (
        tok.join(lm, "w")
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.round(
                    -F.log(
                        (F.col("cnt").cast("double") + 1.0)
                        / (F.col("t").cast("double") + float(v))
                    )
                    * 1000000.0
                ).cast("bigint")
            ).alias("nll_micro"),
        )
    )
    mean_nll = F.col("nll_micro").cast("double") / F.col("n_tokens")
    from hdfs_mr_spark.exprs import davg

    thresh = scored.agg(davg(mean_nll, 8).alias("mean_of_means"))
    return (
        scored.crossJoin(F.broadcast(thresh))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("nll_micro").cast("bigint").alias("nll_micro"),
            mean_nll.alias("mean_nll_micro"),
            (mean_nll <= F.col("mean_of_means")).alias("keep_fluent"),
        )
    )


@query(
    "llm_global_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id || ':shuffle:42'), 1, 12))::BIGINT
           AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key ASC, doc_id ASC)
            AS BIGINT) AS shuffle_pos
FROM keyed
""",
    family=_FAM,
)
def llm_global_shuffle(spark, sf_dir):
    """Deterministic global corpus shuffle (the pre-training-order
    shuffle before sequence packing): each doc gets a seeded md5 shuffle
    key — random-looking but exactly reproducible in any engine, unlike
    rand() — and its global shuffle position is materialized.

    Scale: the position comes from the distributed TeraSort-style rank
    (bucketed_global_rank: per-bucket row_number + cumulative offsets),
    NEVER an unpartitioned row_number window — the md5 key is uniform,
    so fixed high-bit buckets are balanced by construction, no sampling
    pass needed. Reshuffling for a new epoch is a salt change, not a
    data move."""
    from hdfs_mr_spark.operators.sorts import bucketed_global_rank

    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.expr(
            "CAST(conv(substr(md5(concat(doc_id, ':shuffle:42')), 1, 12),"
            " 16, 10) AS BIGINT)"
        ).alias("shuffle_key"),
    )
    # 48-bit uniform key: top 4 bits give 16 balanced, order-aligned buckets
    bucket = F.expr("CAST(shuffle_key DIV 17592186044416 AS BIGINT)")
    return bucketed_global_rank(
        keyed,
        bucket,
        [F.col("shuffle_key").asc(), F.col("doc_id").asc()],
        ["doc_id", "shuffle_key"],
        "shuffle_pos",
    )


@query(
    "llm_sample_temperature",
    oracle="""
WITH tl AS (
  SELECT lang, SUM(len(string_split(text, ' '))) AS total_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT SUM(total_tokens) AS corpus_tokens FROM tl),
w AS (
  SELECT lang, total_tokens,
         sqrt(CAST(total_tokens AS DOUBLE) / corpus_tokens) AS wt
  FROM tl CROSS JOIN tot
),
mx AS (SELECT MAX(wt) AS max_wt FROM w),
rates AS (
  SELECT lang, total_tokens,
         CAST(floor(wt / max_wt * 1000000.0) AS BIGINT) AS rate_micro
  FROM w CROSS JOIN mx
),
kept AS (
  SELECT d.lang,
         COUNT(*) AS n_kept,
         SUM(len(string_split(d.text, ' '))) AS kept_tokens
  FROM documents d
  JOIN rates r ON r.lang = d.lang
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 1000000 < r.rate_micro
  GROUP BY d.lang
)
SELECT r.lang,
       CAST(r.total_tokens AS BIGINT) AS total_tokens,
       r.rate_micro,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k ON k.lang = r.lang
ORDER BY r.lang
""",
    family=_FAM,
)
def llm_sample_temperature(spark, sf_dir):
    """Temperature-scaled language sampling (the Gopher/LLaMA T=2 mix:
    sample each language proportionally to share^(1/T) = sqrt(share),
    normalized so the largest language keeps everything) — upsamples the
    tail relative to proportional sampling without the fixed equal-token
    floor of llm_domain_mix. Rates are derived relationally and the
    keep decision is the md5-bucket integer coin.

    Determinism: sqrt is IEEE-754 correctly rounded — the ONE libm-free
    transcendental — so both engines compute bit-identical weights from
    bit-identical shares; floor(w/max_w * 1e6) then quantizes identical
    doubles to identical integers (pow(x, 0.7)-style temperatures are
    NOT portable; 1/T = 0.5 is chosen exactly because sqrt is). Scale:
    two tiny broadcast rate frames; the corpus is scanned once, no
    shuffle beyond the per-lang token sums."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(_toks())
    tl = d.groupBy("lang").agg(F.sum(n_tok).cast("bigint").alias("total_tokens"))
    tot = tl.agg(F.sum("total_tokens").alias("corpus_tokens"))
    w = tl.crossJoin(F.broadcast(tot)).select(
        "lang", "total_tokens",
        F.sqrt(
            F.col("total_tokens").cast("double") / F.col("corpus_tokens")
        ).alias("wt"),
    )
    mx = w.agg(F.max("wt").alias("max_wt"))
    rates = w.crossJoin(F.broadcast(mx)).select(
        "lang", "total_tokens",
        F.floor(F.col("wt") / F.col("max_wt") * 1000000.0)
        .cast("bigint").alias("rate_micro"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000000
    )
    kept = (
        d.select("lang", n_tok.alias("nt"), bucket.alias("bucket"))
        .join(F.broadcast(rates.select("lang", "rate_micro")), "lang")
        .filter(F.col("bucket") < F.col("rate_micro"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("nt").cast("bigint").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            "rate_micro",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "llm_bpe_pair_counts",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
pairs AS (
  SELECT w, freq, unnest(list_transform(range(1, length(w)),
                         i -> substr(w, i, 2))) AS pair
  FROM wc WHERE length(w) >= 2
),
pc AS (SELECT pair, SUM(freq) AS n FROM pairs GROUP BY pair)
SELECT pair, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INTEGER) AS merge_rank
FROM pc
QUALIFY merge_rank <= 20
ORDER BY merge_rank
""",
    family=_FAM,
)
def llm_bpe_pair_counts(spark, sf_dir):
    """BPE merge-table statistics (the first merge round of byte-pair
    encoding, Sennrich et al.): count adjacent character pairs across
    the corpus — weighted by word frequency, the exact quantity the BPE
    trainer maximizes — and rank the top-20 merge candidates. The full
    trainer iterates this (merge top pair, recount); one round exposes
    the core aggregate, and the iteration composes exactly like
    mr_pagerank's rounds.

    Scale: pair generation runs on the WORD-FREQUENCY table, not the
    token stream — the corpus collapses to its vocabulary before any
    per-character work (|vocab| << corpus, the trick that makes BPE
    training feasible at all); the tiny top-20 rank is a 20-row window.
    Pure integer counts, no float anywhere. The one unpartitioned
    window ranks the PAIR-COUNT relation, whose cardinality is
    bounded by alphabet^2 (~676), not by data volume — the same
    bounded-frame exemption as the dedup vocabulary dictionary."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(_toks()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = wc.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
    )
    pc = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        pc.withColumn("merge_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("merge_rank") <= 20)
        .orderBy("merge_rank")
    )


@query(
    "llm_readability",
    oracle="""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent
  FROM documents
),
sc AS (
  SELECT doc_id, n_words, n_syll, n_sent,
         CAST(round((206.835
            - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
            - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)))
            * 1000.0) AS BIGINT) AS score_milli
  FROM s WHERE n_words > 0
)
SELECT CAST(floor(CAST(score_milli AS DOUBLE) / 10000.0) AS BIGINT) AS bucket10,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli,
       CAST(MIN(score_milli) AS BIGINT) AS min_score_milli,
       CAST(MAX(score_milli) AS BIGINT) AS max_score_milli
FROM sc GROUP BY 1 ORDER BY 1
""",
    family=_FAM,
    tags=("ordered",),
)
def llm_readability(spark, sf_dir):
    """Flesch reading-ease scoring — the classic readability gate used
    to stratify pretraining corpora by difficulty. Words and syllables
    are regex-counted JVM-side (letter runs and vowel-group runs — the
    standard cheap syllable estimator), sentences by terminal-
    punctuation runs with a floor of 1. The per-doc score is one
    fixed-shape IEEE expression quantized to milli-units, then the
    corpus ships as a 10-point histogram with count/sum/min/max per
    bucket — integer-exact aggregates over the quantized score, so the
    hash pins the full distribution, not just the mean. Scale: pure
    per-row map + one combiner-shape aggregate over ~60 buckets; no
    join, no window, nothing leaves the scan stage but bucket
    partials."""
    d = table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias(
            "n_words"
        ),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).alias(
            "n_syll"
        ),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("n_sent"),
    ).filter(F.col("n_words") > 0)
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sent").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
    )
    sc = s.select(
        (F.round(score * 1000.0)).cast("bigint").alias("score_milli")
    )
    return (
        sc.groupBy(
            F.floor(F.col("score_milli").cast("double") / 10000.0)
            .cast("bigint")
            .alias("bucket10")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("score_milli").cast("bigint").alias("sum_score_milli"),
            F.min("score_milli").cast("bigint").alias("min_score_milli"),
            F.max("score_milli").cast("bigint").alias("max_score_milli"),
        )
        .orderBy("bucket10")
    )


@query(
    "llm_zipf_slope",
    oracle="""
WITH wc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
top AS (SELECT w, c FROM wc ORDER BY c DESC, w ASC LIMIT 100),
rk AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS rnk
  FROM top
),
xy AS (
  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
  FROM rk
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS sxy_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS sxx_den,
       CAST(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
            / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
            AS DOUBLE) AS zipf_slope
FROM xy
""",
    family=_FAM,
)
def llm_zipf_slope(spark, sf_dir):
    """Zipf-law slope of the corpus vocabulary: OLS fit of log(freq)
    against log(rank) over the top-100 tokens — natural text sits near
    slope -1, and deviation is a cheap corpus-health signal (template
    spam flattens the head, boilerplate dedup failures steepen it).
    The top-100 head is a TakeOrderedAndProject (per-partition top-k
    merge, never a global sort); ranking the 100 survivors is a
    single-partition window over exactly 100 rows — bounded by the
    constant k, not the corpus, so it is scale-safe the same way the
    <=31-row vocab window in llm_dedup is. Both lns are quantized to
    integer micro-units per point (the llm_lang_id portability rule)
    and the slope is assembled from exact integer moment sums; the raw
    numerator/denominator ship next to the readable double so the hash
    pins the exact arithmetic."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    top = wc.orderBy(F.col("c").desc(), F.col("w").asc()).limit(100)
    rk = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
        .cast("bigint")
        .alias("rnk"),
    )
    xy = rk.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000000.0)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1000000.0)
        .cast("bigint")
        .alias("y"),
    )
    n = F.count("*")
    sxy = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
    sxx = n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    return xy.agg(
        n.cast("bigint").alias("n_points"),
        sxy.cast("bigint").alias("sxy_num"),
        sxx.cast("bigint").alias("sxx_den"),
        (sxy.cast("double") / sxx.cast("double")).alias("zipf_slope"),
    )


@query(
    "llm_lm_score_bigram",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
big AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM tok, LATERAL unnest(range(1, len(l))) AS u(i)
),
train_uni AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT doc_id, unnest(l) AS w FROM tok WHERE doc_id % 2 = 0
  ) GROUP BY w
),
train_big AS (
  SELECT w1, w2, COUNT(*) AS cnt FROM big WHERE doc_id % 2 = 0 GROUP BY w1, w2
),
tv AS (
  SELECT SUM(cnt) AS t, COUNT(*) AS v FROM train_uni
),
scored AS (
  SELECT b.doc_id,
         COUNT(*) AS n_transitions,
         SUM(CAST(round(-ln(
           CASE WHEN tb.cnt IS NOT NULL
                THEN CAST(tb.cnt AS DOUBLE) / CAST(u1.cnt AS DOUBLE)
                ELSE 0.4 * (CAST(COALESCE(u2.cnt, 0) AS DOUBLE) + 1.0)
                     / (CAST(tv.t AS DOUBLE) + CAST(tv.v AS DOUBLE))
           END) * 1000000.0) AS BIGINT)) AS nll_micro,
         SUM(CASE WHEN tb.cnt IS NULL THEN 1 ELSE 0 END) AS n_backoff
  FROM big b
  LEFT JOIN train_big tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
  LEFT JOIN train_uni u1 ON b.w1 = u1.w
  LEFT JOIN train_uni u2 ON b.w2 = u2.w
  CROSS JOIN tv
  GROUP BY b.doc_id
)
SELECT doc_id,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(nll_micro AS BIGINT) AS nll_micro,
       CAST(nll_micro AS DOUBLE) / n_transitions AS mean_nll_micro,
       CAST(n_backoff AS BIGINT) AS n_backoff,
       doc_id % 2 = 0 AS in_train
FROM scored
""",
    family=_FAM,
)
def llm_lm_score_bigram(spark, sf_dir):
    """Bigram LM scoring with stupid backoff — the CCNet refinement over
    :func:`llm_lm_score`'s unigram model: the LM trains on HALF the
    corpus (even doc_id = the blessed reference set, the
    Wikipedia-trains / CommonCrawl-scores shape) and scores EVERY doc's
    transitions, so held-out docs genuinely hit the backoff path
    (P = C(w1,w2)/C(w1) when the bigram was seen in training, else
    0.4 * (C(w2)+1)/(T+V) — Brants et al.'s stupid backoff with add-one
    smoothing on the unigram fallback). n_backoff per doc doubles as an
    out-of-domain signal.

    Determinism: same discipline as the unigram scorer — log domain
    only, each transition's -ln p quantized to integer micro-units
    before the order-independent sum. Scale: bigram and unigram tables
    grow with the corpus (vocab^2 worst case), so ALL THREE LM joins
    are unhinted shuffle equi-joins — no broadcast anywhere; T and V
    enter as ONE broadcast 1-row aggregate (no driver scalar — the
    whole query is a single lazy plan, VERDICT r7 item 5).

    r10 (VERDICT r9 item 7 — heaviest non-streaming Zipf op at 9.1 s):
    MEASURED before restructuring, per the advice. The ablation on the
    90k-vocab stress corpus (warm, noop sink): baseline 9.9 s;
    fan_out on the token frame alone 3.3 s; the suggested
    collapse-to-transition-counts rewrite (score each distinct (w1,w2)
    type once, join back) 6.2 s — SLOWER than fan_out-only, because
    bigram types rarely repeat within a doc (perdoc counts ≈
    instances) and the distinct + join-back add two instance-scale
    shuffles while the three model joins they replace were never the
    bottleneck. The actual defect was parallelism: the documents scan
    is 2 source partitions, so the explode + three join map sides ran
    on 2 of 32 cores. Kept: the original one-pass join shape + fan_out
    (3.3 s, beats the <=6 s target; hashes unchanged)."""
    d = table(spark, sf_dir, "documents")
    tok = fan_out(d.select("doc_id", _toks().alias("l"))).localCheckpoint()
    big = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(l) >= 2,"
                " transform(sequence(1, size(l) - 1),"
                "  i -> struct(element_at(l, i) AS w1, element_at(l, i+1) AS w2)),"
                " array())"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    train_tok = tok.filter(F.col("doc_id") % 2 == 0).select(
        F.explode("l").alias("w")
    )
    train_uni = train_tok.groupBy("w").agg(
        F.count("*").alias("ucnt")
    ).localCheckpoint()
    train_big = (
        big.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("bcnt"))
    )
    tv = train_uni.agg(
        (F.sum("ucnt") + F.count("*")).cast("double").alias("tv_denom")
    )
    u1 = train_uni.select(F.col("w").alias("w1"), F.col("ucnt").alias("u1cnt"))
    u2 = train_uni.select(F.col("w").alias("w2"), F.col("ucnt").alias("u2cnt"))
    p = F.when(
        F.col("bcnt").isNotNull(),
        F.col("bcnt").cast("double") / F.col("u1cnt").cast("double"),
    ).otherwise(
        0.4 * (F.coalesce(F.col("u2cnt"), F.lit(0)).cast("double") + 1.0)
        / F.col("tv_denom")
    )
    scored = (
        big.join(train_big, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(tv))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.sum(F.round(-F.log(p) * 1000000.0).cast("bigint")).alias("nll_micro"),
            F.sum(F.when(F.col("bcnt").isNull(), 1).otherwise(0)).alias("n_backoff"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.col("nll_micro").cast("bigint").alias("nll_micro"),
        (F.col("nll_micro").cast("double") / F.col("n_transitions")).alias(
            "mean_nll_micro"
        ),
        F.col("n_backoff").cast("bigint").alias("n_backoff"),
        (F.col("doc_id") % 2 == 0).alias("in_train"),
    )


@query(
    "llm_quality_ensemble",
    oracle="""
WITH feat AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tok,
         n_chars,
         (SELECT AVG(len(w)) FROM unnest(string_split(text, ' ')) AS t(w))
           AS mean_word_len,
         len(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1] || ' '
                    || string_split(text, ' ')[i+2])))
           AS n_dist_tri,
         greatest(len(string_split(text, ' ')) - 2, 0) AS n_tri
  FROM documents
),
flagged AS (
  SELECT doc_id,
         n_tok < 15 AS fail_short,
         n_chars > 500 AS fail_long,
         lang NOT IN ('en', 'de', 'fr', 'es') AS fail_lang,
         mean_word_len < 3.0 OR mean_word_len > 12.0 AS fail_word_len,
         n_tri > 0 AND (1.0 - CAST(n_dist_tri AS DOUBLE) / n_tri) > 0.3
           AS fail_repetition
  FROM feat
)
SELECT doc_id, fail_short, fail_long, fail_lang, fail_word_len,
       fail_repetition,
       NOT (fail_short OR fail_long OR fail_lang OR fail_word_len
            OR fail_repetition) AS kept,
       CASE WHEN fail_short THEN 'short'
            WHEN fail_long THEN 'long'
            WHEN fail_lang THEN 'lang'
            WHEN fail_word_len THEN 'word_len'
            WHEN fail_repetition THEN 'repetition'
       END AS first_fail
FROM flagged
ORDER BY doc_id
""",
    family=_FAM,
)
def llm_quality_ensemble(spark, sf_dir):
    """Quality-filter ENSEMBLE with per-rule attribution — the artifact a
    curation pipeline actually ships: every doc gets all five rule
    verdicts (C4 length/language gates + two Gopher signals: mean word
    length band, duplicate-trigram fraction), the combined keep bit, and
    `first_fail` = the first rule in pipeline order that killed it (NULL
    if kept), which is what makes filter-funnel dashboards and rule
    ablations possible downstream. All JVM expressions; the token array
    is bound as a materialized column BEFORE the shingle lambda (PERF.md
    §2b — `element_at(split(text), i)` inside transform re-runs the full
    split per shingle index, measured ~8x on this query at sf0.1); the
    decision stays replayable because every threshold is in the output
    schema, not hidden in code."""
    d = fan_out(
        table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars", F.split("text", " ").alias("toks")
        )
    ).localCheckpoint()
    toks = F.col("toks")
    n_tok = F.size(toks)
    mean_wl = F.expr(
        "aggregate(transform(toks, w -> length(w)),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    ).cast("double") / n_tok.cast("double")
    n_tri = F.greatest(n_tok - 2, F.lit(0))
    n_dist_tri = F.size(
        F.array_distinct(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 2, 1)),"
                " i -> concat_ws(' ', element_at(toks, i),"
                " element_at(toks, i+1),"
                " element_at(toks, i+2)))"
            )
        )
    )
    feat = d.select(
        "doc_id",
        (n_tok < 15).alias("fail_short"),
        (F.col("n_chars") > 500).alias("fail_long"),
        (~F.col("lang").isin("en", "de", "fr", "es")).alias("fail_lang"),
        ((mean_wl < 3.0) | (mean_wl > 12.0)).alias("fail_word_len"),
        (
            (n_tri > 0)
            & ((1.0 - n_dist_tri.cast("double") / n_tri.cast("double")) > 0.3)
        ).alias("fail_repetition"),
    )
    any_fail = (
        F.col("fail_short") | F.col("fail_long") | F.col("fail_lang")
        | F.col("fail_word_len") | F.col("fail_repetition")
    )
    return feat.select(
        "*",
        (~any_fail).alias("kept"),
        F.when(F.col("fail_short"), "short")
        .when(F.col("fail_long"), "long")
        .when(F.col("fail_lang"), "lang")
        .when(F.col("fail_word_len"), "word_len")
        .when(F.col("fail_repetition"), "repetition")
        .alias("first_fail"),
    ).orderBy("doc_id")


@query(
    "llm_ngram_novelty",
    oracle="""
WITH tri AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(l) - 1),
           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d
),
first_seen AS (
  SELECT g, MIN(doc_id) AS fd FROM tri GROUP BY g
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tri,
       CAST(COUNT(*) FILTER (WHERE f.fd = t.doc_id) AS BIGINT) AS n_novel,
       CAST(COUNT(*) FILTER (WHERE f.fd = t.doc_id) AS DOUBLE) / COUNT(*)
         AS novelty_frac
FROM tri t JOIN first_seen f ON t.g = f.g
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    family=_FAM,
)
def llm_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty in arrival order (doc_id = ingest
    sequence): what fraction of a doc's distinct trigrams has NO earlier
    occurrence in the corpus. The curation signal behind dataset
    ordering and dedup-priority decisions — a feed whose novelty curve
    collapses is re-crawling itself; a doc with near-zero novelty is
    boilerplate even if no single pair-level duplicate exists.

    Shape: trigram -> MIN(doc_id) first-occurrence table (combiner-shape
    aggregate), then one unhinted shuffle equi-join back on the trigram
    (the first-occurrence table is corpus-sized — the same
    never-broadcast rule as tf-idf's df table) and a per-doc conditional
    aggregate. No windows, no global sort beyond presentation; both
    shuffles key on the trigram. The token array is bound as a
    materialized column before the shingle lambda (PERF.md §2b — the
    nested `element_at(split(text), i)` form re-runs the split per
    shingle index, ~8x on this query at sf0.1); tri is checkpointed
    because both the first-seen aggregate and the join probe consume
    it."""
    d = table(spark, sf_dir, "documents")
    toks = fan_out(
        d.select("doc_id", F.split("text", " ").alias("toks"))
    ).localCheckpoint()
    tri = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "IF(size(toks) >= 3,"
                    " transform(sequence(1, size(toks) - 2),"
                    "  i -> concat_ws(' ', element_at(toks, i),"
                    "  element_at(toks, i+1),"
                    "  element_at(toks, i+2))),"
                    " array())"
                )
            )
        ).alias("g"),
    )
    first_seen = tri.groupBy("g").agg(F.min("doc_id").alias("fd"))
    return (
        tri.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_tri"),
            F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id", "n_distinct_tri", "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_distinct_tri"))
            .alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_preference_pairs",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
lm AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
total AS (SELECT SUM(cnt) AS t FROM lm),
scored AS (
  SELECT tok.doc_id,
         SUM(CAST(round(-ln((CAST(lm.cnt AS DOUBLE) + 1.0)
                            / (CAST(total.t AS DOUBLE) + CAST(vocab.v AS DOUBLE)))
                        * 1000000.0) AS BIGINT)) AS nll_micro,
         COUNT(*) AS n_tokens
  FROM tok JOIN lm ON lm.w = tok.w CROSS JOIN total CROSS JOIN vocab
  GROUP BY tok.doc_id
),
ranked AS (
  SELECT d.lang, s.doc_id,
         CAST(s.nll_micro AS DOUBLE) / s.n_tokens AS fluency_nll,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY CAST(s.nll_micro AS DOUBLE) / s.n_tokens ASC,
                                     s.doc_id ASC) AS rk
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT a.lang,
       a.doc_id AS chosen_doc,
       b.doc_id AS rejected_doc,
       a.fluency_nll AS chosen_nll,
       b.fluency_nll AS rejected_nll,
       b.fluency_nll - a.fluency_nll AS nll_gap
FROM ranked a JOIN ranked b ON a.lang = b.lang AND b.rk = a.rk + 1
ORDER BY a.lang, a.rk
""",
    family=_FAM,
)
def llm_preference_pairs(spark, sf_dir):
    """Preference-pair construction for reward-model / DPO training
    prep: docs ranked within language by unigram-LM fluency (same
    scorer as llm_lm_score, integer-micro NLL), then ADJACENT ranks
    paired as (chosen = more fluent, rejected = next) — adjacent
    pairing is the standard recipe when converting a scalar judge
    into pairwise data because it maximizes pair count while keeping
    margins honest (no trivially-easy far pairs dominating the loss).
    nll_gap ships with each pair so a trainer can curriculum-filter on
    margin. Deterministic: the rank's (score, doc_id) tiebreak makes
    the pairing total.

    Scale: LM join is the unhinted vocab-scale equi-join (never
    broadcast); ranking is one window per lang partition; pairing is a
    self-join on (lang, rk+1) — two lang-keyed shuffles of doc-level
    (not token-level) rows."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("w"))
    v = corpus_stats.vocab_size(spark, sf_dir)  # cached corpus stat
    lm = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    t = lm.agg(F.sum("cnt").alias("t"))
    scored = (
        tok.join(lm, "w")
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(
                    -F.log(
                        (F.col("cnt").cast("double") + 1.0)
                        / (F.col("t").cast("double") + float(v))
                    )
                    * 1000000.0
                ).cast("bigint")
            ).alias("nll_micro"),
            F.count("*").alias("n_tokens"),
        )
    )
    fluency = F.col("nll_micro").cast("double") / F.col("n_tokens")
    ranked = (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .select("lang", "doc_id", fluency.alias("fluency_nll"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("fluency_nll").asc(), F.col("doc_id").asc()
                )
            ),
        )
    )
    a = ranked.select(
        "lang", F.col("doc_id").alias("chosen_doc"),
        F.col("fluency_nll").alias("chosen_nll"), F.col("rk").alias("rka"),
    )
    b = ranked.select(
        F.col("lang").alias("lang_b"), F.col("doc_id").alias("rejected_doc"),
        F.col("fluency_nll").alias("rejected_nll"), F.col("rk").alias("rkb"),
    )
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b")) & (F.col("rkb") == F.col("rka") + 1),
        )
        .select(
            "lang", "chosen_doc", "rejected_doc", "chosen_nll", "rejected_nll",
            (F.col("rejected_nll") - F.col("chosen_nll")).alias("nll_gap"),
        )
        .orderBy("lang", "chosen_doc")
    )


@query(
    "llm_watermark_detect",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
pairs AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(l[i] || ':wm:' || l[i + 1]), 1, 12))::BIGINT
                   % 2 = 0
              THEN 1 ELSE 0 END AS green
  FROM tok, LATERAL unnest(range(1, len(l))) AS u(i)
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_scored, SUM(green) AS n_green
  FROM pairs GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_scored AS BIGINT) AS n_scored,
       CAST(n_green AS BIGINT) AS n_green,
       CAST(n_green AS DOUBLE) / n_scored AS green_frac,
       (CAST(n_green AS DOUBLE) - 0.5 * n_scored) / sqrt(0.25 * n_scored) AS z,
       (CAST(n_green AS DOUBLE) - 0.5 * n_scored) / sqrt(0.25 * n_scored) > 4.0
         AS watermark_suspect
FROM agg
ORDER BY doc_id
""",
    family=_FAM,
)
def llm_watermark_detect(spark, sf_dir):
    """Green-list watermark detection (Kirchenbauer et al. 2023) — the
    synthetic-text hygiene gate a pretraining corpus increasingly
    needs: a watermarking LLM biases each token toward a pseudorandom
    "green list" seeded by the previous token, so detection is pure
    counting — hash(prev, token) parity marks green, and a one-sided
    z-test against the null green-rate 0.5 flags documents whose
    fraction is inexplicably high (z > 4 ~ p < 3e-5). Human text sits
    at z ~ 0 (the oracle hash-checks the whole z column, so the
    statistic itself is verified, not just the flags).

    Determinism: the green decision is the engine-common 48-bit md5
    fold (same idiom as the CMS sketch / global shuffle); the z
    arithmetic is a fixed-shape IEEE expression on two integers. One
    explode + one combiner-shape aggregate — token pairs never
    shuffle; only (doc, 2 counters) rows do. The token array is bound
    as a materialized column before the pair lambda (PERF.md §2b —
    the nested element_at(split) form re-ran the split per index)."""
    d = table(spark, sf_dir, "documents")
    toks = fan_out(
        d.select("doc_id", F.split("text", " ").alias("toks"))
    ).localCheckpoint()
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(toks) >= 2,"
                " transform(sequence(1, size(toks) - 1),"
                "  i -> IF(CAST(conv(substr(md5(concat("
                "element_at(toks, i), ':wm:',"
                " element_at(toks, i + 1))), 1, 12), 16, 10)"
                " AS BIGINT) % 2 = 0, 1, 0)),"
                " array())"
            )
        ).alias("green"),
    )
    agg = pairs.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum("green").cast("bigint").alias("n_green"),
    )
    z = (
        F.col("n_green").cast("double") - 0.5 * F.col("n_scored")
    ) / F.sqrt(0.25 * F.col("n_scored"))
    return agg.select(
        "doc_id", "n_scored", "n_green",
        (F.col("n_green").cast("double") / F.col("n_scored")).alias("green_frac"),
        z.alias("z"),
        (z > 4.0).alias("watermark_suspect"),
    ).orderBy("doc_id")


@query(
    "llm_span_corruption",
    oracle="""
WITH tok AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':span:'
                             || CAST(i AS VARCHAR)), 1, 12))::BIGINT % 8 = 0
           AS is_start
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d,
       LATERAL unnest(range(1, len(l) + 1)) AS u(i)
),
marked AS (
  SELECT doc_id, i, is_start,
         MAX(CASE WHEN is_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS masked
  FROM tok
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE is_start) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (WHERE masked) AS BIGINT) AS n_masked,
       CAST(COUNT(*) FILTER (WHERE masked) AS DOUBLE) / COUNT(*)
         AS corruption_rate
FROM marked
GROUP BY doc_id
ORDER BY doc_id
""",
    family=_FAM,
)
def llm_span_corruption(spark, sf_dir):
    """T5-style span-corruption planning (Raffel et al.): seeded
    pseudorandom span starts (engine-common md5 fold, rate 1/8) each
    mask a 3-token span; a position is masked iff a start fell within
    the 2 preceding positions or on it (window MAX over a 3-row frame —
    overlapping spans merge for free). Emits the per-doc corruption
    plan audit (span count, masked count, realized corruption rate
    ~3/8 pre-overlap) — the deterministic, REPLAYABLE preprocessing
    decision a seq2seq pretraining pipeline must be able to reproduce
    exactly for any example at any time (debugging a loss spike means
    re-deriving the exact mask a sample saw).

    Scale: positions explode once, the mask decision is one per-doc
    window over position order (doc-keyed partitioning — no global
    sort), then a combiner-shape aggregate."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "w"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"))
    is_start = (
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':span:',"
            " CAST(i AS STRING))), 1, 12), 16, 10) AS BIGINT) % 8"
        )
        == 0
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(-2, Window.currentRow)
    )
    marked = tok.select(
        "doc_id", "i", is_start.alias("is_start")
    ).withColumn(
        "masked",
        F.max(F.when(F.col("is_start"), 1).otherwise(0)).over(w) == 1,
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("is_start"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_spans"),
            F.sum(F.when(F.col("masked"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_masked"),
        )
        .select(
            "doc_id", "n_tokens", "n_spans", "n_masked",
            (F.col("n_masked").cast("double") / F.col("n_tokens")).alias(
                "corruption_rate"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_tokenizer_fertility",
    oracle="""
WITH per_doc AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_words,
         list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
                t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS INTEGER))),
              (a, b) -> a + b) AS n_pieces
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
       CAST(SUM(n_pieces) AS DOUBLE) / SUM(n_words) AS fertility,
       MAX(CAST(n_pieces AS DOUBLE) / n_words) AS max_doc_fertility
FROM per_doc
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def llm_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility by language — pieces-per-word, THE metric for
    judging whether a tokenizer serves a language fairly (high fertility
    = more pieces per word = fewer effective context tokens and higher
    cost for that language; multilingual tokenizer papers report
    exactly this table). Uses the same BPE-ish piece count as
    llm_token_count; integer totals make the corpus-level ratio one
    IEEE division, and the per-doc max is a plain aggregate of exact
    per-row ratios.

    Scale: one projection + one lang-keyed combiner aggregate — the
    shuffle carries (lang, 4 counters) partials."""
    d = table(spark, sf_dir, "documents")
    n_pieces = F.aggregate(
        F.transform(
            _toks(), lambda t: F.ceil(F.length(t).cast("double") / 4.0).cast("int")
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    per = d.select(
        "lang",
        F.size(_toks()).alias("n_words"),
        n_pieces.alias("n_pieces"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_pieces").cast("bigint").alias("total_pieces"),
            (
                F.sum("n_pieces").cast("double") / F.sum("n_words")
            ).alias("fertility"),
            F.max(
                F.col("n_pieces").cast("double") / F.col("n_words")
            ).alias("max_doc_fertility"),
        )
        .orderBy("lang")
    )


def _bpe_rounds_oracle(k: int = 5) -> str:
    """Unrolled-CTE DuckDB twin of llm_bpe_train_rounds: k merge rounds,
    each = pair-count over the current segmentation, deterministic top-1
    (count desc, left asc, right asc), then the marker-string replace.
    Both engines share the (\\x01 sym \\x02) wrapping, so `replace` is
    greedy, non-overlapping, and cannot match across symbol boundaries."""
    parts = [
        "wc AS (SELECT w, COUNT(*) AS freq FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "GROUP BY w)",
        "s0 AS (SELECT freq, "
        "regexp_replace(w, '(.)', e'\\x01\\\\1\\x02', 'g') AS seg FROM wc)",
    ]
    for r in range(1, k + 1):
        parts.append(
            f"sy{r} AS (SELECT freq, "
            "list_transform(string_split(seg, e'\\x02\\x01'), "
            f"s -> trim(s, e'\\x01\\x02')) AS syms FROM s{r - 1})"
        )
        parts.append(
            f"pr{r} AS (SELECT pr[1] AS lft, pr[2] AS rgt, SUM(freq) AS n "
            "FROM (SELECT freq, unnest(list_transform(range(1, len(syms)), "
            f"i -> [syms[i], syms[i + 1]])) AS pr FROM sy{r}) "
            "GROUP BY pr[1], pr[2])"
        )
        parts.append(
            f"t{r} AS (SELECT lft, rgt, n FROM pr{r} "
            "ORDER BY n DESC, lft ASC, rgt ASC LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT freq, replace(seg, "
            "e'\\x01' || t.lft || e'\\x02\\x01' || t.rgt || e'\\x02', "
            "e'\\x01' || t.lft || t.rgt || e'\\x02') AS seg "
            f"FROM s{r - 1} CROSS JOIN t{r} t)"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, lft AS left_sym, rgt AS right_sym, "
        f"lft || rgt AS merged, CAST(n AS BIGINT) AS n FROM t{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions + "\nORDER BY round"


_BPE_ROUNDS = 5


@query("llm_bpe_train_rounds", oracle=_bpe_rounds_oracle(_BPE_ROUNDS), family=_FAM)
def llm_bpe_train_rounds(spark, sf_dir):
    """Iterated BPE training (VERDICT r3 item 6 — llm_bpe_pair_counts
    computes only round 1's statistics): 5 full merge rounds of the
    Sennrich et al. trainer — count adjacent symbol pairs weighted by
    word frequency, merge the argmax pair corpus-wide, re-segment,
    repeat — emitting the merge table (round, pair, merged symbol,
    count at merge time) that IS a BPE tokenizer's model file.

    Representation: each word's segmentation is a string of
    marker-wrapped symbols (\\x01 sym \\x02). A merge round is then one
    literal `replace` of \\x01 a \\x02 \\x01 b \\x02 with \\x01 ab \\x02
    — left-to-right, non-overlapping (exactly BPE's greedy semantics,
    including the aaa -> (aa, a) case) and boundary-safe (a pattern
    cannot match inside a longer symbol because the wrapping markers
    must line up). DuckDB's `replace` has identical semantics, so the
    oracle unrolls the same 5 rounds as CTEs and the merge tables
    hash-match.

    Scale: all per-round work runs on the WORD-FREQUENCY table
    (|vocab| rows, not corpus rows) — the standard trick that makes BPE
    training feasible; each round is a combiner-shape pair count plus a
    top-1 (TakeOrdered, no global sort) and a map-side replace. The
    driver loop is k iterations of tiny scalar actions — the merge
    sequence is inherently serial (round r+1's counts depend on round
    r's merge), same discipline as mr_pagerank's rounds; seg frames are
    localCheckpoint'ed per round so the plan doesn't grow with k."""
    rows = _bpe_train(spark, sf_dir, _BPE_ROUNDS)
    return spark.createDataFrame(
        rows, "round int, left_sym string, right_sym string, merged string, n bigint"
    ).orderBy("round")


def _bpe_train(spark, sf_dir, k: int):
    """Shared BPE trainer (llm_bpe_train_rounds' driver loop, factored
    so llm_bpe_apply can load the same merge table): returns the list
    of (round, left, right, merged, n) rows. Cached per (session,
    sf_dir) — in production the merge table is a stored model file,
    not something every encode job retrains."""
    key = (spark.sparkContext.applicationId, str(sf_dir), k)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    a_m, b_m = chr(1), chr(2)
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(_toks()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    seg = wc.select(
        "freq", F.regexp_replace("w", "(.)", a_m + "$1" + b_m).alias("seg")
    ).localCheckpoint()
    rows = []
    for r in range(1, k + 1):
        syms = seg.select(
            "freq",
            F.expr(
                f"transform(split(seg, '{b_m}{a_m}'), "
                f"s -> trim(BOTH '{a_m}{b_m}' FROM s))"
            ).alias("syms"),
        ).filter(F.expr("size(syms) >= 2"))
        pairs = syms.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS lft, "
                    "element_at(syms, i + 1) AS rgt))"
                )
            ).alias("p"),
        ).select("freq", "p.lft", "p.rgt")
        top = (
            pairs.groupBy("lft", "rgt")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("lft").asc(), F.col("rgt").asc())
            .first()
        )
        rows.append((r, top.lft, top.rgt, top.lft + top.rgt, int(top.n)))
        pat = a_m + top.lft + b_m + a_m + top.rgt + b_m
        rep = a_m + top.lft + top.rgt + b_m
        seg = seg.select(
            "freq", F.replace(F.col("seg"), F.lit(pat), F.lit(rep)).alias("seg")
        ).localCheckpoint()
    _BPE_CACHE[key] = rows
    return rows


_BPE_CACHE: dict[tuple, list] = {}


def _bpe_apply_oracle(k: int = 5) -> str:
    """DuckDB twin of llm_bpe_apply: re-derives the same k-round merge
    table (identical CTEs to the training oracle), then applies the
    merges IN ORDER to every document token and rolls up per-doc piece
    counts."""
    parts = [
        "wc AS (SELECT w, COUNT(*) AS freq FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "GROUP BY w)",
        "s0 AS (SELECT freq, "
        "regexp_replace(w, '(.)', e'\\x01\\\\1\\x02', 'g') AS seg FROM wc)",
    ]
    for r in range(1, k + 1):
        parts.append(
            f"sy{r} AS (SELECT freq, "
            "list_transform(string_split(seg, e'\\x02\\x01'), "
            f"s -> trim(s, e'\\x01\\x02')) AS syms FROM s{r - 1})"
        )
        parts.append(
            f"pr{r} AS (SELECT pr[1] AS lft, pr[2] AS rgt, SUM(freq) AS n "
            "FROM (SELECT freq, unnest(list_transform(range(1, len(syms)), "
            f"i -> [syms[i], syms[i + 1]])) AS pr FROM sy{r}) "
            "GROUP BY pr[1], pr[2])"
        )
        parts.append(
            f"t{r} AS (SELECT lft, rgt, n FROM pr{r} "
            "ORDER BY n DESC, lft ASC, rgt ASC LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT freq, replace(seg, "
            "e'\\x01' || t.lft || e'\\x02\\x01' || t.rgt || e'\\x02', "
            "e'\\x01' || t.lft || t.rgt || e'\\x02') AS seg "
            f"FROM s{r - 1} CROSS JOIN t{r} t)"
        )
    parts.append(
        "dtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents)"
    )
    parts.append(
        "d0 AS (SELECT doc_id, "
        "regexp_replace(w, '(.)', e'\\x01\\\\1\\x02', 'g') AS seg FROM dtok)"
    )
    for r in range(1, k + 1):
        parts.append(
            f"d{r} AS (SELECT doc_id, replace(seg, "
            "e'\\x01' || t.lft || e'\\x02\\x01' || t.rgt || e'\\x02', "
            "e'\\x01' || t.lft || t.rgt || e'\\x02') AS seg "
            f"FROM d{r - 1} CROSS JOIN t{r} t)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(string_split(seg, e'\\x02\\x01'))) AS BIGINT) AS n_pieces,
       CAST(SUM(len(string_split(seg, e'\\x02\\x01'))) AS DOUBLE)
         / COUNT(*) AS fertility
FROM d{k}
GROUP BY doc_id
ORDER BY doc_id
"""
    )


@query("llm_bpe_apply", oracle=_bpe_apply_oracle(_BPE_ROUNDS), family=_FAM)
def llm_bpe_apply(spark, sf_dir):
    """BPE ENCODING — the other half of the tokenizer lifecycle
    (llm_bpe_train_rounds trains the merge table; this op applies it):
    every document token is char-segmented into the marker-wrapped
    form and the k trained merges replay IN TRAINING ORDER as literal
    replaces (greedy, non-overlapping, boundary-safe — identical
    semantics to the trainer, which is exactly what makes BPE encoding
    deterministic given a model file), then per-doc piece counts roll
    up into the fertility statistic that drives tokenizer-vs-corpus
    fit decisions (compare llm_tokenizer_fertility, which measures a
    FIXED external tokenizer). The merge table comes from the shared
    cached trainer (_bpe_train — a stored model file in production);
    the merges enter the plan as LITERALS, so the encode itself is a
    pure map-side replace chain + one combiner-shape aggregate — the
    shape that lets encoding scale to the corpus while training stayed
    vocabulary-sized."""
    a_m, b_m = chr(1), chr(2)
    merges = _bpe_train(spark, sf_dir, _BPE_ROUNDS)
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("w"))
    seg = F.regexp_replace("w", "(.)", a_m + "$1" + b_m)
    for _r, lft, rgt, _merged, _n in merges:
        seg = F.replace(
            seg,
            F.lit(a_m + lft + b_m + a_m + rgt + b_m),
            F.lit(a_m + lft + rgt + b_m),
        )
    pieces = F.size(F.split(seg, b_m + a_m))
    return (
        tok.select("doc_id", pieces.alias("pieces"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("pieces").cast("bigint").alias("n_pieces"),
        )
        .select(
            "doc_id", "n_words", "n_pieces",
            (F.col("n_pieces").cast("double")
             / F.col("n_words").cast("double")).alias("fertility"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_bm25_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
),
qtf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN ('spark', 'table', 'hash', 'sort')
  GROUP BY doc_id, term
),
qdf AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM tok WHERE term IN ('spark', 'table', 'hash', 'sort')
  GROUP BY term
),
contrib AS (
  SELECT t.doc_id,
         round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl / s.avgdl)))),
               6) AS c
  FROM qtf t
  JOIN qdf d ON d.term = t.term
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT doc_id,
       (CAST(CAST(SUM(CAST(c AS DECIMAL(38,6))) * 1000000
             AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0) AS bm25,
       CAST(row_number() OVER (
         ORDER BY SUM(CAST(c AS DECIMAL(38,6))) DESC, doc_id ASC
       ) AS BIGINT) AS rank
FROM contrib
GROUP BY doc_id
QUALIFY rank <= 20
ORDER BY rank
""",
    family=_FAM,
    tags=("ordered",),
)
def llm_bm25_score(spark, sf_dir):
    """Okapi BM25 retrieval scoring (k1=1.2, b=0.75) of the corpus
    against a fixed query term set — the lexical-retrieval complement
    to llm_tfidf and the standard first-stage ranker in front of the
    ANN family. Determinism: idf and the tf-saturation factor are
    per-row IEEE chains with identical parenthesization in both
    engines; each term's contribution rounds to 6 dp (the llm_tfidf
    ln-ulp discipline) and the per-doc sum rides the decimal kernel so
    aggregation order can't perturb the ranking. Physical shape at
    100 TB: doc-length and term-frequency aggregates are combiner-shape
    over one doc_id shuffle; the query-term df table is tiny but the
    JOIN is written unhinted on term like llm_tfidf's (vocab-scale df
    generalizes); global scalars (N, avgdl) embed as literals; top-20
    is a bounded TakeOrdered, never a global sort."""
    from hdfs_mr_spark.exprs import dsum

    q_terms = ["spark", "table", "hash", "sort"]
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("term"))
    # Scalar literals from the cached per-sf stats (stats.py): both
    # engines then evaluate the identical double constants.
    n_docs = corpus_stats.n_docs(spark, sf_dir)
    n_toks = corpus_stats.n_tokens(spark, sf_dir)
    n = float(n_docs)
    avgdl = float(n_toks) / float(n_docs)
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    qtok = tok.filter(F.col("term").isin(q_terms))
    qtf = qtok.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    qdf = qtok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    sat = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl)))
    )
    contrib = (
        qtf.join(qdf, "term")
        .join(dl, "doc_id")
        .select("doc_id", F.round(idf * sat, 6).alias("c"))
    )
    return (
        contrib.groupBy("doc_id")
        .agg(dsum(F.col("c"), 6).alias("bm25"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
    )


@query(
    "llm_rag_retrieve",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
),
qterms AS (
  SELECT doc_id AS qid, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents WHERE doc_id < 3
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM tok GROUP BY term
),
contrib AS (
  SELECT q.qid, t.doc_id,
         round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl / s.avgdl)))),
               6) AS c
  FROM qterms q
  JOIN tf t ON t.term = q.term AND t.doc_id <> q.qid
  JOIN df d ON d.term = q.term
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT qid, doc_id,
       (CAST(CAST(SUM(CAST(c AS DECIMAL(38,6))) * 1000000 AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0) AS bm25,
       CAST(row_number() OVER (
         PARTITION BY qid
         ORDER BY SUM(CAST(c AS DECIMAL(38,6))) DESC, doc_id ASC
       ) AS BIGINT) AS rank
FROM contrib
GROUP BY qid, doc_id
QUALIFY rank <= 5
ORDER BY qid, rank
""",
    family=_FAM,
    tags=("ordered",),
)
def llm_rag_retrieve(spark, sf_dir):
    """First-stage RAG retrieval: each query document (doc_id < 3,
    its distinct tokens as the query bag) retrieves its BM25 top-5
    from the rest of the corpus — llm_bm25_score generalized from one
    literal term set to a QUERY FRAME, which is the actual retrieval
    shape (documents-as-queries is also how dense retrievers mine
    training pairs; llm_hard_negative_mining is the embedding-space
    sibling).

    Determinism inherits llm_bm25_score's discipline wholesale:
    contributions round to 6 dp after an identically-parenthesized
    IEEE chain, per-(query, doc) sums ride the decimal kernel, global
    scalars embed as literals, ranking tiebreaks on doc_id.

    Plan: tf/df/dl are combiner-shape aggregates off ONE doc_id/term
    shuffle each; the query frame joins UNHINTED on term (query bags
    are tiny here, but a production query batch is unbounded — same
    vocab-scale reasoning as llm_tfidf's df join); top-5 per query is
    a qid-partitioned window, never a global sort. At 100 TB the tf
    table is the posting index: partition by term and both the df join
    and the query join co-locate."""
    from hdfs_mr_spark.exprs import dsum

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    n_docs = corpus_stats.n_docs(spark, sf_dir)
    n_toks = corpus_stats.n_tokens(spark, sf_dir)
    n = float(n_docs)
    avgdl = float(n_toks) / float(n_docs)
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    qterms = (
        d.filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
        )
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    sat = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl)))
    )
    contrib = (
        qterms.join(tf, (tf.term == qterms.term) & (tf.doc_id != qterms.qid))
        .drop(qterms.term)
        .join(df, "term")
        .join(dl, "doc_id")
        .select("qid", "doc_id", F.round(idf * sat, 6).alias("c"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        contrib.groupBy("qid", "doc_id")
        .agg(dsum(F.col("c"), 6).alias("bm25"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .orderBy("qid", "rank")
    )


@query(
    "llm_vocab_coverage",
    oracle="""
WITH tc AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) GROUP BY w
),
tot AS (SELECT SUM(c) AS total, COUNT(*) AS n_vocab FROM tc),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS r FROM tc
  ORDER BY c DESC, w ASC LIMIT 20
),
ks AS (SELECT unnest([5, 10, 20]) AS k)
SELECT ks.k,
       CAST(t.n_vocab AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN top.r <= ks.k THEN top.c ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(SUM(CASE WHEN top.r <= ks.k THEN top.c ELSE 0 END) AS DOUBLE)
         / CAST(t.total AS DOUBLE) AS coverage
FROM ks CROSS JOIN tot t CROSS JOIN top
GROUP BY ks.k, t.n_vocab, t.total
ORDER BY ks.k
""",
    family=_FAM,
)
def llm_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve — what fraction of all token
    OCCURRENCES the top-k most frequent types cover (k = 5/10/20):
    the tokenizer-design metric that, with llm_zipf_slope and
    llm_tokenizer_fertility, decides vocab size (coverage saturating
    early = a small vocab suffices; a long tail = bigger vocab or
    subword units).

    Plan: term counts are one combiner-shape aggregate; the top-20
    frame comes from a bounded TakeOrdered (never a global sort or a
    vocab-wide rank window — vocabulary grows with the corpus by
    Heaps' law, so a global row_number over it is the scale trap);
    the three coverage points are conditional sums over those 20 rows
    against a broadcast 1-row totals aggregate (no driver scalar — the
    whole query is ONE lazy plan, VERDICT r7 item 5)."""
    d = table(spark, sf_dir, "documents")
    tc = d.select(F.explode(F.split("text", " ")).alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    tot = tc.agg(F.sum("c").alias("total"), F.count("*").alias("n_vocab"))
    top = (
        tc.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(20)
        .withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), F.col("w").asc())
            ),
        )
    )
    ks = spark.createDataFrame([(5,), (10,), (20,)], "k int")
    return (
        ks.crossJoin(top)
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.max("n_vocab").cast("bigint").alias("n_vocab"),
            F.sum(F.when(F.col("r") <= F.col("k"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("covered_tokens"),
            (
                F.sum(
                    F.when(F.col("r") <= F.col("k"), F.col("c")).otherwise(0)
                ).cast("double")
                / F.max("total").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@query(
    "llm_keyword_extract",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tf AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
scored AS (
  SELECT t.doc_id, t.term,
         round(CAST(t.tf AS DOUBLE)
               * (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(d.df AS DOUBLE) + 1.0)) + 1.0),
               6) AS score
  FROM tf t, n_docs n
  JOIN df d ON t.term = d.term
)
SELECT doc_id, term, score,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 3
ORDER BY doc_id, rank
""",
    family=_FAM,
)
def llm_keyword_extract(spark, sf_dir):
    """Per-document keyword extraction — the top-3 TF-IDF terms each
    document would be tagged with (the metadata-enrichment pass a
    training pipeline runs to drive topic-balanced sampling and
    retrieval indexing; the per-LANG rollup is llm_tfidf's job).

    Plan: tf is a (doc_id, term) combiner agg, df a term-keyed agg;
    their join stays an unhinted shuffle on term (vocabulary-sized
    build side — same Heaps'-law rule as llm_tfidf's df join). The
    rank window is partitioned by doc_id, so no partition ever holds
    more than one document's vocabulary. Scores are rounded to 6 dp
    on both engines BEFORE ranking so the ln() ulp difference can
    neither flip values nor ordering."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("term"))
    n_docs = corpus_stats.n_docs(spark, sf_dir)
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = (
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)) + 1.0
    )
    scored = tf.join(df, "term").select(
        "doc_id", "term",
        F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .orderBy("doc_id", "rank")
    )


@query(
    "llm_tokenizer_viterbi",
    oracle="""
WITH RECURSIVE d AS MATERIALIZED (
  SELECT doc_id, lang, substr(text, 1, 120) AS t,
         length(substr(text, 1, 120)) AS L
  FROM documents WHERE doc_id % 4 = 0 AND length(text) >= 1
),
pos AS MATERIALIZED (
  SELECT doc_id, lang, t, L, unnest(generate_series(1, L)) AS p FROM d
),
pieces AS MATERIALIZED (
  SELECT doc_id, L, p, len, substr(t, p - len + 1, len) AS piece
  FROM (SELECT *, unnest([1, 2, 3, 4]) AS len FROM pos)
  WHERE len <= p
),
vocab AS MATERIALIZED (
  SELECT len, piece, COUNT(*) AS c FROM pieces GROUP BY len, piece
  HAVING len = 1 OR COUNT(*) >= 64
),
edges AS MATERIALIZED (
  SELECT e.doc_id, e.p, e.len,
         CAST(1099511627776 + (1048576 - least(v.c, 1048575)) AS BIGINT)
           AS cost
  FROM pieces e JOIN vocab v ON v.len = e.len AND v.piece = e.piece
),
rec AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS cost,
         0 AS age
  FROM d
  UNION ALL
  SELECT * FROM (
    SELECT doc_id, pos, cost, age + 1 AS age FROM rec WHERE age < 3
    UNION ALL
    SELECT e.doc_id, CAST(e.p AS BIGINT) AS pos,
           MIN(r.cost + e.cost) AS cost, 0 AS age
    FROM rec r
    JOIN edges e ON e.doc_id = r.doc_id
                AND e.p = r.pos + r.age + 1 AND e.len = r.age + 1
    GROUP BY e.doc_id, e.p
  )
),
fin AS (
  SELECT r.doc_id, d.lang, d.L, r.cost
  FROM rec r JOIN d ON d.doc_id = r.doc_id
  WHERE r.age = 0 AND r.pos = d.L
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(L) AS BIGINT) AS total_chars,
       CAST(SUM(cost // 1099511627776) AS BIGINT) AS total_tokens,
       CAST(SUM(cost) AS BIGINT) AS total_cost
FROM fin
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def llm_tokenizer_viterbi(spark, sf_dir):
    """LATTICE (Viterbi) TOKENIZATION — the segmentation step of
    unigram-LM / SentencePiece-class tokenizers (Kudo 2018), made
    hash-exact by replacing float log-probs with an integer objective:
    candidate pieces are all corpus substrings of length 1..4 with
    count >= 64 (length-1 pieces always kept, so every document has a
    segmentation), each piece costs 2^40 + (2^20 - min(count, 2^20-1)),
    and Viterbi minimizes total cost — the 2^40 rung makes FEWEST
    TOKENS the primary objective and highest-frequency pieces the
    exact tie-break, and total_tokens falls out of the optimal cost as
    cost DIV 2^40 with NO path reconstruction.

    Spark-first shape: the lattice is built by EQUI-JOINS, never a
    driver-side model — positions explode per doc, the vocabulary is a
    combiner-shape substring count, edge costs come from joining the
    candidates back against the vocabulary; only the per-doc DP walk
    (inherently sequential in position) runs in a grouped-map pandas
    kernel — docs hash-bucketed 256 ways with the walk looped inside
    the kernel (r15-opt; one group per doc paid the r13 ~40x per-group
    Arrow overhead n_docs times), emitting per-lang combiner partials
    (exact int64 sums, so bucketing cannot perturb a bit; parallelism
    = buckets, memory = one 120-char lattice). The DuckDB oracle
    replays the identical DP as a lockstep recursive CTE whose working
    set is the last four positions (age 0..3).

    Scale: vocabulary counting and lattice construction are linear
    scans + one shuffle each; the kernel receives O(len x 4) rows per
    doc. At 100 TB the same plan segments every shard independently
    against a shared trained vocabulary (here trained on the sampled
    corpus itself; counts clamp at 2^20-1 so the cost lattice is
    sf-stable)."""
    import pandas as pd

    d = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 4 == 0) & (F.length("text") >= 1))
        .select(
            "doc_id", "lang",
            F.substring("text", 1, 120).alias("t"),
        )
        .withColumn("L", F.length("t"))
    )
    pos = d.select(
        "doc_id", "lang", "t", "L",
        F.explode(F.sequence(F.lit(1), F.col("L"))).alias("p"),
    )
    pieces = (
        pos.select(
            "doc_id", "lang", "t", "L", "p",
            F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)]))
            .alias("len"),
        )
        .filter(F.col("len") <= F.col("p"))
        .withColumn("piece", F.expr("substring(t, p - len + 1, len)"))
    )
    vocab = (
        pieces.groupBy("len", "piece")
        .agg(F.count("*").alias("c"))
        .filter((F.col("len") == 1) | (F.col("c") >= 64))
    )
    edges = pieces.join(vocab, ["len", "piece"]).select(
        "doc_id", "lang", "L", "p", "len",
        (
            F.lit(2 ** 40)
            + (F.lit(2 ** 20) - F.least(F.col("c"), F.lit(2 ** 20 - 1)))
        ).cast("bigint").alias("cost"),
    )

    schema = (
        "lang string, n_docs bigint, total_chars bigint, "
        "total_tokens bigint, total_cost bigint"
    )

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        # r15-opt (the r13 applyInPandas lesson, guide §4.2): one group
        # per DOC paid the ~40x per-group Arrow overhead ~n_docs times;
        # the kernel now receives a 256-way HASH BUCKET and loops the
        # per-doc DP inside, emitting per-lang COMBINER partials (exact
        # int64 sums of the identical per-doc DP values — addition is
        # commutative, so bucket boundaries cannot perturb a bit).
        agg: dict[str, list[int]] = {}
        for (_doc, lang), g in pdf.groupby(["doc_id", "lang"], sort=False):
            L = int(g["L"].iloc[0])
            by_p: dict[int, list[tuple[int, int]]] = {}
            for p, ln, c in zip(g["p"], g["len"], g["cost"]):
                by_p.setdefault(int(p), []).append((int(ln), int(c)))
            best = [0] + [None] * L
            for p in range(1, L + 1):
                b = None
                for ln, c in by_p.get(p, ()):
                    prev = best[p - ln]
                    if prev is not None and (b is None or prev + c < b):
                        b = prev + c
                best[p] = b
            a = agg.setdefault(lang, [0, 0, 0, 0])
            a[0] += 1
            a[1] += L
            a[2] += best[L] // 2 ** 40
            a[3] += best[L]
        return pd.DataFrame(
            [
                {"lang": lang, "n_docs": a[0], "total_chars": a[1],
                 "total_tokens": a[2], "total_cost": a[3]}
                for lang, a in agg.items()
            ],
            columns=["lang", "n_docs", "total_chars", "total_tokens",
                     "total_cost"],
        )

    partials = (
        edges.withColumn("bkt", F.col("doc_id") % 256)
        .groupBy("bkt")
        .applyInPandas(viterbi, schema)
    )
    return (
        partials.groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_chars").cast("bigint").alias("total_chars"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
            F.sum("total_cost").cast("bigint").alias("total_cost"),
        )
        .orderBy("lang")
    )


@query(
    "llm_feature_hashing",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
),
b AS (
  SELECT doc_id, lang, w,
         ('0x' || substr(md5(w), 1, 6))::BIGINT % 256 AS bucket
  FROM tok WHERE w <> ''
),
per_doc AS (
  SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM b GROUP BY doc_id, lang, bucket
),
sq AS (
  SELECT lang, CAST(SUM(c * c) AS BIGINT) AS sumsq FROM per_doc
  GROUP BY lang
),
st AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_tokens,
         CAST(COUNT(DISTINCT bucket) AS BIGINT) AS buckets_used
  FROM b GROUP BY lang
)
SELECT st.lang, st.n_tokens, st.distinct_tokens, st.buckets_used,
       CAST((st.distinct_tokens - st.buckets_used) * 10000
            // st.distinct_tokens AS BIGINT) AS collision_bp,
       sq.sumsq
FROM st JOIN sq ON sq.lang = st.lang
ORDER BY st.lang
""",
    family=_FAM,
)
def llm_feature_hashing(spark, sf_dir):
    """FEATURE HASHING (the hashing trick — Weinberger 2009, the
    HashingVectorizer/Vowpal-Wabbit vectorizer): tokens map straight to
    a FIXED 256-dim index by hash, no vocabulary dictionary ever built
    or shipped — the property that makes streaming featurization
    possible at 100 TB (a dictionary vectorizer needs a global vocab
    broadcast + an extra pass; the hasher is one stateless map). Per
    language: token counts, distinct tokens vs buckets actually used,
    the collision rate in integer basis points (the price of fixed
    dimensionality, measured rather than assumed), and the exact
    integer sum of squared per-doc bucket counts — the L2^2 mass of the
    hashed count vectors a downstream normalizer divides by.

    Determinism: the bucket hash is md5-derived (portable across
    engines, unlike xxhash64 — the fn_hash vs fn_hash_native split);
    all statistics are exact integers.

    Plan: explode -> one combiner aggregate per statistic family over
    the SAME shuffled layout; the per-doc vector never materializes
    wider than its nonzero buckets (sparse by construction)."""
    d = table(spark, sf_dir, "documents")
    b = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .withColumn(
            "bucket",
            F.expr(
                "CAST(conv(substr(md5(w), 1, 6), 16, 10) AS BIGINT) % 256"
            ),
        )
    )
    per_doc = b.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("bigint").alias("c")
    )
    sq = per_doc.groupBy("lang").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq")
    )
    st = b.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.countDistinct("w").cast("bigint").alias("distinct_tokens"),
        F.countDistinct("bucket").cast("bigint").alias("buckets_used"),
    )
    return (
        st.join(sq, "lang")
        .select(
            "lang", "n_tokens", "distinct_tokens", "buckets_used",
            F.expr(
                "CAST((distinct_tokens - buckets_used) * 10000 "
                "DIV distinct_tokens AS BIGINT)"
            ).alias("collision_bp"),
            "sumsq",
        )
        .orderBy("lang")
    )


@query(
    "llm_importance_resample",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
bg AS (
  SELECT a.doc_id, a.lang,
         ('0x' || substr(md5(a.w || ' ' || b.w), 1, 6))::BIGINT % 1024
           AS bucket
  FROM tok a JOIN tok b
    ON b.doc_id = a.doc_id AND b.i = a.i + 1
  WHERE a.w <> '' AND b.w <> ''
),
bstat AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct,
         COUNT(*) FILTER (WHERE lang <> 'en') AS cr
  FROM bg GROUP BY bucket
),
scored AS (
  SELECT g.doc_id, g.lang,
         SUM((s.ct + 1) * 10000 // (s.cr + 1)) AS imp
  FROM bg g JOIN bstat s ON s.bucket = g.bucket
  GROUP BY g.doc_id, g.lang
),
thr AS (
  SELECT SUM(imp) // COUNT(*) AS mean_imp FROM scored
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE imp > (SELECT mean_imp FROM thr))
            AS BIGINT) AS n_selected,
       CAST(SUM(imp) AS BIGINT) AS sum_importance,
       CAST(MAX(imp) AS BIGINT) AS max_importance
FROM scored
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def llm_importance_resample(spark, sf_dir):
    """DSIR-style DATA SELECTION via hashed-n-gram importance weights
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): word bigrams hash into 1024 buckets; each
    bucket's frequency in the TARGET distribution (English docs)
    versus the rest of the pool gives a per-bucket likelihood ratio,
    and a document's importance is the sum over its bigram occurrences
    of its buckets' ratios — documents whose n-gram profile looks like
    the target score high, and selection keeps those above the global
    mean. Engine-portable deviation, stated: faithful DSIR sums LOG
    ratios and resamples with Gumbel noise; libm log is not
    bit-portable across engines, so the ratio rides INTEGER basis
    points with +1 smoothing ((ct+1)*10000 DIV (cr+1)) — per-bucket
    monotone in the true ratio — and selection is deterministic
    above-mean rather than sampled.

    Plan: bigrams from ONE self-join on (doc, position+1) (no Python),
    bucket stats one combiner aggregate, doc scores a second aggregate
    after an equi-join against the 1024-row broadcast bucket table,
    threshold a broadcast 1-row scalar. At 100 TB the bucket table is
    fixed-size regardless of corpus — the entire point of hashing the
    feature space (same property as llm_feature_hashing)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang",
        F.posexplode(F.split("text", " ")).alias("i", "w"),
    ).filter(F.col("w") != "")
    a = tok.select("doc_id", "lang", "i", F.col("w").alias("wa"))
    b = tok.select("doc_id", (F.col("i") - 1).alias("i"),
                   F.col("w").alias("wb"))
    # r15-opt (guide §5.4): bg is consumed twice (bstat + the scoring
    # join) and scored twice more (threshold + final rollup) — without
    # materialization the tokenize + position self-join + md5 subtree
    # re-expanded FOUR times (plan showed 16 parquet scans / 28
    # Exchanges). Checkpoint each reused frame once: 4 scans, and the
    # bigram hash is computed once.
    bg = a.join(b, ["doc_id", "i"]).select(
        "doc_id", "lang",
        F.expr(
            "CAST(conv(substr(md5(concat(wa, ' ', wb)), 1, 6), 16, 10)"
            " AS BIGINT) % 1024"
        ).alias("bucket"),
    ).localCheckpoint()
    bstat = bg.groupBy("bucket").agg(
        F.sum((F.col("lang") == "en").cast("bigint")).alias("ct"),
        F.sum((F.col("lang") != "en").cast("bigint")).alias("cr"),
    )
    scored = (
        bg.join(F.broadcast(bstat), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.expr("(ct + 1) * 10000 DIV (cr + 1)")
            ).alias("imp")
        )
    ).localCheckpoint()
    thr = scored.agg(
        F.expr("SUM(imp) DIV COUNT(*)").alias("mean_imp")
    )
    return (
        scored.join(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("imp") > F.col("mean_imp")).cast("bigint"))
            .cast("bigint").alias("n_selected"),
            F.sum("imp").cast("bigint").alias("sum_importance"),
            F.max("imp").cast("bigint").alias("max_importance"),
        )
        .orderBy("lang")
    )


@query(
    "llm_segment_texttiling",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS i
  FROM documents
),
blk AS (
  SELECT DISTINCT doc_id, i // 16 AS blk, w FROM tok WHERE w <> ''
),
bsz AS (
  SELECT doc_id, blk, COUNT(*) AS n FROM blk GROUP BY doc_id, blk
),
inter AS (
  SELECT a.doc_id, a.blk AS gap, COUNT(*) AS isect
  FROM blk a JOIN blk b
    ON b.doc_id = a.doc_id AND b.blk = a.blk + 1 AND b.w = a.w
  GROUP BY a.doc_id, a.blk
),
sims AS (
  SELECT l.doc_id, l.blk AS gap,
         COALESCE(i.isect, 0) * 10000
           // (l.n + r.n - COALESCE(i.isect, 0)) AS sim_bp
  FROM bsz l
  JOIN bsz r ON r.doc_id = l.doc_id AND r.blk = l.blk + 1
  LEFT JOIN inter i ON i.doc_id = l.doc_id AND i.gap = l.blk
),
depth AS (
  SELECT doc_id, gap, sim_bp,
         greatest(COALESCE(lag(sim_bp) OVER w, sim_bp) - sim_bp, 0)
         + greatest(COALESCE(lead(sim_bp) OVER w, sim_bp) - sim_bp, 0)
           AS depth_bp
  FROM sims
  WINDOW w AS (PARTITION BY doc_id ORDER BY gap)
),
thr AS (SELECT SUM(depth_bp) // COUNT(*) AS mean_depth FROM depth)
SELECT doc_id,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_blocks,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(COUNT(*) FILTER (
         WHERE depth_bp > (SELECT mean_depth FROM thr)) AS BIGINT)
         AS n_boundaries,
       CAST(SUM(depth_bp) AS BIGINT) AS total_depth_bp,
       CAST(SUM(sim_bp) AS BIGINT) AS total_sim_bp
FROM depth
GROUP BY doc_id
ORDER BY doc_id
""",
    family=_FAM,
)
def llm_segment_texttiling(spark, sf_dir):
    """TOPIC SEGMENTATION, TextTiling-style (Hearst 1997): documents
    split into 16-token blocks; lexical cohesion at each inter-block
    gap is the Jaccard similarity of adjacent blocks' distinct-token
    sets (integer basis points — the stated deviation from Hearst's
    cosine, whose sqrt-normalized floats are not engine-portable;
    Jaccard is the standard substitution in TextTiling
    implementations); a gap's DEPTH is how far its cohesion dips below
    both neighbors (the valley score), and gaps deeper than the
    corpus mean depth are topic boundaries — where a chunking pipeline
    should prefer to cut instead of the blind stride of
    llm_chunk_split.

    Plan: fully relational — block membership is a distinct-project,
    the intersection is ONE self-equi-join on (doc, token, adjacent
    block), depths are lag/lead over one per-doc window sort, the
    threshold a broadcast 1-row scalar. No kernel, no driver model;
    at 100 TB the self-join shuffles O(distinct tokens per block pair)
    and everything else is combiner-shaped."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    ).filter(F.col("w") != "")
    # r15-opt NOTE: checkpointing blk/depth (the 50-Exchange/16-scan plan
    # suspicion) was A/B-REFUTED (flat-to-worse at matched controls) —
    # left lazy like dq_t_closeness/mr_apriori; see OPTIMIZATION_r15.md.
    blk = tok.select(
        "doc_id", (F.col("i") / 16).cast("bigint").alias("blk"), "w"
    ).distinct()
    bsz = blk.groupBy("doc_id", "blk").agg(F.count("*").alias("n"))
    inter = (
        blk.alias("a")
        .join(
            blk.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.blk") == F.col("a.blk") + 1)
            & (F.col("b.w") == F.col("a.w")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"),
                 F.col("a.blk").alias("gap"))
        .agg(F.count("*").alias("isect"))
    )
    l = bsz.select("doc_id", F.col("blk").alias("gap"),
                   F.col("n").alias("nl"))
    r = bsz.select("doc_id", (F.col("blk") - 1).alias("gap"),
                   F.col("n").alias("nr"))
    sims = (
        l.join(r, ["doc_id", "gap"])
        .join(inter, ["doc_id", "gap"], "left")
        .select(
            "doc_id", "gap",
            F.expr(
                "coalesce(isect, 0) * 10000 "
                "DIV (nl + nr - coalesce(isect, 0))"
            ).alias("sim_bp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("gap")
    depth = sims.select(
        "doc_id", "gap", "sim_bp",
        (
            F.greatest(
                F.coalesce(F.lag("sim_bp").over(w), F.col("sim_bp"))
                - F.col("sim_bp"), F.lit(0)
            )
            + F.greatest(
                F.coalesce(F.lead("sim_bp").over(w), F.col("sim_bp"))
                - F.col("sim_bp"), F.lit(0)
            )
        ).alias("depth_bp"),
    )
    thr = depth.agg(
        F.expr("SUM(depth_bp) DIV COUNT(*)").alias("mean_depth")
    )
    return (
        depth.join(F.broadcast(thr))
        .groupBy("doc_id")
        .agg(
            (F.count("*") + 1).cast("bigint").alias("n_blocks"),
            F.count("*").cast("bigint").alias("n_gaps"),
            F.sum((F.col("depth_bp") > F.col("mean_depth")).cast("bigint"))
            .cast("bigint").alias("n_boundaries"),
            F.sum("depth_bp").cast("bigint").alias("total_depth_bp"),
            F.sum("sim_bp").cast("bigint").alias("total_sim_bp"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_rag_fusion_rrf",
    oracle="""
WITH qt AS (
  SELECT doc_id AS qid, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents WHERE doc_id < 3
),
dt AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents
),
dsz AS (SELECT doc_id, COUNT(*) AS dn FROM dt GROUP BY doc_id),
qsz AS (SELECT qid, COUNT(*) AS qn FROM qt GROUP BY qid),
inter AS (
  SELECT qt.qid, dt.doc_id, COUNT(*) AS i
  FROM qt JOIN dt ON dt.term = qt.term AND dt.doc_id <> qt.qid
  GROUP BY qt.qid, dt.doc_id
),
lex AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY
           CAST(i AS DOUBLE) / CAST(qn + dn - i AS DOUBLE) DESC,
           doc_id ASC) AS rank_lex
  FROM inter JOIN qsz USING (qid) JOIN dsz USING (doc_id)
  QUALIFY rank_lex <= 10
),
nrm AS (
  SELECT vec_id, embedding,
         SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, x) -> acc + x)) AS nm
  FROM embeddings
),
dense AS (
  SELECT q.vec_id AS qid, n.vec_id AS doc_id,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(q.embedding, n.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
             (acc, x) -> acc + x) / (q.nm * n.nm) DESC,
           n.vec_id ASC) AS rank_dense
  FROM nrm q JOIN nrm n ON q.vec_id < 3 AND n.vec_id <> q.vec_id
  QUALIFY rank_dense <= 10
),
fused AS (
  SELECT COALESCE(l.qid, d.qid) AS qid,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(1000000 // (60 + l.rank_lex), 0)
            + COALESCE(1000000 // (60 + d.rank_dense), 0) AS BIGINT)
           AS rrf_micro,
         l.rank_lex IS NOT NULL AS in_lex,
         d.rank_dense IS NOT NULL AS in_dense
  FROM lex l FULL JOIN dense d
    ON l.qid = d.qid AND l.doc_id = d.doc_id
)
SELECT qid, doc_id, rrf_micro, in_lex, in_dense,
       CAST(row_number() OVER (PARTITION BY qid
            ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS rank
FROM fused QUALIFY rank <= 5
ORDER BY qid, rank
""",
    family="2.11 llm text analysis",
)
def llm_rag_fusion_rrf(spark, sf_dir):
    """HYBRID-RETRIEVAL RANK FUSION (r11 — reciprocal rank fusion,
    Cormack 2009, the standard way production RAG merges a lexical and
    a dense candidate list without score calibration): each query doc
    (doc_id < 3) retrieves a token-Jaccard top-10 (the lexical list)
    and a cosine top-10 over its embedding (the dense list; doc_id is
    vec_id — the corpus ships one embedding per document), and the
    lists fuse by RRF = sum over lists of 1/(60+rank), kept
    integer-exact as 1000000 DIV (60+rank) micro-units so the fused
    ordering is engine-independent by construction (scores never
    calibrate across retrievers — only RANKS cross the fusion
    boundary, which is RRF's entire point). in_lex/in_dense pin each
    survivor's provenance: a fused top-5 typically mixes
    single-list and both-list hits, which the hash verifies.

    Plan: both candidate generators are the family's standard shapes
    (term-keyed shuffle join for Jaccard, broadcast queries + fold dot
    for cosine), each truncated to top-10 by a qid-partitioned window
    BEFORE the fusion join, so the fusion itself is a join of two
    (queries x 10)-row frames — trivially broadcastable at any corpus
    size. At 100 TB the lists come from the indexed retrievers
    (llm_bm25_score / llm_sim_knn_ivf*); RRF's cost stays O(queries),
    which is why hybrid retrieval is the production default."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    dt = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    qt = (
        dt.filter(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("qid"), "term")
    )
    dsz = dt.groupBy("doc_id").agg(F.count("*").alias("dn"))
    qsz = qt.groupBy("qid").agg(F.count("*").alias("qn"))
    inter = (
        dt.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("i"))
    )
    wl = Window.partitionBy("qid").orderBy(
        (F.col("i").cast("double")
         / (F.col("qn") + F.col("dn") - F.col("i")).cast("double")).desc(),
        F.col("doc_id").asc(),
    )
    lex = (
        inter.join(F.broadcast(qsz), "qid").join(dsz, "doc_id")
        .withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= 10)
        .select("qid", "doc_id", "rank_lex")
    )
    from hdfs_mr_spark.operators.llm_similarity import _dot, _norm

    nrm = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nm"))
    q = (
        nrm.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("nm").alias("qn_"),
        )
    )
    wd = Window.partitionBy("qid").orderBy(
        (_dot(F.col("qe"), F.col("embedding"))
         / (F.col("qn_") * F.col("nm"))).desc(),
        F.col("vec_id").asc(),
    )
    dense = (
        nrm.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("rank_dense", F.row_number().over(wd))
        .filter(F.col("rank_dense") <= 10)
        .select("qid", F.col("vec_id").alias("doc_id"), "rank_dense")
    )
    fused = (
        lex.join(dense, ["qid", "doc_id"], "full")
        .select(
            "qid", "doc_id",
            (
                F.coalesce(
                    F.expr("1000000 DIV (60 + rank_lex)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000 DIV (60 + rank_dense)"), F.lit(0)
                )
            ).cast("bigint").alias("rrf_micro"),
            F.col("rank_lex").isNotNull().alias("in_lex"),
            F.col("rank_dense").isNotNull().alias("in_dense"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("qid", "doc_id", "rrf_micro", "in_lex", "in_dense", "rank")
        .orderBy("qid", "rank")
    )


@query(
    "llm_tokenizer_wordpiece",
    oracle="""
WITH RECURSIVE
wsplit AS (
  SELECT lang, substr(w, 1, 16) AS word
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
        FROM documents)
  WHERE w <> ''
),
occ AS (SELECT lang, word, COUNT(*) AS occ FROM wsplit
        GROUP BY lang, word),
wd AS (SELECT word, SUM(occ) AS wcnt, length(word) AS wlen
       FROM occ GROUP BY word),
tot AS (SELECT SUM(wcnt) AS occ_total FROM wd),
cand AS (
  SELECT word, wcnt, p, len, substr(word, p, len) AS piece,
         CASE WHEN p = 1 THEN 'init' ELSE 'cont' END AS kind
  FROM wd, LATERAL unnest(range(1, wlen + 1)) AS pp(p),
       LATERAL unnest([1, 2, 3, 4]) AS ll(len)
  WHERE p + len - 1 <= wlen
),
vocab AS (
  SELECT kind, len, piece
  FROM (SELECT kind, len, piece, SUM(wcnt) AS c FROM cand
        GROUP BY kind, len, piece)
  WHERE len = 1 OR c >= (SELECT occ_total // 64 FROM tot)
),
step AS (
  SELECT c.word, c.p, MAX(c.len) AS blen
  FROM cand c JOIN vocab v USING (kind, len, piece)
  GROUP BY c.word, c.p
),
walk AS (
  SELECT word, wlen, 1 AS pos, 0 AS toks FROM wd
  UNION ALL
  SELECT w.word, w.wlen, w.pos + s.blen, w.toks + 1
  FROM walk w JOIN step s ON s.word = w.word AND s.p = w.pos
  WHERE w.pos <= w.wlen
),
done AS (SELECT word, toks FROM walk WHERE pos > wlen)
SELECT o.lang,
       CAST(SUM(o.occ) AS BIGINT) AS words_total,
       CAST(SUM(o.occ * d.toks) AS BIGINT) AS tokens_total,
       CAST(SUM(o.occ * w.wlen) AS BIGINT) AS chars_total,
       CAST(CAST(SUM(o.occ * d.toks) AS HUGEINT) * 1000000
            // SUM(o.occ) AS BIGINT) AS fertility_micro,
       CAST(CAST(SUM(o.occ * d.toks) AS HUGEINT) * 1000000
            // SUM(o.occ * w.wlen) AS BIGINT) AS tokens_per_char_micro
FROM occ o JOIN done d ON d.word = o.word
JOIN wd w ON w.word = o.word
GROUP BY o.lang
ORDER BY o.lang
""",
    family=_FAM,
)
def llm_tokenizer_wordpiece(spark, sf_dir):
    """WORDPIECE (greedy longest-match-first) tokenization — the
    BERT-family segmentation algorithm, the deterministic counterpart
    to llm_tokenizer_viterbi's optimal-lattice DP: at each position
    take the LONGEST vocabulary piece (word-initial pieces at position
    1, '##'-style continuation pieces after — kind is part of the
    vocabulary key) and advance; single-character pieces are always in
    vocabulary, so no word ever hits UNK and the walk always
    terminates. The vocabulary threshold is CORPUS-RELATIVE
    (count >= total_occurrences/64), so all four step lengths
    including the single-char fallback fire on the checked fixtures
    (the r10 dead-branch lesson) and the op stays meaningful on a
    90k-type Zipf corpus where absolute thresholds collapse.

    Tokenization happens over DISTINCT WORDS ONLY (Heaps-law collapse
    BEFORE any join, the family discipline), weighted back by
    (lang, word) occurrence counts at the end. The step function
    best(word, pos) = max matching piece length collapses greedy's
    argmax into ONE combiner aggregate; the data-dependent walk over
    it is a per-word sequential fold, so it runs as ONE bucketed
    Arrow kernel pass (r16-opt, guide §4.2/§2.4 — the viterbi/croston
    discipline): step rows hash-bucket 256 ways and each word's ≤16
    greedy hops loop inside the kernel, replacing the former 16
    chained equi-join rounds + 4 localCheckpoint plan-depth barriers
    (measured 2.7–2.9 → 1.53 s at sf0.1, outputs bit-identical — the
    kernel replays the identical walk over the identical step rows;
    pinned by tests/test_units.py::test_wordpiece_kernel_matches_join_form).
    The DuckDB twin replays the walk as a recursive CTE over the same
    step function.

    Scale: piece counting and the step function are vocabulary-sized
    (distinct words x <=16 positions x 4 lengths), not corpus-sized;
    the 16 rounds cost O(|vocab|) each. Fertility ratios are integer
    micro-units (DECIMAL(38,0) / HUGEINT twin promotion)."""
    d = table(spark, sf_dir, "documents")
    ws = d.select(
        "lang",
        F.explode(F.split("text", " ")).alias("w"),
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
    )
    import pandas as pd

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # greedy longest-match walk per word, ≤16 hops each: every
        # position p ≤ wlen has a step row (single chars are always in
        # vocabulary), so blen[pos] is total on the walked domain
        out_w, out_t = [], []
        for word, g in pdf.groupby("word", sort=False):
            blen = dict(zip(g["p"].astype(int), g["blen"].astype(int)))
            wlen = len(word)
            pos, toks = 1, 0
            while pos <= wlen:
                pos += blen[pos]
                toks += 1
            out_w.append(word)
            out_t.append(toks)
        return pd.DataFrame({"word": out_w, "toks": out_t})

    toksw = (
        step.withColumn("bkt", F.pmod(F.xxhash64("word"), F.lit(256)))
        .groupBy("bkt")
        .applyInPandas(walk, "word string, toks int")
    )
    j = occ.join(toksw, "word").withColumn("wlen", F.length("word"))
    return (
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
    )


@query(
    "llm_sample_nucleus",
    oracle="""
WITH t AS (
  SELECT lang, source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok
  FROM documents GROUP BY lang, source
),
s AS (
  SELECT lang, source, tok,
         SUM(tok) OVER (PARTITION BY lang) AS tot,
         SUM(tok) OVER (PARTITION BY lang
                        ORDER BY tok DESC, source ASC
                        ROWS UNBOUNDED PRECEDING) - tok AS cum_before
  FROM t
),
k AS (SELECT *, 10 * cum_before < 8 * tot AS kept FROM s)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(MAX(tot) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN kept THEN tok ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(10000 * SUM(CASE WHEN kept THEN tok ELSE 0 END)
            // MAX(tot) AS BIGINT) AS coverage_bp,
       MAX(CASE WHEN kept AND 10 * (cum_before + tok) >= 8 * tot
                THEN source END) AS boundary_source
FROM k
GROUP BY lang
ORDER BY lang
""",
    family=_FAM,
)
def llm_sample_nucleus(spark, sf_dir):
    """NUCLEUS (top-p) SOURCE TRUNCATION — the third data-mix policy
    next to llm_domain_mix's equal-floor and llm_sample_temperature's
    share^(1/T) upsampling: per language, rank sources by token mass
    and keep the smallest prefix whose cumulative mass reaches p=0.8
    (the source that CROSSES p is kept — standard nucleus semantics),
    dropping the long tail of tiny sources whose marginal quality
    risk outweighs their token contribution. The keep rule is the
    integer cross-multiplication 10*cum_before < 8*total — no
    floating shares anywhere, so the cut is engine-exact; the
    boundary source (the one straddling p) is pinned per language,
    and coverage_bp certifies how much mass survives (>=8000 by
    construction).

    Scale: one combiner-shape (lang, source) token count, one
    lang-partitioned ranked cumulative window over the SOURCE frame
    (sources-per-lang rows, never corpus rows), one rollup. The kept
    set would then drive a broadcast semi-join filter over the corpus
    — the policy itself costs O(|sources|)."""
    d = table(spark, sf_dir, "documents")
    t = d.groupBy("lang", "source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tok")
    )
    w_tot = Window.partitionBy("lang")
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("tok").desc(), F.col("source").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = t.select(
        "lang", "source", "tok",
        F.sum("tok").over(w_tot).alias("tot"),
        (F.sum("tok").over(w_cum) - F.col("tok")).alias("cum_before"),
    )
    k = s.withColumn(
        "kept", 10 * F.col("cum_before") < 8 * F.col("tot")
    )
    return (
        k.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_sources"),
            F.sum(F.col("kept").cast("int")).cast("bigint")
            .alias("n_kept"),
            F.max("tot").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("kept"), F.col("tok")).otherwise(0))
            .cast("bigint").alias("kept_tokens"),
            F.expr(
                "CAST(10000 * SUM(CASE WHEN kept THEN tok ELSE 0 END)"
                " DIV MAX(tot) AS BIGINT)"
            ).alias("coverage_bp"),
            F.max(
                F.when(
                    F.col("kept")
                    & (10 * (F.col("cum_before") + F.col("tok"))
                       >= 8 * F.col("tot")),
                    F.col("source"),
                )
            ).alias("boundary_source"),
        )
        .orderBy("lang")
    )


def _unigram_round_sql(r: int) -> str:
    """One EM round of the unigram-trainer oracle (see
    llm_tokenizer_unigram_train): cost table c{r} from vocab v{r},
    lattice edges e{r}, the Viterbi DP rec{r} carrying the canonical
    argmin path (struct MIN = cost first, then the len-encoded path
    string — 'a'..'d' for piece length 4..1, so ties prefer the
    leftmost longest piece), path decode via a running-sum offset, and
    the M-step recount m{r} -> pruned vocab v{r+1}."""
    return f"""
c{r} AS MATERIALIZED (
  SELECT piece, len,
         CAST(1099511627776 + (1048576 - least(cnt, 1048575)) AS BIGINT)
           AS cost
  FROM v{r}),
e{r} AS MATERIALIZED (
  SELECT c.w, c.freq, c.L, c.p, c.len, k.cost,
         CASE c.len WHEN 4 THEN 'a' WHEN 3 THEN 'b' WHEN 2 THEN 'c'
              ELSE 'd' END AS enc
  FROM cand c JOIN c{r} k ON k.piece = c.piece AND k.len = c.len),
rec{r} AS (
  SELECT w, CAST(0 AS BIGINT) AS pos,
         {{'c': CAST(0 AS BIGINT), 'ph': ''}} AS st, 0 AS age
  FROM words
  UNION ALL
  SELECT * FROM (
    SELECT w, pos, st, age + 1 AS age FROM rec{r} WHERE age < 3
    UNION ALL
    SELECT r.w, r.pos + r.age + 1 AS pos,
           MIN({{'c': r.st.c + e.cost, 'ph': r.st.ph || e.enc}}) AS st,
           0 AS age
    FROM rec{r} r
    JOIN e{r} e ON e.w = r.w AND e.p = r.pos + r.age + 1
               AND e.len = r.age + 1
    GROUP BY r.w, r.pos + r.age + 1
  )),
fin{r} AS MATERIALIZED (
  SELECT r.w, wd.freq, r.st.ph AS ph
  FROM rec{r} r JOIN words wd ON wd.w = r.w
  WHERE r.age = 0 AND r.pos = wd.L),
off{r} AS MATERIALIZED (
  SELECT w, freq, i, len,
         SUM(len) OVER (PARTITION BY w ORDER BY i
                        ROWS UNBOUNDED PRECEDING) - len + 1 AS o
  FROM (
    SELECT w, freq, i,
           CASE substr(ph, i, 1) WHEN 'a' THEN 4 WHEN 'b' THEN 3
                WHEN 'c' THEN 2 ELSE 1 END AS len
    FROM (SELECT w, freq, ph,
                 unnest(generate_series(1, length(ph))) AS i
          FROM fin{r}))),
m{r} AS MATERIALIZED (
  SELECT substr(w, CAST(o AS BIGINT), CAST(len AS BIGINT)) AS piece,
         len, SUM(freq) AS cnt
  FROM off{r} GROUP BY 1, 2),
v{r + 1} AS MATERIALIZED (
  SELECT ch.piece, 1 AS len, COALESCE(m.cnt, 0) AS cnt
  FROM chars ch LEFT JOIN m{r} m ON m.piece = ch.piece AND m.len = 1
  UNION ALL
  SELECT piece, len, cnt FROM m{r}
  WHERE len >= 2
    AND 64 * cnt >= (SELECT MAX(cnt) FROM m{r} WHERE len >= 2))"""


def _unigram_oracle(rounds: int = 3) -> str:
    body = ",".join(_unigram_round_sql(r) for r in range(1, rounds + 1))
    return f"""
WITH RECURSIVE
words AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, length(w) AS L
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) BETWEEN 1 AND 24 GROUP BY w),
cand AS MATERIALIZED (
  SELECT w, freq, L, p, len, substr(w, p - len + 1, len) AS piece
  FROM (SELECT *, unnest(generate_series(1, L)) AS p FROM words),
       (SELECT unnest([1, 2, 3, 4]) AS len)
  WHERE len <= p),
seed AS MATERIALIZED (
  SELECT piece, len, SUM(freq) AS cnt FROM cand GROUP BY piece, len),
chars AS MATERIALIZED (SELECT piece FROM seed WHERE len = 1),
v1 AS MATERIALIZED (
  SELECT piece, len, cnt FROM seed WHERE len = 1
  UNION ALL
  SELECT piece, len, cnt FROM seed
  WHERE len >= 2
    AND 64 * cnt >= (SELECT MAX(cnt) FROM seed WHERE len >= 2)),
{body},
v2sub AS (SELECT piece, len, cnt FROM v{rounds + 1} WHERE len >= 2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab2,
               CAST(SUM(cnt) AS BIGINT) AS cnt2_sum FROM v2sub),
ranked AS (
  SELECT row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rank,
         piece, len, cnt
  FROM v2sub)
SELECT CAST(rank AS BIGINT) AS rank, piece, CAST(len AS BIGINT) AS len,
       CAST(cnt AS BIGINT) AS cnt, n_vocab2, cnt2_sum
FROM ranked, tot WHERE rank <= 40 ORDER BY rank
"""


@query("llm_tokenizer_unigram_train", oracle=_unigram_oracle(3), family=_FAM)
def llm_tokenizer_unigram_train(spark, sf_dir):
    """UNIGRAM-LM TOKENIZER TRAINING (r13 — VERDICT r12 next-round item
    5, the missing half of the tokenizer story: llm_tokenizer_viterbi
    APPLIES a unigram model; SentencePiece TRAINS one by EM, Kudo
    2018). Hard-EM (Viterbi-EM) over the DISTINCT-WORD frame with the
    engine's integer-exact cost ladder: piece cost = 2^40 + (2^20 -
    min(count, 2^20-1)) (fewest-tokens primary, frequency tie-break,
    the llm_tokenizer_viterbi rule), seed vocabulary = all substrings
    of length 1..4 with relative-to-mode support (64*cnt >= max cnt),
    single chars always kept so every word segments. Each of 3 rounds:
    E-step Viterbi-segments every distinct word under current costs
    with a CANONICAL tie-break (min over (cost, path) where the path
    encodes piece lengths 'a'..'d' for 4..1 — equal cost means equal
    token count, so lexicographic path-min prefers the leftmost
    longest piece deterministically in both engines); M-step recounts
    pieces from the chosen segmentations weighted by word frequency;
    prune drops len>=2 pieces below 1/64 of the round's modal count.
    The final vocabulary hash-checks rank-for-rank (top 40 by count,
    piece tie-break) plus its global size and mass — vocab convergence
    is checked identically, not summarized.

    Spark-first shape (r15-opt, guide §4.2/§2.3/§2.4 — the
    llm_embed_opq / llm_quality_classifier_train driver-model
    discipline): ALL data-sized work stays distributed — the word
    frame collapses by Heaps' law (|words| << corpus) and every pass
    over it is one Arrow kernel emitting combiner-shape (piece, cnt)
    partials folded by a tiny groupBy. The VOCABULARY is the model —
    bounded by the alphabet (Σ|charset|^k, k ≤ 4) and, after the
    relative-to-mode prune, within 64× of the modal count — so the
    cost table rides INTO each round's kernel as a plain dict closure
    (no candidate-explode frame, no broadcast join, no per-round
    checkpoint barrier) and the prune/weight bookkeeping is exact
    driver integer arithmetic, exactly the committed classifier-train
    pattern. Per round: ONE kernel pass + one tiny exchange, versus
    the r13 shape's broadcast join + 512-bucket applyInPandas shuffle
    + recount shuffle + two prune jobs with a localCheckpoint barrier
    each. The per-word DP is unchanged line-for-line (tuple-min over
    (cost, path); min is enumeration-order independent, and distinct
    piece lengths always yield distinct paths, so the inline dict
    lookup is bit-identical to the old (piece, len) equi-join — the
    join key was piece alone, since a substring's length IS its
    piece's length). The DuckDB oracle replays the identical 3
    rounds: the DP is a lockstep recursive CTE whose state is a
    (cost, path) STRUCT under MIN — struct comparison is
    field-ordered, so the SQL argmin IS the kernel's tuple min.

    Scale: at 100 TB the word frame is ~10^7 rows per language
    (distributed, repartition pinned to defaultParallelism — the r8
    AQE-coalesce lesson); driver state is only the pruned vocab
    (mode-relative: ≤ 64 count-classes above 1/64 of the mode, plus
    the charset), and each round moves one vocab-sized partial set
    through one exchange."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_toks()).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= 24))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .repartition(spark.sparkContext.defaultParallelism, "w")
        .localCheckpoint()
    )

    def sub_kernel(batches):
        # seed support: every end-position substring of length 1..4,
        # weighted by word frequency — the old cand explode + groupBy,
        # now per-batch dict partials (combiner shape).
        import pandas as pd

        for b in batches:
            acc: dict = {}
            for w, freq in zip(b["w"], b["freq"]):
                f = int(freq)
                for p in range(1, len(w) + 1):
                    for ln in (1, 2, 3, 4):
                        if ln > p:
                            break
                        pc = w[p - ln:p]
                        acc[pc] = acc.get(pc, 0) + f
            yield pd.DataFrame(
                {"piece": list(acc), "cnt": list(acc.values())}
            )

    def fold(kern):
        """One kernel pass over the word frame, piece partials folded
        by one tiny exchange, collected as the vocab-sized model."""
        return {
            r["piece"]: int(r["cnt"])
            for r in words.mapInPandas(kern, "piece string, cnt long")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .collect()
        }

    def prune(counts: dict) -> dict:
        """len-1 pieces (the seed charset) always survive, coalesced
        to their new count; len>=2 pieces need 64*cnt >= the round's
        modal len>=2 count — exact driver ints, same rule as the old
        crossJoin(broadcast(max)) + coalesce form."""
        c2 = {p: c for p, c in counts.items() if len(p) >= 2}
        mx = max(c2.values()) if c2 else None
        vocab = {p: c for p, c in c2.items() if 64 * c >= mx} if c2 else {}
        for ch in chars:
            vocab[ch] = counts.get(ch, 0)
        return vocab

    seed = fold(sub_kernel)
    chars = sorted(p for p in seed if len(p) == 1)
    # seed vocab v1 uses the same relative-to-mode rule on raw
    # substring support (chars from seed itself, so coalesce is exact)
    vocab = prune(seed)

    def make_estep(cost: dict):
        def estep(batches):
            import pandas as pd

            ENC = {4: "a", 3: "b", 2: "c", 1: "d"}
            DEC = {"a": 4, "b": 3, "c": 2, "d": 1}
            for b in batches:
                acc: dict = {}
                for w, freq in zip(b["w"], b["freq"]):
                    f = int(freq)
                    L = len(w)
                    best: list = [(0, "")] + [None] * L
                    for p in range(1, L + 1):
                        bst = None
                        for ln in (1, 2, 3, 4):
                            if ln > p:
                                break
                            c = cost.get(w[p - ln:p])
                            if c is None:
                                continue
                            prev = best[p - ln]
                            if prev is None:
                                continue
                            st = (prev[0] + c, prev[1] + ENC[ln])
                            if bst is None or st < bst:
                                bst = st
                        best[p] = bst
                    off = 0
                    for ch in best[L][1]:
                        ln = DEC[ch]
                        pc = w[off:off + ln]
                        acc[pc] = acc.get(pc, 0) + f
                        off += ln
                yield pd.DataFrame(
                    {"piece": list(acc), "cnt": list(acc.values())}
                )

        return estep

    for _r in range(3):
        cost = {
            p: 2 ** 40 + (2 ** 20 - min(c, 2 ** 20 - 1))
            for p, c in vocab.items()
        }
        vocab = prune(fold(make_estep(cost)))

    v2 = sorted(
        ((p, c) for p, c in vocab.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )
    n2, s2 = len(v2), sum(c for _, c in v2)
    return spark.createDataFrame(
        [
            (r + 1, p, len(p), c, n2, s2)
            for r, (p, c) in enumerate(v2[:40])
        ],
        schema="rank bigint, piece string, len bigint, cnt bigint,"
               " n_vocab2 bigint, cnt2_sum bigint",
    ).orderBy("rank")


@query(
    "llm_lm_score_kn",
    oracle="""
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
cont AS (
  SELECT w2, COUNT(*) AS n1bwd FROM train_big GROUP BY w2
),
tot AS (
  SELECT (SELECT COUNT(*) FROM train_big) AS n1p_total,
         (SELECT COUNT(DISTINCT w) FROM (
            SELECT unnest(l) AS w FROM tok WHERE doc_id % 2 = 0)) AS v
),
scored AS (
  SELECT b.doc_id,
         COUNT(*) AS n_transitions,
         SUM(CAST(round(-ln(
           CASE WHEN h.cw1 IS NOT NULL THEN
             greatest(CAST(COALESCE(tb.bcnt, 0) AS DOUBLE) - 0.75, 0.0)
               / CAST(h.cw1 AS DOUBLE)
             + 0.75 * CAST(h.n1fwd AS DOUBLE) / CAST(h.cw1 AS DOUBLE)
               * ((CAST(COALESCE(c.n1bwd, 0) AS DOUBLE) + 1.0)
                  / (CAST(t.n1p_total AS DOUBLE) + CAST(t.v AS DOUBLE) + 1.0))
           ELSE
             (CAST(COALESCE(c.n1bwd, 0) AS DOUBLE) + 1.0)
               / (CAST(t.n1p_total AS DOUBLE) + CAST(t.v AS DOUBLE) + 1.0)
           END) * 1000000.0) AS BIGINT)) AS nll_micro,
         SUM(CASE WHEN tb.bcnt IS NOT NULL THEN 1 ELSE 0 END) AS n_seen,
         SUM(CASE WHEN h.cw1 IS NULL THEN 1 ELSE 0 END) AS n_unseen_history
  FROM big b
  LEFT JOIN train_big tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
  LEFT JOIN hist h ON b.w1 = h.w1
  LEFT JOIN cont c ON b.w2 = c.w2
  CROSS JOIN tot t
  GROUP BY b.doc_id
)
SELECT doc_id,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(nll_micro AS BIGINT) AS nll_micro,
       CAST(nll_micro AS DOUBLE) / n_transitions AS mean_nll_micro,
       CAST(n_seen AS BIGINT) AS n_seen,
       CAST(n_unseen_history AS BIGINT) AS n_unseen_history,
       doc_id % 2 = 0 AS in_train
FROM scored
""",
    family=_FAM,
)
def llm_lm_score_kn(spark, sf_dir):
    """KNESER-NEY smoothed bigram LM scoring (r13 — VERDICT r12
    next-round item 6: the perplexity-filter upgrade over
    llm_lm_score_bigram's stupid backoff; interpolated KN with absolute
    discounting, Kneser & Ney 1995 / Chen & Goodman 1998):

        P(w2|w1) = max(C(w1,w2) - D, 0)/C(w1)
                   + D * N1+(w1,.)/C(w1) * Pcont(w2),   D = 0.75
        Pcont(w2) = (N1+(.,w2) + 1) / (N1+(..) + V + 1)

    where N1+(w1,.) is the count of distinct continuations of w1,
    N1+(.,w2) the distinct histories of w2, N1+(..) total bigram types
    and V the training vocabulary (add-one on the continuation
    distribution keeps every probability > 0, so OOV tokens score
    finitely). Unknown history (C(w1)=0) falls back to Pcont alone.
    The model trains on the even-doc half and scores every doc, so
    held-out docs exercise the discount, interpolation, and
    unknown-history paths for real; n_seen / n_unseen_history are
    per-doc domain signals. This is the quality gate every production
    pretraining pipeline runs (CCNet-style perplexity filtering) with
    the smoothing that actually wins at it.

    Determinism: the llm_lm_score_bigram discipline — all model
    quantities are INTEGER counts; each transition's probability is
    one closed-form double expression over those integers, -ln'd and
    quantized to integer micro-units before the order-independent sum.
    ln() is not correctly rounded IEEE, so a 1-ulp cross-engine
    difference could in principle flip round() at a .5 boundary; the
    boundary margin is MEASURED (r13 ADVICE): over every transition of
    the fixture corpora the minimum distance of -ln(p)*1e6 to a .5
    boundary is 2.6e-3 / 8.4e-5 / 9.4e-5 (sf0.001/0.01/0.1) vs a
    maximum ulp of ~1.9e-9 — a ≥5e4× safety factor, re-pinned every
    run by tests/test_units.py::test_lm_score_kn_rounding_margin.
    Scale: all three model tables (bigram types, history stats,
    continuation stats) are combiner aggregations over the bigram-TYPE
    frame (vocab-squared bounded, Heaps-collapsed); scoring is three
    unhinted shuffle equi-joins on the instance frame plus ONE
    broadcast 1-row totals aggregate — no driver scalar, one lazy
    plan."""
    d = table(spark, sf_dir, "documents")
    # r15-opt NOTE: a tok localCheckpoint (the bigram scorer's win) was
    # A/B'd here and measured FLAT across three pairs — kn already
    # checkpoints train_big, which covers the expensive reuse. Left lazy.
    tok = fan_out(d.select("doc_id", _toks().alias("l")))
    big = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(l) >= 2,"
                " transform(sequence(1, size(l) - 1),"
                "  i -> struct(element_at(l, i) AS w1, element_at(l, i+1) AS w2)),"
                " array())"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # the bigram-TYPE frame feeds FOUR consumers (scoring join, history
    # stats, continuation stats, totals) — checkpoint it once so the
    # corpus explode + type aggregation run once, not four times (the
    # llm_rag_mmr multi-consumer lesson; vocab-squared bounded frame)
    train_big = (
        big.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("bcnt"))
        .localCheckpoint()
    )
    hist = train_big.groupBy("w1").agg(
        F.sum("bcnt").alias("cw1"), F.count("*").alias("n1fwd")
    )
    cont = train_big.groupBy("w2").agg(F.count("*").alias("n1bwd"))
    v = (
        tok.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("l").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    tot = train_big.agg(F.count("*").alias("n1p_total")).crossJoin(
        F.broadcast(v)
    )
    pcont = (
        (F.coalesce(F.col("n1bwd"), F.lit(0)).cast("double") + 1.0)
        / (F.col("n1p_total").cast("double") + F.col("v").cast("double") + 1.0)
    )
    p = F.when(
        F.col("cw1").isNotNull(),
        F.greatest(
            F.coalesce(F.col("bcnt"), F.lit(0)).cast("double") - 0.75,
            F.lit(0.0),
        ) / F.col("cw1").cast("double")
        + 0.75 * F.col("n1fwd").cast("double") / F.col("cw1").cast("double")
        * pcont,
    ).otherwise(pcont)
    scored = (
        big.join(train_big, ["w1", "w2"], "left")
        .join(hist, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.sum(F.round(-F.log(p) * 1000000.0).cast("bigint"))
            .alias("nll_micro"),
            F.sum(F.when(F.col("bcnt").isNotNull(), 1).otherwise(0))
            .alias("n_seen"),
            F.sum(F.when(F.col("cw1").isNull(), 1).otherwise(0))
            .alias("n_unseen_history"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.col("nll_micro").cast("bigint").alias("nll_micro"),
        (F.col("nll_micro").cast("double") / F.col("n_transitions"))
        .alias("mean_nll_micro"),
        F.col("n_seen").cast("bigint").alias("n_seen"),
        F.col("n_unseen_history").cast("bigint").alias("n_unseen_history"),
        (F.col("doc_id") % 2 == 0).alias("in_train"),
    )


# ---- trained quality classifier ---------------------------------------
_QC_B = 64            # hashed feature buckets
_QC_S = 10 ** 9       # fast-sigmoid margin scale (micro^2 units)
_QC_LRDEN = 10 ** 5   # learning-rate denominator (per-doc)
_QC_ROUNDS = 6        # emitted trace rows (5 weight updates)


def _qc_round_sql(r: int, with_stats: bool) -> str:
    """One GD round's CTEs: margins against w_r, fast-sigmoid
    probabilities, (optionally) trace stats, gradient, w_{r+1}. Shared
    by the train oracle (with stats) and the apply oracle (weight
    chain only)."""
    st = f""",
st{r} AS (
  SELECT {r} AS round,
         (SELECT CAST(SUM(CAST(wv >= 0 AS BIGINT) * wv
                          - CAST(wv < 0 AS BIGINT) * wv) AS BIGINT)
          FROM w{r}) AS w_l1,
         CAST(SUM((p - y * 1000000) * (p - y * 1000000)) AS BIGINT)
           AS brier_micro2,
         CAST(COUNT(*) FILTER (WHERE (p > 500000) = (y = 1)) AS BIGINT)
           AS n_correct,
         CAST(COUNT(*) FILTER (WHERE (p > 500000) = (y = 1)) * 10000
              // COUNT(*) AS BIGINT) AS accuracy_bp,
         CAST(COUNT(*) FILTER (WHERE p > 500000) AS BIGINT) AS n_pred_pos
  FROM p{r}
)""" if with_stats else ""
    return f"""
marg{r} AS (
  SELECT f.doc_id, SUM(f.x * w.wv) AS m
  FROM feats f JOIN w{r} w ON w.bucket = f.bucket
  GROUP BY f.doc_id
),
p{r} AS MATERIALIZED (
  SELECT l.doc_id, l.y,
         500000 + (500000 * m.m) // ({_QC_S} + abs(m.m)) AS p
  FROM labels l JOIN marg{r} m ON m.doc_id = l.doc_id
){st},
grad{r} AS (
  SELECT f.bucket, SUM((p.p - p.y * 1000000) * f.x) AS g
  FROM feats f JOIN p{r} p ON p.doc_id = f.doc_id
  GROUP BY f.bucket
),
w{r + 1} AS MATERIALIZED (
  SELECT w.bucket,
         w.wv - g.g // ((SELECT n FROM nn) * {_QC_LRDEN}) AS wv
  FROM w{r} w JOIN grad{r} g ON g.bucket = w.bucket
)"""


def _qc_base_sql() -> str:
    """Shared feature/label CTE prefix of the classifier oracles:
    Gopher teacher labels, hashed L1-normalized features (+bias,
    +length), zero-initialized weights."""
    return f"""nn AS (SELECT COUNT(*) AS n FROM documents),
gop AS (
  SELECT doc_id, words, text FROM (
    SELECT doc_id, string_split(text, ' ') AS words, text FROM documents)
),
labels AS MATERIALIZED (
  SELECT doc_id, CASE WHEN (n_words BETWEEN 50 AND 100000)
      AND (CAST(n_word_chars AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
      AND (CAST(n_alpha AS DOUBLE) / n_words >= 0.8)
      AND n_stop >= 2 THEN 1 ELSE 0 END AS y
  FROM (
    SELECT doc_id, len(words) AS n_words,
           length(replace(text, ' ', '')) AS n_word_chars,
           len(list_filter(words, x -> regexp_full_match(x, '[a-z]+')))
             AS n_alpha,
           len(list_intersect(list_distinct(words),
                              ['the','a','of','and','to','in'])) AS n_stop
    FROM gop)
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nw AS (
  SELECT doc_id, COUNT(*) AS n FROM tok WHERE w <> '' GROUP BY doc_id
),
bkt AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 6))::BIGINT % {_QC_B} AS bucket
  FROM tok WHERE w <> ''
),
feats AS MATERIALIZED (
  SELECT c.doc_id, c.bucket, (c.c * 10000) // n.n AS x
  FROM (SELECT doc_id, bucket, COUNT(*) AS c FROM bkt
        GROUP BY doc_id, bucket) c
  JOIN nw n ON n.doc_id = c.doc_id
  UNION ALL SELECT doc_id, -1, 10000 FROM documents
  UNION ALL SELECT doc_id, -2, n * 100 FROM nw
),
w0 AS (
  SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS wv FROM feats
)"""


def _qc_oracle() -> str:
    """Unrolled GD replay (train): shared base CTEs, then per round r
    margins/probabilities/trace-stats/gradient/w_{r+1}. Pure integer
    arithmetic (trunc-div //), no exp/ln anywhere — bit-identical
    across engines by construction."""
    rounds = [_qc_round_sql(r, with_stats=True) for r in range(_QC_ROUNDS)]
    stats = [f"SELECT * FROM st{r}" for r in range(_QC_ROUNDS)]
    return f"""
WITH {_qc_base_sql()},{",".join(rounds)}
SELECT round, w_l1, brier_micro2, n_correct, accuracy_bp, n_pred_pos
FROM ({" UNION ALL ".join(stats)})
ORDER BY round
"""


def _qc_apply_oracle() -> str:
    """Serving-path replay (apply): the weight chain through w_{R-1}
    (the FINAL reported training round's weights — the vector whose
    trace row the train op emits last), then one scoring pass over the
    whole corpus plus confusion / precision-recall totals against the
    Gopher teacher labels."""
    wf = _QC_ROUNDS - 1
    rounds = [_qc_round_sql(r, with_stats=False) for r in range(wf)]
    return f"""
WITH {_qc_base_sql()},{",".join(rounds)},
margF AS (
  SELECT f.doc_id, SUM(f.x * w.wv) AS m
  FROM feats f JOIN w{wf} w ON w.bucket = f.bucket
  GROUP BY f.doc_id
),
cls AS MATERIALIZED (
  SELECT l.doc_id, l.y,
         500000 + (500000 * m.m) // ({_QC_S} + abs(m.m)) AS p
  FROM labels l JOIN margF m ON m.doc_id = l.doc_id
),
conf AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE p > 500000 AND y = 1) AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (WHERE p > 500000 AND y = 0) AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (WHERE p <= 500000 AND y = 0) AS BIGINT) AS tn,
    CAST(COUNT(*) FILTER (WHERE p <= 500000 AND y = 1) AS BIGINT) AS fn
  FROM cls
)
SELECT c.doc_id,
       CAST(c.p AS BIGINT) AS score_micro,
       c.p > 500000 AS keep,
       CAST(c.y AS INT) AS teacher_y,
       CASE WHEN c.p > 500000 AND c.y = 1 THEN 'TP'
            WHEN c.p > 500000 THEN 'FP'
            WHEN c.y = 1 THEN 'FN' ELSE 'TN' END AS cell,
       f.tp, f.fp, f.tn, f.fn,
       CAST(CASE WHEN f.tp + f.fp > 0
                 THEN f.tp * 10000 // (f.tp + f.fp) ELSE -1 END
            AS BIGINT) AS precision_bp,
       CAST(CASE WHEN f.tp + f.fn > 0
                 THEN f.tp * 10000 // (f.tp + f.fn) ELSE -1 END
            AS BIGINT) AS recall_bp,
       CAST(CASE WHEN 2 * f.tp + f.fp + f.fn > 0
                 THEN 2 * f.tp * 10000 // (2 * f.tp + f.fp + f.fn)
                 ELSE -1 END AS BIGINT) AS f1_bp
FROM cls c CROSS JOIN conf f
ORDER BY c.doc_id
"""


def _qc_wide(spark, sf_dir):
    """r15-opt (guide §4.2/§2.4): the hashed features as ONE dense row
    per doc — a 66-slot bigint vector indexed slot = bucket + 2
    (length, bias, 64 hash buckets) — built by a single Arrow kernel
    pass over documents (tokenize + md5 bucket counts + integer L1
    quantization in one go) instead of the explode + conv(md5) long
    chain with its two tokenization scans and three shuffles; each GD
    round then runs as one kernel pass instead of two broadcast-join +
    groupBy passes. Buckets absent from a doc are exact zeros (x = 0
    contributes nothing to any sum), and buckets absent from the whole
    corpus stay at weight 0 forever (gradient 0, trunc-div step 0), so
    the dense form computes bit-identical margins, gradients and trace
    stats to the sparse join form — the feature kernel is pinned
    against the Spark long chain by
    tests/test_units.py::test_qc_dense_features_match_join_form and
    the round kernel by ::test_qc_kernel_round_matches_join_form."""
    n_docs = corpus_stats.n_docs(spark, sf_dir)
    d = table(spark, sf_dir, "documents")

    def feat_kernel(batches):
        # One documents pass replaces the explode + conv(md5) feature
        # chain (two tokenization scans, three shuffles) AND the
        # separate Gopher teacher pass + label join: hashlib.md5 of
        # the UTF-8 token == Spark md5(w), first 6 hex digits base-16
        # == conv(substr(md5(w),1,6),16,10); the count quantization
        # (c*10000)//n == `(c*10000) DIV n` (both operands positive);
        # the teacher label replays llm_quality_gopher's keep rule
        # with the same exact-integer counts and single IEEE double
        # divisions (py `$` == Java `$`: both match before one final
        # newline only; len(text)-count(' ') == length(regexp_replace)
        # on this corpus, no UTF-16 surrogate pairs in the fixtures).
        # Docs with no non-empty token keep the bias slot only —
        # exactly the sparse form, where the length row exists iff the
        # doc has an nw row.
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        alpha = re.compile(r"^[a-z]+$")
        stops = {"the", "a", "of", "and", "to", "in"}
        for b in batches:
            if not len(b):
                continue
            ids = b["doc_id"].to_numpy(dtype=np.int64)
            out = np.zeros((len(b), 66), dtype=np.int64)
            out[:, 1] = 10000  # bias feature (bucket -1 -> slot 1)
            ys = np.zeros(len(b), dtype=np.int32)
            for i, txt in enumerate(b["text"]):
                if txt is None:
                    continue
                words = txt.split(" ")
                toks = [w for w in words if w]
                n = len(toks)
                if n:
                    out[i, 0] = n * 100  # length feature (bucket -2)
                    c = np.zeros(_QC_B, dtype=np.int64)
                    for w in toks:
                        c[int(hashlib.md5(w.encode()).hexdigest()[:6],
                              16) % _QC_B] += 1
                    out[i, 2:] = (c * 10000) // n
                n_words = len(words)
                n_chars = len(txt) - txt.count(" ")
                n_alpha = sum(1 for w in words if alpha.search(w))
                n_stop = len(stops.intersection(words))
                mean_wl = n_chars / n_words
                if (50 <= n_words <= 100000
                        and 3.0 <= mean_wl <= 10.0
                        and n_alpha / n_words >= 0.8
                        and n_stop >= 2):
                    ys[i] = 1
            yield pd.DataFrame({
                "doc_id": ids, "xs": list(out), "y": ys,
            })

    wide = (
        d.select("doc_id", "text")
        .mapInPandas(feat_kernel, "doc_id long, xs array<long>, y int")
        .localCheckpoint()
    )
    return wide, n_docs


def _qc_tdiv(a: int, b: int) -> int:
    """Trunc-toward-zero integer division — Spark DIV == DuckDB //
    (the repo-wide spelling, same as llm_similarity's _tdiv)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _qc_round_pass(wide, wts):
    """One GD round as ONE mapInPandas pass over the dense frame:
    margins m = X·w, rational fast-sigmoid p, residual r = p - y*1e6,
    then per-batch partials — 66 gradient sums XᵀR plus the three
    trace sums (Brier, n_correct, n_pred_pos) — folded on the driver
    (model-sized: 69 ints per batch, the llm_embed_opq marker-row
    discipline). Integer-exact: every partial is an int64 sum whose
    magnitude is bounded by batch_rows * 1e6 * max|x| (~2e14 at 10k
    Arrow rows), and the driver fold is arbitrary-precision python
    ints, so batch boundaries cannot perturb a bit."""
    wts = tuple(int(v) for v in wts)
    s_const = _QC_S

    def kern(batches):
        import numpy as np
        import pandas as pd

        W = np.array(wts, dtype=np.int64)
        G = np.zeros(66, dtype=np.int64)
        tr = [0, 0, 0]
        for b in batches:
            if not len(b):
                continue
            X = np.array(b["xs"].tolist(), dtype=np.int64)
            y = b["y"].to_numpy(dtype=np.int64)
            m = X @ W
            num = 500000 * m
            q = np.abs(num) // (s_const + np.abs(m))
            p = 500000 + np.where(num >= 0, q, -q)
            r = p - y * 1000000
            G += X.T @ r
            tr[0] += int(np.dot(r, r))
            tr[1] += int(np.count_nonzero((p > 500000) == (y == 1)))
            tr[2] += int(np.count_nonzero(p > 500000))
        rows = [(i, int(G[i])) for i in range(66)]
        rows += [(100, tr[0]), (101, tr[1]), (102, tr[2])]
        yield pd.DataFrame(rows, columns=["k", "v"])

    grad = [0] * 66
    brier = n_correct = n_pred_pos = 0
    for row in wide.mapInPandas(kern, "k int, v long").collect():
        if row.k < 66:
            grad[row.k] += row.v
        elif row.k == 100:
            brier += row.v
        elif row.k == 101:
            n_correct += row.v
        else:
            n_pred_pos += row.v
    return grad, brier, n_correct, n_pred_pos


def _qc_weight_chain(wide, n_docs, n_passes, traces=None):
    """Replay the integer GD chain: n_passes kernel passes, each
    producing round r's gradient/trace against weights w_r, with the
    w_{r+1} = w_r - g DIV (n_docs * lr_den) step as driver arithmetic
    on the 66-value model (exactly the join form's `wv - g DIV d`,
    trunc-div). Returns the final weight vector; appends per-round
    trace rows to ``traces`` when given."""
    d = n_docs * _QC_LRDEN
    w = [0] * 66
    for r in range(n_passes):
        grad, brier, n_correct, n_pred_pos = _qc_round_pass(wide, w)
        if traces is not None:
            traces.append((
                r,
                sum(abs(v) for v in w),
                brier,
                n_correct,
                _qc_tdiv(n_correct * 10000, n_docs),
                n_pred_pos,
            ))
        w = [wv - _qc_tdiv(g, d) for wv, g in zip(w, grad)]
    return w


def _qc_score_pass(wide, wts):
    """Frozen-weights scoring pass (apply's serving path): one Arrow
    kernel emitting per-doc (doc_id, y, p) with the same integer
    margin/sigmoid spelling as the round pass."""
    wts = tuple(int(v) for v in wts)
    s_const = _QC_S

    def kern(batches):
        import numpy as np
        import pandas as pd

        W = np.array(wts, dtype=np.int64)
        for b in batches:
            if not len(b):
                continue
            X = np.array(b["xs"].tolist(), dtype=np.int64)
            m = X @ W
            num = 500000 * m
            q = np.abs(num) // (s_const + np.abs(m))
            p = 500000 + np.where(num >= 0, q, -q)
            yield pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
                "y": b["y"].to_numpy(dtype=np.int64),
                "p": p,
            })

    return wide.mapInPandas(kern, "doc_id long, y long, p long")


@query("llm_quality_classifier_train", oracle=_qc_oracle(), family=_FAM)
def llm_quality_classifier_train(spark, sf_dir):
    """TRAINED QUALITY CLASSIFIER (r14, VERDICT r13 item 8 — the
    fastText-classifier stage every production pretraining pipeline
    runs between the Gopher rule battery and the LM-perplexity gate):
    a linear classifier over HASHED features (llm_feature_hashing's
    md5 trick, 64 buckets, L1-normalized counts in fixed-point ppm-of-
    10k, plus explicit bias and length features — the fastText shape)
    trained by 5 full-batch gradient-descent rounds to DISTILL the
    Gopher rule battery into a single score (weak supervision: the
    rules are the teacher, exactly how production classifiers bootstrap
    from heuristics). Labels come from llm_quality_gopher's keep rule.

    Determinism (the reason this trains bit-identically in two
    engines): NO exp/ln anywhere — the link is the rational fast
    sigmoid p = 1/2 + m/(2(S+|m|)) in integer micro-units, the loss is
    integer Brier (squared error in micro^2), gradients and weight
    updates are exact integer sums with trunc-div learning steps.
    Every quantity in the trace is an exact integer both engines
    reproduce; the oracle replays all rounds unrolled.

    Result = the TRAINING TRACE, one row per round: L1 weight mass,
    Brier loss, correct count, accuracy bp, predicted-positive count.
    Measured at sf0.01: Brier falls monotonically 125000 -> 109691
    (x1e9 micro^2) and accuracy climbs 5320 -> 9060/9140 bp over the 5
    updates vs a 53% base rate — the trace IS the evidence the
    optimizer works, hash-checked value by value.

    Scale: each round is one broadcast join of the 66-row weight
    vector against the hashed feature frame + two combiner aggregates
    (margins per doc, gradient per bucket) — no dictionary, no
    per-token state, the hashing-trick property that makes this run
    streaming-style at 100 TB. Full-batch GD rounds are deterministic
    by construction; at cluster scale the same plan runs on a
    per-shard sample with federated gradient sums (still exact
    integers)."""
    # r15-opt (guide §4.2, the llm_embed_opq discipline): each of the
    # 6 rounds was two broadcast-join + double-groupBy passes over the
    # long feature frame with a localCheckpoint barrier each (12 passes,
    # 13 checkpoints, 18-exchange trace tail); now ONE dense-frame
    # Arrow kernel pass per round with the 66-value weight step and the
    # trace row as driver arithmetic — 6 passes, 0 joins.
    wide, n_docs = _qc_wide(spark, sf_dir)
    traces: list[tuple] = []
    _qc_weight_chain(wide, n_docs, _QC_ROUNDS, traces=traces)
    return spark.createDataFrame(
        traces,
        schema="round int, w_l1 long, brier_micro2 long,"
               " n_correct long, accuracy_bp long, n_pred_pos long",
    ).orderBy("round")


@query("llm_quality_classifier_apply", oracle=_qc_apply_oracle(),
       family=_FAM)
def llm_quality_classifier_apply(spark, sf_dir):
    """QUALITY CLASSIFIER SERVING PATH (r15 — VERDICT r14 item 4, the
    missing half of the train/apply split that IS the production shape:
    train nightly on a sample, score 100 TB with frozen weights): replay
    the integer GD weight chain to the FINAL reported round's weight
    vector (w_{R-1}, the 66-row model whose accuracy the training trace
    ends on — _QC_ROUNDS-1 updates from zero init), FREEZE it, and score
    the whole corpus in ONE broadcast join + combiner aggregate per doc.
    Emits per-doc score (integer micro-units), the keep decision, the
    Gopher teacher label, the confusion cell, and corpus-level
    TP/FP/TN/FN + precision/recall/F1 in basis points (trunc-div — every
    value an exact integer both engines reproduce; -1 sentinel when a
    denominator is empty).

    Scoring cost is the hashing-trick property: no vocabulary, no
    dictionary join — md5-bucket counts + one 66-row broadcast join,
    streaming-shape at any corpus size. The weight replay is model-sized
    work (66-row frames per round, localCheckpointed); on a cluster the
    weights would load from the model store instead — the scoring plan
    below is exactly the one that runs either way.

    Measured at sf0.01 vs the Gopher teacher: precision 8528 bp /
    recall 9658 bp / F1 9058 bp (tp=226 fp=39 tn=227 fn=8) — the
    trace's round-5 accuracy, now decomposed per error type: the
    distilled model over-keeps (fp-heavy), the safe failure direction
    for a pretraining pre-filter."""
    # r15-opt: weight-chain replay through the same per-round Arrow
    # kernel as train (5 passes, driver-side trunc-div steps), then a
    # single frozen-weights scoring kernel — the serving plan below the
    # checkpoint is unchanged.
    wide, n_docs = _qc_wide(spark, sf_dir)
    w_final = _qc_weight_chain(wide, n_docs, _QC_ROUNDS - 1)
    scored = _qc_score_pass(wide, w_final).localCheckpoint()
    conf = scored.agg(
        F.sum(F.when((F.col("p") > 500000) & (F.col("y") == 1), 1)
              .otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when((F.col("p") > 500000) & (F.col("y") == 0), 1)
              .otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when((F.col("p") <= 500000) & (F.col("y") == 0), 1)
              .otherwise(0)).cast("bigint").alias("tn"),
        F.sum(F.when((F.col("p") <= 500000) & (F.col("y") == 1), 1)
              .otherwise(0)).cast("bigint").alias("fn"),
    )
    return (
        scored.crossJoin(F.broadcast(conf))
        .select(
            "doc_id",
            F.col("p").cast("bigint").alias("score_micro"),
            (F.col("p") > 500000).alias("keep"),
            F.col("y").cast("int").alias("teacher_y"),
            F.when((F.col("p") > 500000) & (F.col("y") == 1), "TP")
            .when(F.col("p") > 500000, "FP")
            .when(F.col("y") == 1, "FN")
            .otherwise("TN").alias("cell"),
            "tp", "fp", "tn", "fn",
            F.expr("CAST(IF(tp + fp > 0, tp * 10000 DIV (tp + fp), -1)"
                   " AS BIGINT)").alias("precision_bp"),
            F.expr("CAST(IF(tp + fn > 0, tp * 10000 DIV (tp + fn), -1)"
                   " AS BIGINT)").alias("recall_bp"),
            F.expr("CAST(IF(2 * tp + fp + fn > 0,"
                   " 2 * tp * 10000 DIV (2 * tp + fp + fn), -1)"
                   " AS BIGINT)").alias("f1_bp"),
        )
        .orderBy("doc_id")
    )


_LSA_V, _LSA_Q, _LSA_R = 64, 4096, 4


def _lsa_oracle() -> str:
    """Unrolled LSA replay: top-V vocab -> integer tf-idf weights ->
    requantized Gram -> 4 power rounds (component 1) -> exact-integer
    Hotelling deflation scaled by v'v (stays integral) -> 4 rounds
    (component 2) -> per-doc loadings.  Every division is the shared
    trunc-div (DuckDB BIGINT/HUGEINT // == Spark div == the op's
    driver-side tdiv); requantization denominators are
    GREATEST(max|.|, 1) so a rank-deficient corpus degrades to zero
    vectors instead of a crash."""
    V, Q, R = _LSA_V, _LSA_Q, _LSA_R

    def rounds(mat: str, vprev: str, tag: str) -> str:
        out, prev = [], vprev
        for r in range(1, R + 1):
            out.append(f"""
mv{tag}{r} AS MATERIALIZED (
  SELECT g.j, SUM(g.gq * p.v) AS mv
  FROM {mat} g JOIN {prev} p ON g.k = p.j GROUP BY g.j
),
v{tag}{r} AS MATERIALIZED (
  SELECT j, (mv * {Q})
         // (SELECT GREATEST(MAX(ABS(mv)), 1) FROM mv{tag}{r}) AS v
  FROM mv{tag}{r}
),""")
            prev = f"v{tag}{r}"
        return "".join(out)

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
ndocs AS (SELECT COUNT(*) AS n FROM documents),
dfreq AS MATERIALIZED (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
vocab AS MATERIALIZED (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS j
  FROM dfreq QUALIFY j < {V}
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
wraw AS MATERIALIZED (
  SELECT t.doc_id, v.j,
         t.tf * ((1000 * (SELECT n FROM ndocs)) // v.df) AS w
  FROM tf t JOIN vocab v ON t.term = v.term
),
wq AS MATERIALIZED (
  SELECT doc_id, j,
         (w * {Q}) // (SELECT MAX(w) FROM wraw) AS w
  FROM wraw
),
gram AS MATERIALIZED (
  SELECT a.j AS j, b.j AS k, SUM(a.w * b.w) AS g
  FROM wq a JOIN wq b ON a.doc_id = b.doc_id
  GROUP BY a.j, b.j
),
gq AS MATERIALIZED (
  SELECT j, k,
         (g * {Q}) // (SELECT GREATEST(MAX(ABS(g)), 1) FROM gram) AS gq
  FROM gram
),
va0 AS (SELECT j, 1 AS v FROM vocab),{rounds("gq", "va0", "a")}
s1 AS (SELECT SUM(v * v) AS s FROM va{R}),
gv AS (
  SELECT g.j, SUM(g.gq * p.v) AS gv
  FROM gq g JOIN va{R} p ON g.k = p.j GROUP BY g.j
),
hmat AS MATERIALIZED (
  SELECT g.j, g.k,
         (SELECT s FROM s1) * g.gq - gv.gv * p.v AS h
  FROM gq g JOIN gv ON g.j = gv.j JOIN va{R} p ON g.k = p.j
),
hq AS MATERIALIZED (
  SELECT j, k,
         (h * {Q}) // (SELECT GREATEST(MAX(ABS(h)), 1) FROM hmat) AS gq
  FROM hmat
),
vb0 AS (SELECT j, 1 AS v FROM vocab),{rounds("hq", "vb0", "b")}
s2 AS (SELECT SUM(v * v) AS s FROM vb{R}),
lo AS (
  SELECT w.doc_id,
         COALESCE(SUM(w.w * a.v), 0) AS l1,
         COALESCE(SUM(w.w * b.v), 0) AS l2,
         SUM(w.w * w.w) AS wn2
  FROM wq w
  LEFT JOIN va{R} a ON w.j = a.j
  LEFT JOIN vb{R} b ON w.j = b.j
  GROUP BY w.doc_id
)
SELECT doc_id,
  CAST(CASE WHEN wn2 = 0 THEN 0
       WHEN CAST(l1 AS HUGEINT) * l1 * (SELECT s FROM s2)
            >= CAST(l2 AS HUGEINT) * l2 * (SELECT s FROM s1) THEN 1
       ELSE 2 END AS BIGINT) AS topic,
  CAST(CASE WHEN wn2 = 0 THEN 0
       WHEN l1 >= 0 THEN (CAST(l1 AS HUGEINT) * l1 * 1000000)
            // (CAST(GREATEST((SELECT s FROM s1), 1) AS HUGEINT) * wn2)
       ELSE -((CAST(l1 AS HUGEINT) * l1 * 1000000)
            // (CAST(GREATEST((SELECT s FROM s1), 1) AS HUGEINT) * wn2))
       END AS BIGINT) AS cos2_t1_signed_micro,
  CAST(CASE WHEN wn2 = 0 THEN 0
       WHEN l2 >= 0 THEN (CAST(l2 AS HUGEINT) * l2 * 1000000)
            // (CAST(GREATEST((SELECT s FROM s2), 1) AS HUGEINT) * wn2)
       ELSE -((CAST(l2 AS HUGEINT) * l2 * 1000000)
            // (CAST(GREATEST((SELECT s FROM s2), 1) AS HUGEINT) * wn2))
       END AS BIGINT) AS cos2_t2_signed_micro,
  CAST((SELECT s FROM s1) AS BIGINT) AS s1_pin,
  CAST((SELECT s FROM s2) AS BIGINT) AS s2_pin
FROM lo
ORDER BY doc_id
"""


@query("llm_topic_lsa", oracle=_lsa_oracle(), family=_FAM)
def llm_topic_lsa(spark, sf_dir):
    """LATENT SEMANTIC ANALYSIS topic extraction (r15 — Deerwester et
    al. 1990): top-2 principal directions of the integer tf-idf
    term-document matrix, assigned per document — the classical
    corpus-structure pass (topic discovery / semantic clustering on
    TEXT features, where llm_cluster_kmeans clusters embeddings).

    Exact-integer pipeline (the llm_quality_classifier_train /
    llm_embed_opq recipe — no floats anywhere): vocabulary capped to
    the top-V=64 terms by document frequency (the honest dense-
    factorization shape: at 100 TB vocab grows by Heaps' law, so the
    VxV Gram is bounded by FEATURE SELECTION, not by luck), weights
    w = tf * (1000 * N // df) requantized to <= 4096 by the corpus
    max, Gram G = W'W accumulated as exact BIGINTs, then 4 power-
    iteration rounds with trunc-div requantization per round;
    component 2 by exact-INTEGER Hotelling deflation: s1 * G - (G v)
    v' (the v'v scaling keeps the deflated matrix integral — no
    rational division ever happens), 4 more rounds. Dominant topic
    per doc by exact cross-multiplied comparison l1^2 * s2 >= l2^2 *
    s1 (never a float cosine); reported per-topic alignments are
    signed cos^2 in micro-units via one 128-bit trunc-div. s1/s2
    norm pins ride every row.

    Scale shape: two corpus passes (tokenize->tf->weights; loadings),
    both combiner-form; the Gram pair-join fans out <= V^2 rows per
    document (bounded by the vocab cap, repartition-pinned against
    AQE coalescing the exploding join — the r13 lesson); the ONLY
    driver-side state is the <= V^2-row Gram and the 2 V-row
    directions — model-sized, the documented collect-the-model-state
    discipline (_GATE_EXEMPT, the llm_embed_opq class). The weight
    frame is localCheckpointed once and reused by Gram and loadings.

    Cited parity: the driver-side rounds are a literal transcription
    of the oracle CTEs (tdiv == BIGINT/HUGEINT // == Spark div,
    verified on negatives; GREATEST(max,1) guards rank-deficient
    degenerate corpora in both engines identically)."""
    V, Q, R = _LSA_V, _LSA_Q, _LSA_R
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("term"))
    n = corpus_stats.n_docs(spark, sf_dir)
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    wv = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    # top-V selection: distributed TakeOrdered via orderBy+limit, then
    # the j-index window runs on the V-row result (bounded by the cap)
    vocab = (
        dfreq.orderBy(F.col("df").desc(), F.col("term").asc()).limit(V)
        .withColumn("j", F.row_number().over(wv) - 1)
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    wraw = tf.join(F.broadcast(vocab), "term").select(
        "doc_id", "j",
        (F.col("tf") * F.expr(f"(1000 * CAST({n} AS BIGINT)) div df"))
        .alias("w"),
    )
    wmax = wraw.agg(F.max("w").alias("wmax"))
    wq = (
        wraw.crossJoin(F.broadcast(wmax))
        .select("doc_id", "j", F.expr(f"(w * {Q}) div wmax").alias("w"))
        .localCheckpoint()
    )
    par = spark.sparkContext.defaultParallelism
    a = wq.repartition(par, "doc_id").select(
        "doc_id", F.col("j").alias("ja"), F.col("w").alias("wa")
    )
    b = wq.repartition(par, "doc_id").select(
        "doc_id", F.col("j").alias("jb"), F.col("w").alias("wb")
    )
    gram_rows = (
        a.join(b, "doc_id")
        .groupBy("ja", "jb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("g"))
        .collect()  # model-sized: <= V^2 rows (_GATE_EXEMPT)
    )
    G = {(r.ja, r.jb): r.g for r in gram_rows}
    vocab_js = sorted({j for j, _ in G} | {k for _, k in G})

    def tdiv(x: int, y: int) -> int:
        q = abs(x) // y
        return q if x >= 0 else -q

    def requant(mat: dict) -> dict:
        m = max((abs(v) for v in mat.values()), default=0)
        m = max(m, 1)
        return {k: tdiv(v * Q, m) for k, v in mat.items()}

    def power(mat: dict, v0: dict) -> dict:
        v = v0
        for _ in range(R):
            mv: dict = {}
            for (j, k), g in mat.items():
                if k in v:
                    mv[j] = mv.get(j, 0) + g * v[k]
            v = requant(mv)
        return v

    gq = requant(G)
    v1 = power(gq, {j: 1 for j in vocab_js})
    s1 = sum(v * v for v in v1.values())
    gv: dict = {}
    for (j, k), g in gq.items():
        if k in v1:
            gv[j] = gv.get(j, 0) + g * v1[k]
    H = {
        (j, k): s1 * g - gv[j] * v1[k]
        for (j, k), g in gq.items()
        if j in gv and k in v1
    }
    v2 = power(requant(H), {j: 1 for j in vocab_js})
    s2 = sum(v * v for v in v2.values())

    vdf = spark.createDataFrame(
        [
            (int(j), int(v1.get(j, 0)), int(v2.get(j, 0)))
            for j in vocab_js
        ],
        "j int, va long, vb long",
    )
    lo = (
        wq.join(F.broadcast(vdf), wq.j == vdf.j, "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum(F.col("w") * F.col("va")), F.lit(0))
            .alias("l1"),
            F.coalesce(F.sum(F.col("w") * F.col("vb")), F.lit(0))
            .alias("l2"),
            F.sum(F.col("w") * F.col("w")).alias("wn2"),
        )
    )
    s1g, s2g = max(s1, 1), max(s2, 1)
    return lo.select(
        "doc_id",
        F.expr(
            f"CAST(CASE WHEN wn2 = 0 THEN 0"
            f" WHEN CAST(l1 AS DECIMAL(38,0)) * l1 * {s2}"
            f"      >= CAST(l2 AS DECIMAL(38,0)) * l2 * {s1} THEN 1"
            f" ELSE 2 END AS BIGINT)"
        ).alias("topic"),
        F.expr(
            f"CAST(CASE WHEN wn2 = 0 THEN 0"
            f" WHEN l1 >= 0 THEN (CAST(l1 AS DECIMAL(38,0)) * l1 * 1000000)"
            f"      div (CAST({s1g} AS DECIMAL(38,0)) * wn2)"
            f" ELSE -((CAST(l1 AS DECIMAL(38,0)) * l1 * 1000000)"
            f"      div (CAST({s1g} AS DECIMAL(38,0)) * wn2))"
            f" END AS BIGINT)"
        ).alias("cos2_t1_signed_micro"),
        F.expr(
            f"CAST(CASE WHEN wn2 = 0 THEN 0"
            f" WHEN l2 >= 0 THEN (CAST(l2 AS DECIMAL(38,0)) * l2 * 1000000)"
            f"      div (CAST({s2g} AS DECIMAL(38,0)) * wn2)"
            f" ELSE -((CAST(l2 AS DECIMAL(38,0)) * l2 * 1000000)"
            f"      div (CAST({s2g} AS DECIMAL(38,0)) * wn2))"
            f" END AS BIGINT)"
        ).alias("cos2_t2_signed_micro"),
        F.lit(s1).cast("bigint").alias("s1_pin"),
        F.lit(s2).cast("bigint").alias("s2_pin"),
    ).orderBy("doc_id")
