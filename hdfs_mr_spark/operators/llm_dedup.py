"""LLM-pipeline deduplication (SURVEY.md §2.11, mandate: "dedup").

Exact dedup is a hash-group (one shuffle, combiner-friendly). Near-dedup
is MinHash+LSH: the LSH join only *generates candidates*; the checked
output is defined by an exact token-set Jaccard recomputed JVM-side, so
results are deterministic and oracle-matchable while LSH (numHashTables
=25, seed=42, miss prob (1-J)^25 <= 3e-18 at J>=0.8) provides the
sub-quadratic scale path. SimHash fingerprint dedup lives in
llm_text.llm_fingerprint_simhash; embedding-cosine near-dup in
llm_similarity.llm_sim_pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query

_FAM = "2.11 llm dedup"


@query(
    "llm_dedup_exact",
    oracle="""
WITH hashed AS (
  SELECT doc_id, lang, sha256(lower(trim(text))) AS content_hash FROM documents
)
SELECT content_hash,
       MIN(doc_id) AS kept_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM hashed
GROUP BY content_hash
ORDER BY kept_doc_id
""",
    family=_FAM,
)
def llm_dedup_exact(spark, sf_dir):
    """Exact text dedup on normalized content hash; keeps the lowest
    doc_id per hash (deterministic representative). Expressed as an
    aggregate, not distinct-on-wide-rows, so the shuffle carries
    (hash, min, count) — the combiner shape."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", "lang",
            F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .orderBy("kept_doc_id")
    )


_NEAR_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.d1, i.d2, CAST(i.n_common AS INTEGER) AS n_common,
       CAST(i.n_common AS DOUBLE)
         / CAST(s1.sz + s2.sz - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes s1 ON i.d1 = s1.doc_id
JOIN sizes s2 ON i.d2 = s2.doc_id
WHERE CAST(i.n_common AS DOUBLE)
      / CAST(s1.sz + s2.sz - i.n_common AS DOUBLE) >= 0.8
ORDER BY d1, d2
"""


@query("llm_dedup_near", oracle=_NEAR_ORACLE, family=_FAM)
def llm_dedup_near(spark, sf_dir):
    """Near-dedup: shingle (distinct tokens) -> MinHash -> LSH band
    bucketing -> candidate pairs -> exact Jaccard >= 0.8.

    The LSH stage is pyspark.ml MinHashLSH(seed=42) approxSimilarityJoin
    at a loose candidate threshold; the *output* is defined by the exact
    Jaccard over token sets (array_intersect), computed identically in
    the oracle — LSH recall tuning therefore only affects completeness,
    which the oracle verifies (any missed pair fails the check)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    feat = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=1 << 18, binary=True
    ).transform(toks)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=25, seed=42
    ).fit(feat)
    cand = (
        model.approxSimilarityJoin(feat, feat, 0.5, distCol="lsh_dist")
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            F.col("datasetA.toks").alias("toks1"),
            F.col("datasetB.toks").alias("toks2"),
        )
        .filter(F.col("d1") < F.col("d2"))
    )
    n_common = F.size(F.array_intersect("toks1", "toks2"))
    union_sz = F.size("toks1") + F.size("toks2") - n_common
    jac = n_common.cast("double") / union_sz.cast("double")
    return (
        cand.select(
            "d1", "d2",
            n_common.cast("int").alias("n_common"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("d1", "d2")
    )


@query(
    "llm_dedup_embed",
    oracle="""
WITH n AS (
  SELECT vec_id, embedding,
         SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, x) -> acc + x)) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
          (acc, x) -> acc + x) / (a.nrm * b.nrm) >= 0.35
)
SELECT e.vec_id,
       MIN(p.v1) AS dup_of,
       (MIN(p.v1) IS NULL) AS kept
FROM embeddings e LEFT JOIN pairs p ON e.vec_id = p.v2
GROUP BY e.vec_id
ORDER BY e.vec_id
""",
    family=_FAM,
)
def llm_dedup_embed(spark, sf_dir):
    """Embedding-cosine near-dup dedup: a vector is a duplicate if some
    lower-id vector has cosine >= 0.35 with it; the kept representative
    is the lowest id (deterministic, no connected components needed for
    a dedup decision). Reuses the JVM-side fold kernel from
    llm_similarity; brute-force pairs at fixture scale — the documented
    scale path buckets candidates by sign-bit sketch first
    (llm_sim_knn_lsh plan shape), which leaves this exact query as the
    per-bucket kernel."""
    from hdfs_mr_spark.operators.llm_similarity import _dot, _norm

    e = table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    a = n.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = n.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    cos = _dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    pairs = (
        a.join(b, F.col("v1") < F.col("v2"))
        .filter(cos >= 0.35)
        .select("v1", "v2")
    )
    return (
        e.select("vec_id")
        .join(pairs, e.vec_id == pairs.v2, "left")
        .groupBy("vec_id")
        .agg(F.min("v1").alias("dup_of"))
        .select("vec_id", "dup_of", F.col("dup_of").isNull().alias("kept"))
        .orderBy("vec_id")
    )


@query(
    "llm_dedup_near_ngram",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) d
),
tok AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
  FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.d1, i.d2,
       CAST(i.n_common AS DOUBLE)
         / CAST(s1.sz + s2.sz - i.n_common AS DOUBLE) AS jaccard3
FROM inter i
JOIN sizes s1 ON i.d1 = s1.doc_id
JOIN sizes s2 ON i.d2 = s2.doc_id
WHERE CAST(i.n_common AS DOUBLE)
      / CAST(s1.sz + s2.sz - i.n_common AS DOUBLE) >= 0.5
ORDER BY d1, d2
""",
    family=_FAM,
)
def llm_dedup_near_ngram(spark, sf_dir):
    """3-gram (word-trigram) Jaccard near-dup: inverted-index self-join on
    shingles, group-count intersections, exact Jaccard >= 0.5. This is
    the posting-list formulation — pairs sharing no shingle are never
    materialized, which is what keeps it sub-quadratic at scale."""
    d = table(spark, sf_dir, "documents")
    shingles = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(split(text,' ')) - 2),"
            " i -> concat_ws(' ', element_at(split(text,' '), i),"
            " element_at(split(text,' '), i+1), element_at(split(text,' '), i+2)))"
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles"))
    tok = sh.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    t2 = tok.select(F.col("doc_id").alias("doc_id2"), F.col("s").alias("s2"))
    inter = (
        tok.join(t2, (tok.s == t2.s2) & (tok.doc_id < t2.doc_id2))
        .groupBy(F.col("doc_id").alias("d1"), F.col("doc_id2").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    jac = F.col("n_common").cast("double") / (
        (F.col("sz1") + F.col("sz2") - F.col("n_common")).cast("double")
    )
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", jac.alias("jaccard3"))
        .filter(F.col("jaccard3") >= 0.5)
        .orderBy("d1", "d2")
    )
